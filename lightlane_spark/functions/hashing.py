"""Portable 32-bit hashing — the primitive under MinHash/SimHash/LSH.

``h32`` is md5-based so the SAME value is computable in any engine
with an md5 function — which makes every sketch built on it
oracle-checkable in DuckDB (SQL equivalent:
``('0x' || substr(md5(s), 1, 8))::BIGINT``). xxhash64/murmur3 would be
faster but engine-specific; md5 stays JVM-side in codegen and the hash
cost is dwarfed by the shuffle it feeds, so portability wins.

Verified bit-identical Spark↔DuckDB (tests/test_text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^32 — h32 values are uniform in [0, 2^32)
H32_SPACE = 1 << 32


def h32(col: Column | str, seed: int | None = None) -> Column:
    """Uniform 32-bit hash of a string column, optionally seeded.

    Seeding prefixes ``"{seed}:"`` — a family of independent hash
    functions for MinHash (one per signature position).
    DuckDB equivalent::

        ('0x' || substr(md5(concat(seed, ':', s)), 1, 8))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(str(seed)), F.lit(":"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_seeded_all(col: Column | str, num_seeds: int) -> Column:
    """Array of ``num_seeds`` independent h32 values for one string —
    one expression, no per-seed re-explode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[h32(c, seed=i) for i in range(num_seeds)])


def bit_of(col: Column, bit: int) -> Column:
    """Bit ``bit`` of a non-negative integral column (portable:
    ``(x DIV 2^bit) % 2`` — same arithmetic in any SQL engine)."""
    return (col.bitwiseAND(F.lit(1 << bit)) != 0).cast("int")
