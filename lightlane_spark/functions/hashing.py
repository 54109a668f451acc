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
    one expression, no per-seed re-explode. Costs ``num_seeds`` md5
    evaluations; prefer ``hash_family`` for MinHash-sized families."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(*[h32(c, seed=i) for i in range(num_seeds)])


def hash_family(col: Column | str, k: int) -> Column:
    """``k`` 32-bit hashes from ONE md5: double hashing
    ``h_i = (m1 + i·m2) mod 2^32`` with m1/m2 the md5's first two
    32-bit words — the standard Carter-Wegman family used for MinHash
    (k× cheaper than k independent md5s; independence is sufficient
    for min-sketch estimates).

    DuckDB equivalent::

        m1 = ('0x' || substr(md5(s), 1, 8))::BIGINT
        m2 = ('0x' || substr(md5(s), 9, 8))::BIGINT
        h_i = (m1 + i * m2) % 4294967296

    All intermediates < 2^61, no BIGINT overflow in either engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.md5(c)
    m1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    m2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return F.array(*[((m1 + F.lit(i) * m2) % F.lit(H32_SPACE)) for i in range(k)])


def bit_of(col: Column, bit: int) -> Column:
    """Bit ``bit`` of a non-negative integral column (portable:
    ``(x DIV 2^bit) % 2`` — same arithmetic in any SQL engine)."""
    return (col.bitwiseAND(F.lit(1 << bit)) != 0).cast("int")
