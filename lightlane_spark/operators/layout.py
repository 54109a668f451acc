"""Data-layout operators: Z-order (Morton) clustering keys.

Sorting a table by one column gives parquet min/max file stats that
prune scans on THAT column only; at 100 TB, queries filtering on a
second dimension (user AND time, tenant AND date) still read
everything. Z-ordering interleaves the bits of several dimensions
into one sort key, so range-partitioning + sorting by the key gives
every file a tight min/max envelope on EVERY participating column —
multi-dimensional scan pruning from ordinary parquet statistics.
This is the standard lakehouse technique (Delta/Iceberg `OPTIMIZE
ZORDER BY`), reproduced here engine-side with plain integer
arithmetic so it works on any sink and has an exact SQL oracle.

The reference (RickyXuPengfei/LightLane) has no layout control at
all — its loaders write rows in arrival order (hive_loader.py's
INSERT path); this is a beyond-parity scale extension.

Implementation notes:
  - The key is rendered as ONE SQL expression string (like
    ``similarity._hyperplane_bits_sql``): bits×dims arithmetic terms,
    no Python-side Column composition per bit (py4j round-trips), and
    stable generated-code text so whole-stage codegen caches.
  - Bounds are caller-supplied, not probed: the key must be STABLE
    across incremental loads (a data-derived min/max would re-shuffle
    the whole layout every batch). Clamping handles outliers.
  - Everything is integer DIV/%/× — deterministic, engine-portable,
    exactly reproducible in DuckDB for the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sql(
    specs: Sequence[tuple[str, int, int]],
    bits: int = 16,
    idiv: str = "DIV",
) -> str:
    """SQL text for the Z-order key of ``specs`` = [(col_sql, lo, hi)].

    Each dimension is scaled to an unsigned ``bits``-bit integer
    u = (clamp(v, lo, hi) - lo) * (2^bits - 1) DIV (hi - lo), then bit
    b of dimension j lands at position b*d + j of the key. d*bits must
    stay ≤ 62 (bigint, sign bit spared).

    The same generator authors the oracle: Spark spells integer
    division ``DIV``, DuckDB spells it ``//`` — pass ``idiv="//"``
    for the DuckDB rendering (operands are non-negative, so floor and
    truncating division agree).
    """
    d = len(specs)
    if d == 0:
        raise ValueError("zorder_sql needs at least one (col, lo, hi) spec")
    if d * bits > 62:
        raise ValueError(f"{d} dims × {bits} bits exceeds the 62-bit key budget")
    terms: list[str] = []
    top = (1 << bits) - 1
    for j, (col_sql, lo, hi) in enumerate(specs):
        if hi <= lo:
            raise ValueError(f"spec {col_sql!r}: hi must exceed lo")
        span = hi - lo
        # The clamped value is cast to BIGINT BEFORE the ``* top``
        # scaling: on a 32-bit INT column the multiply would otherwise
        # run in int32 and overflow (silent wraparound in non-ANSI
        # Spark, a runtime error in DuckDB) for values above
        # ~2^31/top. All arithmetic after the cast is 64-bit in both
        # engines.
        u = (
            f"(CAST(CASE WHEN ({col_sql}) < {lo} THEN {lo} "
            f"WHEN ({col_sql}) > {hi} THEN {hi} "
            f"ELSE ({col_sql}) END AS BIGINT) - {lo}) * {top} {idiv} {span}"
        )
        # bit b of dimension j: (u DIV 2^b) % 2 << (b*d + j)
        for b in range(bits):
            shift = 1 << (b * d + j)
            terms.append(
                f"((({u}) {idiv} {1 << b}) % 2) * {shift}"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    specs: Sequence[tuple[str, int, int]],
    bits: int = 16,
) -> Column:
    """Z-order key column from ``specs`` = [(col_sql, lo, hi)]."""
    return F.expr(zorder_sql(specs, bits))


def zorder_repartition(
    df: DataFrame,
    specs: Sequence[tuple[str, int, int]],
    num_partitions: int,
    bits: int = 16,
    key_col: str = "__zkey",
    keep_key: bool = False,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional scan pruning: range-
    partition on the Z-order key, sort within partitions by it, so a
    subsequent parquet write gives every file a tight min/max envelope
    on every spec'd column.

    One range-partitioning shuffle (same cost class as any global
    sort); the sample pass for range boundaries is Spark's own.
    ``keep_key=True`` retains the key column for inspection.
    """
    keyed = df.withColumn(key_col, zorder_key(specs, bits))
    out = keyed.repartitionByRange(num_partitions, F.col(key_col)).sortWithinPartitions(
        F.col(key_col)
    )
    return out if keep_key else out.drop(key_col)
