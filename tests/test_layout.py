"""Z-order layout: key correctness vs a pure-python reference, and
the clustering property the layout exists for (per-partition envelopes
tight on EVERY dimension)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightlane_spark.operators.layout import zorder_key, zorder_repartition, zorder_sql


def _py_zkey(vals, specs, bits=16):
    top = (1 << bits) - 1
    d = len(specs)
    z = 0
    for j, (v, (lo, hi)) in enumerate(zip(vals, specs)):
        v = min(max(v, lo), hi)
        u = (v - lo) * top // (hi - lo)
        for b in range(bits):
            z += ((u >> b) & 1) << (b * d + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 3, 7, 100, 999) for y in (0, 1, 50, 999)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    specs = [("x", 0, 1000), ("y", 0, 1000)]
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(specs, bits=10)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_zkey((x, y), [(0, 1000), (0, 1000)], bits=10)


def test_zorder_key_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5, 2000)], "x bigint, y bigint")
    specs = [("x", 0, 1000), ("y", 0, 1000)]
    z = df.select(zorder_key(specs, bits=10).alias("z")).first().z
    assert z == _py_zkey((0, 1000), [(0, 1000), (0, 1000)], bits=10)


def test_zorder_key_int32_column_no_overflow(spark):
    """Overflow regression: on a 32-bit INT column the ``* 65535``
    scaling must run in 64-bit — pre-fix it multiplied in int32 and
    silently wrapped (non-ANSI Spark), corrupting keys for values
    above ~2^31/65535 ≈ 32k."""
    vals = [0, 40_000, 1_000_000_000, 2_000_000_000]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    hi = 2_000_000_000
    got = {
        r.x: r.z
        for r in df.withColumn("z", zorder_key([("x", 0, hi)], bits=16)).collect()
    }
    for v in vals:
        assert got[v] == _py_zkey((v,), [(0, hi)], bits=16), v


def test_zorder_sql_validates():
    with pytest.raises(ValueError):
        zorder_sql([], bits=8)
    with pytest.raises(ValueError):
        zorder_sql([("x", 0, 10)] * 8, bits=16)  # 128 bits > 62
    with pytest.raises(ValueError):
        zorder_sql([("x", 10, 10)])


def test_zorder_write_gives_prunable_file_stats(spark, tmp_path):
    """The point of the layout: after a z-ordered write, EVERY parquet
    file's min/max footer stats are tight on BOTH dimensions, so
    row-group pruning works for predicates on either column."""
    import pyarrow.parquet as pq

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    specs = [("x", 0, n - 1), ("y", 0, n - 1)]
    path = str(tmp_path / "zordered")
    zorder_repartition(grid, specs, 16, bits=6).write.parquet(path)

    import glob

    spans_x, spans_y = [], []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        lo_x = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi_x = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        lo_y = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi_y = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_x.append(hi_x - lo_x)
        spans_y.append(hi_y - lo_y)
    assert len(spans_x) >= 8
    assert sum(spans_x) / len(spans_x) < (n - 1) / 2
    assert sum(spans_y) / len(spans_y) < (n - 1) / 2


def test_zorder_repartition_tightens_both_dims(spark):
    # 64×64 grid: after z-order range partitioning into 16 parts, the
    # average per-partition span of BOTH x and y must be far below the
    # global span (a single-column sort leaves the second dim global).
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    specs = [("x", 0, n - 1), ("y", 0, n - 1)]
    parts = zorder_repartition(grid, specs, 16, bits=6, keep_key=True)
    spans = (
        parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
        .first()
    )
    assert spans.ax < (n - 1) / 2
    assert spans.ay < (n - 1) / 2
