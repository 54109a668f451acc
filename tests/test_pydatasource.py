"""Custom Python data source (sources/pydatasource.py): partition
planning, determinism, and exact content."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightlane_spark.sources.pydatasource import _MOD, _MULT, read_synth


def test_partition_split_is_honored(spark):
    df = read_synth(spark, 1000, partitions=5)
    nparts = (
        df.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert nparts == 5
    # each partition holds a contiguous id range of 200
    bounds = (
        df.select(F.spark_partition_id().alias("p"), "event_id")
        .groupBy("p")
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    assert all(r.n == 200 and r.hi - r.lo == 199 for r in bounds)


def test_content_matches_closed_form(spark):
    rows = read_synth(spark, 500, partitions=3).orderBy("event_id").collect()
    for i, r in enumerate(rows):
        assert r.event_id == i
        assert r.user_id == (i * _MULT) % _MOD
        assert r.grp == i % 7
        assert abs(r.value - (i % 1000) / 10.0) == 0.0


def test_rows_not_divisible_by_partitions(spark):
    df = read_synth(spark, 103, partitions=4)
    assert df.count() == 103
    assert df.select("event_id").distinct().count() == 103
