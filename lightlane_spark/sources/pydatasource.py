"""Custom Python data source (Spark 4 DataSource API) — the modern
extension point for sources Spark has no built-in reader for (internal
services, proprietary formats, synthetic generators).

The reference's source surface is JDBC-or-files; this shows the
engine's third path: a first-class pluggable source that participates
in Spark's planning — ``partitions()`` declares the parallel split
(the analog of OP-12's range partitioning, but source-side), and each
task materializes ONLY its partition, so a 1000-executor cluster
generates/fetches 1000 ways with no driver bottleneck and no
post-hoc repartition.

``lightlane_synth`` generates a deterministic event stream from pure
integer arithmetic — every value is a closed-form function of the row
id, so any slice is reproducible on any engine (the DuckDB oracle
mirrors the formulas over ``range()``), and tests can assert exact
content without fixture files.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


# Knuth's multiplicative-hash constant and a prime modulus: a cheap
# deterministic scatter that both engines compute exactly in int64
# (max operand ~2.6e15 « 2^63).
_MULT = 2654435761
_MOD = 1000003


class SynthEventsDataSource(DataSource):
    """``spark.read.format("lightlane_synth").option("rows", N)
    .option("partitions", P).load()``"""

    @classmethod
    def name(cls) -> str:
        return "lightlane_synth"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, grp int, value double"

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(self.options)


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        n, p = self.rows, max(1, self.num_partitions)
        step = (n + p - 1) // p
        return [
            _Range(lo, min(lo + step, n)) for lo in range(0, n, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (
                i,
                (i * _MULT) % _MOD,
                i % 7,
                float(i % 1000) / 10.0,
            )


def register_synth_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine).

    Ships the package to Python workers first: local-mode workers
    fork from the driver and inherit ``sys.path``, but cluster
    executors resolve the pickled DataSource class by module
    reference and need ``lightlane_spark`` importable."""
    from lightlane_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    spark.dataSource.register(SynthEventsDataSource)


def read_synth(spark, rows: int, partitions: int = 8):
    register_synth_source(spark)
    return (
        spark.read.format("lightlane_synth")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )
