"""Mode-aware table loader — OP-24..OP-32.

Reference parity (SURVEY §2.3): the reference loads a staging table
and then reconciles it into the target with one of three modes
(``loader/hive_loader.py:97-204``, ``loader/mysql_loader.py:66-129``):

  - OVERWRITE: replace target content (MySQL 3-step RENAME swap /
    Hive INSERT OVERWRITE) → ``mode('overwrite')``.
  - APPEND: INSERT INTO → ``mode('append')``.
  - MERGE (upsert): keep target rows whose PK is NOT in staging
    (LEFT OUTER JOIN … IS NULL — an anti-join), UNION ALL staging,
    write to a reconcile table, atomic rename swap
    (``hive_loader.py:162-182``). Here:
    ``target.join(staging, pks, 'left_anti').unionByName(staging)``
    staged to a temp path then atomically swapped — same reconcile-
    and-swap commit the reference uses, minus the Hive DDL.

Validation rules preserved (``hive_loader.py:62-82``): mode must be
one of the three; MERGE requires primary keys and forbids static
partitioning; dedup requires keys, default order = keys.

Pipeline ordering preserved (``hive_loader.py:184-193``): optional
dedup of staging happens BEFORE the merge, and pre/post SQL hooks
bracket the operation.

Scale notes: the anti-join shuffles both sides on the PK unless the
staging side is small enough to broadcast — we broadcast it below a
size hint since incremental batches are typically ≪ target. AQE skew
handling covers hot PKs. For true ACID upserts use Delta's MERGE INTO
when the runtime has it; this file is the format-agnostic path.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightlane_spark.operators.dedup import dedup_keep_first


class LoadMode(str, Enum):
    OVERWRITE = "overwrite"
    APPEND = "append"
    MERGE = "merge"


def align_schemas(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Schema evolution: give both frames the union of their columns,
    filling each side's missing columns with typed NULLs (types taken
    from the side that has the column). Column order = a's columns
    then b's additions, both sides identical — so unionByName and
    parquet writes see one schema. Raises if a shared column name has
    conflicting types (silent cast would corrupt data)."""
    ta = {f.name: f.dataType for f in a.schema.fields}
    tb = {f.name: f.dataType for f in b.schema.fields}
    conflicts = {c for c in ta.keys() & tb.keys() if ta[c] != tb[c]}
    if conflicts:
        raise ValueError(
            f"schema evolution cannot reconcile conflicting types for {sorted(conflicts)}"
        )
    ordered = list(a.columns) + [c for c in b.columns if c not in ta]
    types = {**tb, **ta}
    def conform(df, have):
        cols = [
            F.col(c) if c in have else F.lit(None).cast(types[c]).alias(c)
            for c in ordered
        ]
        return df.select(*cols)
    return conform(a, ta), conform(b, tb)


def merge_upsert(
    target: DataFrame,
    staging: DataFrame,
    primary_keys: list[str],
    broadcast_staging: bool | None = None,
    schema_evolution: bool = False,
) -> DataFrame:
    """OP-27 MERGE semantics: anti-join target on PKs, union staging.

    Multi-column PKs form a conjunctive equi-join key
    (``hive_loader.py:164``). ``broadcast_staging=None`` lets AQE
    decide; ``True`` forces a broadcast hash anti-join (the common
    case — a small incremental batch against a huge target avoids
    shuffling the target entirely).

    ``schema_evolution=True`` reconciles drifted schemas first
    (``align_schemas``): columns added to the staging batch appear
    NULL on retained target rows, columns dropped from staging stay
    NULL on upserted rows — where the reference's rigid
    INSERT-by-position load simply breaks on drift. Default off: an
    unannounced schema change should fail loudly.
    """
    if not primary_keys:
        raise ValueError("MERGE mode requires primary_keys")  # hive_loader.py:67-69
    if schema_evolution:
        target, staging = align_schemas(target, staging)
    stg = F.broadcast(staging) if broadcast_staging else staging
    kept = target.join(stg, on=primary_keys, how="left_anti")
    return kept.unionByName(staging)


@dataclass
class Loader:
    """Write a DataFrame to a parquet table path under a load mode.

    The reference's loader entry points (``hive_loader.py``,
    ``mysql_loader.py``) collapse into this one class: staging tables
    become transient DataFrames (OP-29 — no DDL needed), bulk-load
    becomes the write itself (OP-22/23), and the commit protocol is
    Spark's plus an atomic directory swap for MERGE/self-overwrite.
    """

    spark: SparkSession
    table_path: str
    mode: LoadMode | str = LoadMode.OVERWRITE
    primary_keys: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    dedup: bool = False
    dedup_uniq_keys: list[str] = field(default_factory=list)
    dedup_orderby: list[str] = field(default_factory=list)
    pre_sql: list[str] = field(default_factory=list)
    post_sql: list[str] = field(default_factory=list)
    analyze: bool = False
    schema_evolution: bool = False
    # Sink format for PATH-based writes: parquet/orc/json here; text
    # goes through loaders/text_sinks.py (its own delimiter contract),
    # AVRO through loaders/avro_sink.py (pure-Python container codec).
    # Hive-CATALOG tables in any reference HIVE_FILE_FORMAT —
    # TEXTFILE/SEQUENCEFILE/RCFILE/ORC/PARQUET, const.py:19-26 — go
    # through ``write_hive_table`` (needs a Hive-enabled session).
    fmt: str = "parquet"

    def __post_init__(self):
        self.mode = LoadMode(self.mode)
        if self.mode is LoadMode.MERGE:
            if not self.primary_keys:
                # hive_loader.py:67-69
                raise ValueError("MERGE mode requires primary_keys")
            if self.partition_by:
                # hive_loader.py:70-72 — MERGE ⊥ partitioning
                raise ValueError("MERGE mode does not support partition_by")
        if self.dedup and not self.dedup_uniq_keys:
            # hive_loader.py:76-79
            raise ValueError("dedup requires dedup_uniq_keys")

    # -- pipeline -----------------------------------------------------
    def execute(self, staging: DataFrame) -> None:
        for q in self.pre_sql:  # OP-31
            self.spark.sql(q)
        if self.dedup:  # dedup BEFORE merge — hive_loader.py:184-187
            staging = dedup_keep_first(
                staging, self.dedup_uniq_keys, self.dedup_orderby or None
            )
        if self.mode is LoadMode.MERGE:
            self._merge(staging)
        else:
            writer = staging.write.mode(self.mode.value).format(self.fmt)
            if self.partition_by:  # OP-24 dynamic partitioned insert
                writer = writer.partitionBy(*self.partition_by)
            writer.save(self.table_path)
        for q in self.post_sql:  # OP-31
            self.spark.sql(q)
        if self.analyze:  # OP-32 — stats for downstream planning
            self._analyze()

    def _merge(self, staging: DataFrame) -> None:
        """Reconcile-and-swap: the reference's MERGE commit
        (``hive_loader.py:166-179``) re-expressed as a staged parquet
        write + a rename swap through the Hadoop FileSystem API — so
        the same code works on file://, HDFS, and S3A paths, not just
        the driver-local filesystem."""
        fs, table = self._fs_path(self.table_path)
        if not fs.exists(table):
            staging.write.mode("overwrite").format(self.fmt).save(self.table_path)
            return
        target = self.spark.read.format(self.fmt).load(self.table_path)
        merged = merge_upsert(
            target,
            staging,
            self.primary_keys,
            schema_evolution=self.schema_evolution,
        )
        reconcile = self._sibling_tmp_path()
        _, rec = self._fs_path(reconcile)
        try:
            merged.write.mode("overwrite").format(self.fmt).save(reconcile)
            # Swap, mirroring the reference's rename dance
            # (mysql_loader.py:119-123): retire the old dir, move the
            # reconcile dir into place, drop the old. If the second
            # rename fails, restore the retired dir so the table path
            # is never left missing.
            _, retired = self._fs_path(self.table_path + ".old-" + uuid.uuid4().hex[:8])
            if not fs.rename(table, retired):
                raise IOError(f"MERGE swap: could not retire {self.table_path}")
            if not fs.rename(rec, table):
                fs.rename(retired, table)
                raise IOError(f"MERGE swap: could not install reconcile dir at {self.table_path}")
            fs.delete(retired, True)
        except Exception:
            if fs.exists(rec):
                fs.delete(rec, True)
            raise

    def _fs_path(self, path_str: str):
        """(FileSystem, Path) for ``path_str``'s scheme via the JVM
        Hadoop API — local paths resolve against the default FS."""
        jvm = self.spark.sparkContext._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        return path.getFileSystem(hconf), path

    def _sibling_tmp_path(self) -> str:
        # Scheme-preserving sibling path (os.path would mangle URIs).
        base = self.table_path.rstrip("/")
        parent, _, _ = base.rpartition("/")
        return (parent or ".") + "/.reconcile-" + uuid.uuid4().hex[:12]

    def _analyze(self) -> None:
        """OP-32: refresh stats. On a path-backed table the useful
        equivalent is dropping any cached footer metadata; for
        catalog tables run ANALYZE TABLE instead."""
        self.spark.catalog.clearCache()


HIVE_FILE_FORMATS = ("textfile", "sequencefile", "rcfile", "orc", "parquet")


def write_hive_table(
    df: DataFrame,
    table: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` as a Hive-catalog table in any of the reference's
    HIVE_FILE_FORMATS (``const.py:19-26``): TEXTFILE, SEQUENCEFILE,
    RCFILE, ORC, PARQUET — the Hive SerDes ship in Spark's own jars,
    so even the legacy container formats round-trip (verified in
    ``tests/test_hive_formats.py``; AVRO is covered separately by the
    pure-Python container codec in ``loaders/avro_sink.py``).

    Requires a ``enableHiveSupport()`` session (embedded Derby
    metastore locally; a shared metastore on a cluster). Partitioned
    writes use Hive dynamic partitioning — the reference's OP-24.
    """
    fmt = file_format.lower()
    if fmt not in HIVE_FILE_FORMATS:
        raise ValueError(
            f"unknown Hive file format {file_format!r}; known: {HIVE_FILE_FORMATS}"
        )
    writer = df.write.format("hive").option("fileFormat", fmt).mode(mode)
    if partition_by:
        # all partition values come from the data (the reference's
        # dynamic insert, OP-24) — Hive's strict mode wants at least
        # one static partition otherwise
        df.sparkSession.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)
