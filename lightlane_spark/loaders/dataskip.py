"""File-level data skipping: min/max manifest + pruned scans.

Parquet row-group statistics already let Spark skip ROW GROUPS, but
only after opening every file footer — at 100 TB with millions of
files, the footer-read storm IS the bottleneck (one S3 GET per file
per query). Lakehouse formats (Delta/Iceberg/Hudi) fix this with a
MANIFEST: per-file column min/max collected once at write time, so
planning prunes the file LIST from one small metadata read and the
query opens only surviving files. This module reproduces that
pattern on plain parquet:

  - ``write_with_stats`` range-lays-out the data on the skip column
    (tight per-file envelopes — stats on a randomly-distributed
    column prune nothing) and collects each file's min/max into
    ``_lightlane_manifest.json`` from the parquet footers the write
    already produced;
  - ``pruned_scan`` intersects a range predicate with the manifest,
    reads only overlapping files, and RE-APPLIES the predicate (files
    straddling the bound contain out-of-range rows) — so the result
    is exactly the full-scan filter, just cheaper.

The reference (RickyXuPengfei/LightLane) reads full tables and
filters afterwards (hive_extractor.py's SELECT *); its only pruning
is partition-value equality. Range manifests are a beyond-parity
scale extension, and they compose with ``layout.zorder_repartition``
for multi-column envelopes.

Footer collection runs on the driver (one local footer read per
file); at real scale the same collection is a map-only Spark job over
file paths — the manifest format and pruning logic are unchanged, so
the driver-side version is the honest local form, not a shortcut
baked into the API.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_lightlane_manifest.json"


def _encode(v: Any) -> Any:
    """JSON-safe stat value; dates/timestamps as ISO strings (which
    preserve ordering under string comparison)."""
    if isinstance(v, (dt.date, dt.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def write_with_stats(
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    num_files: int = 16,
    layout_col: str | None = None,
) -> dict[str, dict[str, list[Any]]]:
    """Write ``df`` as parquet range-laid-out on ``layout_col``
    (default: first stats col) and build the per-file min/max manifest
    for ``stats_cols``. Returns the manifest (also persisted next to
    the data).

    One range-partitioning shuffle (Spark samples the boundaries) +
    in-partition sort — the layout cost that buys every later scan
    its pruning. Min/max come from the parquet footers, so they are
    exactly what the files contain, never a second data pass.
    """
    lc = layout_col or stats_cols[0]
    (
        df.repartitionByRange(num_files, F.col(lc))
        .sortWithinPartitions(lc)
        .write.mode("overwrite")
        .parquet(path)
    )
    return write_manifest(path, stats_cols)


def write_manifest(path: str, stats_cols: list[str]) -> dict[str, dict[str, list[Any]]]:
    """Collect per-file min/max for ``stats_cols`` from the parquet
    footers already on disk and persist ``_lightlane_manifest.json``.

    Public so ANY layout can get a manifest — in particular
    ``layout.zorder_repartition`` output, where the interleaved sort
    key gives tight envelopes on EVERY participating column and the
    manifest then prunes on any of them (multi-dimensional file
    skipping; pinned in tests/test_dataskip.py)."""
    import pyarrow.parquet as pq

    manifest: dict[str, dict[str, list[Any]]] = {}
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = list(md.schema.names)
        stats: dict[str, list[Any]] = {}
        for col in stats_cols:
            idx = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                if s is None or not s.has_min_max:
                    stats[col] = [None, None]  # unknown → never pruned
                    break
                mins.append(s.min)
                maxs.append(s.max)
            else:
                stats[col] = [_encode(min(mins)), _encode(max(maxs))]
        manifest[os.path.basename(f)] = stats
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def pruned_files(path: str, col: str, lo: Any, hi: Any) -> tuple[list[str], int]:
    """File names whose [min,max] envelope on ``col`` intersects
    [lo, hi], plus the total file count (for pruning-ratio asserts).
    Files with unknown stats are conservatively kept."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    lo_e, hi_e = _encode(lo), _encode(hi)
    keep = []
    for fname, stats in sorted(manifest.items()):
        mn, mx = stats.get(col, [None, None])
        if mn is None or mx is None or (mx >= lo_e and mn <= hi_e):
            keep.append(fname)
    return keep, len(manifest)


def pruned_files_multi(
    path: str, ranges: dict[str, tuple[Any, Any]]
) -> tuple[list[str], int]:
    """Files whose envelopes intersect EVERY [lo, hi] in ``ranges`` —
    conjunctive pruning across manifest columns. With a Z-ordered
    layout (``layout.zorder_repartition`` + ``write_manifest``) each
    file is tight on every participating dimension, so a two-column
    predicate keeps roughly the PRODUCT of the per-column survival
    fractions instead of their minimum."""
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    keep = []
    for fname, stats in sorted(manifest.items()):
        ok = True
        for col, (lo, hi) in ranges.items():
            mn, mx = stats.get(col, [None, None])
            if mn is None or mx is None:
                continue  # unknown stats → cannot prune on this column
            if mx < _encode(lo) or mn > _encode(hi):
                ok = False
                break
        if ok:
            keep.append(fname)
    return keep, len(manifest)


def pruned_scan_multi(
    spark: SparkSession, path: str, ranges: dict[str, tuple[Any, Any]]
) -> DataFrame:
    """Conjunctive-range scan over manifest-surviving files with every
    predicate re-applied — identical to the full-scan filter chain."""
    keep, _ = pruned_files_multi(path, ranges)
    df = (
        spark.read.parquet(*[os.path.join(path, f) for f in keep])
        if keep
        else spark.read.parquet(path).where(F.lit(False))
    )
    for col, (lo, hi) in ranges.items():
        df = df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
    return df


def pruned_scan(
    spark: SparkSession, path: str, col: str, lo: Any, hi: Any
) -> DataFrame:
    """Range scan that opens only manifest-surviving files and
    re-applies the predicate — result identical to
    ``read.parquet(path).filter(col BETWEEN lo AND hi)``, I/O
    proportional to the selected range instead of the table."""
    keep, total = pruned_files(path, col, lo, hi)
    if not keep:
        full = spark.read.parquet(path)
        return full.where(F.lit(False))
    df = spark.read.parquet(*[os.path.join(path, f) for f in keep])
    return df.where(F.col(col).between(F.lit(lo), F.lit(hi)))
