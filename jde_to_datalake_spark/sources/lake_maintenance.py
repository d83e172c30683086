"""Lake maintenance: file stats, small-file compaction, clustered writes.

The reference's lake layer lands one parquet object per dispatch call
(s3_helper.py:45-52 ``dispatch_{timestamp}.parquet``) and never
revisits it — at production rates that is the classic small-file
problem: a year of hourly dispatches is ~9k objects per partition, and
every reader pays per-file open/footer costs. The reference also has
no layout control at all: objects carry whatever row order the API
returned, so min/max footer stats are useless and every query reads
every byte of every partition it touches.

Three maintenance primitives fix this, all metadata-driven and safe to
run while readers are active (writers must pause per partition):

- ``partition_file_stats``  — per-partition file count / bytes via the
  Hadoop FileSystem API (works on HDFS/S3A/local alike; a pure
  metadata listing, no data read — the distributed analogue of the
  reference's key-string walk in s3_helper.py:129-140).
- ``compact_partitions``    — rewrite partitions whose files are too
  small/numerous into ~target-size files, atomic-swap per partition so
  readers never observe a half-written directory.
- ``write_clustered``       — range-partition + sort by clustering
  columns before writing, so each output file owns a disjoint key
  range and parquet footer min/max stats actually prune: a point or
  range predicate on the cluster key skips whole files/row-groups
  (asserted via SQLMetrics in tests, not just claimed).
- ``zorder_value`` / ``write_zordered`` — multi-column variant:
  interleave the bits of per-column quantile-bucket ranks (Morton
  code) so proximity in ANY clustered dimension maps to proximity in
  the sort key; predicates on each dimension alone still skip most
  files. Bucket boundaries come from ``approxQuantile`` (one pass,
  driver gets only the boundary list), never from a global rank —
  a window-based rank would serialize the whole table through one
  partition.

Clustering-key caveat (measured here, Spark 4.1): parquet row-group
stats skipping only engages for predicates the source can convert to
parquet filter predicates — numeric, string, DATE and TIMESTAMP(UTC)
columns qualify; **TIMESTAMP_NTZ does not** (the filter shows up under
``PushedFilters`` but never prunes a row group — scan_rows stays at
table size). Cluster on a DATE / numeric derivative of an NTZ column,
not the NTZ column itself; tests assert both sides of this.

Scale notes: compaction is per-partition-parallel and reads only the
partitions it rewrites; at 100 TB you run it on the partitions the
stats report flags (cheap listing first, expensive rewrite only where
justified). The atomic swap is rename-based — on object stores
without atomic rename, point the tmp dir at the final location's
versioned sibling and flip a manifest instead (same interface as
plans/ledger.py's Delta-ready MERGE).
"""

from __future__ import annotations

import math
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


# ---------------------------------------------------------------- listing


@dataclass
class PartitionStats:
    partition: str  # relative dir, e.g. "year=2024/month=1/day=3"
    n_files: int
    total_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def partition_file_stats(spark: SparkSession, root: str) -> list[PartitionStats]:
    """Per-leaf-directory file stats under a (possibly hive-
    partitioned) ``root``. Pure namenode/object-listing work."""
    fs, hroot = _fs_and_path(spark, root)
    root_str = fs.makeQualified(hroot).toString().rstrip("/")
    out: dict[str, PartitionStats] = {}
    it = fs.listFiles(hroot, True)  # recursive, returns LocatedFileStatus
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        name = p.rsplit("/", 1)[1]
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, hidden/tmp files
        rel_dir = p[len(root_str):].lstrip("/").rsplit("/", 1)[0] if "/" in p[len(root_str):].lstrip("/") else ""
        s = out.get(rel_dir)
        if s is None:
            out[rel_dir] = PartitionStats(rel_dir, 1, st.getLen())
        else:
            s.n_files += 1
            s.total_bytes += st.getLen()
    return sorted(out.values(), key=lambda s: s.partition)


# ------------------------------------------------------------- compaction


def compaction_candidates(
    stats: list[PartitionStats],
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> list[PartitionStats]:
    """Partitions worth rewriting: more than ``min_files`` files AND
    average file size under half the target (rewriting one 60 MB file
    into one 60 MB file is churn, not maintenance)."""
    return [
        s
        for s in stats
        if s.n_files >= min_files and s.avg_bytes < target_bytes / 2
    ]


def compact_partitions(
    spark: SparkSession,
    root: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
    sort_within_by: list[str] | None = None,
) -> list[dict]:
    """Rewrite small-file partitions into ceil(total/target) files.

    Each flagged leaf directory is read in isolation (no full-table
    scan), coalesced to the target file count, optionally re-sorted
    (keeps clustering through compaction), written to a sibling tmp
    dir and atomically renamed over the original. Returns a report of
    what was rewritten. Partition VALUES survive because the directory
    path (with its ``k=v`` segments) is preserved verbatim — the data
    files themselves never contained the partition columns.
    """
    fs, hroot = _fs_and_path(spark, root)
    root_str = fs.makeQualified(hroot).toString().rstrip("/")
    report = []
    for s in compaction_candidates(
        partition_file_stats(spark, root), target_bytes, min_files
    ):
        leaf = f"{root_str}/{s.partition}" if s.partition else root_str
        n_out = max(1, math.ceil(s.total_bytes / target_bytes))
        df = spark.read.parquet(leaf)
        if sort_within_by:
            df = df.repartitionByRange(n_out, *sort_within_by).sortWithinPartitions(
                *sort_within_by
            )
        else:
            df = df.coalesce(n_out)
        jvm = spark._jvm
        tmp = f"{leaf}__compact_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{leaf}__old_{uuid.uuid4().hex}"
        fs.rename(jvm.org.apache.hadoop.fs.Path(leaf), jvm.org.apache.hadoop.fs.Path(old))
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jvm.org.apache.hadoop.fs.Path(leaf))
        fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
        # spark may have written a _SUCCESS marker inside the leaf; harmless
        report.append(
            {
                "partition": s.partition,
                "files_before": s.n_files,
                "files_after": n_out,
                "bytes": s.total_bytes,
            }
        )
    return report


# -------------------------------------------------------- clustered write


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` files, each owning a disjoint range
    of ``cluster_by`` — range partition (sampled boundaries, no global
    sort-merge) then sort within each file so parquet page/row-group
    min-max stats are tight. Point/range predicates on the cluster key
    then skip files wholesale at scan time."""
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


# ---------------------------------------------------------------- z-order


def zorder_value(
    df: DataFrame, columns: list[str], bits_per_col: int = 8
) -> tuple[DataFrame, Column]:
    """(df', zcol): Morton-interleaved quantile-bucket ranks.

    Each column is bucketed into ``2**bits_per_col`` approx-equi-depth
    buckets (boundaries via one ``approxQuantile`` pass — only the
    boundary array reaches the driver), then the bucket indices' bits
    are interleaved column-round-robin into one BIGINT. Sorting by
    that value gives the multi-dimensional locality Z-ordering is for.
    Supports numeric/date/timestamp columns (anything castable to
    double for quantiles).
    """
    n_buckets = 1 << bits_per_col
    work = df
    idx_cols = []
    for c in columns:
        dcol = f"__zd_{c}"
        work = work.withColumn(dcol, F.col(c).cast("double"))
        # equi-depth boundaries; relativeError trades one-pass cost for
        # bucket skew, not correctness (skewed buckets only weaken
        # skipping, never results)
        qs = work.approxQuantile(
            dcol, [i / n_buckets for i in range(1, n_buckets)], 0.001
        )
        # drop NaN boundaries and collapse duplicates (skewed or
        # constant columns repeat boundaries; an all-null column
        # yields none) — fewer distinct boundaries only weakens this
        # column's pruning power, never correctness. NULL values take
        # the otherwise-branch everywhere -> bucket 0 (cluster low).
        edges: list = []
        for b in qs:
            if b == b and (not edges or b > edges[-1]):
                edges.append(b)
        idx = F.lit(0)
        for b in edges:  # bucket index = #boundaries below the value
            idx = idx + F.when(F.col(dcol) > F.lit(b), 1).otherwise(0)
        work = work.withColumn(f"__zi_{c}", idx.cast("long")).drop(dcol)
        idx_cols.append(f"__zi_{c}")

    z = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for ci, c in enumerate(idx_cols):
            out_pos = bit * len(idx_cols) + ci
            z = z + F.shiftleft(
                F.shiftright(F.col(c), bit).bitwiseAND(F.lit(1)), out_pos
            )
    return work, z


def write_zordered(
    df: DataFrame,
    path: str,
    columns: list[str],
    n_files: int,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> None:
    """Cluster by the Morton value of ``columns`` and write — the
    multi-dimension counterpart of ``write_clustered``. The helper
    columns never reach the files."""
    work, z = zorder_value(df, columns, bits_per_col)
    work = work.withColumn("__z", z)
    (
        work.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zi_{c}" for c in columns])
        .write.mode(mode)
        .parquet(path)
    )
