"""Hive-partitioned parquet lake source/sink — SURVEY.md S6/S7/S8.

The reference hand-builds S3 keys ``{prefix}/{type}/year=YYYY/month=
MM/day=DD/dispatch_*.parquet`` (s3_helper.py:45) and prunes by
parsing key strings (s3_helper.py:129-140). Spark gets both for free:
``partitionBy("year","month","day")`` writes the same layout, and a
``WHERE`` on the partition columns becomes Catalyst partition pruning
(no listing code, no key parsing — verified in tests via the
PartitionFilters section of the physical plan).

Scale notes: day-grain partitions keep file counts sane at 100 TB
(~36k partitions for a decade); within a partition, file size is
governed by shuffle partitions at write — repartition by the
partition columns before writing to avoid the
every-task-writes-every-partition small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_dispatch(
    df: DataFrame,
    root: str,
    dispatch_type: str,
    date_col: str,
    mode: str = "append",
) -> None:
    """S6: land a dispatch batch under type/year=/month=/day=."""
    out = (
        df.withColumn("dispatch_type", F.lit(dispatch_type))
        .withColumn("year", F.year(date_col))
        .withColumn("month", F.month(date_col))
        .withColumn("day", F.dayofmonth(date_col))
        # co-locate rows of one partition in one task -> one file per
        # partition per write instead of (tasks x partitions) files
        .repartition("year", "month", "day")
    )
    (
        out.write.mode(mode)
        .partitionBy("dispatch_type", "year", "month", "day")
        .parquet(root)
    )


def read_dispatches(
    spark: SparkSession,
    root: str,
    dispatch_type: str | None = None,
    start: tuple[int, int, int] | None = None,
    end: tuple[int, int, int] | None = None,
) -> DataFrame:
    """S8: partition-pruned date-range scan (replaces manual key listing)."""
    df = spark.read.parquet(root)
    if dispatch_type is not None:
        df = df.filter(F.col("dispatch_type") == dispatch_type)
    date_key = (F.col("year") * 10000 + F.col("month") * 100 + F.col("day"))
    if start is not None:
        df = df.filter(date_key >= start[0] * 10000 + start[1] * 100 + start[2])
    if end is not None:
        df = df.filter(date_key <= end[0] * 10000 + end[1] * 100 + end[2])
    return df
