"""Bucketed tables: pre-shuffled storage for exchange-free joins/aggs.

The reference re-joins the same keys on every sync cycle — cardex to
item master on item number, dispatches to the ledger on transaction id
(dag_cardex_changes_to_bakery_ops.py, dag_bakery_ops_to_jde.py) — and
pays the full pandas merge each time. On a cluster the equivalent cost
is a shuffle of BOTH join sides on every query. Bucketing moves that
shuffle to WRITE time, once: rows are hash-distributed into a fixed
number of buckets on the join key as they land, so every later join or
aggregation on that key starts from co-located, (optionally) pre-sorted
files and plans with ZERO Exchange nodes — asserted against the
physical plan in tests, not assumed.

At 100 TB this is the difference between "every reconciliation query
reshuffles 100 TB" and "the lake is already partitioned the way the
hot queries need". Pick bucket counts so one bucket of the LARGEST
table fits an executor's shuffle memory (buckets = files per write
task, so also keep write parallelism * buckets sane — see
``write_bucketed``'s repartition note).

Mechanics (Spark-native, no custom reader):

- ``bucketBy`` is only honored by ``saveAsTable`` (a catalog entry
  carries the bucket spec; a bare parquet path has nowhere to put it).
  ``write_bucketed`` registers an EXTERNAL table at an explicit path —
  the catalog holds metadata only, the data stays in the lake.
- Exchange-free plans require BOTH sides bucketed on the join key with
  the same bucket count (or a groupBy whose keys cover the bucket
  spec). A single bucketed side still skips ITS OWN shuffle.
- ``sortBy`` additionally pre-orders within each bucket file, which
  lets sort-merge join skip its per-task sort when bucket files are
  read one-per-task (``spark.sql.sources.bucketing.maxBucketsPerScan``
  governs coalescing; plans fall back to sorting when files merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as an external bucketed table ``name`` at ``path``.

    Each write task writes one file per bucket it sees rows for; the
    ``repartition`` on the bucket columns below collapses that to one
    file per bucket (the same small-files guard as
    parquet_lake.write_dispatch), and is itself the one-time shuffle
    that all later queries skip.
    """
    w = (
        df.repartition(n_buckets, *bucket_by)
        .write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read back through the catalog — a plain ``spark.read.parquet``
    of the path would NOT see the bucket spec and would re-shuffle."""
    return spark.table(name)


def is_exchange_free(df: DataFrame) -> bool:
    """True when ``df``'s executed plan contains no Exchange node —
    the mechanical check that bucketing actually took effect."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
