"""Idempotency ledger — SURVEY.md A12/A13 (dedup / idempotent upsert).

The reference keeps an ``ingredient_submitted_status`` Postgres table
with ``unique_transaction_id UNIQUE`` and writes via
``INSERT ... ON CONFLICT DO UPDATE`` (jde_helper.py:1006-1012,
dag_bakery_system_to_jde.py:383-423). The Spark-native equivalent is
Delta ``MERGE INTO``; this environment has no Delta, so the same
MERGE semantics are implemented over plain parquet behind an atomic
LogStore pointer flip (correct for a single writer, which matches the
reference's one-dispatcher-at-a-time model). For multi-version MERGE
with time travel, history, and optimistic multi-writer detection, see
``sources/versioned.py`` (a transaction-log table in the Delta
design). Swap to Delta in prod:

    DeltaTable.forPath(spark, path).alias("l").merge(
        updates.alias("u"), "l.key = u.key"
    ).whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

Scale: the MERGE join is keyed on the idempotency key (uniform hash);
the updates side is one micro-batch — broadcast against the ledger.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IdempotencyLedger:
    """Parquet-backed keyed upsert ledger with MERGE semantics.

    The rewrite publish is a POINTER FLIP through the LogStore seam
    (``store`` injects an object-store impl; default POSIX under
    ``<path>/_log``): each merge writes the new ledger parquet under a
    fresh unique dir — no rename on the data plane — then atomically
    re-points one record at it, so readers see the old ledger or the
    new one, never a mix (single dispatching writer, matching the
    reference's one-dispatcher-at-a-time model)."""

    def __init__(
        self, path: str, key: str = "unique_transaction_id", store=None
    ):
        from jde_to_datalake_spark.sources.log_store import (
            DataDirPointer,
            PosixLogStore,
        )

        self.path = path
        self.key = key
        self._ptr = DataDirPointer(path, store or PosixLogStore(path))

    def exists(self) -> bool:
        self._ptr.require_migrated("idempotency ledger")
        return self._ptr.current() is not None

    def load(self, spark: SparkSession) -> DataFrame | None:
        self._ptr.require_migrated("idempotency ledger")
        p = self._ptr.current_path()
        if p is None:
            return None
        return spark.read.parquet(p)

    def pending_only(self, spark: SparkSession, batch: DataFrame) -> DataFrame:
        """J6: drop rows already marked done (MUST precede side effects)."""
        ledger = self.load(spark)
        if ledger is None:
            return batch
        done = ledger.filter(F.col("status") == "done").select(self.key)
        return batch.join(done, self.key, "left_anti")

    def merge(self, spark: SparkSession, updates: DataFrame) -> None:
        """MERGE: matched -> take update row; not matched -> insert.

        ``updates`` must contain the key plus the ledger payload
        columns. Last-writer-wins within ``updates`` is resolved by
        keeping one row per key: max by 'updated_at' when present
        (ties and the no-timestamp case fall through to min row hash —
        deterministic under any partitioning, unlike dropDuplicates'
        keep-whichever-arrives-first).
        """
        from pyspark.sql import Window

        order = [F.xxhash64(*updates.columns).asc()]
        if "updated_at" in updates.columns:
            order.insert(0, F.col("updated_at").desc_nulls_last())
        w = Window.partitionBy(self.key).orderBy(*order)
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        current = self.load(spark)
        if current is None:
            merged = updates
        else:
            merged = updates.unionByName(
                current.join(updates.select(self.key), self.key, "left_anti"),
                allowMissingColumns=True,
            )
        self._atomic_write(merged)

    def mark_done(
        self, spark: SparkSession, keys: DataFrame, status_text: str = ""
    ) -> None:
        """A13: grouped status UPDATE (dag_bakery_ops_to_jde.py:289-295)."""
        updates = keys.select(self.key).withColumns(
            {
                "status": F.lit("done"),
                "status_text": F.lit(status_text[:699]),  # F16 cap
            }
        )
        self.merge(spark, updates)

    def clean_stale(self, retention_seconds: float = 3600.0) -> list:
        """Reclaim data-dir orphans of crashed merges (died between
        the parquet write and the pointer flip) older than the
        retention window; the current ledger is never touched."""
        return self._ptr.clean_stale(retention_seconds)

    def _atomic_write(self, df: DataFrame) -> None:
        self._ptr.flip(lambda p: df.write.mode("overwrite").parquet(p))
