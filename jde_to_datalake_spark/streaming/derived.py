"""Continuous table-to-table derivation — the medallion bronze→silver
hop, exactly-once.

The reference derives downstream datasets by re-running full DAG
cycles over a polled lookback window (dag_bakery_system_to_jde.py:
38-59 — every cycle re-reads data it already transformed). With the
versioned lake both halves improve:

- the SOURCE side streams a table's appended rows through
  :mod:`sources.versioned_stream` (offsets = table versions, one task
  per new file — nothing already processed is ever re-read);
- the SINK side writes each micro-batch into a target
  :class:`~jde_to_datalake_spark.sources.versioned.VersionedTable`
  stamped with Delta's txnAppId/txnVersion idempotence action, so a
  re-delivered batch (crash between sink commit and checkpoint
  advance) commits nothing twice.

Together that is the lake-native replacement for the reference's
"poll, re-filter, re-push" cadence: per cycle the work is
O(new data), end-to-end exactly-once, resumable from the checkpoint.

Scope: ``transform`` must be a ROW-LEVEL derivation (filter /
project / enrich / flatten) — it is applied per micro-batch, so a
global aggregate inside it would aggregate each batch independently.
Continuous AGGREGATE maintenance is the job of
:class:`~jde_to_datalake_spark.plans.incremental_view.
IncrementalAggregateView` (change-feed deltas), not this hop.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from jde_to_datalake_spark.sources.versioned import VersionedTable
from jde_to_datalake_spark.sources.versioned_stream import versioned_stream
from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id


def derive_batch_writer(
    target: VersionedTable,
    transform: Callable[[DataFrame], DataFrame],
    app_id: str,
    key: Optional[str] = None,
):
    """``foreachBatch`` function applying ``transform`` to each
    micro-batch and committing the result into ``target``.

    Without ``key`` the sink is a txn-stamped APPEND: the batch is
    skipped outright when ``target.last_txn_version(app_id)`` already
    covers it (the crash window between sink commit and checkpoint
    advance), so each source row lands in the target exactly once at
    O(batch) write cost. With ``key`` the sink is the stats-pruned
    partial-rewrite MERGE on that key — re-deliveries and re-emitted
    rewritten files (``ignore_changes`` sources) collapse by key, at
    the cost of rewriting the touched files. Append for append-only
    pipelines, merge when the source can rewrite.

    ``app_id`` must be bound to the checkpoint LINEAGE (use
    :func:`~jde_to_datalake_spark.streaming.ingest.checkpoint_app_id`)
    — batch_id restarts at 0 on a fresh checkpoint, and a reused
    app_id would wrongly skip the new run's early batches.

    Within-batch key collisions (one drained batch spanning several
    source versions that each touched the key, or an
    ``ignore_changes`` source re-emitting a rewritten file alongside
    a fresh append) are RESOLVED HERE before the merge —
    ``VersionedTable.merge`` rejects duplicate source keys, and
    without this dedup such a batch would fail deterministically on
    every re-delivery (a wedged stream). Resolution order: highest
    ``_commit_version`` when the batch carries it (a change-feed
    source — version order is the correct last-write-wins), else
    newest ``updated_at`` when the transform provides one, else a
    deterministic row-hash tie-break (stable across re-deliveries
    and partitionings). Plain-append sources whose same-key rows
    differ and carry neither column get the hash tie-break —
    deterministic but not version-ordered; stream the change feed
    when version-ordered resolution matters.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        recorded = target.last_txn_version(app_id)
        if recorded is not None and recorded >= int(batch_id):
            return  # re-delivered batch: sink commit already landed
        out = transform(batch_df).persist()
        try:
            if key is not None:
                from pyspark.sql import Window
                from pyspark.sql import functions as F

                from jde_to_datalake_spark.functions.scalars import (
                    stable_row_hash,
                )

                # stable_row_hash folds map-typed columns through
                # to_json — a transform emitting a map payload (the
                # reference's own `additions` shape, SURVEY §1.2)
                # would otherwise fail the whole sink at plan time
                # (Spark refuses xxhash64 on maps) even with no
                # duplicate keys in the batch
                order = [stable_row_hash(out).asc()]
                if "updated_at" in out.columns:
                    order.insert(0, F.col("updated_at").desc_nulls_last())
                if "_commit_version" in out.columns:
                    order.insert(0, F.col("_commit_version").desc_nulls_last())
                w = Window.partitionBy(key).orderBy(*order)
                # NULL-key rows are pure inserts under merge semantics
                # (they match nothing and its duplicate guard exempts
                # them) — they must not be collapsed into one row here
                deduped = (
                    out.filter(F.col(key).isNotNull())
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                    .unionByName(out.filter(F.col(key).isNull()))
                )
                target.merge(
                    batch_df.sparkSession, deduped, key,
                    txn=(app_id, int(batch_id)),
                )
            elif out.limit(1).count() > 0:
                target.commit(
                    out, mode="append", txn=(app_id, int(batch_id))
                )
            # an all-filtered batch commits nothing: re-running it is
            # free and equally empty, so the unadvanced stamp is safe
        finally:
            out.unpersist()

    return write


def derive_table(
    spark: SparkSession,
    source: VersionedTable,
    target: VersionedTable,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    schema=None,
    key: Optional[str] = None,
    ignore_changes: bool = False,
    starting_version: Optional[int] = None,
    max_files_per_run: Optional[int] = None,
):
    """Start (availableNow) the continuous derivation
    ``source → transform → target``.

    Drains every source version not yet checkpointed, then stops —
    the reference DAGs' poll cadence without the re-reads; a
    long-lived service re-invokes on its schedule and resumes from
    the checkpoint. Returns the StreamingQuery.

    ``schema`` pins the source projection across restarts (DDL string
    or StructType; sniffed from the current table footer otherwise).
    ``ignore_changes`` opts into streaming a source that compacts or
    merges (rewritten files re-emitted whole) and therefore REQUIRES
    ``key`` — an append sink would duplicate the re-emitted rows,
    which is exactly the corruption the merge sink absorbs.

    ``max_files_per_run`` bounds a cold-start backfill over a long
    source history: instead of one availableNow run whose first batch
    spans every file (the Python source API has no ReadLimit hook),
    the catch-up loops availableNow runs each clamped to at most this
    many new files (``sources.versioned_stream.catch_up_chunked``).
    Runs are awaited internally; returns the number of runs instead
    of a query. The sink's txn stamps keep exactly-once across any
    run partitioning.
    """
    if ignore_changes and key is None:
        raise ValueError(
            "ignore_changes re-emits rewritten files whole; an append "
            "sink would duplicate their rows. Pass key=... so the "
            "merge sink collapses re-emissions, or stream an "
            "append-only source."
        )

    def _start(extra: Optional[dict] = None):
        options: dict = {
            "ignore_changes": str(bool(ignore_changes)).lower()
        }
        if starting_version is not None:
            options["starting_version"] = str(int(starting_version))
        if extra:
            options.update(extra)
        stream = versioned_stream(spark, source, schema=schema, **options)
        return (
            stream.writeStream.foreachBatch(
                derive_batch_writer(
                    target, transform,
                    app_id=checkpoint_app_id(checkpoint_dir),
                    key=key,
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    if max_files_per_run is None:
        return _start()
    from jde_to_datalake_spark.sources.versioned_stream import (
        catch_up_chunked,
        checkpoint_covered_version,
    )

    def _cursor():
        c = checkpoint_covered_version(checkpoint_dir)
        if c is not None:
            return c
        return starting_version

    return catch_up_chunked(
        source,
        lambda end: _start({"ending_version": str(int(end))}),
        _cursor,
        max_files_per_run,
        change_feed=False,
    )
