"""CDF-maintained materialized aggregate over a ``VersionedTable``.

The reference recomputes every summary frame from scratch on each
request/sync (the pivot report re-groups the full joined frame at
backend/main.py:385; the comparison endpoints re-pull and re-aggregate
live data per call). At 100 TB the recompute IS the cost — this module
maintains the aggregate **incrementally from the change feed**
(``VersionedTable.read_changes``): each refresh reads only the rows
that changed between the covered base snapshot and the latest one,
folds them into per-group deltas, and MERGEs the touched groups into
the materialized view. Cost per refresh is O(changed data) + O(view),
never O(base table).

Delta-maintainable aggregates only: ``count`` and ``sum`` (and the
ratios derivable from them — ``avg = sum/count``); these are the
self-inverse aggregates where a delete is the exact inverse of an
insert. ``min``/``max`` are NOT maintainable under deletes without
per-group recompute and are intentionally unsupported. Floating-point
sums drift from a from-scratch recompute by normal fp reassociation;
use integer or decimal measure columns when bit-exact parity with a
recompute matters (the tests do).

Crash safety / idempotency: the view table stores the covered base
version as an idempotent-writer txn (Delta's txnAppId/txnVersion,
``app_id = "cdf-view:<base root>"``), stamped ATOMICALLY with the same
manifest publish that applies the delta — a crash between "apply" and
"record" is impossible, and a redelivered refresh sees
``last_txn_version >= base version`` and does nothing. Applying a
delta is not idempotent by itself (it would double-count), which is
exactly why the stamp must ride the merge commit and not a sidecar.

Internal state schema (per group): the null-safe group key string
``__view_key`` (the MERGE key), the group columns, ``__n`` (count(*)),
and per measure ``__sum_<m>`` / ``__nn_<m>`` (SQL sum over non-nulls,
count of non-nulls). A group whose ``__n`` reaches 0 is semantically
absent; it stays as a tombstone row that ``current()`` filters and
``prune_empty()`` physically deletes (deletion vector, O(matching)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable

_SEP = "\x1f"


def _null_safe_key(cols: list[str]):
    """One string per group that distinguishes NULL from every value
    and from the empty string (presence byte + separator — the same
    encoding discipline as operators/bloom.py keys)."""
    parts = [
        F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
            F.concat(F.lit("\x01"), F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


class IncrementalAggregateView:
    """A materialized ``GROUP BY`` maintained from a base table's
    change feed.

    ``measures`` maps output name -> ("sum"|"count", column); a
    ``("count", "*")`` measure is the plain row count. ``refresh()``
    performs the initial full build on first call and CDF-delta
    maintenance afterwards; ``current()`` is the queryable result.
    """

    def __init__(
        self,
        view: VersionedTable,
        base: VersionedTable,
        group_by: list[str],
        measures: "dict[str, tuple[str, str]]",
    ):
        if not group_by:
            raise ValueError("group_by must name at least one column")
        for name, (agg, col) in measures.items():
            if agg not in ("sum", "count"):
                raise ValueError(
                    f"measure {name!r}: only count/sum are "
                    f"delta-maintainable (got {agg!r}); min/max need "
                    "per-group recompute under deletes"
                )
            if agg == "sum" and col == "*":
                raise ValueError(f"measure {name!r}: sum needs a column")
        self.view = view
        self.base = base
        self.group_by = list(group_by)
        self.measures = dict(measures)
        self.app_id = f"cdf-view:{os.path.abspath(base.root)}"

    # -- internal aggregate expressions ---------------------------------
    def _sum_cols(self) -> list[str]:
        return sorted(
            {c for (a, c) in self.measures.values() if a == "sum"}
        )

    def _nn_cols(self) -> list[str]:
        return sorted(
            {
                c
                for (a, c) in self.measures.values()
                if c != "*"
            }
        )

    def _full_aggs(self):
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in self._sum_cols():
            aggs.append(F.sum(F.col(c)).alias(f"__sum_{c}"))
        for c in self._nn_cols():
            aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        return aggs

    def _delta_aggs(self, sign):
        aggs = [F.sum(sign).alias("__n")]
        for c in self._sum_cols():
            aggs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign * F.col(c))
                ).alias(f"__sum_{c}")
            )
        for c in self._nn_cols():
            aggs.append(
                F.sum(
                    F.when(F.col(c).isNotNull(), sign)
                ).alias(f"__nn_{c}")
            )
        return aggs

    def _state_cols(self) -> list[str]:
        return (
            ["__n"]
            + [f"__sum_{c}" for c in self._sum_cols()]
            + [f"__nn_{c}" for c in self._nn_cols()]
        )

    # -- refresh ---------------------------------------------------------
    def covered_version(self) -> int | None:
        """The base snapshot the view currently reflects (None before
        the first refresh)."""
        return self.view.last_txn_version(self.app_id)

    def refresh(self, spark: SparkSession) -> dict:
        """Advance the view to the base's latest version. Returns
        ``{"mode": "noop"|"full"|"delta", "base_version": int}``."""
        latest = self.base.latest_version()
        if latest is None:
            return {"mode": "noop", "base_version": None}
        covered = self.covered_version()
        if covered is not None and covered >= latest:
            return {"mode": "noop", "base_version": covered}
        if covered is None:
            state = (
                self.base.read(spark, latest)
                .groupBy(*self.group_by)
                .agg(*self._full_aggs())
                .withColumn("__view_key", _null_safe_key(self.group_by))
            )
            self.view.commit(
                state, mode="overwrite", txn=(self.app_id, latest)
            )
            return {"mode": "full", "base_version": latest}

        # rows rewritten byte-identical between the snapshots surface
        # as delete+insert pairs and cancel exactly in count/sum deltas
        changes = self.base.read_changes(spark, covered, latest)
        self.apply_changes(spark, changes, txn=(self.app_id, latest))
        return {"mode": "delta", "base_version": latest}

    def _fold_delta(self, changes: DataFrame) -> DataFrame:
        """Sign-fold a change-feed slice (``_change_type`` in
        insert/delete) to per-group state deltas, dropping all-zero
        groups (compaction/merge carry churn arrives as byte-identical
        delete+insert pairs that cancel exactly — filtering them keeps
        the MERGE below touching only genuinely changed groups'
        files)."""
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            changes.groupBy(*self.group_by)
            .agg(*self._delta_aggs(sign))
            .withColumn("__view_key", _null_safe_key(self.group_by))
        )
        nonzero = F.lit(False)
        for c in self._state_cols():
            nonzero = nonzero | (F.coalesce(F.col(c), F.lit(0)) != 0)
        return delta.filter(nonzero)

    def _restore_null_sums(self, rows: DataFrame) -> DataFrame:
        """SQL convention: a group with zero non-null values has a
        NULL sum, not the 0 the delta coalesce produces."""
        for c in self._sum_cols():
            rows = rows.withColumn(
                f"__sum_{c}",
                F.when(F.col(f"__nn_{c}") > 0, F.col(f"__sum_{c}")),
            )
        return rows

    def apply_changes(self, spark: SparkSession, changes: DataFrame, txn) -> str:
        """Fold one change-feed slice into the view state under ``txn``
        (a pair or a LIST of pairs — the streaming writer stamps its
        batch lineage and the covered base version atomically).
        ``refresh()`` routes its batch pull here; a change-feed STREAM
        (``maintain_view_stream``) routes its micro-batches here. The
        slice must be exactly the base's changes in some version span
        (start, end], each applied at most once — the txn stamps are
        what enforce the at-most-once across redeliveries.

        Returns ``"init" | "merged" | "empty-carry" | "noop-empty"``.
        """
        delta = self._fold_delta(changes)
        if self.view.latest_version() is None:
            if delta.isEmpty():
                # nothing to record and nowhere to stamp; replaying an
                # empty slice is free and equally empty
                return "noop-empty"
            # first slice against an empty base: the delta IS the state
            state = self._restore_null_sums(delta).select(
                *self.group_by, *self._state_cols(), "__view_key"
            )
            self.view.commit(state, mode="overwrite", txn=txn)
            return "init"
        if delta.isEmpty():
            # nothing net-changed: advance the covered stamp with an
            # empty-carry publish so the next refresh diffs from here
            self.view.publish(
                [],
                mode="overwrite",
                expected_base=self.view.latest_version(),
                carry=self.view._manifest(self.view.latest_version())["files"],
                txn=txn,
            )
            return "empty-carry"

        # old values for exactly the touched groups; the view relation
        # is aggregate-sized (orders below the base), and MERGE below
        # rewrites only the files whose key range is hit
        old = self.view.read(spark).select(
            "__view_key", *[F.col(c).alias(f"__old_{c}") for c in self._state_cols()]
        )
        merged = delta.join(old, "__view_key", "left")
        combined_cols = {}
        for c in self._state_cols():
            combined_cols[c] = F.coalesce(
                F.col(f"__old_{c}"), F.lit(0)
            ) + F.coalesce(F.col(c), F.lit(0))
        new_rows = merged.withColumns(
            {f"__new_{c}": e for c, e in combined_cols.items()}
        ).select(
            "__view_key",
            *self.group_by,
            *[F.col(f"__new_{c}").alias(c) for c in self._state_cols()],
        )
        new_rows = self._restore_null_sums(new_rows)
        self.view.merge(spark, new_rows, key="__view_key", txn=txn)
        return "merged"

    # -- queries ----------------------------------------------------------
    def current(self, spark: SparkSession) -> DataFrame:
        """The maintained aggregate, shaped like the from-scratch
        ``base.groupBy(group_by).agg(measures)`` result."""
        df = self.view.read(spark).filter(F.col("__n") > 0)
        out = [F.col(c) for c in self.group_by]
        for name, (agg, col) in self.measures.items():
            if agg == "count" and col == "*":
                out.append(F.col("__n").alias(name))
            elif agg == "count":
                out.append(F.col(f"__nn_{col}").alias(name))
            else:
                out.append(F.col(f"__sum_{col}").alias(name))
        return df.select(*out)

    def prune_empty(self, spark: SparkSession) -> int:
        """Physically drop count-0 tombstone groups (deletion vector,
        O(matching rows)); a later compact() materializes the removal.
        Safe at any time: ``current()`` never shows them anyway."""
        return self.view.delete_where(spark, F.col("__n") == 0)


def view_maintenance_writer(view: IncrementalAggregateView, app_id: str):
    """``foreachBatch`` function folding change-feed micro-batches
    (``versioned_stream(..., change_feed=True)`` rows, carrying
    ``_change_type``/``_commit_version``) into the view — the
    continuous form of ``refresh()``.

    Exactly-once twice over: (1) rows at or below the view's covered
    base version are filtered out, so a batch pull (``refresh``) and
    the stream can be mixed freely — whichever applied a span first
    wins, the other sees it already covered; (2) the applying commit
    atomically stamps BOTH the stream-batch lineage ``(app_id,
    batch_id)`` and the covered-version lineage ``(view.app_id,
    max _commit_version)`` — one manifest publish, no window where one
    ledger has advanced and the other hasn't.

    ``app_id`` must be bound to the checkpoint LINEAGE
    (:func:`~jde_to_datalake_spark.streaming.ingest.checkpoint_app_id`).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        recorded = view.view.last_txn_version(app_id)
        if recorded is not None and recorded >= int(batch_id):
            return  # re-delivered batch: the view commit already landed
        covered = view.covered_version()
        if covered is not None:
            batch_df = batch_df.filter(
                F.col("_commit_version") > F.lit(covered)
            )
        batch_df = batch_df.persist()
        try:
            mx = batch_df.agg(F.max("_commit_version")).collect()[0][0]
            txns = [(app_id, int(batch_id))]
            if mx is not None:
                txns.append((view.app_id, int(mx)))
            view.apply_changes(
                batch_df.sparkSession,
                batch_df.drop("_commit_version"),
                txn=txns,
            )
        finally:
            batch_df.unpersist()

    return write


def maintain_view_stream(
    spark: SparkSession,
    view: IncrementalAggregateView,
    checkpoint_dir: str,
    schema=None,
):
    """Maintain the view CONTINUOUSLY from the base table's change-feed
    stream (availableNow: drain every un-checkpointed commit, then
    stop — a scheduler re-invokes on its cadence and resumes from the
    checkpoint). The lake-native replacement for re-running the
    aggregate: per cycle the cost is O(changed rows) + the touched
    groups' MERGE, never O(base table).

    A fresh checkpoint starts at the view's covered version when the
    view was already built by ``refresh()`` (nothing is re-read), else
    from the table's beginning (the first micro-batch IS the initial
    build). Returns the StreamingQuery."""
    from jde_to_datalake_spark.sources.versioned_stream import (
        versioned_stream,
    )
    from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id

    options = {}
    covered = view.covered_version()
    if covered is not None:
        options["starting_version"] = str(int(covered))
    stream = versioned_stream(
        spark, view.base, schema=schema, change_feed=True, **options
    )
    return (
        stream.writeStream.foreachBatch(
            view_maintenance_writer(view, checkpoint_app_id(checkpoint_dir))
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
