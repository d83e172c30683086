"""Change-feed STREAMING: ``versioned_stream(change_feed=True)``
(Delta's readChangeFeed as a stream) and continuous incremental-view
maintenance from it (``plans.incremental_view.maintain_view_stream``).

The contract under test: every commit — append, DV delete, merge
rewrite, restore — surfaces as row-level insert/delete events stamped
with ``_commit_version``, such that a sign-fold of the whole feed
equals the table's final snapshot exactly; and a count/sum view folded
from the feed equals the from-scratch recompute at every drain point,
exactly once, across checkpoint resumes and mixed batch/stream
maintenance.
"""

import collections

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.plans.incremental_view import (
    IncrementalAggregateView,
    maintain_view_stream,
)
from jde_to_datalake_spark.sources.versioned import VersionedTable
from jde_to_datalake_spark.sources.versioned_stream import (
    _cdf_partitions,
    versioned_stream,
)


def _rows(spark, t, tmp_path, name, **options):
    """Drain the change feed into a list of Rows (availableNow)."""
    sink: list = []
    q = (
        versioned_stream(spark, t, change_feed=True, **options)
        .writeStream.foreachBatch(
            lambda df, bid: sink.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sink


def _staged_table(spark, tmp_path):
    """v0 append, v1 DV delete, v2 merge rewrite, v3 restore(v1)."""
    t = VersionedTable(str(tmp_path / "base"))
    t.commit(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(20)],
            "id bigint, g int, x double",
        )
    )
    t.delete_where(spark, F.col("id") < 5)
    t.merge(
        spark,
        spark.createDataFrame(
            [(7, 1, 700.0), (99, 0, 99.0)], "id bigint, g int, x double"
        ),
        key="id",
    )
    t.restore(1)
    return t


def test_cdf_fold_equals_snapshot_across_all_commit_kinds(spark, tmp_path):
    t = _staged_table(spark, tmp_path)
    rows = _rows(spark, t, tmp_path, "fold")

    # per-commit shape: the merge (v2) rewrites one file -> paired
    # deletes+inserts; the restore (v3) rolls it back symmetrically
    per = collections.Counter(
        (r["_commit_version"], r["_change_type"]) for r in rows
    )
    assert per[(0, "insert")] == 20
    assert per[(1, "delete")] == 5
    assert per[(2, "insert")] == per[(2, "delete")] + 1  # net +1 row (id 99)
    assert per[(3, "delete")] == per[(2, "insert")]  # restore removes them
    assert per[(3, "insert")] == per[(2, "delete")]  # and revives the old

    net: collections.Counter = collections.Counter()
    for r in rows:
        net[(r["id"], r["g"], r["x"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert all(v in (0, 1) for v in net.values())  # never dup/negative
    folded = sorted(k for k, v in net.items() if v == 1)
    actual = sorted(
        (r["id"], r["g"], r["x"]) for r in t.read(spark).collect()
    )
    assert folded == actual


def test_cdf_resume_emits_only_new_commits(spark, tmp_path):
    t = _staged_table(spark, tmp_path)
    first = _rows(spark, t, tmp_path, "resume")
    assert {r["_commit_version"] for r in first} == {0, 1, 2, 3}
    t.delete_where(spark, F.col("id") % 4 == 1)
    again = _rows(spark, t, tmp_path, "resume")  # same checkpoint
    assert {r["_commit_version"] for r in again} == {4}
    assert {r["_change_type"] for r in again} == {"delete"}


def test_view_maintained_from_stream_equals_recompute(spark, tmp_path):
    t = _staged_table(spark, tmp_path)
    view = IncrementalAggregateView(
        VersionedTable(str(tmp_path / "view")),
        t,
        ["g"],
        {"n": ("count", "*"), "sx": ("sum", "x")},
    )

    def recompute():
        return sorted(
            (r["g"], r["n"], r["sx"])
            for r in t.read(spark)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
            .collect()
        )

    def current():
        return sorted(
            (r["g"], r["n"], r["sx"])
            for r in view.current(spark).collect()
        )

    q = maintain_view_stream(spark, view, str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert current() == recompute()  # first drain IS the initial build
    assert view.covered_version() == t.latest_version()

    # churn, then resume the SAME checkpoint: O(changes) maintenance
    t.delete_where(spark, F.col("id") % 4 == 1)
    t.merge(
        spark,
        spark.createDataFrame([(200, 2, 2.5)], "id bigint, g int, x double"),
        key="id",
    )
    q = maintain_view_stream(spark, view, str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert current() == recompute()
    assert view.covered_version() == t.latest_version()


def test_mixed_refresh_and_stream_never_double_applies(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "base"))
    t.commit(
        spark.createDataFrame(
            [(i, i % 2, i * 10) for i in range(12)],
            "id bigint, g int, x bigint",
        )
    )
    view = IncrementalAggregateView(
        VersionedTable(str(tmp_path / "view")),
        t,
        ["g"],
        {"n": ("count", "*"), "sx": ("sum", "x")},
    )
    view.refresh(spark)  # batch-built first

    def both():
        got = sorted(
            (r["g"], r["n"], r["sx"])
            for r in view.current(spark).collect()
        )
        exp = sorted(
            (r["g"], r["n"], r["sx"])
            for r in t.read(spark)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
            .collect()
        )
        return got, exp

    # stream takes over on a fresh checkpoint: starts at the covered
    # version, re-reads nothing
    t.delete_where(spark, F.col("id") < 3)
    q = maintain_view_stream(spark, view, str(tmp_path / "ck"))
    q.awaitTermination(120)
    got, exp = both()
    assert got == exp

    # a batch refresh lands BETWEEN stream drains; the stream's next
    # batch must filter the span the refresh already covered
    t.merge(
        spark,
        spark.createDataFrame([(3, 1, 999)], "id bigint, g int, x bigint"),
        key="id",
    )
    view.refresh(spark)
    t.delete_where(spark, F.col("id") == 4)
    q = maintain_view_stream(spark, view, str(tmp_path / "ck"))
    q.awaitTermination(120)
    got, exp = both()
    assert got == exp
    assert view.covered_version() == t.latest_version()
    # and a final refresh() is a no-op
    assert view.refresh(spark)["mode"] == "noop"


def test_cdf_schema_evolution_absent_columns_read_null(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "base"))
    t.commit(spark.createDataFrame([(1,)], "id bigint"))
    t.commit(
        spark.createDataFrame([(2, "new")], "id bigint, tag string"),
        mode="append",
    )
    rows = _rows(
        spark, t, tmp_path, "evolve", schema="id bigint, tag string"
    )
    got = {r["id"]: (r["tag"], r["_change_type"]) for r in rows}
    assert got == {1: (None, "insert"), 2: ("new", "insert")}


def test_multi_txn_pairs_stamp_atomically(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1,)], "id bigint"),
        txn=[("app-a", 7), ("app-b", 3)],
    )
    assert t.last_txn_version("app-a") == 7
    assert t.last_txn_version("app-b") == 3
    # single-pair form still works, and versions only ratchet up
    t.commit(
        spark.createDataFrame([(2,)], "id bigint"),
        mode="append",
        txn=("app-a", 5),
    )
    assert t.last_txn_version("app-a") == 7


def test_cdf_vacuumed_offset_fails_with_guidance(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    for lo in (0, 5, 10, 15):
        t.commit(
            spark.range(lo, lo + 5).selectExpr("id AS k"), mode="append"
        )
    t.vacuum(keep_last=1)
    with pytest.raises(RuntimeError, match="vacuumed away"):
        _cdf_partitions(t, 0, t.latest_version())


def test_cross_handle_vacuum_cache_semantics(spark, tmp_path):
    """A handle's manifest cache legally OUTLIVES a vacuum run through
    another handle (separate-process model: caches are per-handle, the
    log is shared). Pin the contract surfaced by the racing-vacuum
    op-sequence property (round 10): the stale handle still reads the
    LATEST version correctly, `versions()` is authoritative (reads the
    log, not the cache), and the CDF stream — which plans from the log
    — fails with the vacuum guidance rather than silently part-folding."""
    a = VersionedTable(str(tmp_path / "t"))
    a.commit(spark.createDataFrame([(1, "x")], ["k", "v"]), mode="append")
    a.commit(spark.createDataFrame([(2, "y")], ["k", "v"]), mode="append")
    b = VersionedTable(a.root)
    b.vacuum(keep_last=1)  # trims version 0 through the OTHER handle
    assert a.versions() == [1]  # log-read: authoritative on handle a
    assert {r["k"] for r in a.read(spark).collect()} == {1, 2}
    with pytest.raises(RuntimeError, match="vacuumed away"):
        _cdf_partitions(a, -1, a.latest_version())


def test_cdf_survives_fully_tombstoned_file(spark, tmp_path):
    """A file whose EVERY row is tombstoned (delete-all) and then
    departs in an overwrite emits an empty take, not
    ArrowNotImplementedError: a plain empty Python list infers a
    NULL-typed Arrow index array and Table.take has no (T, null)
    kernel (found by the partitioned op-sequence property, round 9).
    The fold across append -> delete-all -> overwrite must equal the
    final snapshot."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(0, "s1")], ["k", "v"]), mode="append"
    )
    t.delete_where(spark, F.col("k") == 0)
    t.commit(
        spark.createDataFrame([(0, "s3")], ["k", "v"]), mode="overwrite"
    )
    got = _rows(spark, t, tmp_path, "full_tomb")
    net = collections.Counter()
    for r in got:
        net[(r["k"], r["v"])] += (
            1 if r["_change_type"] == "insert" else -1
        )
    assert {kv for kv, c in net.items() if c == 1} == {(0, "s3")}
    assert all(c in (0, 1) for c in net.values())
