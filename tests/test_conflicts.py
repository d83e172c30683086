"""Logical conflict detection between concurrent writers (Delta's
ConflictChecker re-expressed over the O(changed) commit-delta log).

The table-level compare-and-swap arbitrates every race; these tests
pin the RECONCILIATION layer on top: a commit whose logical intent
provably commutes with the intervening commits re-bases and re-links
with no caller re-execution, while overlapping intents still raise
``ConcurrentCommitError`` (and the opt-in ``retries=N`` re-runs).

Reference anchor: the 5-/10-/30-minute DAGs all write concurrently to
one staging store (dag_bakery_system_to_jde.py:449,
dag_bakery_ops_to_jde.py:351) — multi-writer ingest is the reference's
own posture, so disjoint writers must not serialize each other.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.log_store import (
    InMemoryLogStore,
    LostAckStore,
    PosixLogStore,
)
from jde_to_datalake_spark.sources.versioned import (
    ConcurrentCommitError,
    VersionedTable,
)


@pytest.fixture(params=["posix", "memory", "lost-ack", "s3"])
def make_table(request, tmp_path):
    """Factory building writers on a shared root, parametrized over
    the LogStore: the SAME conflict matrix runs against the POSIX
    store and the injected in-memory one, proving the reconciliation
    tier depends only on the seam's put-if-absent/read contract —
    no hidden reliance on hard links, rename atomicity, or directory
    listing (the object-store portability claim, log_store.py).

    The "lost-ack" leg re-runs the whole matrix with EVERY successful
    put also reporting a conflict (an at-least-once object-store
    adapter's worst behavior): the writer-token recovery must turn
    each such false conflict back into exactly-once success, while
    every GENUINE conflict in the matrix still conflicts — i.e. the
    recovery composes with reconciliation, not just with a clean
    append.

    The "s3" leg runs the matrix through the S3ObjectLogStore adapter
    against the in-repo fake client (real If-None-Match 412
    semantics, paginated listing): writers on one root share one
    "bucket", exactly the multi-client S3 deployment shape."""
    s3_buckets: dict = {}

    def make(root=None):
        r = str(root if root is not None else tmp_path / "tbl")
        if request.param == "memory":
            return VersionedTable(r, log_store=InMemoryLogStore(r))
        if request.param == "lost-ack":
            return VersionedTable(
                r, log_store=LostAckStore(InMemoryLogStore(r))
            )
        if request.param == "s3":
            from jde_to_datalake_spark.sources.log_store import (
                S3ObjectLogStore,
            )
            from tests.test_log_store import FakeS3Client

            client = s3_buckets.setdefault(r, FakeS3Client())
            return VersionedTable(
                r, log_store=S3ObjectLogStore("bkt", r, client)
            )
        return VersionedTable(r)

    yield make
    if request.param in ("memory", "lost-ack"):
        InMemoryLogStore.reset()


@pytest.fixture()
def table(make_table):
    return make_table()


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, ["k", "v"])


def _clustered(spark, table, n=100, files=4):
    """A key-clustered table: each file covers a narrow disjoint key
    range, so footer stats make disjoint-key merges touch disjoint
    files."""
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    table.commit(df.repartitionByRange(files, "k").sortWithinPartitions("k"),
                 mode="overwrite")
    return table


def _rows(spark, table):
    return sorted(tuple(r) for r in table.read(spark).collect())


def _race(table, monkeypatch, interloper):
    """Arrange ``interloper()`` to commit AFTER the caller's next
    operation reads its base but BEFORE its manifest link lands — the
    classic read-publish race, injected deterministically by wrapping
    the first ``_publish_once`` attempt (so the loser hits the atomic
    link failure and must reconcile or raise)."""
    real_once = table._publish_once
    fired = {"done": False}

    def raced_once(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            interloper()
        return real_once(*a, **kw)

    monkeypatch.setattr(table, "_publish_once", raced_once)
    return fired


# -- blind appends ----------------------------------------------------------


def test_concurrent_blind_appends_both_commit(spark, table, monkeypatch, make_table):
    table.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    other = make_table(table.root)

    _race(table, monkeypatch,
          lambda: other.commit(_kv(spark, [(2, "b")]), mode="append"))
    v = table.commit(_kv(spark, [(3, "c")]), mode="append")

    assert v == 2  # re-based onto the interloper's version
    assert _rows(spark, table) == [(1, "a"), (2, "b"), (3, "c")]


def test_blind_append_commutes_with_merge(spark, table, monkeypatch, make_table):
    _clustered(spark, table)
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.merge(spark, _kv(spark, [(5, 555)]), "k"),
    )
    table.commit(_kv(spark, [(1000, 1)]), mode="append")

    got = dict(_rows(spark, table))
    assert got[5] == 555 and got[1000] == 1


def test_blind_append_conflicts_with_concurrent_constraint(
    spark, table, monkeypatch, make_table
):
    # the staged rows were validated under the OLD rules: a concurrent
    # ADD CONSTRAINT must fail the append, not silently bypass it
    table.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.add_constraint(spark, "k_pos", "k > 0"),
    )
    with pytest.raises(ConcurrentCommitError, match="metadata"):
        table.commit(_kv(spark, [(2, "b")]), mode="append")


# -- key-disjoint merges ------------------------------------------------------


def test_disjoint_merges_commute_with_one_execution_each(
    spark, table, monkeypatch, make_table
):
    _clustered(spark, table)
    other = make_table(table.root)

    # count executions of the loser's merge via its stage() calls
    # (every merge execution stages exactly once before publishing)
    calls = {"n": 0}
    real_stage = table.stage

    def counting_stage(df, *a, **kw):
        calls["n"] += 1
        return real_stage(df, *a, **kw)

    monkeypatch.setattr(table, "stage", counting_stage)
    # interloper merges keys 0-4 (files at the low end) while the
    # loser merges keys 90-94 (files at the high end)
    _race(
        table,
        monkeypatch,
        lambda: other.merge(
            spark, _kv(spark, [(i, -i) for i in range(5)]), "k"
        ),
    )
    v = table.merge(
        spark, _kv(spark, [(i, i * 1000) for i in range(90, 95)]), "k"
    )

    assert calls["n"] == 1  # ONE execution: reconciled, not re-run
    assert v == 2
    got = dict(_rows(spark, table))
    assert got[0] == 0 and got[4] == -4  # interloper's writes live
    assert got[90] == 90000 and got[94] == 94000  # loser's writes live
    assert len(got) == 100


def test_overlapping_merges_conflict_and_retry_reruns(
    spark, table, monkeypatch, make_table
):
    _clustered(spark, table)
    other = make_table(table.root)

    fired = _race(
        table,
        monkeypatch,
        lambda: other.merge(spark, _kv(spark, [(50, -50)]), "k"),
    )
    with pytest.raises(ConcurrentCommitError):
        table.merge(spark, _kv(spark, [(50, 5000), (51, 5100)]), "k")
    assert fired["done"]

    # retries=1: the first attempt loses the same race again, the
    # retry re-executes against the fresh snapshot and wins
    fired["done"] = False
    v = table.merge(
        spark, _kv(spark, [(50, 5000), (51, 5100)]), "k", retries=1
    )
    assert v is not None
    got = dict(_rows(spark, table))
    assert got[50] == 5000 and got[51] == 5100


def test_merge_conflicts_with_concurrent_delete_of_read_files(
    spark, table, monkeypatch, make_table
):
    _clustered(spark, table)
    other = make_table(table.root)

    # interloper tombstones rows in the same key region the merge read
    _race(
        table,
        monkeypatch,
        lambda: other.delete_where(spark, "k = 51"),
    )
    with pytest.raises(ConcurrentCommitError):
        table.merge(spark, _kv(spark, [(50, 5000)]), "k")


def test_merge_commutes_with_optimize_of_untouched_files(
    spark, table, monkeypatch, make_table
):
    _clustered(spark, table)
    other = make_table(table.root)
    m = table._manifest(table.latest_version())
    # compact only the files NOT holding keys 90-94
    low_files = table.files_for_ranges({"k": (0, 49)}, table.latest_version())
    assert low_files and set(low_files) < set(m["files"])

    _race(
        table,
        monkeypatch,
        lambda: other.compact_files(spark, files=low_files),
    )
    v = table.merge(spark, _kv(spark, [(92, 9200)]), "k")
    assert v == 2
    got = dict(_rows(spark, table))
    assert got[92] == 9200 and len(got) == 100


# -- maintenance vs ingest ----------------------------------------------------


def test_compaction_commutes_with_concurrent_append(
    spark, table, monkeypatch, make_table
):
    _clustered(spark, table)
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.commit(
            spark.createDataFrame([(1000, 1)], ["k", "v"]), mode="append"
        ),
    )
    v = table.compact(spark, target_partitions=2)
    assert v == 2
    got = dict(_rows(spark, table))
    assert got[1000] == 1 and len(got) == 101


def test_same_txn_app_stamped_concurrently_conflicts(
    spark, table, monkeypatch, make_table
):
    table.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.commit(
            _kv(spark, [(2, "b")]), mode="append", txn=("app", 7)
        ),
    )
    with pytest.raises(ConcurrentCommitError, match="txn app"):
        table.commit(_kv(spark, [(3, "c")]), mode="append", txn=("app", 8))


def test_reconciled_merge_inherits_interloper_dv_state(
    spark, table, monkeypatch, make_table
):
    """An interloper's deletion vectors aimed at files the loser never
    read must survive the loser's re-based publish."""
    _clustered(spark, table)
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.delete_where(spark, "k = 3"),
    )
    table.merge(spark, _kv(spark, [(92, 9200)]), "k")
    got = dict(_rows(spark, table))
    assert 3 not in got  # the interloper's delete held
    assert got[92] == 9200
    assert len(got) == 99


@pytest.mark.soak
def test_threaded_disjoint_writers_never_lose_an_update(spark, table, make_table):
    """Two REAL concurrent writer threads hammer disjoint key ranges
    of one clustered table (plus a third appending). With retries as
    the overlap fallback, every update must land exactly once — the
    multi-stream ingest posture the reference's DAGs assume."""
    import threading

    _clustered(spark, table, n=100, files=4)
    errors: list = []

    def writer(lo: int, hi: int, mark: int):
        try:
            t = make_table(table.root)
            for i in range(4):
                batch = _kv(
                    spark,
                    [(k, mark * 1_000_000 + i) for k in range(lo, hi)],
                )
                t.merge(spark, batch, key="k", retries=8)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    def appender():
        try:
            t = make_table(table.root)
            for i in range(3):
                t.commit(
                    _kv(spark, [(10_000 + i, -1)]), mode="append"
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(0, 5, 1)),
        threading.Thread(target=writer, args=(90, 95, 2)),
        threading.Thread(target=appender),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    got = dict(_rows(spark, table))
    # last batch (i=3) of each writer won its keys
    for k in range(0, 5):
        assert got[k] == 1_000_003, (k, got[k])
    for k in range(90, 95):
        assert got[k] == 2_000_003, (k, got[k])
    for i in range(3):
        assert got[10_000 + i] == -1
    assert len(got) == 103
    # the log is a contiguous, readable history
    vs = table.versions()
    assert vs == list(range(vs[-1] + 1))


def test_scd2_commutes_with_disjoint_append(spark, tmp_path, monkeypatch, make_table):
    """SCD2 declares its batch-key envelope, so a concurrent append of
    unrelated keys re-bases instead of failing the dimension update."""
    from jde_to_datalake_spark.sources.scd import apply_scd2

    dim = make_table(str(tmp_path / "dim"))
    b1 = spark.createDataFrame(
        [(1, "red", 100), (2, "blue", 100)], ["k", "color", "ts"]
    )
    apply_scd2(spark, dim, b1, "k", ["color"], "ts")
    other = make_table(dim.root)

    _race(
        dim,
        monkeypatch,
        lambda: other.commit(
            spark.createDataFrame(
                [(99, "green", 100, 100, None, True)],
                "k bigint, color string, ts bigint, valid_from bigint, "
                "valid_to bigint, is_current boolean",
            ).drop("ts"),
            mode="append",
        ),
    )
    b2 = spark.createDataFrame([(1, "RED", 200)], ["k", "color", "ts"])
    apply_scd2(spark, dim, b2, "k", ["color"], "ts")

    rows = dim.read(spark, merge_schema=True).collect()
    cur = {r["k"]: r["color"] for r in rows if r["is_current"]}
    assert cur == {1: "RED", 2: "blue", 99: "green"}
    assert sum(1 for r in rows if not r["is_current"]) == 1


def test_delete_commutes_with_disjoint_append_and_merge(
    spark, table, monkeypatch, make_table
):
    """A DV-only DELETE bounded by prune_ranges re-bases over a
    key-disjoint concurrent writer: GDPR deletes don't block ingest."""
    _clustered(spark, table)
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.merge(spark, _kv(spark, [(95, -95)]), "k"),
    )
    v = table.delete_where(
        spark, "k = 3", prune_ranges={"k": (3, 3)}
    )
    assert v == 2
    got = dict(_rows(spark, table))
    assert 3 not in got and got[95] == -95 and len(got) == 99


def test_delete_without_ranges_conflicts_with_concurrent_add(
    spark, table, monkeypatch, make_table
):
    """An unbounded DELETE predicate cannot prove concurrent inserts
    are irrelevant — the race must surface, not silently skip the
    newly added matching rows."""
    _clustered(spark, table)
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.commit(_kv(spark, [(777, 0)]), mode="append"),
    )
    with pytest.raises(ConcurrentCommitError):
        table.delete_where(spark, "v = 0")
    # retries re-run against the fresh snapshot and delete BOTH rows
    # with v=0 (the original k=0 and the interloper's k=777)
    table.delete_where(spark, "v = 0", retries=1)
    got = dict(_rows(spark, table))
    assert 0 not in got and 777 not in got


def test_reconciled_commit_is_audited(spark, table, monkeypatch, make_table):
    _clustered(spark, table)
    other = make_table(table.root)
    _race(
        table,
        monkeypatch,
        lambda: other.merge(spark, _kv(spark, [(1, -1)]), "k"),
    )
    v = table.merge(spark, _kv(spark, [(95, 9500)]), "k")
    rec = table._manifest(v)
    assert rec.get("reconciled_over") == 1  # re-based over one commit


def test_disjoint_merges_commute_under_active_rename(
    spark, table, monkeypatch, make_table
):
    """Reconciliation's read declarations are PHYSICAL-name ranges, so
    disjoint merges still commute when the key column has been
    renamed (footer stats keep the physical name underneath)."""
    _clustered(spark, table)
    table.rename_column("k", "key_id")
    other = make_table(table.root)

    _race(
        table,
        monkeypatch,
        lambda: other.merge(
            spark,
            spark.createDataFrame([(2, -2)], ["key_id", "v"]),
            "key_id",
        ),
    )
    v = table.merge(
        spark,
        spark.createDataFrame([(97, 9700)], ["key_id", "v"]),
        "key_id",
    )
    assert v == 3  # v0 data, v1 rename, v2 interloper, v3 re-based
    got = {r["key_id"]: r["v"] for r in table.read(spark).collect()}
    assert got[2] == -2 and got[97] == 9700 and len(got) == 100


def test_reconcile_budget_exhaustion_raises(spark, table, monkeypatch, make_table):
    """A writer losing EVERY re-based race (pathological contention)
    fails with the budget message instead of looping forever."""
    table.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    other = make_table(table.root)
    real_once = table._publish_once
    n = {"i": 0}

    def always_raced(*a, **kw):
        n["i"] += 1
        other.commit(_kv(spark, [(100 + n["i"], "x")]), mode="append")
        return real_once(*a, **kw)

    monkeypatch.setattr(table, "_publish_once", always_raced)
    with pytest.raises(ConcurrentCommitError, match="reconciliation"):
        table.commit(_kv(spark, [(2, "b")]), mode="append")
    # the interlopers' commits all survived; ours never landed
    vals = sorted(r.v for r in table.read(spark).collect())
    assert "b" not in vals and vals.count("x") == n["i"]


class _AmbiguousPutStore:
    """Delegating store whose put_if_absent SUCCEEDS server-side but
    reports LogConflict to the caller — the object-store failure mode
    where a PUT times out after landing and the adapter's internal
    retry answers 412 from its own success. Fires once, on the
    ``fire_on``-th put."""

    def __init__(self, inner, fire_on=1):
        self.inner = inner
        self.fire_on = fire_on
        self.puts = 0

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def put_if_absent(self, version, record):
        from jde_to_datalake_spark.sources.log_store import LogConflict

        self.puts += 1
        self.inner.put_if_absent(version, record)
        if self.puts == self.fire_on:
            raise LogConflict(str(version))


def test_ambiguous_put_recovers_as_success(spark, tmp_path):
    """A lost-acknowledgement put must complete the publish (writer
    token match), not raise — and MUST NOT double-apply on the
    reconcile loop's retry (the would-be failure mode: a blind append
    re-based over its own landed commit writes the rows twice)."""
    root = str(tmp_path / "tbl")
    store = _AmbiguousPutStore(PosixLogStore(root), fire_on=2)
    t = VersionedTable(root, log_store=store)
    t.commit(_kv(spark, [(1, "a")]), mode="overwrite")  # put #1: clean
    v = t.commit(_kv(spark, [(2, "b")]), mode="append")  # put #2: ambiguous
    assert v == 1
    assert store.puts == 2  # recovered by token match, no third put
    vals = sorted(r.v for r in t.read(spark).collect())
    assert vals == ["a", "b"]  # exactly once
    assert t.latest_version() == 1


def test_ambiguous_put_recovery_never_claims_a_competitor(
    spark, tmp_path, monkeypatch
):
    """The token must settle ownership correctly in the REAL race too:
    when another writer owns the version, recovery must not trigger —
    the commit re-bases (blind append) onto the competitor instead of
    absorbing it."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(root)
    t.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    other = VersionedTable(root)
    real_once = t._publish_once
    fired = {"done": False}

    def raced(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            other.commit(_kv(spark, [(9, "z")]), mode="append")
        return real_once(*a, **kw)

    monkeypatch.setattr(t, "_publish_once", raced)
    t.commit(_kv(spark, [(2, "b")]), mode="append")
    vals = sorted(r.v for r in t.read(spark).collect())
    assert vals == ["a", "b", "z"]  # both commits present, neither lost
    assert t.latest_version() == 2


class _FlakyReadStore:
    """Reads of one specific version fail `fail_times` times with
    OSError before succeeding — the transient object-store read fault
    in the ambiguous-put read-back window."""

    def __init__(self, inner, version, fail_times):
        self.inner = inner
        self.version = version
        self.fail_times = fail_times

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def read(self, version):
        if version == self.version and self.fail_times > 0:
            self.fail_times -= 1
            raise OSError("injected transient read fault")
        return self.inner.read(version)


def test_ambiguous_put_readback_retries_transient_faults(spark, tmp_path):
    """Lost ACK + transient read-back failure: the bounded retry must
    recover the writer token and complete exactly-once (treating the
    failed read as a competitor would re-base a blind append over its
    own landed commit and double-apply the rows)."""
    root = str(tmp_path / "tbl")
    store = _FlakyReadStore(
        _AmbiguousPutStore(PosixLogStore(root), fire_on=2),
        version=1,
        fail_times=2,
    )
    t = VersionedTable(root, log_store=store)
    t.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    v = t.commit(_kv(spark, [(2, "b")]), mode="append")
    assert v == 1 and store.fail_times == 0
    assert sorted(r.v for r in t.read(spark).collect()) == ["a", "b"]


def test_ambiguous_put_undecidable_raises_distinct_error(spark, tmp_path):
    """When the read-back keeps failing, ownership is undecidable: the
    publish must raise CommitOwnershipUnknown — NOT
    ConcurrentCommitError, which the reconcile loop would catch and
    re-base, republishing possibly-landed files. The caller re-checks
    state and finds the commit DID land, exactly once."""
    from jde_to_datalake_spark.sources.versioned import (
        CommitOwnershipUnknown,
    )

    root = str(tmp_path / "tbl")
    store = _FlakyReadStore(
        _AmbiguousPutStore(PosixLogStore(root), fire_on=2),
        version=1,
        fail_times=10**9,  # never recovers within the bounded retry
    )
    t = VersionedTable(root, log_store=store)
    t.commit(_kv(spark, [(1, "a")]), mode="overwrite")
    with pytest.raises(CommitOwnershipUnknown):
        t.commit(_kv(spark, [(2, "b")]), mode="append")
    assert not isinstance(
        CommitOwnershipUnknown("x"), ConcurrentCommitError
    )
    # caller's re-check: the put actually landed, exactly once
    t2 = VersionedTable(root)
    assert t2.latest_version() == 1
    assert sorted(r.v for r in t2.read(spark).collect()) == ["a", "b"]
