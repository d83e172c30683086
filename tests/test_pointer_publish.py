"""The five non-table atomic-publish points (watermark, idempotency
ledger, schema registry, training-shard manifest, ingest nonce) run
their semantics against EVERY LogStore implementation — POSIX, the
in-memory object-store stand-in, the S3 adapter over the fake
conditional-write client, a lost-ACK wrapper (every successful put
also reports a conflict), and ``s3-full``: BOTH planes — pointer
records AND payload dirs (listing, retention mtimes, reaping, footer
reads) — on the fault-injectable S3 fake, the proof that the ledger
and the watermark run END-TO-END against a bucket with zero ``os.*``
in the control path. This is what routing them through the seams
(records round 10, payloads round 12) actually bought: the same
behavior, byte for byte, on every store."""

from __future__ import annotations

import os
import threading

import pytest

from jde_to_datalake_spark.sources.log_store import (
    InMemoryLogStore,
    LostAckStore,
    PosixLogStore,
    S3ObjectLogStore,
    S3PayloadStore,
)
from tests.test_log_store import FakeS3Client

STORES = ["posix", "memory", "s3", "lost-ack", "s3-full"]


@pytest.fixture(params=STORES)
def make_store(request, tmp_path):
    """Store factory: multiple calls with one root return handles on
    the SAME underlying log (the separate-writer deployment shape).
    ``make_store.payloads(root)`` is the matching payload-plane
    factory (None = the artifact's default POSIX payload store); on
    the ``s3-full`` leg it returns an :class:`S3PayloadStore` over
    the SAME backing-dir fake client as the record store, with
    ``uri_base`` mapped to the local backing path so Spark's writer
    lands bytes exactly where the client lists them.
    ``make_store.leg`` exposes the leg name for the one
    POSIX-only expectation (empty dirs don't exist on a bucket)."""
    s3_buckets: dict = {}

    def client_for(root: str, backing=None):
        return s3_buckets.setdefault(root, FakeS3Client(backing=backing))

    def make(root: str):
        if request.param == "memory":
            return InMemoryLogStore(root)
        if request.param == "s3":
            return S3ObjectLogStore("bkt", root, client_for(root))
        if request.param == "s3-full":
            return S3ObjectLogStore("bkt", root, client_for(root, "/"))
        if request.param == "lost-ack":
            return LostAckStore(InMemoryLogStore(root))
        return PosixLogStore(root)

    def payloads(root: str):
        if request.param == "s3-full":
            s = S3PayloadStore(
                "bkt", root, client_for(root, "/"), uri_base=root
            )
            s.RETRY_SLEEP = 0
            return s
        return None  # artifact default: PosixPayloadStore(root)

    make.payloads = payloads
    make.leg = request.param
    yield make
    if request.param in ("memory", "lost-ack"):
        InMemoryLogStore.reset()


def test_watermark_semantics_on_every_store(spark, tmp_path, make_store):
    from pyspark.sql import functions as F

    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    wm = Watermark(root, store=make_store(root), payload_store=make_store.payloads(root))
    assert wm.get(spark) is None
    b1 = spark.createDataFrame([(1, 10), (2, 30)], ["k", "ts"])
    assert wm.advance(spark, b1, "ts") == 30
    # type-exact round trip through the parquet payload
    assert wm.get(spark) == 30
    # never rewinds on an old-batch replay
    b0 = spark.createDataFrame([(9, 5)], ["k", "ts"])
    assert wm.advance(spark, b0, "ts") == 30
    # empty batch is a no-op
    assert wm.advance(spark, b1.filter(F.lit(False)), "ts") == 30
    # a SECOND handle (own store instance) resolves the same pointer
    wm2 = Watermark(root, store=make_store(root), payload_store=make_store.payloads(root))
    assert wm2.get(spark) == 30
    # superseded data dirs survive the flip (lazy readers may still be
    # bound to them) and age out through the retention-gated sweep
    assert wm.advance(spark, spark.createDataFrame([(3, 99)], ["k", "ts"]), "ts") == 99
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 2
    assert len(wm.clean_stale(retention_seconds=0)) == 1
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 1
    assert wm.get(spark) == 99  # current payload untouched by the sweep


def test_ledger_semantics_on_every_store(spark, tmp_path, make_store):
    from pyspark.sql import functions as F

    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    led = IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
    assert not led.exists() and led.load(spark) is None
    batch = spark.createDataFrame(
        [(1, "pending"), (2, "pending")], ["k", "status"]
    )
    # nothing done yet: all pending
    assert led.pending_only(spark, batch).count() == 2
    led.merge(spark, batch)
    led.mark_done(spark, spark.createDataFrame([(1,)], ["k"]))
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "pending"}
    # the done key is filtered out of the next batch (J6 order)
    assert {r["k"] for r in led.pending_only(spark, batch).collect()} == {2}
    # a second handle sees the flipped pointer
    led2 = IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
    assert led2.exists()
    assert {r["k"] for r in led2.pending_only(spark, batch).collect()} == {2}
    # superseded ledger dirs survive the flips for lazy readers and
    # are reclaimed by the retention-gated sweep (2 flips = 1 stale)
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 2
    assert len(led.clean_stale(retention_seconds=0)) == 1
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "pending"}  # current ledger untouched


def test_schema_registry_on_every_store(spark, tmp_path, make_store):
    from jde_to_datalake_spark.sources.schema_manager import SchemaRegistry

    root = str(tmp_path / "reg")
    reg = SchemaRegistry(root, store=make_store(root))
    assert reg.latest(spark, "t") is None
    assert reg.next_version(spark, "t") == 1
    assert reg.save(spark, "t", {"a": {"type": "string"}}) == 1
    assert reg.save(spark, "t", {"a": {"type": "string"}, "b": {"type": "integer"}}) == 2
    assert reg.save(spark, "other", {"x": {"type": "float"}}) == 1
    assert set(reg.latest(spark, "t")) == {"a", "b"}
    assert reg.next_version(spark, "t") == 3
    # a second handle reads the same log
    reg2 = SchemaRegistry(root, store=make_store(root))
    assert reg2.next_version(spark, "other") == 2
    # the DataFrame surface (A6/A7 SQL consumers)
    df = reg._load(spark)
    assert df.count() == 3
    assert set(df.columns) == {
        "table_name", "version", "schema_definition", "created_at"
    }


def test_schema_registry_concurrent_saves_never_collide(
    spark, tmp_path, make_store
):
    """Two racing saves of ONE table must claim versions 1 and 2 —
    the old parquet-swap design could lose one (lost update); the
    log's put-if-absent retry cannot."""
    from jde_to_datalake_spark.sources.schema_manager import SchemaRegistry

    root = str(tmp_path / "reg")
    handles = [
        SchemaRegistry(root, store=make_store(root)) for _ in range(2)
    ]
    got = [None, None]
    barrier = threading.Barrier(2)

    def save(i):
        barrier.wait()
        got[i] = handles[i].save(spark, "t", {"w": {"type": "string"}})

    ts = [threading.Thread(target=save, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == [1, 2]
    assert handles[0].next_version(spark, "t") == 3


def test_training_shards_on_every_store(spark, tmp_path, make_store):
    from jde_to_datalake_spark.sources.training_shards import (
        clean_stale_stagings,
        read_manifest,
        read_training_shards,
        write_training_shards,
    )

    root = str(tmp_path / "sh")
    packs = spark.createDataFrame(
        [(i, [f"t{i}"], 1) for i in range(10)],
        "pack_id bigint, tokens array<string>, n_toks bigint",
    )
    store = make_store(root)
    os.makedirs(root, exist_ok=True)  # injected-payload legs skip it
    manifest = write_training_shards(
        packs, root, rows_per_shard=5, store=store,
        payload_store=make_store.payloads(root),
    )
    assert manifest["n_shards"] == 2 and manifest["n_rows"] == 10
    assert read_manifest(root, store=make_store(root)) == manifest
    # write-once: a second export loses and leaves no orphan dir
    with pytest.raises(FileExistsError):
        write_training_shards(
            packs, root, rows_per_shard=5, store=store,
            payload_store=make_store.payloads(root),
        )
    dirs = [d for d in os.listdir(root) if d.startswith("shards-")]
    assert dirs == [manifest["data_dir"]]
    # reads resolve the manifest's data dir through the SAME seam
    assert read_training_shards(
        spark, root, verify=True, store=make_store(root),
        payload_store=make_store.payloads(root),
    ).count() == 10
    assert clean_stale_stagings(
        root, store=make_store(root),
        payload_store=make_store.payloads(root),
    ) == []
    if isinstance(store, PosixLogStore):
        # the no-injection default read path (POSIX deployments)
        assert read_training_shards(spark, root, verify=True).count() == 10


def test_ingest_nonce_on_every_store(tmp_path, make_store):
    from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id

    ckpt = str(tmp_path / "ck")
    os.makedirs(ckpt, exist_ok=True)
    a = checkpoint_app_id(ckpt, store=make_store(ckpt))
    b = checkpoint_app_id(ckpt, store=make_store(ckpt))
    assert a == b  # one identity per checkpoint lineage, any store


def test_legacy_layouts_fail_loudly(spark, tmp_path):
    """A PRE-seam artifact (parquet directly under the path, no _log
    pointer) must raise, never read as empty: a silently-empty ledger
    would re-dispatch every done transaction, a silently-None
    watermark would re-backfill, a silently-empty registry would
    re-claim version 1."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger
    from jde_to_datalake_spark.sources.incremental import Watermark
    from jde_to_datalake_spark.sources.schema_manager import SchemaRegistry

    for name in ("led", "wm", "reg"):
        d = tmp_path / name
        d.mkdir()
        spark.createDataFrame([(1, "done")], ["k", "status"]).coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / "__tmp"))
        # flatten: move part files up to the root (the legacy layout)
        import glob
        import shutil as _sh

        for f in glob.glob(str(d / "__tmp" / "*.parquet")):
            _sh.move(f, str(d / os.path.basename(f)))
        _sh.rmtree(str(d / "__tmp"))

    with pytest.raises(RuntimeError, match="pre-pointer"):
        IdempotencyLedger(str(tmp_path / "led"), key="k").exists()
    with pytest.raises(RuntimeError, match="pre-pointer"):
        Watermark(str(tmp_path / "wm")).get(spark)
    with pytest.raises(RuntimeError, match="pre-log"):
        SchemaRegistry(str(tmp_path / "reg")).next_version(spark, "t")


def test_nonce_legacy_file_migrates_identity(tmp_path):
    """A checkpoint written before the seam holds its nonce in a flat
    _ingest_app_nonce file: the app identity must SURVIVE the upgrade
    (a fresh nonce would reset the txn watermark while the batch_id
    lineage continues — the last epoch's replay would double-apply)."""
    from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id

    ckpt = str(tmp_path / "ck")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "_ingest_app_nonce"), "w") as fh:
        fh.write("legacynonce123")
    app = checkpoint_app_id(ckpt)
    assert app == f"{os.path.abspath(ckpt)}#legacynonce123"
    # stable on re-read, with and without the legacy file present
    assert checkpoint_app_id(ckpt) == app
    os.remove(os.path.join(ckpt, "_ingest_app_nonce"))
    assert checkpoint_app_id(ckpt) == app  # slot now owns the identity


def test_flip_defers_reap_for_lazy_readers(spark, tmp_path, make_store):
    """A reader holding an UNMATERIALIZED DataFrame bound to the
    pre-flip ledger must still be able to run its action after a flip
    — the flip publishes the new pointer but never deletes the
    superseded payload (that's clean_stale's retention-gated job)."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    led = IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
    led.merge(
        spark,
        spark.createDataFrame([(1, "pending"), (2, "done")], ["k", "status"]),
    )
    lazy = led.load(spark).filter("status = 'done'")  # plan only, no action
    led.mark_done(spark, spark.createDataFrame([(1,)], ["k"]))  # flip lands
    # the pre-flip plan still materializes against the old payload
    assert [r["k"] for r in lazy.collect()] == [2]
    # and a fresh read sees the post-flip state
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "done"}


def test_two_dispatcher_merge_loses_loudly_zero_rows_lost(
    spark, tmp_path, make_store
):
    """TWO concurrent dispatchers merging the ledger: with the CAS'd
    flip exactly one wins, the other raises PointerConflict — and the
    ledger holds exactly the winner's rows (the old last-writer-wins
    flip silently dropped one side's rows → duplicate side-effect
    dispatch, the failure A12 exists to prevent). The loud loser then
    re-merges with conflict_retries and BOTH sides' rows are present."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger
    from jde_to_datalake_spark.sources.log_store import PointerConflict

    root = str(tmp_path / "led")
    handles = [
        IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
        for _ in range(2)
    ]
    batches = [
        spark.createDataFrame([(1, "done"), (2, "done")], ["k", "status"]),
        spark.createDataFrame([(3, "done"), (4, "done")], ["k", "status"]),
    ]
    outcomes: list = [None, None]
    barrier = threading.Barrier(2)

    def dispatch(i):
        barrier.wait()
        try:
            handles[i].merge(spark, batches[i])
            outcomes[i] = "won"
        except PointerConflict:
            outcomes[i] = "lost"

    ts = [threading.Thread(target=dispatch, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(outcomes) == ["lost", "won"]
    winner = outcomes.index("won")
    loser = 1 - winner
    keys = {r["k"] for r in handles[0].load(spark).collect()}
    # exactly the winner's rows — nothing silently half-merged
    assert keys == {1, 2} if winner == 0 else keys == {3, 4}
    # the loud loser re-derives: both sides present, zero rows lost
    handles[loser].merge(spark, batches[loser], conflict_retries=3)
    keys = {r["k"] for r in handles[0].load(spark).collect()}
    assert keys == {1, 2, 3, 4}


def test_merge_conflict_retries_rederive_serialized_outcome(
    spark, tmp_path, make_store
):
    """conflict_retries re-reads the NEW current ledger and re-applies
    the updates on top — the serialized ON CONFLICT DO UPDATE outcome:
    both writers' disjoint keys survive, and the retrying writer's
    update wins on the contended key."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    led = IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
    led.merge(spark, spark.createDataFrame([(1, "pending")], ["k", "status"]))

    class StaleAnchorPtr:
        """First flip attempt uses a deliberately stale anchor — the
        deterministic stand-in for an intervening dispatcher."""

        def __init__(self, ptr):
            self._ptr = ptr
            self._sabotaged = False

        def flip(self, write_fn, expected):
            if not self._sabotaged:
                self._sabotaged = True
                expected = None if expected is None else expected - 1
            return self._ptr.flip(write_fn, expected=expected)

        def __getattr__(self, name):
            return getattr(self._ptr, name)

    led._ptr = StaleAnchorPtr(led._ptr)
    led.merge(
        spark,
        spark.createDataFrame([(1, "done"), (5, "pending")], ["k", "status"]),
        conflict_retries=2,
    )
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 5: "pending"}


@pytest.mark.soak
def test_many_dispatchers_with_retries_lose_no_rows(
    spark, tmp_path, make_store
):
    """Four dispatchers, three merges each, all racing with retry
    budget: every one of the 12 batches' keys must be present at the
    end — the serialized ON-CONFLICT-DO-UPDATE outcome under REAL
    thread interleavings (not just the pointwise two-writer shapes).
    Runs on every store leg incl. the every-put lost-ACK injector."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    n_threads, n_merges = 4, 3
    handles = [
        IdempotencyLedger(root, key="k", store=make_store(root), payload_store=make_store.payloads(root))
        for _ in range(n_threads)
    ]
    errors: list = []
    barrier = threading.Barrier(n_threads)

    def dispatch(i):
        barrier.wait()
        for m in range(n_merges):
            batch = spark.createDataFrame(
                [(i * 100 + m, "done")], ["k", "status"]
            )
            try:
                handles[i].merge(spark, batch, conflict_retries=30)
            except Exception as e:  # noqa: BLE001 — collected for assert
                errors.append((i, m, repr(e)))

    ts = [
        threading.Thread(target=dispatch, args=(i,))
        for i in range(n_threads)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == []
    keys = {r["k"] for r in handles[0].load(spark).collect()}
    expected = {i * 100 + m for i in range(n_threads) for m in range(n_merges)}
    assert keys == expected  # zero silently lost rows


def test_concurrent_watermark_advances_converge_on_global_max(
    spark, tmp_path, make_store
):
    """Racing advances are CAS'd and retried (monotonic max is
    commutative): the surviving watermark is the GLOBAL max — the old
    last-writer-wins flip could rewind it to a slower writer's smaller
    value (a silent re-backfill)."""
    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    values = [10, 40, 20, 30]
    handles = [
        Watermark(root, store=make_store(root), payload_store=make_store.payloads(root)) for _ in values
    ]
    barrier = threading.Barrier(len(values))
    errors: list = []

    def advance(i, v):
        barrier.wait()
        try:
            handles[i].advance(
                spark,
                spark.createDataFrame([(1, v)], ["k", "ts"]),
                "ts",
                conflict_retries=10,
            )
        except Exception as e:  # noqa: BLE001 — collected for assert
            errors.append(e)

    ts = [
        threading.Thread(target=advance, args=(i, v))
        for i, v in enumerate(values)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == []
    assert handles[0].get(spark) == 40


def test_watermark_stale_anchor_conflict_is_loud(
    spark, tmp_path, make_store
):
    """With retries exhausted (conflict_retries=0) a lost CAS raises
    PointerConflict — detection, never a silent clobber."""
    from jde_to_datalake_spark.sources.incremental import Watermark
    from jde_to_datalake_spark.sources.log_store import PointerConflict

    root = str(tmp_path / "wm")
    wm = Watermark(root, store=make_store(root), payload_store=make_store.payloads(root))
    wm.advance(spark, spark.createDataFrame([(1, 10)], ["k", "ts"]), "ts")

    class StaleAnchorPtr:
        def __init__(self, ptr):
            self._ptr = ptr

        def flip(self, write_fn, expected):
            return self._ptr.flip(
                write_fn,
                expected=None if expected is None else expected - 1,
            )

        def __getattr__(self, name):
            return getattr(self._ptr, name)

    wm._ptr = StaleAnchorPtr(wm._ptr)
    with pytest.raises(PointerConflict):
        wm.advance(
            spark,
            spark.createDataFrame([(1, 99)], ["k", "ts"]),
            "ts",
            conflict_retries=0,
        )


def _vled(root, make_store, threshold):
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    return IdempotencyLedger(
        root,
        key="k",
        store=make_store(root),
        versioned_threshold_rows=threshold,
        versioned_store=make_store(os.path.join(root, "_versioned")),
        payload_store=make_store.payloads(root),
    )


def test_ledger_hands_off_to_versioned_above_threshold(
    spark, tmp_path, make_store
):
    """Below the threshold the ledger is a pointer-flipped parquet
    swap; the merge that carries it to >= threshold rows hands off to
    the VersionedTable backend (file-level partial-rewrite MERGE), and
    every ledger surface — load, pending_only, mark_done, exists —
    behaves identically across the switch."""
    root = str(tmp_path / "led")
    led = _vled(root, make_store, threshold=3)
    led.merge(
        spark,
        spark.createDataFrame([(1, "pending"), (2, "pending")], ["k", "status"]),
    )
    assert led.backend() == "pointer"
    led.merge(
        spark,
        spark.createDataFrame([(3, "pending"), (4, "pending")], ["k", "status"]),
    )
    # the threshold is read from the CURRENT payload's parquet footers
    # (metadata-only, no extra Spark action), so the handoff fires on
    # the first merge AFTER the ledger has reached the threshold
    assert led.backend() == "pointer"
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "pending", 2: "pending", 3: "pending", 4: "pending"}
    # post-handoff A13 + J6 semantics are unchanged (this merge sees
    # 4 >= 3 rows and migrates)
    led.mark_done(spark, spark.createDataFrame([(1,), (3,)], ["k"]))
    assert led.backend() == "versioned"
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "pending", 3: "done", 4: "pending"}
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x"), (9, "x")], ["k", "status"]
    )
    assert {r["k"] for r in led.pending_only(spark, batch).collect()} == {2, 9}
    # a second handle routes through the handoff record too
    led2 = _vled(root, make_store, threshold=3)
    assert led2.backend() == "versioned" and led2.exists()
    assert {r["k"] for r in led2.pending_only(spark, batch).collect()} == {2, 9}
    # superseded pointer payload dirs are now all unreferenced
    led.clean_stale(retention_seconds=0)
    assert [d for d in os.listdir(root) if d.startswith("data-")] == []
    # ... and the versioned backend survived the sweep
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "pending", 3: "done", 4: "pending"}


def test_ledger_explicit_migration_and_merge_cadence(
    spark, tmp_path, make_store
):
    """migrate_to_versioned() is the threshold path minus the
    threshold; post-handoff merges go through VersionedTable.merge
    (partial rewrite), and the table's history records each merge."""
    root = str(tmp_path / "led")
    led = _vled(root, make_store, threshold=None)
    led.merge(
        spark,
        spark.createDataFrame([(1, "pending"), (2, "done")], ["k", "status"]),
    )
    led.migrate_to_versioned(spark)
    assert led.backend() == "versioned"
    led.migrate_to_versioned(spark)  # idempotent no-op
    led.merge(spark, spark.createDataFrame([(5, "pending")], ["k", "status"]))
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "pending", 2: "done", 5: "pending"}
    # the versioned backend keeps history: handoff commit + merge
    assert len(led._vt().versions()) >= 2


def test_versioned_ledger_concurrent_merges_lose_loudly_or_serialize(
    spark, tmp_path, make_store
):
    """Post-handoff, two concurrent dispatchers ride the versioned
    table's optimistic concurrency: with conflict_retries=0 one may
    lose LOUDLY (PointerConflict) and no rows are silently dropped;
    with retries the loser re-derives and both land."""
    from jde_to_datalake_spark.sources.log_store import PointerConflict

    root = str(tmp_path / "led")
    led = _vled(root, make_store, threshold=1)
    led.merge(spark, spark.createDataFrame([(0, "done")], ["k", "status"]))
    assert led.backend() == "pointer"  # footer count was 0 pre-merge
    led.merge(spark, spark.createDataFrame([(0, "done")], ["k", "status"]))
    assert led.backend() == "versioned"  # 1 >= threshold: handoff
    handles = [_vled(root, make_store, threshold=1) for _ in range(2)]
    batches = [
        spark.createDataFrame([(1, "done")], ["k", "status"]),
        spark.createDataFrame([(2, "done")], ["k", "status"]),
    ]
    outcomes: list = [None, None]
    barrier = threading.Barrier(2)

    def dispatch(i):
        barrier.wait()
        try:
            handles[i].merge(spark, batches[i])
            outcomes[i] = "won"
        except PointerConflict:
            outcomes[i] = "lost"

    ts = [threading.Thread(target=dispatch, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    keys = {r["k"] for r in handles[0].load(spark).collect()}
    # every winner's batch is present; a loser was told loudly
    for i, out in enumerate(outcomes):
        if out == "won":
            assert i + 1 in keys
        else:
            handles[i].merge(spark, batches[i], conflict_retries=3)
    keys = {r["k"] for r in handles[0].load(spark).collect()}
    assert keys == {0, 1, 2}


def test_handoff_races_pointer_flip_rederives(spark, tmp_path, make_store):
    """A pointer flip landing between a migrator's read and its
    handoff CAS must force re-derivation — the handoff retry upserts
    the FRESHER merged state (including the intervening writer's
    rows) before publishing."""
    root = str(tmp_path / "led")
    led = _vled(root, make_store, threshold=100)  # stays pointer-backed
    led.merge(spark, spark.createDataFrame([(1, "done")], ["k", "status"]))
    # drop the threshold so the next merge migrates — but sabotage its
    # first CAS anchor to simulate an intervening dispatcher
    led.versioned_threshold_rows = 1

    class StaleAnchorOnce:
        def __init__(self, store):
            self._store = store
            self._fired = False

        def put_if_absent(self, version, record):
            if not self._fired and record.get("backend") == "versioned":
                self._fired = True
                # an intervening pointer flip claimed this version
                self._store.put_if_absent(
                    version, {"data_dir": "data-intervener"}
                )
            return self._store.put_if_absent(version, record)

        def __getattr__(self, name):
            return getattr(self._store, name)

    real_store = led._ptr.store
    led._ptr.store = StaleAnchorOnce(real_store)
    # the intervener's merged state carries the existing row forward
    # (a real merge never drops keys) plus its own new row
    spark.createDataFrame(
        [(1, "done"), (7, "done")], ["k", "status"]
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "data-intervener")
    )
    led.merge(
        spark,
        spark.createDataFrame([(2, "pending")], ["k", "status"]),
        conflict_retries=2,
    )
    assert led.backend() == "versioned"
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    # the intervener's row (7) AND the migrating writer's row (2) both
    # survived the race — zero silent loss across the handoff
    assert got == {1: "done", 7: "done", 2: "pending"}


def test_data_dir_orphan_reclaim(spark, tmp_path, make_store):
    """A writer that dies between the payload write and the pointer
    flip leaks a data-* orphan; clean_stale reclaims it past the
    retention window while sparing the current payload and any fresh
    (in-flight) dir — the staging-sweep discipline applied to every
    pointer-flip artifact."""
    import time

    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    wm = Watermark(root, store=make_store(root), payload_store=make_store.payloads(root))
    wm.advance(spark, spark.createDataFrame([(1, 10)], ["k", "ts"]), "ts")
    old = time.time() - 7200
    stale = os.path.join(root, "data-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-x.parquet"), "w").close()
    for p in (stale, os.path.join(stale, "part-x.parquet")):
        os.utime(p, (old, old))
    fresh = os.path.join(root, "data-cafebabe")
    os.makedirs(fresh)
    removed = wm.clean_stale()  # default retention: 1 h
    assert removed == [stale]
    assert not os.path.exists(stale) and os.path.isdir(fresh)
    assert wm.get(spark) == 10  # current payload untouched
    # the CURRENT dir survives even past retention
    cur = [
        d
        for d in os.listdir(root)
        if d.startswith("data-") and d != "data-cafebabe"
    ]
    assert len(cur) == 1
    curp = os.path.join(root, cur[0])
    for dirpath, dirs, files in os.walk(curp):
        for n in dirs + files:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(curp, (old, old))
    if make_store.leg == "s3-full":
        # an empty dir is not an object: a crashed writer that wrote
        # no bytes left nothing on the bucket to reclaim (the empty
        # `fresh` dir exists only on the local fs, invisible to the
        # payload store); the aged-out current payload still survives
        # via the authoritative pointer re-read
        assert wm.clean_stale(retention_seconds=0) == []
    else:
        assert wm.clean_stale(retention_seconds=0) == [fresh]
    assert wm.get(spark) == 10


def _dual_plane(root):
    """One artifact root with BOTH planes on backed fakes — separate
    clients per plane (sharing state through the backing files, like
    two boto3 connections to one bucket) so faults can target the
    payload plane alone."""
    log_client = FakeS3Client(backing="/")
    pay_client = FakeS3Client(backing="/")
    log = S3ObjectLogStore("bkt", root, log_client)
    log.RETRY_SLEEP = 0
    pay = S3PayloadStore("bkt", root, pay_client, uri_base=root)
    pay.RETRY_SLEEP = 0
    return log, pay, pay_client


def test_payload_throttle_defers_threshold_handoff_not_merge(
    spark, tmp_path
):
    """A payload-store fault during the handoff THRESHOLD read (footer
    row count) must defer the handoff — never fail the merge, never
    hand off on garbage — and the next clean merge hands off."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    log, pay, pay_client = _dual_plane(root)
    led = IdempotencyLedger(
        root, key="k", store=log, payload_store=pay,
        versioned_threshold_rows=1,
    )
    led.merge(
        spark, spark.createDataFrame([(1, "pending")], "k bigint, status string")
    )
    assert led.backend() == "pointer"
    # exhaust the payload plane's bounded retries on the listing the
    # threshold read needs — the record plane is untouched
    pay_client.inject(
        "list_objects_v2", "SlowDown", times=pay.MAX_RETRIES + 1
    )
    led.merge(
        spark, spark.createDataFrame([(2, "sent")], "k bigint, status string")
    )
    # the merge LANDED (deferral, not failure) and no bogus handoff
    assert led.backend() == "pointer"
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "pending", 2: "sent"}
    # next merge reads the threshold cleanly and hands off
    led.mark_done(spark, spark.createDataFrame([(1,)], "k bigint"))
    assert led.backend() == "versioned"
    got = {r["k"]: r["status"] for r in led.load(spark).collect()}
    assert got == {1: "done", 2: "sent"}


def test_payload_faults_never_fail_sweep_or_publish(spark, tmp_path):
    """Throttle + landed-but-unACKed faults on the payload plane's
    list/delete during clean_stale: the sweep DEFERS (never raises,
    never fails the flip that triggered it) and converges on the next
    clean sweep — the advisory-trim discipline under injected faults,
    not just by code inspection."""
    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    log, pay, pay_client = _dual_plane(root)
    wm = Watermark(root, store=log, payload_store=pay)
    wm.advance(spark, spark.createDataFrame([(1, 10)], ["k", "ts"]), "ts")
    # a flip whose auto-reclaim sweep hits an exhausted-listing fault
    # must still PUBLISH (the sweep is advisory)
    pay_client.inject(
        "list_objects_v2", "SlowDown", times=pay.MAX_RETRIES + 1
    )
    assert (
        wm.advance(spark, spark.createDataFrame([(1, 20)], ["k", "ts"]), "ts")
        == 20
    )
    assert wm.get(spark) == 20
    # deletes that LAND but report failure (lost-ACK shape): the sweep
    # DEFERS — reports nothing removed, fails nothing...
    pay_client.inject(
        "delete_object", "SlowDown", times=pay.MAX_RETRIES + 1, after=True
    )
    assert wm.clean_stale(retention_seconds=0) == []
    assert wm.get(spark) == 20  # current payload untouched
    # ...and the next clean sweep re-lists the partially-reaped dir
    # and converges (the landed deletes are not repeated, the
    # remainder is removed)
    assert len(wm.clean_stale(retention_seconds=0)) == 1
    assert wm.get(spark) == 20
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 1  # exactly the current payload survives


def test_ledger_merge_handles_map_typed_payload(spark, tmp_path):
    """A ledger payload carrying a MAP column (the reference's
    `additions` shape) used to fail merge at PLAN time — the
    within-batch tie-break hashed all columns and Spark refuses
    xxhash64 on maps (round-11 advisor). Now folded through to_json:
    the merge plans, and a genuine duplicate key still collapses to
    exactly one deterministic row."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    led = IdempotencyLedger(str(tmp_path / "led"), key="k")
    batch = spark.createDataFrame(
        [
            (1, "pending", {"a": "x"}),
            (1, "sent", {"a": "y"}),  # duplicate key, differing map
            (2, "pending", {"b": "z"}),
        ],
        "k bigint, status string, attrs map<string,string>",
    )
    led.merge(spark, batch)
    rows = {r["k"]: r for r in led.load(spark).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["attrs"] == {"b": "z"}
    first_pick = rows[1]["status"]
    assert first_pick in ("pending", "sent")
    # deterministic across re-deliveries: the same batch re-merged
    # picks the same row
    led.merge(spark, batch)
    rows = {r["k"]: r for r in led.load(spark).collect()}
    assert rows[1]["status"] == first_pick


def test_pending_only_probe_is_file_pruned_on_versioned_backend(
    spark, tmp_path
):
    """Post-handoff, pending_only's done-probe must read only the
    ledger files whose footer key-range can contain the batch's keys
    (read_where_in) — O(batch-intersecting files), not O(ledger) —
    while returning exactly the J6 anti-join result. Mirrors the
    band-probe plan pin in test_plan_shapes."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    led = IdempotencyLedger(root, key="k", versioned_threshold_rows=1)
    led.merge(
        spark,
        spark.createDataFrame(
            [(k, "done") for k in range(10)], "k bigint, status string"
        ),
    )
    led.merge(  # crosses the threshold: handoff to the versioned table
        spark,
        spark.createDataFrame([(10, "pending")], "k bigint, status string"),
    )
    assert led.backend() == "versioned"
    led.merge(  # disjoint key range lands in its own file(s)
        spark,
        spark.createDataFrame(
            [(k, "done") for k in range(100, 110)], "k bigint, status string"
        ),
    )
    batch = spark.createDataFrame(
        [(0, "x"), (1, "x"), (10, "x"), (500, "x")], "k bigint, payload string"
    )
    out = led.pending_only(spark, batch)
    # correctness: done keys 0,1 drop; pending 10 and unseen 500 stay
    assert {r["k"] for r in out.collect()} == {10, 500}
    # the probe planned over a strict SUBSET of the ledger's files —
    # the 100-109 file(s) can't contain keys {0,1,10,500}
    all_files = set(led.load(spark).inputFiles())
    probe_files = set(out.inputFiles())
    assert probe_files < all_files
    # past the key bound the probe falls back to the full read — same
    # result, no collect of an unbounded key list
    led.PROBE_MAX_KEYS = 2
    out2 = led.pending_only(spark, batch)
    assert {r["k"] for r in out2.collect()} == {10, 500}
    assert set(out2.inputFiles()) == all_files
