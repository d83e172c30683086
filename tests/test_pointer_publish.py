"""The five non-table atomic-publish points (watermark, idempotency
ledger, schema registry, training-shard manifest, ingest nonce) run
their semantics against EVERY LogStore implementation — POSIX, the
in-memory object-store stand-in, the S3 adapter over the fake
conditional-write client, and a lost-ACK wrapper (every successful
put also reports a conflict). This is the proof that routing them
through the seam (round 10) actually bought portability: the same
behavior, byte for byte, on all four stores."""

from __future__ import annotations

import os
import threading

import pytest

from jde_to_datalake_spark.sources.log_store import (
    InMemoryLogStore,
    LostAckStore,
    PosixLogStore,
    S3ObjectLogStore,
)
from tests.test_log_store import FakeS3Client

STORES = ["posix", "memory", "s3", "lost-ack"]


@pytest.fixture(params=STORES)
def make_store(request, tmp_path):
    """Store factory: multiple calls with one root return handles on
    the SAME underlying log (the separate-writer deployment shape)."""
    s3_buckets: dict = {}

    def make(root: str):
        if request.param == "memory":
            return InMemoryLogStore(root)
        if request.param == "s3":
            client = s3_buckets.setdefault(root, FakeS3Client())
            return S3ObjectLogStore("bkt", root, client)
        if request.param == "lost-ack":
            return LostAckStore(InMemoryLogStore(root))
        return PosixLogStore(root)

    yield make
    if request.param in ("memory", "lost-ack"):
        InMemoryLogStore.reset()


def test_watermark_semantics_on_every_store(spark, tmp_path, make_store):
    from pyspark.sql import functions as F

    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    wm = Watermark(root, store=make_store(root))
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
    wm2 = Watermark(root, store=make_store(root))
    assert wm2.get(spark) == 30
    # superseded data dirs are reclaimed after the flip
    assert wm.advance(spark, spark.createDataFrame([(3, 99)], ["k", "ts"]), "ts") == 99
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 1


def test_ledger_semantics_on_every_store(spark, tmp_path, make_store):
    from pyspark.sql import functions as F

    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    root = str(tmp_path / "led")
    led = IdempotencyLedger(root, key="k", store=make_store(root))
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
    led2 = IdempotencyLedger(root, key="k", store=make_store(root))
    assert led2.exists()
    assert {r["k"] for r in led2.pending_only(spark, batch).collect()} == {2}
    # superseded ledger dirs reclaimed (merge + mark_done = 2 flips)
    datas = [d for d in os.listdir(root) if d.startswith("data-")]
    assert len(datas) == 1


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
    manifest = write_training_shards(
        packs, root, rows_per_shard=5, store=store
    )
    assert manifest["n_shards"] == 2 and manifest["n_rows"] == 10
    assert read_manifest(root, store=make_store(root)) == manifest
    # write-once: a second export loses and leaves no orphan dir
    with pytest.raises(FileExistsError):
        write_training_shards(packs, root, rows_per_shard=5, store=store)
    dirs = [d for d in os.listdir(root) if d.startswith("shards-")]
    assert dirs == [manifest["data_dir"]]
    # reads resolve the manifest's data dir through the SAME seam
    assert read_training_shards(
        spark, root, verify=True, store=make_store(root)
    ).count() == 10
    assert clean_stale_stagings(root, store=make_store(root)) == []
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


def test_data_dir_orphan_reclaim(spark, tmp_path, make_store):
    """A writer that dies between the payload write and the pointer
    flip leaks a data-* orphan; clean_stale reclaims it past the
    retention window while sparing the current payload and any fresh
    (in-flight) dir — the staging-sweep discipline applied to every
    pointer-flip artifact."""
    import time

    from jde_to_datalake_spark.sources.incremental import Watermark

    root = str(tmp_path / "wm")
    wm = Watermark(root, store=make_store(root))
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
    assert wm.clean_stale(retention_seconds=0) == [fresh]
    assert wm.get(spark) == 10
