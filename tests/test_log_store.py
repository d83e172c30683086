"""LogStore seam contract — both implementations must satisfy the
same five-primitive behavior the commit protocol builds on
(sources/log_store.py). These are pure-Python tests (no Spark)."""

from __future__ import annotations

import json
import os
import threading

import pytest

from jde_to_datalake_spark.sources.log_store import (
    InMemoryLogStore,
    LogConflict,
    PosixLogStore,
    S3ObjectLogStore,
)


class _FakeClientError(Exception):
    """botocore.ClientError shape: carries response["Error"]["Code"]."""

    def __init__(self, code):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class FakeS3Client:
    """In-repo stand-in for the boto3 S3 client surface
    S3ObjectLogStore uses, with REAL conditional-write semantics:
    put_object(IfNoneMatch="*") is atomic under the lock and answers
    412 PreconditionFailed when the key exists — the exact behavior
    of S3 conditional writes (GA Nov 2024). Listing paginates at 2
    keys per page so the adapter's ContinuationToken loop is
    exercised, and is strongly consistent like real S3 (2020+)."""

    PAGE = 2

    def __init__(self):
        import threading

        self._objects: dict = {}  # (bucket, key) -> bytes
        self._lock = threading.Lock()

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self._lock:
            if IfNoneMatch == "*" and (Bucket, Key) in self._objects:
                raise _FakeClientError("PreconditionFailed")
            self._objects[(Bucket, Key)] = bytes(Body)
        return {}

    def get_object(self, Bucket, Key):
        import io

        with self._lock:
            try:
                data = self._objects[(Bucket, Key)]
            except KeyError:
                raise _FakeClientError("NoSuchKey") from None
        return {"Body": io.BytesIO(data)}

    def delete_object(self, Bucket, Key):
        with self._lock:
            self._objects.pop((Bucket, Key), None)  # S3: 204 either way
        return {}

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        with self._lock:
            keys = sorted(
                k
                for b, k in self._objects
                if b == Bucket and k.startswith(Prefix)
            )
        start = int(ContinuationToken) if ContinuationToken else 0
        page = keys[start : start + self.PAGE]
        truncated = start + self.PAGE < len(keys)
        resp = {
            "Contents": [{"Key": k} for k in page],
            "IsTruncated": truncated,
        }
        if truncated:
            resp["NextContinuationToken"] = str(start + self.PAGE)
        return resp


@pytest.fixture(params=["posix", "memory", "s3"])
def store(request, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root, exist_ok=True)
    if request.param == "memory":
        s = InMemoryLogStore(root)
        yield s
        InMemoryLogStore.reset(root)
    elif request.param == "s3":
        yield S3ObjectLogStore("bkt", "tables/t1", FakeS3Client())
    else:
        yield PosixLogStore(root)


def test_put_read_list_roundtrip(store):
    store.put_if_absent(0, {"a": 1})
    store.put_if_absent(2, {"b": [1, 2]})
    assert store.list_versions() == [0, 2]
    assert store.read(0) == {"a": 1}
    assert store.read(2) == {"b": [1, 2]}


def test_put_if_absent_is_exclusive(store):
    store.put_if_absent(5, {"x": 1})
    with pytest.raises(LogConflict):
        store.put_if_absent(5, {"x": 2})
    assert store.read(5) == {"x": 1}  # loser never overwrites


def test_read_missing_raises_file_not_found(store):
    # the reconcile loop maps this to a retryable "vacuumed mid-check"
    with pytest.raises(FileNotFoundError):
        store.read(99)


def test_replace_and_delete(store):
    store.put_if_absent(1, {"v": "old"})
    store.replace(1, {"v": "new"})
    assert store.read(1) == {"v": "new"}
    store.delete(1)
    assert store.list_versions() == []


def test_records_must_be_json_serializable(store):
    # both stores enforce the wire contract at put time — a record
    # that can't serialize must fail loudly, not lie in memory
    with pytest.raises(TypeError):
        store.put_if_absent(0, {"bad": object()})


def test_read_result_is_not_aliased(store):
    store.put_if_absent(0, {"files": ["a"]})
    r = store.read(0)
    r["files"].append("mutant")
    assert store.read(0) == {"files": ["a"]}


def test_concurrent_put_if_absent_single_winner(store):
    """N threads race one version; exactly one wins — the uniqueness
    guarantee the entire optimistic-concurrency protocol rests on."""
    results = []

    def contender(i):
        try:
            store.put_if_absent(7, {"writer": i})
            results.append(("won", i))
        except LogConflict:
            results.append(("lost", i))

    threads = [
        threading.Thread(target=contender, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wins = [i for tag, i in results if tag == "won"]
    assert len(wins) == 1
    assert store.read(7) == {"writer": wins[0]}


def test_posix_layout_matches_legacy_paths(tmp_path):
    """The POSIX store writes exactly the `_log/<v>.json` layout every
    pre-seam table already has — existing tables keep reading."""
    root = str(tmp_path / "tbl")
    s = PosixLogStore(root)
    s.put_if_absent(3, {"k": 1})
    p = os.path.join(root, "_log", f"{3:011d}.json")
    assert os.path.exists(p)
    with open(p) as fh:
        assert json.load(fh) == {"k": 1}


def test_posix_clean_stale_reclaims_only_old_tmp(tmp_path):
    root = str(tmp_path / "tbl")
    s = PosixLogStore(root)
    s.put_if_absent(0, {})
    stale = os.path.join(s.dir, "_tmp-dead")
    with open(stale, "w") as fh:
        fh.write("{}")
    os.utime(stale, (0, 0))
    fresh = os.path.join(s.dir, "_tmp-live")
    with open(fresh, "w") as fh:
        fh.write("{}")
    s.clean_stale(1.0)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # younger than cutoff: an in-flight writer
    assert s.list_versions() == [0]


def test_memory_store_shared_across_instances(tmp_path):
    """Two store instances on one root see one log — the multi-writer
    visibility model (what separate S3 clients get from the bucket)."""
    root = str(tmp_path / "tbl")
    a, b = InMemoryLogStore(root), InMemoryLogStore(root)
    a.put_if_absent(0, {"w": "a"})
    assert b.list_versions() == [0]
    with pytest.raises(LogConflict):
        b.put_if_absent(0, {"w": "b"})
    InMemoryLogStore.reset(root)


def test_pointer_slot_create_get_set(store):
    from jde_to_datalake_spark.sources.log_store import PointerSlot

    slot = PointerSlot(store)
    assert slot.get() is None
    slot.create({"data_dir": "a"})
    assert slot.get() == {"data_dir": "a"}
    with pytest.raises(LogConflict):
        slot.create({"data_dir": "b"})  # write-once loser
    slot.set({"data_dir": "c"})  # pointer flip
    assert slot.get() == {"data_dir": "c"}


def test_lost_ack_store_lands_then_conflicts(store):
    from jde_to_datalake_spark.sources.log_store import LostAckStore

    s = LostAckStore(store)
    with pytest.raises(LogConflict):
        s.put_if_absent(0, {"k": 1})
    # the put LANDED despite the reported conflict
    assert s.read(0) == {"k": 1}
    assert s.list_versions() == [0]
    # a genuine conflict (occupied version) propagates from the inner
    # store BEFORE any injection — and does not advance the fire count
    with pytest.raises(LogConflict):
        s.put_if_absent(0, {"k": 2})
    assert s.read(0) == {"k": 1}
    # pass-throughs
    s.replace(0, {"k": 3})
    assert s.read(0) == {"k": 3}
    s.delete(0)
    assert s.list_versions() == []


def test_lost_ack_fire_every_n(store):
    from jde_to_datalake_spark.sources.log_store import LostAckStore

    s = LostAckStore(store, fire_every=2)
    s.put_if_absent(0, {})  # 1st put: clean ACK
    with pytest.raises(LogConflict):
        s.put_if_absent(1, {})  # 2nd: lands, ACK lost
    assert s.list_versions() == [0, 1]
