"""Commit-log storage seam — the five primitives the transaction
protocol needs, behind one interface.

Everything the versioned lake guarantees (optimistic concurrency,
conflict reconciliation, time travel, vacuum) reduces to FIVE
operations on immutable commit records keyed by version:

- ``put_if_absent(version, record)`` — the ONE atomic primitive the
  whole protocol rests on: publish a record if and only if no record
  exists at that version, failing with :class:`LogConflict` otherwise
  (the optimistic-concurrency loser detection).
- ``read(version)`` — one record's JSON (``FileNotFoundError`` when
  vacuumed/absent; callers surface that as a retryable conflict).
- ``list_versions()`` — the retained version numbers.
- ``replace(version, record)`` — atomic in-place overwrite; used ONLY
  by vacuum's checkpoint augmentation (adds derived state to the
  oldest retained record — never changes a record's meaning).
- ``delete(version)`` — vacuum trimming history.

``VersionedTable`` routes ALL log I/O through an injected store
(default :class:`PosixLogStore`), so the commit protocol's guarantees
are exactly the store's guarantees — nothing above this seam touches
``os``.

Object-store mapping (how the same contract deploys off POSIX — see
SCALE.md "Object-store commits"):

- **S3 (2024+ conditional writes)**: ``put_if_absent`` = ``PutObject``
  with ``If-None-Match: *`` (fails 412 when the key exists);
  ``replace`` = plain ``PutObject`` (S3 PUTs are atomic — readers see
  old or new, never torn); ``read``/``list_versions``/``delete`` =
  ``GetObject``/``ListObjectsV2`` (prefix ``_log/``)/``DeleteObject``.
- **GCS**: ``put_if_absent`` = ``x-goog-if-generation-match: 0``;
  rest as above.
- **ABFS**: real rename — Delta's own HDFS/ABFS LogStore recipe
  (write temp, atomic rename-without-overwrite) works verbatim.
- **S3 without conditional writes** (legacy): an external
  coordinator issues the uniqueness guarantee — DynamoDB
  ``PutItem`` with ``attribute_not_exists(version)`` as the
  ``put_if_absent``, the object body written after winning (Delta's
  S3DynamoDBLogStore). The interface is unchanged; only the impl is.

The reference keeps its lake on S3 (s3_helper.py:29-75) with no
transaction log at all; this seam is what makes the engine's commit
protocol deployable there.

:class:`InMemoryLogStore` exists to PROVE the seam: the full
concurrency test matrix (tests/test_conflicts.py) runs against it,
demonstrating the conflict tier has no hidden dependence on POSIX
semantics (hard links, rename atomicity, directory listing).

:class:`PointerSlot` is the thin sibling primitive for the engine's
OTHER atomic-publish points — artifacts that are a single named
record rather than a version-keyed log (the ingest app nonce, the
training-shard manifest, the watermark / idempotency-ledger /
schema-registry pointers). Each of those used to hand-roll its own
POSIX ``os.link`` / ``os.rename``; routing them through the slot
means the whole engine's exactly-once publishes — not just the
table log — are exactly one ``LogStore`` implementation away from
any object store.

:class:`LostAckStore` wraps any store with the object-store
lost-ACK fault: a ``put_if_absent`` that LANDS server-side but
reports :class:`LogConflict` to the caller (an SDK's internal retry
answering 412/conditional-failure from its own earlier write). The
conflict matrix runs once under this injection to prove the
writer-token recovery composes with reconciliation, not just with a
clean append.
"""

from __future__ import annotations

import json
import os
import threading
import uuid


class LogConflict(Exception):
    """A record already exists at the target version — the caller
    lost the optimistic-concurrency race."""


class LogStore:
    """Interface. Implementations must make ``put_if_absent`` atomic
    and ``replace`` reader-atomic (a concurrent ``read`` sees the old
    record or the new one, never a torn byte sequence).

    Retry policy lives in the IMPLEMENTATION (an object-store adapter
    keeps its SDK's transient-error retries): retrying a timed-out
    ``put_if_absent`` is safe even when the first attempt actually
    landed, because every commit record carries a writer token
    (``commit_id``) and the publisher recognizes its own record on
    ``LogConflict`` (versioned.py ambiguous-put recovery) — report the
    conflict honestly, never swallow it."""

    def list_versions(self) -> "list[int]":
        raise NotImplementedError

    def read(self, version: int) -> dict:
        raise NotImplementedError

    def put_if_absent(self, version: int, record: dict) -> None:
        raise NotImplementedError

    def replace(self, version: int, record: dict) -> None:
        raise NotImplementedError

    def delete(self, version: int) -> None:
        raise NotImplementedError

    def clean_stale(self, cutoff_epoch: float) -> None:
        """Reclaim implementation-private debris left by crashed
        publishes (e.g. POSIX temp files) older than ``cutoff_epoch``.
        No-op where the implementation leaves none."""


def _record_name(version: int) -> str:
    return f"{version:011d}.json"


class PosixLogStore(LogStore):
    """Local-filesystem store: records are ``_log/<v>.json`` under the
    table root. ``put_if_absent`` = write a fully-formed temp file,
    then ``os.link`` it into place — link is atomic AND fails with
    ``FileExistsError`` when the target exists, which is exactly the
    loser detection; a reader can never observe a half-written record,
    and a writer crash leaves only a temp file (reclaimed by
    ``clean_stale`` via vacuum). ``replace`` = temp + ``os.replace``
    (atomic on POSIX)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_log")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, _record_name(version))

    def list_versions(self) -> "list[int]":
        out = []
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                try:
                    out.append(int(f[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def read(self, version: int) -> dict:
        with open(self._path(version)) as fh:
            return json.load(fh)

    def _write_tmp(self, record: dict) -> str:
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(record, fh)
        return tmp

    def put_if_absent(self, version: int, record: dict) -> None:
        tmp = self._write_tmp(record)
        try:
            os.link(tmp, self._path(version))
        except FileExistsError:
            raise LogConflict(str(version)) from None
        finally:
            os.remove(tmp)

    def replace(self, version: int, record: dict) -> None:
        tmp = self._write_tmp(record)
        os.replace(tmp, self._path(version))

    def delete(self, version: int) -> None:
        os.remove(self._path(version))

    def clean_stale(self, cutoff_epoch: float) -> None:
        for f in os.listdir(self.dir):
            if f.startswith("_tmp-"):
                p = os.path.join(self.dir, f)
                if os.path.getmtime(p) <= cutoff_epoch:
                    os.remove(p)


class InMemoryLogStore(LogStore):
    """Process-local store used to PROVE the seam (and handy for
    tests): records live in a class-level registry keyed by the
    table's absolute root, so every ``VersionedTable`` instance —
    and every thread — pointed at the same root shares one log, the
    same visibility model an object store gives separate writers.

    Records are stored as SERIALIZED JSON: ``put`` round-trips through
    ``json.dumps`` so a record that would not survive the wire fails
    here exactly as it would on POSIX/S3, and ``read`` hands back a
    fresh deserialization (no aliasing mutable state into callers).
    All operations take one lock — the uniqueness guarantee of
    ``put_if_absent`` is the lock, standing in for S3's
    ``If-None-Match`` / DynamoDB's conditional put."""

    _registry: "dict[str, dict[int, str]]" = {}
    _lock = threading.Lock()

    def __init__(self, root: str):
        self.key = os.path.abspath(root)
        with self._lock:
            self._registry.setdefault(self.key, {})

    def _log(self) -> "dict[int, str]":
        return self._registry[self.key]

    def list_versions(self) -> "list[int]":
        with self._lock:
            return sorted(self._log())

    def read(self, version: int) -> dict:
        with self._lock:
            try:
                raw = self._log()[version]
            except KeyError:
                raise FileNotFoundError(
                    f"in-memory log {self.key}: no record {version}"
                ) from None
        return json.loads(raw)

    def put_if_absent(self, version: int, record: dict) -> None:
        raw = json.dumps(record)
        with self._lock:
            if version in self._log():
                raise LogConflict(str(version))
            self._log()[version] = raw

    def replace(self, version: int, record: dict) -> None:
        raw = json.dumps(record)
        with self._lock:
            self._log()[version] = raw

    def delete(self, version: int) -> None:
        with self._lock:
            self._log().pop(version, None)

    @classmethod
    def reset(cls, root: "str | None" = None) -> None:
        """Drop one root's log (or all) — test isolation."""
        with cls._lock:
            if root is None:
                cls._registry.clear()
            else:
                cls._registry.pop(os.path.abspath(root), None)


class S3ObjectLogStore(LogStore):
    """The object-store adapter the seam was built for: commit records
    as ``s3://<bucket>/<prefix>/_log/<v>.json`` objects, uniqueness
    from S3 conditional writes (``If-None-Match: *`` — GA since
    Nov 2024; GCS: ``x-goog-if-generation-match: 0`` behaves
    identically through the same client shape).

    ``client`` is injected and duck-typed to the boto3 S3 client
    surface this class actually uses (``put_object``, ``get_object``,
    ``delete_object``, ``list_objects_v2`` + paginator) — the
    container has no boto3 and no bucket, so the contract is proven
    against an in-repo fake with real 412 semantics
    (tests/test_log_store.py::FakeS3Client) running the same seam
    contract suite as the POSIX/in-memory stores. With a real boto3
    client the behavior notes are:

    - ``put_if_absent``: ``PutObject`` with ``IfNoneMatch="*"`` —
      the 412 ``PreconditionFailed`` is the loser detection. The
      SDK's internal retry can answer 412 from its OWN landed first
      attempt (lost ACK); that is exactly what the engine's
      writer-token recovery absorbs (versioned.py ambiguous-put
      handling), so the adapter reports the conflict honestly and
      never needs to disambiguate itself.
    - ``replace``: plain ``PutObject`` — S3 PUTs are reader-atomic
      (old or new body, never torn).
    - ``list_versions``: ``ListObjectsV2`` on the ``_log/`` prefix
      (strongly consistent since 2020), paginated.
    - ``clean_stale``: no-op — this adapter writes no temp objects.
    """

    def __init__(self, bucket: str, prefix: str, client):
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.client = client

    def _key(self, version: int) -> str:
        return f"{self.prefix}/_log/{_record_name(version)}"

    def list_versions(self) -> "list[int]":
        out = []
        token: "str | None" = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": f"{self.prefix}/_log/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", []):
                name = obj["Key"].rsplit("/", 1)[-1]
                if name.endswith(".json"):
                    try:
                        out.append(int(name[:-5]))
                    except ValueError:
                        continue
            if not resp.get("IsTruncated"):
                return sorted(out)
            token = resp.get("NextContinuationToken")

    def read(self, version: int) -> dict:
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(version)
            )
        except Exception as e:
            if _s3_error_code(e) in ("NoSuchKey", "404"):
                raise FileNotFoundError(self._key(version)) from None
            raise
        return json.loads(resp["Body"].read())

    def put_if_absent(self, version: int, record: dict) -> None:
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(version),
                Body=json.dumps(record).encode(),
                IfNoneMatch="*",
            )
        except Exception as e:
            if _s3_error_code(e) in ("PreconditionFailed", "412"):
                raise LogConflict(str(version)) from None
            raise

    def replace(self, version: int, record: dict) -> None:
        self.client.put_object(
            Bucket=self.bucket,
            Key=self._key(version),
            Body=json.dumps(record).encode(),
        )

    def delete(self, version: int) -> None:
        self.client.delete_object(
            Bucket=self.bucket, Key=self._key(version)
        )


def _s3_error_code(e: Exception) -> str:
    """The error code of a botocore ClientError (duck-typed: any
    exception carrying the same ``response`` shape matches)."""
    resp = getattr(e, "response", None)
    if isinstance(resp, dict):
        err = resp.get("Error", {})
        return str(err.get("Code", ""))
    return ""


class PointerSlot:
    """A single named atomic record on a :class:`LogStore` — the
    publish primitive shared by every non-table artifact:

    - ``create(record)`` — publish once, exclusively
      (:class:`LogConflict` when a record already exists: the caller
      lost a write-once race, e.g. two training-shard exports).
    - ``get()`` — the current record, or ``None`` before the first
      ``create``/``set``.
    - ``set(record)`` — reader-atomic overwrite (pointer flips: the
      watermark / ledger data-dir indirection — data files land under
      unique final names, then ONE record flip makes them current,
      which is the object-store replacement for directory rename).

    The slot is version ``0`` of an ordinary log, so every store
    implementation (POSIX link, S3 If-None-Match, DynamoDB
    conditional put, the in-memory prover) serves it unchanged.
    """

    SLOT = 0

    def __init__(self, store: LogStore):
        self.store = store

    def create(self, record: dict) -> None:
        self.store.put_if_absent(self.SLOT, record)

    def get(self) -> "dict | None":
        try:
            return self.store.read(self.SLOT)
        except FileNotFoundError:
            return None

    def set(self, record: dict) -> None:
        self.store.replace(self.SLOT, record)


class DataDirPointer:
    """Pointer-flip publish for directory-shaped payloads (the
    watermark's single-row parquet, the idempotency ledger's table):
    ``flip(write_fn)`` writes the new payload under a fresh unique
    ``data-<uuid>`` dir (write-direct-to-final-name — no rename on
    the data plane), atomically re-points the slot at it, then reaps
    the superseded dir best-effort. Readers resolve ``current_path``
    first, so they see the old payload or the new one, never a mix.

    ``require_migrated`` raises on a PRE-seam layout (payload files
    directly under the root with no pointer record): silently
    treating legacy data as "empty" would, e.g., re-dispatch every
    transaction an old ledger had marked done."""

    def __init__(self, root: str, store: LogStore):
        self.root = root
        self.slot = PointerSlot(store)

    def current(self) -> "str | None":
        rec = self.slot.get()
        return rec["data_dir"] if rec else None

    def current_path(self) -> "str | None":
        d = self.current()
        return None if d is None else os.path.join(self.root, d)

    def require_migrated(self, what: str) -> None:
        if self.slot.get() is not None:
            return
        try:
            legacy = any(
                f.endswith(".parquet") for f in os.listdir(self.root)
            )
        except OSError:
            return
        if legacy:
            raise RuntimeError(
                f"{self.root}: found a pre-pointer {what} layout "
                "(parquet files at the root, no _log pointer). "
                "Refusing to treat existing data as empty — migrate "
                "by moving the parquet files into a data-<uuid> "
                "subdirectory and publishing a pointer record "
                '{"data_dir": "<that name>"} at log version 0.'
            )

    def flip(self, write_fn) -> str:
        """``write_fn(abs_path)`` materializes the new payload at the
        given (not-yet-existing) directory path; then one record flip
        publishes it."""
        old = self.current()
        name = f"data-{uuid.uuid4().hex}"
        write_fn(os.path.join(self.root, name))
        self.slot.set({"data_dir": name})
        if old is not None:
            import shutil

            shutil.rmtree(
                os.path.join(self.root, old), ignore_errors=True
            )
        return name

    def clean_stale(self, retention_seconds: float = 3600.0) -> list:
        """Reclaim ``data-*`` orphans left by writers that died between
        the payload write and the pointer flip — the same discipline
        as the versioned table's staging sweep: unreferenced dirs are
        deleted only past the retention window (judged on the NEWEST
        mtime inside, so an in-flight flip is never reclaimed), and
        the pointer is re-read right before each delete so a flip
        landing mid-sweep keeps its payload. Returns removed paths."""
        import shutil
        import time

        removed = []
        if not os.path.isdir(self.root):
            return removed
        cutoff = time.time() - retention_seconds
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("data-"):
                continue
            p = os.path.join(self.root, name)
            if not os.path.isdir(p):
                continue
            try:
                newest = os.path.getmtime(p)
                for dirpath, _dirs, files in os.walk(p):
                    newest = max(
                        newest,
                        os.path.getmtime(dirpath),
                        *(
                            os.path.getmtime(os.path.join(dirpath, f))
                            for f in files
                        ),
                    )
            except OSError:
                continue  # entries moved mid-walk: an active writer
            if newest > cutoff:
                continue
            if self.current() == name:  # re-read: authoritative
                continue
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
        return removed


class LostAckStore(LogStore):
    """Fault-injection wrapper: every ``put_if_absent`` LANDS in the
    wrapped store, then reports :class:`LogConflict` anyway — the
    object-store lost-ACK failure mode (an adapter's internal retry
    answering "already exists" from its own earlier successful
    write). ``fire_every`` narrows the fault to every Nth put
    (default 1 = every put); all other primitives pass through.

    With writer-token recovery (versioned.py ambiguous-put handling)
    every publish must still complete exactly-once under this store —
    tests/test_conflicts.py runs its matrix once with it wrapped
    around each real store.
    """

    def __init__(self, inner: LogStore, fire_every: int = 1):
        self.inner = inner
        self.fire_every = fire_every
        self._puts = 0

    def list_versions(self) -> "list[int]":
        return self.inner.list_versions()

    def read(self, version: int) -> dict:
        return self.inner.read(version)

    def put_if_absent(self, version: int, record: dict) -> None:
        self.inner.put_if_absent(version, record)
        self._puts += 1
        if self._puts % self.fire_every == 0:
            raise LogConflict(f"{version} (injected lost ACK)")

    def replace(self, version: int, record: dict) -> None:
        self.inner.replace(version, record)

    def delete(self, version: int) -> None:
        self.inner.delete(version)

    def clean_stale(self, cutoff_epoch: float) -> None:
        self.inner.clean_stale(cutoff_epoch)
