"""VersionedTable as a Structured Streaming SOURCE (Delta's
"table as stream source" re-expressed with the Spark 4 Python Data
Source streaming API).

The reference's ingestion loops POLL: re-fetch a lookback window each
cycle and filter against the uniqueness ledger
(dag_bakery_system_to_jde.py:38-59,107-109 — the lookback is a guess,
and every cycle re-reads data it already processed). A versioned table
makes polling unnecessary: the manifest log IS an exact change
cursor. This source streams a table's APPENDED ROWS with offsets =
table versions:

- ``initialOffset`` starts before the first commit (or at
  ``starting_version``);
- each micro-batch covers a (start, end] version span; its input
  partitions are exactly the data FILES added in that span (one task
  per file — executor-parallel, no driver data path), enumerated
  per-version so a file added and later compacted away inside one
  span is neither missed nor double-read;
- replay after a crash re-plans the same (start, end] span from the
  immutable manifests — deterministic by construction.

Semantics (Delta's rules, same trade-offs):
- append commits (previous files all carried forward) stream their
  new files' rows;
- deletion-vector growth (delete_where) adds no data files and is
  silently NOT streamed — this is the INSERT feed; row-level deletes
  travel through ``read_changes`` (the CDF), not the stream;
- a rewriting commit (merge/compact touched files) RAISES by default
  — rewritten files mix old and new rows, so streaming them would
  duplicate. ``ignore_changes=true`` opts into Delta's documented
  behavior: rewritten files are re-emitted whole (downstream must
  dedupe, e.g. the ingestion loop's idempotent MERGE).

CHANGE-FEED MODE (``read_change_feed=true`` / ``versioned_stream(...,
change_feed=True)``) streams the table's row-level CDC instead of its
appends — Delta's ``readChangeFeed`` as a stream. Every commit kind is
expressible: appends emit inserts; merge/compact rewrites emit
delete+insert pairs (byte-identical carried rows cancel in a
sign-fold); ``delete_where`` deletion vectors emit exactly the newly
tombstoned rows as deletes; ``restore`` emits the rollback (departed
files' live rows as deletes, returning files' as inserts, and REMOVED
deletion vectors as re-inserts). Rows carry ``_change_type``
('insert'|'delete') and ``_commit_version``; the per-commit tasks are
still one per changed FILE (or changed DV sidecar), executor-parallel.
Downstream, ``plans.incremental_view.maintain_view_stream`` folds this
feed into a materialized count/sum aggregate exactly-once.

Usage::

    spark.dataSource.register(VersionedTableDataSource)
    (spark.readStream.format("versioned_table")
        .option("path", table.root).load())

or ``versioned_stream(spark, table)`` which does both.
"""

from __future__ import annotations

import itertools
import os
from typing import Iterator

from dataclasses import dataclass
from typing import Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from jde_to_datalake_spark.sources.versioned import VersionedTable

# arrow -> Spark DDL for schema sniffing (common lake types; explicit
# .schema(...) overrides for anything richer)
_ARROW_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _arrow_field_ddl(t) -> str:
    import pyarrow as pa

    s = str(t)
    if s in _ARROW_DDL:
        return _ARROW_DDL[s]
    if pa.types.is_timestamp(t):
        return "timestamp_ntz" if t.tz is None else "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_field_ddl(t.value_type)}>"
    raise ValueError(
        f"versioned_table source cannot map arrow type {s}; "
        "pass an explicit .schema(...)"
    )


def sniff_schema_ddl(root: str) -> str:
    """DDL of the table's CURRENT LOGICAL schema, from one parquet
    footer of the newest manifest (metadata read, no scan) — dropped
    columns excluded, renamed ones under their logical name."""
    import pyarrow.parquet as pq

    t = VersionedTable(root)
    v = t.latest_version()
    if v is None:
        raise FileNotFoundError(f"{root}: no commits yet — nothing to sniff")
    files = t._manifest(v)["files"]
    if not files:
        raise FileNotFoundError(f"{root}: version {v} lists no files")
    sch = pq.read_schema(os.path.join(root, files[-1]))
    inv = {p: l for l, p in t.column_renames(v).items()}
    dropped = set(t.dropped_columns(v))
    parts = [
        f"{inv.get(f.name, f.name)} {_arrow_field_ddl(f.type)}"
        for f in sch
        if f.name not in dropped
    ]
    # hive partition columns live in directory names, not footers —
    # their types are PINNED in the manifest (partition_types; set at
    # layout establishment, derived from all files' path values for
    # legacy manifests), so the stream schema matches the batch
    # basePath scan byte-for-byte instead of each surface inferring
    # its own width (the round-8 int-vs-bigint drift)
    ptypes = t.partition_types(v)
    for c in t.partitioned_by(v):
        parts.append(f"{c} {ptypes.get(c, 'string')}")
    return ", ".join(parts)


#: the change-feed meta columns appended to the table schema in CDF
#: mode (Delta's readChangeFeed shape, minus _commit_timestamp — the
#: manifest's committed_at is wall-clock, not a change identity)
CDF_META_DDL = "_change_type string, _commit_version bigint"
_CDF_META_COLS = ("_change_type", "_commit_version")


class _AddedFilePartition(InputPartition):
    def __init__(self, root: str, file: str):
        self.root = root
        self.file = file


class _CdfPartition(InputPartition):
    """One change-feed task: a data file inserted/deleted at
    ``version``, or a deletion-vector sidecar added/removed at
    ``version`` (kind in insert_file | delete_file | dv_new |
    dv_gone). The task re-reads the two neighboring manifests itself
    (small JSON) instead of shipping file lists through the plan."""

    def __init__(self, root: str, version: int, kind: str, name: str):
        self.root = root
        self.version = version
        self.kind = kind
        self.name = name


def _emit_arrow(t, schema_: StructType, meta: "dict | None"):
    """Hand Spark the arrow table cast/reordered to the DECLARED
    schema's arrow types (files may differ: large_string vs string,
    evolved columns absent -> typed nulls), with optional CONSTANT
    meta columns (the CDF _change_type/_commit_version). Any cast the
    file genuinely can't satisfy falls back to the row path, whose
    per-value Python conversion is laxer."""
    import pyarrow as pa

    meta = meta or {}
    cols = [f.name for f in schema_.fields]
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(schema_)
        arrays = []
        for f in target:
            if f.name in meta:
                arrays.append(
                    pa.repeat(pa.scalar(meta[f.name], type=f.type), t.num_rows)
                )
            elif f.name in t.column_names:
                arrays.append(t.column(f.name).cast(f.type))
            else:
                arrays.append(pa.nulls(t.num_rows, type=f.type))
        return iter(pa.table(arrays, schema=target).to_batches())
    except Exception:
        return iter(
            tuple(
                meta[c] if c in meta else rec.get(c) for c in cols
            )
            for rec in t.to_pylist()
        )


#: executor-side table handles, keyed by root. Spark reuses Python
#: worker processes across tasks, and a VersionedTable caches the
#: reconstructed states it reads — sharing one instance per root means
#: a change-feed micro-batch with many tasks on one worker
#: reconstructs each (root, version) state once, not once per task.
#: Safe because _read_cdf only reads PINNED versions (immutable once
#: published) — never latest_version().
_WORKER_TABLES: "dict[str, VersionedTable]" = {}


def _worker_table(root: str) -> VersionedTable:
    t = _WORKER_TABLES.get(root)
    if t is None:
        if len(_WORKER_TABLES) >= 8:
            _WORKER_TABLES.pop(next(iter(_WORKER_TABLES)))
        t = _WORKER_TABLES[root] = VersionedTable(root)
    return t


def _idx(positions: list):
    """Typed take-indices: a plain empty Python list infers a
    NULL-typed Arrow array and ``Table.take`` has no (T, null) kernel
    — a file whose every row is tombstoned (delete-all then overwrite)
    must yield an empty emission, not ArrowNotImplementedError
    (caught by the partitioned op-sequence property test, round 9)."""
    import pyarrow as pa

    return pa.array(positions, type=pa.int64())


def _dv_positions(root: str, manifest: dict, basename: str) -> set:
    """Tombstoned row positions for one data file under a manifest's
    deletion vectors. Sidecars whose cached ``dv_refs`` entry excludes
    the file are skipped without a read; refs-less sidecars are read
    whole (conservative)."""
    import pyarrow.parquet as pq

    pos: set = set()
    refs = manifest.get("dv_refs", {})
    for s in manifest.get("dv_files", []):
        r = refs.get(s)
        if r is not None and basename not in {
            os.path.basename(x) for x in r
        }:
            continue
        t = pq.read_table(
            os.path.join(root, s), columns=["file", "pos"]
        )
        pos.update(
            p
            for f, p in zip(
                t.column("file").to_pylist(), t.column("pos").to_pylist()
            )
            if f == basename
        )
    return pos


def _span_delta(table: VersionedTable, v: int) -> dict:
    """A span version's per-commit change summary
    (``VersionedTable.commit_delta`` — one O(changed files) record
    read), or the vacuumed-offset guidance — ANY version inside a
    planned span may have been vacuumed (not just the start: keep_last
    trims from the oldest up)."""
    try:
        return table.commit_delta(v)
    except FileNotFoundError:
        raise RuntimeError(
            f"versioned_table stream: version {v} of {table.root} "
            "has been vacuumed away — the checkpointed offset predates "
            "the table's retention window. Restart from a fresh "
            "checkpoint (full re-read) or raise vacuum keep_last on "
            "the source table above the stream's maximum lag."
        ) from None


def _added_per_version(
    table: VersionedTable, v_from: int, v_to: int, ignore_changes: bool
) -> "list[str]":
    """Data files appended in (v_from, v_to], enumerated one version
    step at a time so intra-span compaction cannot double-count, in
    deterministic (version, manifest-order) sequence. Each step reads
    the commit's DELTA record — planning cost is O(span x changed
    files), never O(span x table files)."""
    added: list[str] = []
    added_set: set = set()
    for v in range(v_from + 1, v_to + 1):
        d = _span_delta(table, v)
        if d["remove"] and not ignore_changes:
            raise RuntimeError(
                f"versioned_table stream: version {v} of {table.root} "
                "rewrote or dropped data files (merge/compact/"
                "overwrite); a rewritten file mixes old and new rows. "
                "Set ignore_changes=true to re-emit rewritten files "
                "whole (downstream must dedupe), or stream from an "
                "append-only table."
            )
        # a file added in this step and re-added in a LATER step
        # (restore) must not re-enter the plan twice
        for f in d["add"]:
            if f not in added_set:
                added.append(f)
                added_set.add(f)
    return added


def _cdf_partitions(
    table: VersionedTable, v_from: int, v_to: int
) -> "list[_CdfPartition]":
    """Change-feed tasks for the span (v_from, v_to], one version step
    at a time: every data file entering or leaving the manifest, and
    every deletion-vector sidecar added or removed — straight off each
    commit's DELTA record (O(span x changed), never O(span x files)).
    Rewrites need no guard here — a merge/compact surfaces as
    delete_file+insert_file pairs whose unchanged rows cancel in any
    sign-folding consumer (exactly batch ``read_changes``' file-level
    truth, per commit)."""
    parts: list[_CdfPartition] = []
    for v in range(v_from + 1, v_to + 1):
        d = _span_delta(table, v)
        for f in d["add"]:
            parts.append(_CdfPartition(table.root, v, "insert_file", f))
        for f in d["remove"]:
            parts.append(_CdfPartition(table.root, v, "delete_file", f))
        for s in d["dv_add"]:
            parts.append(_CdfPartition(table.root, v, "dv_new", s))
        for s in d["dv_remove"]:
            parts.append(_CdfPartition(table.root, v, "dv_gone", s))
    return parts


def pace_span(
    table: VersionedTable,
    v_from: int,
    v_to: int,
    max_files: int,
    change_feed: bool,
) -> int:
    """Largest end version in (v_from, v_to] whose span stays at or
    under ``max_files`` CHANGED files (added files; in change-feed mode
    also departed files and DV sidecar churn) — the admission budget of
    Delta's maxFilesPerTrigger. Always admits at least one version, so
    a single huge commit still flows (as one batch). Counts come from
    each commit's DELTA record: O(span x changed), never
    O(span x table files)."""
    total = 0
    end = v_from
    for v in range(v_from + 1, v_to + 1):
        d = table.commit_delta(v)
        n = len(d["add"])
        if change_feed:
            n += len(d["remove"]) + len(d["dv_add"]) + len(d["dv_remove"])
        if total + n > max_files and total > 0:
            break
        total += n
        end = v
    return end


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        root = options.get("path")
        if not root:
            raise ValueError("versioned_table source requires .option('path', ...)")
        self.root = root
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        self.change_feed = (
            str(options.get("read_change_feed", "false")).lower() == "true"
        )
        self.starting_version = int(options.get("starting_version", -1))
        self.max_files = int(options.get("max_files_per_trigger", 0)) or None
        # hard END ceiling for this run (chunked catch-up): versions
        # beyond it are left for the next availableNow invocation —
        # the driver-side bound the Python source API's missing
        # ReadLimit hook cannot provide. -1 = unbounded.
        self.ending_version = int(options.get("ending_version", -1))
        # admission-control cursor: the last batch end this reader
        # planned, so latestOffset can bound the NEXT batch's span.
        # None until initialOffset/partitions runs — the one batch
        # after a restart that replays ahead of any partitions() call
        # is unbounded (the Python source API has no ReadLimit hook).
        self._paced_from: "int | None" = None
        self._map_cache: "tuple[dict, set] | None" = None

    def _table(self) -> VersionedTable:
        return VersionedTable(self.root)

    def initialOffset(self) -> dict:
        self._paced_from = self.starting_version
        return {"version": self.starting_version}

    def _pace(self, v_from: int, v_to: int) -> int:
        """Largest end version in (v_from, v_to] whose span stays at or
        under ``max_files_per_trigger`` CHANGED files (added files; in
        change-feed mode also departed files and DV sidecar churn) —
        Delta's maxFilesPerTrigger. Always admits at least one version,
        so a single huge commit still flows (as one batch). Counts
        come from each commit's DELTA record (O(span x changed)). Any
        manifest problem defers to partitions(), whose error message
        carries the vacuum guidance."""
        try:
            return pace_span(
                self._table(), v_from, v_to, self.max_files,
                self.change_feed,
            )
        except FileNotFoundError:
            return v_to

    def latestOffset(self) -> dict:
        v = self._table().latest_version()
        v = self.starting_version if v is None else v
        if 0 <= self.ending_version < v:
            # chunked catch-up ceiling; an ending_version at or below
            # the checkpointed offset simply yields an empty run
            v = self.ending_version
        if (
            self.max_files is not None
            and self._paced_from is not None
            and v > self._paced_from
        ):
            v = self._pace(self._paced_from, v)
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        v_from, v_to = int(start["version"]), int(end["version"])
        self._paced_from = v_to
        if self.change_feed:
            parts = (
                _cdf_partitions(self._table(), v_from, v_to)
                if v_to > v_from
                else []
            )
            return parts or [_AddedFilePartition(self.root, "")]
        files = (
            _added_per_version(
                self._table(), v_from, v_to, self.ignore_changes
            )
            if v_to > v_from
            else []
        )
        if not files:
            # a DV-only / empty span still needs one (empty) partition
            # — the engine requires a non-empty plan per micro-batch
            return [_AddedFilePartition(self.root, "")]
        return [_AddedFilePartition(self.root, f) for f in files]

    def _data_cols(self) -> list[str]:
        return [
            f.name
            for f in self.schema_.fields
            if f.name not in _CDF_META_COLS
        ]

    def _mapping(self) -> "tuple[dict, set]":
        """(logical->physical renames, dropped physical names) at the
        table's CURRENT version, cached for the reader's lifetime — a
        rename committed mid-stream applies on restart (the same
        pin-a-schema guidance as any schema evolution)."""
        if self._map_cache is None:
            t = self._table()
            v = t.latest_version()
            self._map_cache = (
                t.column_renames(v) if v is not None else {},
                set(t.dropped_columns(v)) if v is not None else set(),
            )
        return self._map_cache

    def _read_file(self, root: str, name: str):
        """One data file projected to the declared DATA columns
        (schema-evolved files: requesting an absent column raises in
        pyarrow, so project the intersection; absent ones become typed
        nulls at emit, extra ones are ignored — parquet-by-name).
        Declared names are LOGICAL: the projection asks for their
        physical storage names and renames back after the read.

        Hive-partitioned tables: a partition column lives in the
        file's ``k=v`` directory path, not its bytes — declared
        columns absent from the footer but present in the path are
        appended as constant Arrow columns (the pyarrow twin of
        Spark's basePath discovery)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from jde_to_datalake_spark.sources.versioned import (
            _path_partitions,
        )

        renames, dropped = self._mapping()
        path = os.path.join(root, name)
        present = set(pq.read_schema(path).names) - dropped
        want = [
            (c, renames.get(c, c))
            for c in self._data_cols()
            if renames.get(c, c) in present
        ]
        t = pq.read_table(path, columns=[p for _, p in want])
        if any(c != p for c, p in want):
            back = {p: c for c, p in want}
            t = t.rename_columns([back.get(n, n) for n in t.column_names])
        pvals = _path_partitions(os.path.relpath(path, root))
        if pvals:
            have = set(t.column_names)
            for c in self._data_cols():
                if c not in have and c in pvals and pvals[c] is not None:
                    t = t.append_column(
                        c, pa.array([pvals[c]] * t.num_rows)
                    )
        return t

    def read(self, partition) -> Iterator[tuple]:
        if isinstance(partition, _CdfPartition):
            return self._read_cdf(partition)
        if not partition.file:
            return iter([])
        t = self._read_file(partition.root, partition.file)
        # fast path: hand Spark Arrow RecordBatches (zero per-row
        # Python objects; the file's buffers flow through)
        return _emit_arrow(t, self.schema_, None)

    # -- change-feed read --------------------------------------------------
    def _read_cdf(self, p: _CdfPartition) -> Iterator:
        table = _worker_table(p.root)
        m_cur = table._manifest(p.version)
        m_prev = (
            table._manifest(p.version - 1)
            if p.version > 0
            else {"files": [], "dv_files": []}
        )

        def emit(t, change_type: str):
            return _emit_arrow(
                t,
                self.schema_,
                {
                    "_change_type": change_type,
                    "_commit_version": p.version,
                },
            )

        if p.kind == "insert_file":
            # rows live AT version p.version: a file (re-)entering the
            # manifest together with deletion vectors that tombstone
            # some of its rows (RESTORE) must not resurrect them
            t = self._read_file(p.root, p.name)
            skip = _dv_positions(p.root, m_cur, os.path.basename(p.name))
            if skip:
                t = t.take(_idx([i for i in range(t.num_rows) if i not in skip]))
            return emit(t, "insert")
        if p.kind == "delete_file":
            # rows that were LIVE at version-1 stop existing here;
            # already-tombstoned positions were never alive to delete
            t = self._read_file(p.root, p.name)
            skip = _dv_positions(p.root, m_prev, os.path.basename(p.name))
            if skip:
                t = t.take(_idx([i for i in range(t.num_rows) if i not in skip]))
            return emit(t, "delete")

        # a deletion-vector sidecar entering (dv_new -> row deletes) or
        # leaving (dv_gone -> row re-inserts, the RESTORE rollback of a
        # delete) the manifest. Only files present in BOTH manifests
        # are handled here: rows of files entering/leaving in the same
        # step are already emitted net-of-DV by the file tasks above.
        import pyarrow.parquet as pq

        sidecar = pq.read_table(
            os.path.join(p.root, p.name), columns=["file", "pos"]
        )
        by_file: dict[str, list[int]] = {}
        for f, pos in zip(
            sidecar.column("file").to_pylist(),
            sidecar.column("pos").to_pylist(),
        ):
            by_file.setdefault(f, []).append(pos)
        old_names = {os.path.basename(f) for f in m_prev["files"]}
        cur_map = {os.path.basename(f): f for f in m_cur["files"]}
        guard_m = m_prev if p.kind == "dv_new" else m_cur
        change = "delete" if p.kind == "dv_new" else "insert"
        outs = []
        for b, plist in sorted(by_file.items()):
            if b not in cur_map or b not in old_names:
                continue
            # dv_new: a row some OTHER (older) sidecar already
            # tombstoned was not alive — nothing to delete; dv_gone: a
            # row still tombstoned by a REMAINING sidecar stays dead
            guarded = _dv_positions(p.root, guard_m, b)
            take = sorted(set(plist) - guarded)
            if not take:
                continue
            t = self._read_file(p.root, cur_map[b]).take(_idx(take))
            outs.append(emit(t, change))
        return itertools.chain.from_iterable(outs)

    def commit(self, end: dict) -> None:
        pass  # manifests are the source of truth; nothing to ack

    def stop(self) -> None:
        pass


class VersionedTableDataSource(DataSource):
    """``spark.readStream.format("versioned_table")
    .option("path", root).load()`` — offsets are table versions, one
    input partition per appended data file."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("versioned_table source requires .option('path', ...)")
        ddl = sniff_schema_ddl(root)
        if (
            str(self.options.get("read_change_feed", "false")).lower()
            == "true"
        ):
            ddl = f"{ddl}, {CDF_META_DDL}"
        return ddl

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VersionedTableStreamReader(schema, self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return VersionedTableStreamWriter(schema, self.options, overwrite)


@dataclass
class _StagedSinkFile(WriterCommitMessage):
    """One task's staged output: the file it wrote, or None when the
    partition was empty."""

    name: Optional[str]


class VersionedTableStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("versioned_table").option("path", root)``
    — the versioned table as a NATIVE streaming sink, one atomic table
    version per micro-batch.

    The write follows the table's own write-audit-publish discipline
    split across the cluster: each TASK stages one parquet file into
    the table root (unreferenced — invisible to readers, reclaimable
    by ``vacuum`` if the batch dies), and the DRIVER's ``commit``
    publishes exactly the staged files as one table version (append
    in update/append output modes; a full replace when Spark signals
    truncation — ``outputMode("complete")``). A failed batch's
    ``abort`` deletes its staged files; a torn write can never
    surface.

    ``.option("txn_app_id", <id>)`` makes the sink EXACTLY-ONCE: the
    commit is stamped (app_id, batchId) and a re-delivered batch
    (crash between sink commit and checkpoint advance) is discarded
    instead of re-applied — the same txn contract as
    ``derive_batch_writer``/``scd2_batch_writer``, here for plain
    appends with no foreachBatch wrapper at all. Bind the id to the
    checkpoint lineage (``streaming.ingest.checkpoint_app_id``).

    Write-contract parity with ``commit()``: when the target table
    declares CHECK constraints, generated columns, or an active
    column mapping, the driver re-reads the staged bytes and routes
    them through the SAME validate/fill/translate pipeline every
    other write path uses (one extra staged pass, only when such
    metadata exists — a plain table publishes the task files
    directly). Timestamps: Spark's python write worker hands tasks
    naive LOCAL-time datetimes for TIMESTAMP columns; the task
    re-attaches the host zone before Arrow encodes them as UTC
    micros, so the stored instant is exact on any host timezone.
    Empty partitions stage nothing; an all-empty batch commits
    nothing (no empty versions).

    Throughput bound (honest): the Python ``DataSourceStreamWriter``
    API hands ``write()`` a ROW iterator, so each task pays a per-row
    Python encode before the Arrow/parquet write — chunked and
    heap-bounded, but roughly an order of magnitude slower per byte
    than the JVM parquet write ``foreach_batch_writer`` /
    ``derive_table`` use. Route BULK ingest through those (same
    txn-stamped exactly-once); this sink is the no-wrapper
    statement-parity surface for moderate-rate streams.
    """

    #: rows per Arrow record batch inside one task's staged file —
    #: bounds executor memory to O(chunk), not O(partition)
    CHUNK_ROWS: int = 10_000

    def __init__(
        self, schema: StructType, options: dict, overwrite: bool = False
    ):
        self.root = options.get("path")
        if not self.root:
            raise ValueError(
                "versioned_table sink requires .option('path', ...)"
            )
        # '' (misconfigured env var) must not half-enable the txn
        # branch: one normalized predicate for stamp AND check
        self.app_id = options.get("txn_app_id") or None
        self.schema = schema
        self.overwrite = bool(overwrite)
        # instantiating the table creates the log dir, so executor
        # tasks (which only ever write plain files) find the root
        VersionedTable(self.root)

    def write(self, iterator) -> _StagedSinkFile:
        import datetime as _dt
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import TimestampType

        arrow_schema = to_arrow_schema(self.schema)
        # TIMESTAMP (ltz) columns arrive as naive LOCAL datetimes
        # (the worker does value.astimezone().replace(tzinfo=None));
        # re-attach the local zone so the tz-aware arrow field stores
        # the true instant instead of local-wall-clock-as-UTC
        ts_fields = [
            f.name
            for f in self.schema.fields
            if isinstance(f.dataType, TimestampType)
        ]

        def _fix(row) -> dict:
            d = row.asDict(recursive=True)
            for c in ts_fields:
                v = d.get(c)
                if v is not None and v.tzinfo is None:
                    # arrow's from_pylist IGNORES tzinfo and takes the
                    # wall-clock fields verbatim, so the value must be
                    # rewritten to its UTC wall clock, not just made
                    # timezone-aware
                    d[c] = v.astimezone(_dt.timezone.utc)
            return d

        name = f"part-{_uuid.uuid4().hex}.parquet"
        path = os.path.join(self.root, name)
        writer = None
        wrote = 0
        try:
            while True:
                chunk = list(itertools.islice(iterator, self.CHUNK_ROWS))
                if not chunk:
                    break
                batch = pa.RecordBatch.from_pylist(
                    [_fix(r) for r in chunk], schema=arrow_schema
                )
                if writer is None:
                    writer = pq.ParquetWriter(path, arrow_schema)
                writer.write_batch(batch)
                wrote += len(chunk)
        finally:
            if writer is not None:
                writer.close()
        if not wrote:
            return _StagedSinkFile(None)
        return _StagedSinkFile(name)

    def commit(self, messages, batchId: int) -> None:
        t = VersionedTable(self.root)
        staged = [m.name for m in messages if m is not None and m.name]
        if self.app_id is not None:
            last = t.last_txn_version(self.app_id)
            if last is not None and last >= batchId:
                t.discard(staged)  # re-delivered batch: already applied
                return
        if not staged:
            return  # empty micro-batch: no empty version
        mode = "overwrite" if self.overwrite else "append"
        txn = (self.app_id, batchId) if self.app_id else None
        prev = t.latest_version()
        needs_pipeline = prev is not None and (
            t.constraints(prev)
            or t.generated_columns(prev)
            or t.column_renames(prev)
            or t.dropped_columns(prev)
            or t.partitioned_by(prev)
        )
        if needs_pipeline:
            # tables with write contracts, an active column mapping,
            # or a hive partition layout (task files are flat — the
            # re-commit lays them into k=v directories) take the same
            # validate/fill/translate path as commit(): re-read the
            # staged bytes, run the pipeline, publish the RESULT, and
            # drop the raw task files
            from pyspark.sql import SparkSession

            spark = (
                SparkSession.getActiveSession()
                or SparkSession.builder.getOrCreate()
            )
            df = t.read_staged(spark, staged)
            try:
                t.commit(df, mode=mode, txn=txn, annotations={
                    "operation": "STREAMING UPDATE",
                })
            finally:
                t.discard(staged)
            return
        t.publish(
            staged,
            mode=mode,
            txn=txn,
            annotations={"operation": "STREAMING UPDATE"},
        )

    def abort(self, messages, batchId: int) -> None:
        VersionedTable(self.root).discard(
            [m.name for m in messages if m is not None and m.name]
        )


def versioned_stream(
    spark,
    table: VersionedTable,
    schema=None,
    change_feed: bool = False,
    **options,
):
    """Register the source (idempotent) and open ``table`` as a
    streaming DataFrame.

    ``schema`` (DDL string or StructType) pins the projection
    explicitly; without it the CURRENT table schema is sniffed at
    query start. A restarted query re-sniffs — on a schema-evolved
    table pass the schema explicitly so the sink sees one stable
    shape across restarts (absent columns read as NULL, extra ones
    are ignored).

    ``change_feed=True`` streams the table's CHANGE FEED instead of
    its appends (Delta's ``readChangeFeed`` as a stream): every commit
    — append, merge, delete_where, compact, restore — surfaces as
    row-level ``_change_type`` insert/delete events stamped with
    ``_commit_version``; rewritten-but-identical rows arrive as
    delete+insert pairs that cancel in any sign-folding consumer
    (``plans.incremental_view``). The two meta columns are appended to
    an explicit ``schema`` automatically when absent.

    ``max_files_per_trigger=N`` (Delta's knob) paces a long-lived
    stream: each steady-state micro-batch admits whole versions up to
    N changed files (in change-feed mode: added + departed + DV
    sidecar churn), so a consumer stalled behind a 10k-commit backlog
    catches up in bounded batches instead of one giant plan. Scope of
    the bound: the FIRST batch of each run is unbounded — the Python
    source API has no ReadLimit hook, so the cursor engages once the
    first batch is planned; ``availableNow`` snapshots its end offset
    at start and is therefore never paced."""
    if change_feed:
        options.setdefault("read_change_feed", "true")
    # ``ending_version=N`` clamps the run's end offset — the chunked
    # catch-up primitive (catch_up_chunked): the Python source API has
    # no ReadLimit hook, so a run's FIRST batch (and all of an
    # availableNow run) ignores max_files_per_trigger; a stepped end
    # ceiling across several availableNow runs bounds each one.
    if (
        str(options.get("read_change_feed", "false")).lower() == "true"
        and schema is not None
    ):
        if isinstance(schema, str):
            if "_change_type" not in schema:
                schema = f"{schema}, {CDF_META_DDL}"
        else:
            from pyspark.sql.types import LongType, StringType, StructField

            names = {f.name for f in schema.fields}
            if "_change_type" not in names:
                schema = StructType(
                    list(schema.fields)
                    + [
                        StructField("_change_type", StringType()),
                        StructField("_commit_version", LongType()),
                    ]
                )
    spark.dataSource.register(VersionedTableDataSource)
    reader = spark.readStream.format("versioned_table").option(
        "path", table.root
    )
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def checkpoint_covered_version(checkpoint_dir: str) -> "int | None":
    """The last COMMITTED ``versioned_table`` source offset of a stream
    checkpoint — i.e. the table version the stream has fully applied
    (offsets are written before a batch runs; commits after — only a
    committed batch counts). None before any batch commits.

    This is the catch-up loop's cursor: it reads Structured Streaming's
    documented checkpoint layout (``offsets/<batchId>`` /
    ``commits/<batchId>``), and the offset payload is this source's own
    ``{"version": N}`` dict.

    Deployment note: the checkpoint is read through LOCAL filesystem
    APIs — run the catch-up driver where the checkpoint location is
    mounted (the normal arrangement: the catch-up loop and the stream
    it hands off to share one checkpoint dir). A checkpoint on a
    remote Hadoop filesystem is Spark-managed state this helper does
    not reach; there, drive ``catch_up_chunked`` with an explicit
    cursor instead."""
    import json as _json

    commits = os.path.join(checkpoint_dir, "commits")
    offsets = os.path.join(checkpoint_dir, "offsets")
    try:
        ids = [int(f) for f in os.listdir(commits) if f.isdigit()]
    except FileNotFoundError:
        return None
    if not ids:
        return None
    with open(os.path.join(offsets, str(max(ids)))) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    off = _json.loads(lines[-1])
    if isinstance(off, str):  # engine-serialized JSON-in-JSON form
        off = _json.loads(off)
    return int(off["version"])


def catch_up_chunked(
    table: VersionedTable,
    start_run,
    covered,
    max_files_per_run: int,
    change_feed: bool = False,
) -> int:
    """Drain a long table history in BOUNDED availableNow runs.

    The Python streaming source API has no ReadLimit hook, so
    ``max_files_per_trigger`` cannot bound a run's FIRST micro-batch —
    and an availableNow run snapshots its end offset at start, so it is
    never paced at all (NOTES.md "API landmines"). A cold-start view
    build or bronze->silver backfill over a 100 TB table's history
    would otherwise plan one batch spanning every file. This driver
    loop bounds each RUN instead: ``covered()`` reports the stream's
    committed cursor (``checkpoint_covered_version``), the remaining
    span is budgeted with the same changed-file arithmetic as
    ``max_files_per_trigger`` (``pace_span`` — O(span x changed) record
    reads), and ``start_run(ending_version)`` launches one availableNow
    run clamped to that ceiling. Repeats until caught up; returns the
    number of runs. Exactly-once is untouched — it lives in the
    consumer's txn stamps, which hold across any run partitioning."""
    n_runs = 0
    while True:
        latest = table.latest_version()
        if latest is None:
            return n_runs
        start = covered()
        start = -1 if start is None else int(start)
        if start >= latest:
            return n_runs
        try:
            end = pace_span(
                table, start, latest, max_files_per_run, change_feed
            )
        except FileNotFoundError:
            end = latest  # vacuumed span start: partitions() carries
            # the guidance error if the run truly needs those versions
        q = start_run(end)
        q.awaitTermination()
        n_runs += 1
        after = covered()
        if after is None or int(after) <= start:
            raise RuntimeError(
                f"catch_up_chunked: run {n_runs} advanced nothing "
                f"(cursor {start} -> {after}) — the stream committed "
                "no batch; check the sink for errors"
            )
