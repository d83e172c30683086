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

Usage::

    spark.dataSource.register(VersionedTableDataSource)
    (spark.readStream.format("versioned_table")
        .option("path", table.root).load())

or ``versioned_stream(spark, table)`` which does both.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
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
    """DDL of the table's CURRENT schema, from one parquet footer of
    the newest manifest (metadata read, no scan)."""
    import pyarrow.parquet as pq

    t = VersionedTable(root)
    v = t.latest_version()
    if v is None:
        raise FileNotFoundError(f"{root}: no commits yet — nothing to sniff")
    files = t._manifest(v)["files"]
    if not files:
        raise FileNotFoundError(f"{root}: version {v} lists no files")
    sch = pq.read_schema(os.path.join(root, files[-1]))
    return ", ".join(
        f"{f.name} {_arrow_field_ddl(f.type)}" for f in sch
    )


class _AddedFilePartition(InputPartition):
    def __init__(self, root: str, file: str):
        self.root = root
        self.file = file


def _added_per_version(
    table: VersionedTable, v_from: int, v_to: int, ignore_changes: bool
) -> "list[str]":
    """Data files appended in (v_from, v_to], enumerated one version
    step at a time so intra-span compaction cannot double-count, in
    deterministic (version, manifest-order) sequence."""
    added: list[str] = []
    try:
        prev_files = (
            table._manifest(v_from)["files"] if v_from >= 0 else []
        )
    except FileNotFoundError:
        raise RuntimeError(
            f"versioned_table stream: version {v_from} of {table.root} "
            "has been vacuumed away — the checkpointed offset predates "
            "the table's retention window. Restart from a fresh "
            "checkpoint (full re-read) or raise vacuum keep_last on "
            "the source table above the stream's maximum lag."
        ) from None
    prev_set = set(prev_files)
    for v in range(v_from + 1, v_to + 1):
        cur_files = table._manifest(v)["files"]
        cur_set = set(cur_files)
        if not prev_set <= cur_set and not ignore_changes:
            raise RuntimeError(
                f"versioned_table stream: version {v} of {table.root} "
                "rewrote or dropped data files (merge/compact/"
                "overwrite); a rewritten file mixes old and new rows. "
                "Set ignore_changes=true to re-emit rewritten files "
                "whole (downstream must dedupe), or stream from an "
                "append-only table."
            )
        # a file added in this step and removed in a LATER step must
        # not re-enter if a later manifest re-adds nothing; per-step
        # set difference handles both directions exactly
        step_added = [f for f in cur_files if f not in prev_set]
        added.extend(f for f in step_added if f not in added)
        prev_set = cur_set
    return added


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
        self.starting_version = int(options.get("starting_version", -1))

    def _table(self) -> VersionedTable:
        return VersionedTable(self.root)

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        v = self._table().latest_version()
        return {"version": self.starting_version if v is None else v}

    def partitions(self, start: dict, end: dict):
        v_from, v_to = int(start["version"]), int(end["version"])
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

    def read(self, partition: _AddedFilePartition) -> Iterator[tuple]:
        if not partition.file:
            return iter([])
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = [f.name for f in self.schema_.fields]
        path = os.path.join(partition.root, partition.file)
        # schema-evolved files: project only the columns this file has
        # (requesting an absent column raises in pyarrow); absent ones
        # read as NULL, extra ones are ignored — parquet-by-name
        present = set(pq.read_schema(path).names)
        t = pq.read_table(path, columns=[c for c in cols if c in present])
        # fast path: hand Spark Arrow RecordBatches (zero per-row
        # Python objects; the file's buffers flow through). Columns
        # are cast/reordered to the DECLARED schema's arrow types
        # (files may differ: large_string vs string, evolved columns
        # absent -> typed nulls). Any cast the file genuinely can't
        # satisfy falls back to the row path, whose per-value Python
        # conversion is laxer.
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self.schema_)
            arrays = [
                t.column(f.name).cast(f.type)
                if f.name in present
                else pa.nulls(t.num_rows, type=f.type)
                for f in target
            ]
            return iter(pa.table(arrays, schema=target).to_batches())
        except Exception:
            return iter(
                tuple(rec.get(c) for c in cols) for rec in t.to_pylist()
            )

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
        return sniff_schema_ddl(root)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VersionedTableStreamReader(schema, self.options)


def versioned_stream(spark, table: VersionedTable, schema=None, **options):
    """Register the source (idempotent) and open ``table`` as a
    streaming DataFrame.

    ``schema`` (DDL string or StructType) pins the projection
    explicitly; without it the CURRENT table schema is sniffed at
    query start. A restarted query re-sniffs — on a schema-evolved
    table pass the schema explicitly so the sink sees one stable
    shape across restarts (absent columns read as NULL, extra ones
    are ignored)."""
    spark.dataSource.register(VersionedTableDataSource)
    reader = spark.readStream.format("versioned_table").option(
        "path", table.root
    )
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
