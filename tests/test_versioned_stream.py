"""VersionedTable as a streaming source: versions are offsets,
appended files are the input partitions, rewrites fail loudly."""

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable
from jde_to_datalake_spark.sources.versioned_stream import (
    _added_per_version,
    sniff_schema_ddl,
    versioned_stream,
)


def _commit(spark, t, lo, hi):
    t.commit(
        spark.range(lo, hi).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v"
        )
    )


def _drain(spark, t, tmp_path, name, schema=None, **options):
    out = str(tmp_path / f"out_{name}")
    q = (
        versioned_stream(spark, t, schema=schema, **options)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_streams_all_appended_rows_then_only_new_ones(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 10)
    _commit(spark, t, 10, 25)
    out = _drain(spark, t, tmp_path, "a")
    got = {r["k"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(25))
    # two more commits; the SAME checkpoint resumes at the offset
    _commit(spark, t, 25, 30)
    _commit(spark, t, 30, 33)
    _drain(spark, t, tmp_path, "a")
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(33))  # no re-emission of old versions


def test_schema_is_sniffed_from_footers(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.range(0, 3).selectExpr(
            "id AS k",
            "CAST(id AS STRING) AS s",
            "CAST(id AS DOUBLE) AS d",
            "CAST(id AS DECIMAL(12,2)) AS m",
            "array(CAST(id AS DOUBLE)) AS vec",
        )
    )
    ddl = sniff_schema_ddl(t.root)
    assert ddl == (
        "k bigint, s string, d double, m decimal(12,2), "
        "vec array<double>"
    )
    out = _drain(spark, t, tmp_path, "s")
    df = spark.read.parquet(out)
    assert {f.name: f.dataType.simpleString() for f in df.schema.fields} == {
        "k": "bigint", "s": "string", "d": "double",
        "m": "decimal(12,2)", "vec": "array<double>",
    }
    assert df.count() == 3


def test_rewriting_commit_fails_unless_ignore_changes(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 10)
    t.merge(
        spark,
        spark.createDataFrame([(5, "FIVE")], "k bigint, v string"),
        key="k",
    )
    with pytest.raises(RuntimeError, match="rewrote or dropped"):
        _added_per_version(t, -1, t.latest_version(), False)
    # opt-in: rewritten files re-emit whole (downstream dedupes)
    files = _added_per_version(t, -1, t.latest_version(), True)
    assert files
    out = _drain(spark, t, tmp_path, "ic", ignore_changes="true")
    rows = spark.read.parquet(out)
    # the updated row is present post-update; duplicates allowed
    assert {r["v"] for r in rows.filter("k = 5").collect()} >= {"FIVE"}


def test_dv_only_span_streams_nothing(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 10)
    out = _drain(spark, t, tmp_path, "d")
    assert spark.read.parquet(out).count() == 10
    t.delete_where(spark, F.col("k") == 3)  # DV sidecar, no new files
    _drain(spark, t, tmp_path, "d")
    # deletes are not streamed (CDF is the tool for that): count holds
    assert spark.read.parquet(out).count() == 10


def test_intra_span_compaction_neither_misses_nor_duplicates(
    spark, tmp_path
):
    """A file added then compacted away INSIDE one span: per-version
    enumeration with ignore_changes still sees each appended file
    exactly once plus the compacted rewrite."""
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 5)
    _commit(spark, t, 5, 8)
    t.compact(spark)
    files = _added_per_version(t, -1, t.latest_version(), True)
    assert len(files) == len(set(files))
    # the original appends AND the compacted file all enumerate
    m0 = t._manifest(0)["files"]
    m1 = [f for f in t._manifest(1)["files"] if f not in m0]
    m2 = t._manifest(2)["files"]
    assert files == m0 + m1 + m2


def test_landing_table_streams_into_ingestion_loop(spark, tmp_path):
    """End-to-end composition: an upstream writer commits raw docs to
    a LANDING versioned table; the ingestion loop consumes it as a
    stream (no lookback polling — versions are the cursor) and dedups
    into the corpus. Restarts resume from the version offset."""
    from jde_to_datalake_spark.streaming.ingest import ingest_corpus_stream

    landing = VersionedTable(str(tmp_path / "landing"))
    corpus = VersionedTable(str(tmp_path / "corpus"))
    index = VersionedTable(str(tmp_path / "index"))
    ckpt = str(tmp_path / "ckpt")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    landing.commit(docs([(1, "one"), (2, "two")]))
    landing.commit(docs([(3, "one"), (4, "three")]))  # 3 dups 1
    q = ingest_corpus_stream(
        versioned_stream(spark, landing), corpus, index, ckpt
    )
    q.awaitTermination(120)
    assert sorted(r["text"] for r in corpus.read(spark).collect()) == [
        "one", "three", "two",
    ]
    # more upstream commits; the same checkpoint resumes mid-log
    landing.commit(docs([(5, "three"), (6, "four")]))
    q = ingest_corpus_stream(
        versioned_stream(spark, landing), corpus, index, ckpt
    )
    q.awaitTermination(120)
    assert sorted(r["text"] for r in corpus.read(spark).collect()) == [
        "four", "one", "three", "two",
    ]
    assert {r["fingerprint"] for r in index.read(spark).collect()} == {
        r["fingerprint"] for r in corpus.read(spark).collect()
    }


def test_schema_evolved_commits_stream_with_nulls(spark, tmp_path):
    """An explicitly pinned schema keeps the stream shape stable
    across restarts on a schema-evolved table: files missing a pinned
    column stream it as NULL, extra columns are ignored
    (parquet-by-name projection)."""
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 3)  # k, v
    ddl = "k bigint, v string"
    out = _drain(spark, t, tmp_path, "e", schema=ddl)
    # evolved commit: drops v, adds w
    t.commit(
        spark.range(3, 5).selectExpr("id AS k", "id * 2 AS w")
    )
    _drain(spark, t, tmp_path, "e", schema=ddl)
    rows = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[3] is None and rows[4] is None  # absent column -> NULL
    assert rows[0] == "0"


def test_vacuumed_offset_fails_with_clear_guidance(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    _commit(spark, t, 0, 5)
    _commit(spark, t, 5, 8)
    _commit(spark, t, 8, 12)
    t.vacuum(keep_last=1, retention_seconds=0)
    with pytest.raises(RuntimeError, match="vacuumed away"):
        _added_per_version(t, 0, t.latest_version(), False)


def test_read_yields_arrow_batches_even_for_evolved_files(spark, tmp_path):
    """The executor read path hands Spark Arrow RecordBatches (no
    per-row Python objects) — including for pre-evolution files where
    the declared schema has columns the file lacks (typed nulls) and
    for decimal/array columns."""
    import pyarrow as pa
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
        _AddedFilePartition,
    )

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        # one file: a multi-file commit may include empty part files,
        # whose (correct) batch list is empty and proves nothing
        spark.range(0, 3).coalesce(1).selectExpr(
            "id AS k",
            "CAST(id AS DECIMAL(12,2)) AS m",
            "array(CAST(id AS DOUBLE)) AS vec",
        )
    )
    declared = _parse_datatype_string(
        "k bigint, m decimal(12,2), vec array<double>, later string"
    )
    reader = VersionedTableStreamReader(declared, {"path": t.root})
    files = _added_per_version(t, -1, t.latest_version(), False)
    batches = [
        b
        for f in files
        for b in reader.read(_AddedFilePartition(t.root, f))
    ]
    assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
    tbl = pa.Table.from_batches(batches)
    assert tbl.num_rows == 3
    assert tbl.column_names == ["k", "m", "vec", "later"]
    assert tbl.column("later").null_count == tbl.num_rows
    assert tbl.column("m").type == pa.decimal128(12, 2)


def test_max_files_per_trigger_paces_the_offset_walk(spark, tmp_path):
    """Admission control at the protocol level (deterministic — no
    trigger timing): once partitions() has planned a batch, every
    subsequent latestOffset() advances at most max_files_per_trigger
    changed files, one whole version at a time, and a single
    over-sized commit still flows as one batch."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    t = VersionedTable(str(tmp_path / "t"))
    for lo in (0, 10, 20):
        t.commit(
            spark.range(lo, lo + 10).selectExpr("id AS k").coalesce(2),
            mode="append",
        )
    # one commit with MORE files than the cap: must still be admitted
    t.commit(
        spark.range(30, 40).selectExpr("id AS k").repartition(5),
        mode="append",
    )
    declared = _parse_datatype_string("k bigint")
    r = VersionedTableStreamReader(
        declared, {"path": t.root, "max_files_per_trigger": "2"}
    )
    seen = []
    start = r.initialOffset()
    for _ in range(10):
        end = r.latestOffset()
        if end == start:
            break
        r.partitions(start, end)
        seen.append((int(start["version"]), int(end["version"])))
        start = end
    # 2 files per commit, cap 2 -> one version per batch; the 5-file
    # commit is over-sized but still admitted alone
    assert seen == [(-1, 0), (0, 1), (1, 2), (2, 3)]

    # unpaced reader drains the same table in ONE span
    r2 = VersionedTableStreamReader(declared, {"path": t.root})
    assert int(r2.latestOffset()["version"]) == 3


def test_max_files_per_trigger_counts_cdf_churn(spark, tmp_path):
    """In change-feed mode the pace counter includes departed files
    and deletion-vector sidecar churn, not just added files."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        CDF_META_DDL,
        VersionedTableStreamReader,
    )

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(spark.range(0, 10).selectExpr("id AS k").coalesce(1))
    t.delete_where(spark, F.col("k") < 2)  # +1 dv sidecar
    t.compact(spark, target_partitions=1)  # -1 file +1 file -1 dv
    declared = _parse_datatype_string(f"k bigint, {CDF_META_DDL}")
    r = VersionedTableStreamReader(
        declared,
        {
            "path": t.root,
            "read_change_feed": "true",
            "max_files_per_trigger": "1",
        },
    )
    start = r.initialOffset()
    spans = []
    for _ in range(10):
        end = r.latestOffset()
        if end == start:
            break
        r.partitions(start, end)
        spans.append((int(start["version"]), int(end["version"])))
        start = end
    # v0 = 1 added file; v1 = 1 dv sidecar; v2 = 3 churn units — each
    # version alone exceeds-or-meets the cap of 1, so one per batch
    assert spans == [(-1, 0), (0, 1), (1, 2)]


def test_max_files_per_trigger_paces_a_midstream_backlog(spark, tmp_path):
    """e2e: a backlog landing while the stream runs drains one capped
    batch per trigger (the first batch of a run is unbounded — the
    Python source API has no ReadLimit hook — so the backlog arrives
    after batch 0)."""
    import time

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(spark.range(0, 10).selectExpr("id AS k").coalesce(2))
    got = []
    q = (
        versioned_stream(spark, t, max_files_per_trigger="2")
        .writeStream.foreachBatch(
            lambda df, bid: got.append(df.count())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and sum(got) < 10:
            time.sleep(0.5)
        assert sum(got) == 10
        for lo in (10, 20, 30):
            t.commit(
                spark.range(lo, lo + 10).selectExpr("id AS k").coalesce(2),
                mode="append",
            )
        deadline = time.time() + 120
        while time.time() < deadline and sum(got) < 40:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert sum(got) == 40
    steady = [n for n in got[1:] if n]
    assert steady and max(steady) <= 10  # cap 2 files = 1 version


def test_stream_planning_reads_deltas_not_manifests(spark, tmp_path):
    """Round-7 lead item, planning half: enumerating a span's appended
    files / change-feed tasks / pacing must read each commit's DELTA
    record only — O(span x changed files) — never reconstruct full
    manifests (O(span x table files)). Pinned by stubbing _manifest to
    raise during planning."""
    import pytest

    from jde_to_datalake_spark.sources.versioned import VersionedTable
    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
        _added_per_version,
        _cdf_partitions,
        sniff_schema_ddl,
    )

    t = VersionedTable(str(tmp_path / "t"))
    one = spark.createDataFrame([(1, "x")], "k bigint, v string").coalesce(1)
    for _ in range(7):
        t.commit(one, mode="append")  # versions 0..6
    hi = t.latest_version()
    ddl = sniff_schema_ddl(t.root)

    def boom(self, version):
        raise AssertionError(
            f"planning reconstructed a full manifest for v{version}"
        )

    from unittest.mock import patch

    with patch.object(VersionedTable, "_manifest", boom):
        frozen = VersionedTable(t.root)
        added = _added_per_version(frozen, 0, hi, ignore_changes=False)
        assert len(added) == hi
        parts = _cdf_partitions(frozen, 0, hi)
        assert len(parts) == hi
        assert all(p.kind == "insert_file" for p in parts)
        # pacing too
        from pyspark.sql.types import StructType

        reader = VersionedTableStreamReader(
            StructType.fromDDL(ddl),
            {"path": t.root, "max_files_per_trigger": "3"},
        )
        assert reader._pace(0, hi) == 3  # 3 one-file versions admitted


# -- native streaming SINK (writeStream.format("versioned_table")) ----------


def test_native_sink_end_to_end_exactly_once(spark, tmp_path):
    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableDataSource,
        versioned_stream,
    )
    from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id

    spark.dataSource.register(VersionedTableDataSource)
    src = VersionedTable(str(tmp_path / "src"))
    dst_path = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    src.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
        mode="overwrite",
    )

    def run():
        q = (
            versioned_stream(spark, src, schema="k bigint, v string")
            .writeStream.format("versioned_table")
            .option("path", dst_path)
            .option("txn_app_id", checkpoint_app_id(ckpt))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    dst = VersionedTable(dst_path)
    assert sorted(tuple(r) for r in dst.read(spark).collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    v1 = dst.latest_version()
    run()  # nothing new: no version, no empty commit
    assert dst.latest_version() == v1
    src.commit(spark.createDataFrame([(3, "c")], ["k", "v"]), mode="append")
    run()
    assert sorted(tuple(r) for r in dst.read(spark).collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert [h["operation"] for h in dst.history()] == [
        "STREAMING UPDATE",
        "STREAMING UPDATE",
    ]


def test_native_sink_redelivered_batch_is_discarded(spark, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )

    dst_path = str(tmp_path / "dst")
    w = VersionedTableStreamWriter(
        _parse_datatype_string("k bigint, v string"),
        {"path": dst_path, "txn_app_id": "sink-test"},
    )
    rows = spark.createDataFrame([(1, "a")], ["k", "v"]).collect()
    m0 = w.write(iter(rows))
    w.commit([m0], 0)
    dst = VersionedTable(dst_path)
    v0 = dst.latest_version()
    # crash-window re-delivery of batch 0: staged bytes are discarded,
    # no second version, no orphan file
    m1 = w.write(iter(rows))
    w.commit([m1], 0)
    assert dst.latest_version() == v0
    assert dst.read(spark).count() == 1
    import os

    orphan = [
        f
        for f in os.listdir(dst_path)
        if f.endswith(".parquet")
        and f not in set(dst._manifest(v0)["files"])
    ]
    assert orphan == []


def test_native_sink_abort_discards_staged(spark, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )

    dst_path = str(tmp_path / "dst")
    w = VersionedTableStreamWriter(
        _parse_datatype_string("k bigint, v string"),
        {"path": dst_path},
    )
    rows = spark.createDataFrame([(1, "a")], ["k", "v"]).collect()
    m = w.write(iter(rows))
    w.abort([m, None], 0)
    import os

    assert [f for f in os.listdir(dst_path) if f.endswith(".parquet")] == []
    assert VersionedTable(dst_path).latest_version() is None


def test_native_sink_timestamps_survive_non_utc_host(spark, tmp_path, monkeypatch):
    """Spark's python write worker hands tasks naive LOCAL datetimes
    for TIMESTAMP columns; the sink must re-attach the host zone
    before the tz-aware arrow encode, or a non-UTC host shifts every
    stored instant by its UTC offset."""
    import datetime as dt
    import time as _time

    import pyarrow.parquet as pq
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )

    monkeypatch.setenv("TZ", "Etc/GMT-2")  # local = UTC+2
    _time.tzset()
    try:
        dst_path = str(tmp_path / "dst")
        w = VersionedTableStreamWriter(
            _parse_datatype_string("k bigint, ts timestamp"),
            {"path": dst_path},
        )
        # the worker would deliver instant 10:00Z as naive 12:00 local
        local_naive = dt.datetime(2026, 8, 15, 12, 0, 0)
        from pyspark.sql import Row

        m = w.write(iter([Row(k=1, ts=local_naive)]))
        stored = pq.read_table(
            str(tmp_path / "dst" / m.name), columns=["ts"]
        ).column("ts").to_pylist()[0]
        assert stored == local_naive.astimezone()  # the true instant
        assert stored.astimezone(dt.timezone.utc).hour == 10
    finally:
        monkeypatch.setenv("TZ", "UTC")
        _time.tzset()


def test_native_sink_routes_through_write_contracts(spark, tmp_path):
    """Tables with constraints / column mapping take commit()'s
    validate/translate pipeline — a violating batch fails loudly and
    publishes nothing; logical names survive an active rename."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )

    dst_path = str(tmp_path / "dst")
    t = VersionedTable(dst_path)
    t.commit(spark.createDataFrame([(1, 10)], ["k", "n"]), mode="overwrite")
    t.add_constraint(spark, "n_pos", "n > 0")
    t.rename_column("k", "id")  # n itself is constraint-protected
    w = VersionedTableStreamWriter(
        _parse_datatype_string("id bigint, n bigint"), {"path": dst_path}
    )
    from pyspark.sql import Row

    good = w.write(iter([Row(id=2, n=20)]))
    w.commit([good], 0)
    got = sorted(tuple(r) for r in t.read(spark, merge_schema=True).collect())
    assert got == [(1, 10), (2, 20)]
    assert t.read(spark).columns == ["id", "n"]
    v = t.latest_version()
    bad = w.write(iter([Row(id=3, n=-5)]))
    with pytest.raises(ValueError, match="n_pos"):
        w.commit([bad], 1)
    assert t.latest_version() == v  # nothing published
    import os

    live = set()
    for vv in t.versions():
        live |= set(t._manifest(vv)["files"])
    orphans = [
        f
        for f in os.listdir(dst_path)
        if f.endswith(".parquet") and f not in live
    ]
    assert orphans == []  # staged bytes of the failed batch discarded


def test_native_sink_overwrite_flag_truncates(spark, tmp_path):
    """outputMode('complete') hands the sink overwrite=True: every
    batch replaces the table instead of appending."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )
    from pyspark.sql import Row

    dst_path = str(tmp_path / "dst")
    w = VersionedTableStreamWriter(
        _parse_datatype_string("k bigint"), {"path": dst_path}, overwrite=True
    )
    w.commit([w.write(iter([Row(k=1), Row(k=2)]))], 0)
    w.commit([w.write(iter([Row(k=9)]))], 1)
    t = VersionedTable(dst_path)
    assert [r["k"] for r in t.read(spark).collect()] == [9]


def test_native_sink_empty_app_id_is_unset(spark, tmp_path):
    """txn_app_id='' (misconfigured env var) must behave as NO app id
    (at-least-once), never as a half-enabled idempotency check."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )
    from pyspark.sql import Row

    dst_path = str(tmp_path / "dst")
    w = VersionedTableStreamWriter(
        _parse_datatype_string("k bigint"),
        {"path": dst_path, "txn_app_id": ""},
    )
    assert w.app_id is None
    w.commit([w.write(iter([Row(k=1)]))], 0)
    w.commit([w.write(iter([Row(k=1)]))], 0)  # same batch id: re-applied
    assert VersionedTable(dst_path).read(spark).count() == 2


def test_native_sink_chunked_write_bounds_memory(spark, tmp_path):
    """write() streams the iterator in CHUNK_ROWS record batches into
    one file (bounded executor heap) — the staged file holds every
    row exactly once."""
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableStreamWriter,
    )
    from pyspark.sql import Row

    dst_path = str(tmp_path / "dst")
    w = VersionedTableStreamWriter(
        _parse_datatype_string("k bigint"), {"path": dst_path}
    )
    w.CHUNK_ROWS = 7
    m = w.write(Row(k=i) for i in range(100))
    w.commit([m], 0)
    t = VersionedTable(dst_path)
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(100))
