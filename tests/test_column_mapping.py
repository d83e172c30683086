"""Column mapping: RENAME/DROP COLUMN as metadata-only commits (Delta
column mapping, name mode). No data file is touched by the DDL; every
read/write surface speaks logical names; footer stats keep physical
names so data skipping survives a rename unchanged."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable


@pytest.fixture
def table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(i, f"s{i}", i * 10) for i in range(10)],
            "k bigint, v string, amt bigint",
        )
    )
    return t


def _files(t):
    return list(t._manifest(t.latest_version())["files"])


def test_rename_is_metadata_only_and_read_translates(spark, table):
    before = _files(table)
    v = table.rename_column("v", "label")
    assert _files(table) == before  # zero files written
    df = table.read(spark)
    assert set(df.columns) == {"k", "label", "amt"}
    assert {r["label"] for r in df.collect()} == {f"s{i}" for i in range(10)}
    # history preserved: the pre-rename version still reads old names
    assert set(table.read(spark, v - 1).columns) == {"k", "v", "amt"}


def test_skipping_and_reads_work_on_the_logical_name(spark, table):
    table.compact(spark, target_partitions=4, cluster_by="k")
    table.rename_column("k", "key_id")
    total = len(_files(table))
    pruned = table.files_for_range("key_id", 0, 1)
    assert 0 < len(pruned) < total  # stats under the PHYSICAL name still prune
    got = {r["key_id"] for r in table.read_where(spark, "key_id", 0, 1).collect()}
    assert got == {0, 1}
    got_in = {
        r["key_id"]
        for r in table.read_where_in(spark, "key_id", [3, 7]).collect()
    }
    assert got_in == {3, 7}


def test_writes_after_rename_store_the_physical_name(spark, table):
    table.rename_column("v", "label")
    table.commit(
        spark.createDataFrame(
            [(100, "s100", 1000)], "k bigint, label string, amt bigint"
        ),
        mode="append",
    )
    # the new file carries the PHYSICAL name, like every older file
    newest = _files(table)[-1]
    names = set(pq.read_schema(os.path.join(table.root, newest)).names)
    assert "v" in names and "label" not in names
    df = table.read(spark)
    assert "label" in df.columns and df.count() == 11


def test_merge_and_delete_on_logical_names(spark, table):
    table.rename_column("k", "key_id")
    table.rename_column("amt", "amount")
    table.merge(
        spark,
        spark.createDataFrame(
            [(3, "S3", 999), (42, "new", 1)],
            "key_id bigint, v string, amount bigint",
        ),
        key="key_id",
    )
    rows = {r["key_id"]: (r["v"], r["amount"]) for r in table.read(spark).collect()}
    assert rows[3] == ("S3", 999) and rows[42] == ("new", 1)
    table.delete_where(spark, F.col("amount") >= 900)
    rows = {r["key_id"] for r in table.read(spark).collect()}
    assert 3 not in rows and 42 in rows


def test_read_changes_emits_logical_names(spark, table):
    v0 = table.latest_version()
    table.rename_column("v", "label")
    table.merge(
        spark,
        spark.createDataFrame(
            [(3, "S3", 999)], "k bigint, label string, amt bigint"
        ),
        key="k",
    )
    feed = table.read_changes(spark, v0, table.latest_version(), key="k")
    assert "label" in feed.columns and "v" not in feed.columns
    got = {
        (r["_change_type"], r["label"])
        for r in feed.filter(F.col("k") == 3).collect()
    }
    assert got == {("update_preimage", "s3"), ("update_postimage", "S3")}


def test_drop_column_hides_then_compact_materializes(spark, table):
    before = _files(table)
    table.drop_column("v")
    assert _files(table) == before  # metadata-only
    assert set(table.read(spark).columns) == {"k", "amt"}
    # re-adding the dropped name is blocked: old files still carry it
    with pytest.raises(ValueError, match="dropped"):
        table.commit(
            spark.createDataFrame([(1, "x", 1)], "k bigint, v string, amt bigint"),
            mode="append",
        )
    table.compact(spark, target_partitions=1)
    names = set(
        pq.read_schema(os.path.join(table.root, _files(table)[0])).names
    )
    assert "v" not in names  # the rewrite materialized the drop


def test_rename_chains_and_identity_collapse(spark, table):
    table.rename_column("v", "b")
    table.rename_column("b", "c")
    assert table.column_renames() == {"c": "v"}
    table.rename_column("c", "v")  # back to the physical name
    assert table.column_renames() == {}
    assert set(table.read(spark).columns) == {"k", "v", "amt"}


def test_collision_guards(spark, table):
    table.rename_column("v", "label")
    with pytest.raises(ValueError, match="physical storage"):
        table.rename_column("amt", "v")
    with pytest.raises(ValueError, match="physical storage"):
        table.commit(
            spark.createDataFrame(
                [(1, "x", "y", 1)], "k bigint, label string, v string, amt bigint"
            ),
            mode="append",
        )
    with pytest.raises(ValueError, match="already names"):
        table.rename_column("amt", "label")


def test_restore_rolls_back_the_mapping_too(spark, table):
    v0 = table.latest_version()
    table.rename_column("v", "label")
    table.restore(v0)
    assert table.column_renames() == {}
    assert set(table.read(spark).columns) == {"k", "v", "amt"}


def test_clone_carries_the_mapping(spark, table, tmp_path):
    table.rename_column("v", "label")
    clone = table.clone_to(str(tmp_path / "clone"))
    assert clone.column_renames() == {"label": "v"}
    assert set(clone.read(spark).columns) == {"k", "label", "amt"}


def test_audited_commit_checks_logical_names(spark, table):
    from jde_to_datalake_spark.operators import quality as Q
    from jde_to_datalake_spark.sources.versioned import AuditFailure

    table.rename_column("v", "label")
    v = table.commit_audited(
        spark.createDataFrame(
            [(50, "ok", 5)], "k bigint, label string, amt bigint"
        ),
        [Q.not_null("label")],
    )
    assert v == table.latest_version()
    with pytest.raises(AuditFailure):
        table.commit_audited(
            spark.createDataFrame(
                [(51, None, 5)], "k bigint, label string, amt bigint"
            ),
            [Q.not_null("label")],
        )


def test_stream_source_speaks_logical_names(spark, table, tmp_path):
    from jde_to_datalake_spark.sources.versioned_stream import (
        sniff_schema_ddl,
        versioned_stream,
    )

    table.rename_column("v", "label")
    table.drop_column("amt")
    assert sniff_schema_ddl(table.root) == "k bigint, label string"
    rows: list = []
    q = (
        versioned_stream(spark, table)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(rows) == 10
    assert set(rows[0].asDict().keys()) == {"k", "label"}
    assert {r["label"] for r in rows} == {f"s{i}" for i in range(10)}


def test_drift_checked_commit_respects_the_mapping(spark, table):
    from jde_to_datalake_spark.sources.versioned import (
        commit_drift_checked,
    )

    table.rename_column("amt", "amount")
    commit_drift_checked(
        table,
        spark.createDataFrame(
            [(60, "s60", 55)], "k bigint, v string, amount bigint"
        ),
        column="amount",
        edges=[0.0, 50.0, 200.0],
        max_chi2=1e9,
        mode="append",
    )
    # the staged-and-published file carries the PHYSICAL name
    newest = _files(table)[-1]
    names = set(pq.read_schema(os.path.join(table.root, newest)).names)
    assert "amt" in names and "amount" not in names
    assert table.read(spark).filter(F.col("amount") == 55).count() == 1


def test_change_feed_stream_speaks_logical_names(spark, table, tmp_path):
    from jde_to_datalake_spark.sources.versioned_stream import (
        versioned_stream,
    )

    table.rename_column("v", "label")
    table.delete_where(spark, F.col("k") < 2)
    rows: list = []
    q = (
        versioned_stream(spark, table, change_feed=True)
        .writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {r["_change_type"] for r in rows} == {"insert", "delete"}
    assert "label" in rows[0].asDict() and "v" not in rows[0].asDict()
    net = {}
    for r in rows:
        net[r["k"]] = net.get(r["k"], 0) + (
            1 if r["_change_type"] == "insert" else -1
        )
    live = {k for k, n in net.items() if n == 1}
    assert live == {r["k"] for r in table.read(spark).collect()}


def test_rename_onto_existing_ordinary_column_rejected(spark, table):
    """Round-6 advisor (medium): rename_column('v','k') on a table that
    already has a real 'k' would project duplicate 'k' columns on every
    read — Delta rejects it, so must we."""
    with pytest.raises(ValueError, match="already names an existing"):
        table.rename_column("v", "k")
    # and through a rename chain: label is logical over physical v;
    # renaming amt onto a name colliding with ordinary column k fails
    table.rename_column("v", "label")
    with pytest.raises(ValueError, match="already names an existing"):
        table.rename_column("label", "amt")
    # the guard does not block renaming BACK to one's own physical name
    table.rename_column("label", "v")
    assert table.column_renames() == {}


def test_rename_and_drop_validate_the_column_exists(spark, table):
    """Round-6 advisor (low): a typo'd drop used to record a phantom
    physical name that permanently blocked that column name."""
    with pytest.raises(ValueError, match="not a column"):
        table.drop_column("nope")
    with pytest.raises(ValueError, match="not a column"):
        table.rename_column("nope", "other")
    # nothing was recorded: the name stays usable
    table.commit(
        spark.createDataFrame(
            [(100, "x", 1, 9)], "k bigint, v string, amt bigint, nope bigint"
        ),
        mode="append",
    )
    table.drop_column("nope")  # now it exists, the drop is legal
    assert "nope" not in table.read(spark).columns


def test_rename_and_drop_reject_dependent_columns(spark, tmp_path):
    """Delta's dependent-column rule: a column referenced by a CHECK
    constraint or a generated-column expression cannot be renamed or
    dropped — the stored SQL would dangle (or resolve against the
    wrong column after a later re-add)."""
    import pytest

    from jde_to_datalake_spark.sources.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, 10)], ["k", "n"]), mode="overwrite")
    t.add_constraint(spark, "n_pos", "n > 0")
    t.add_generated_column(spark, "n2", "n * 2")
    with pytest.raises(ValueError, match="constraint 'n_pos'"):
        t.rename_column("n", "amount")
    with pytest.raises(ValueError, match="constraint 'n_pos'"):
        t.drop_column("n")
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("n2")
    # unreferenced columns still alter freely
    t.rename_column("k", "id")
    assert t.read(spark).columns[0] == "id"
    # dropping the dependency unlocks the column
    t.drop_constraint("n_pos")
    t.drop_generated_column("n2")
    t.rename_column("n", "amount")
    assert "amount" in t.read(spark).columns
