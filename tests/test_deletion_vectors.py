"""Deletion vectors + change data feed on the versioned table.

Row-level DELETE without file rewrites (Delta's deletion-vector
design re-expressed via the public ``_metadata.file_name`` /
``_metadata.row_index`` columns) and NET row-level changes between
snapshots computed from the manifest diff (Delta's table_changes,
costing O(changed data) because untouched files are carried by
reference and never scanned).
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import (
    ConcurrentCommitError,
    VersionedTable,
)


@pytest.fixture()
def table(tmp_path):
    return VersionedTable(str(tmp_path / "tbl"))


def _base(spark, n=200, parts=4):
    return (
        spark.range(0, n)
        .withColumn("grp", (F.col("id") % 10).cast("int"))
        .withColumn("val", (F.col("id") * 2).cast("int"))
        .repartition(parts)
    )


# -- deletion vectors ------------------------------------------------------


def test_delete_where_tombstones_without_rewrite(spark, table):
    table.commit(_base(spark), mode="overwrite")
    v0 = table.latest_version()
    v1 = table.delete_where(spark, "grp = 3")
    # same data files: the delete wrote only sidecars + a manifest
    assert table._manifest(v0)["files"] == table._manifest(v1)["files"]
    assert table.dv_files(v1)
    assert table.read(spark).count() == 180
    assert table.read(spark).filter("grp = 3").count() == 0
    # time travel: the pre-delete snapshot is intact
    assert table.read(spark, v0).count() == 200


def test_delete_where_accumulates_and_skips_already_deleted(spark, table):
    table.commit(_base(spark), mode="overwrite")
    v1 = table.delete_where(spark, "grp = 3")
    # re-deleting the same rows is a no-op: no new version
    assert table.delete_where(spark, "grp = 3") == v1
    v2 = table.delete_where(spark, F.col("id") < 50)
    assert v2 == v1 + 1
    # 200 - 20 (grp=3) - 45 (id<50 minus the 5 already-deleted grp-3)
    assert table.read(spark).count() == 135


def test_delete_matching_nothing_is_noop(spark, table):
    table.commit(_base(spark), mode="overwrite")
    v = table.latest_version()
    assert table.delete_where(spark, "id > 10000") == v
    assert table.dv_files() == []


def test_merge_does_not_resurrect_deleted_rows(spark, table):
    table.commit(_base(spark), mode="overwrite")
    table.delete_where(spark, "grp = 3")
    upd = spark.range(3, 4).withColumns(
        {"grp": F.lit(99).cast("int"), "val": F.lit(-1).cast("int")}
    )
    table.merge(spark, upd, "id")
    got = table.read(spark)
    # the merged key is back (as an insert), its deleted neighbors are not
    assert got.filter("id = 3").collect()[0]["grp"] == 99
    assert got.filter("id = 13").count() == 0
    assert got.count() == 181


def test_compact_materializes_deletes_and_vacuum_reclaims(spark, table):
    table.commit(_base(spark), mode="overwrite")
    table.delete_where(spark, "grp = 3")
    table.compact(spark, target_partitions=2)
    assert table.dv_files() == []  # deletes rewritten into the data
    assert table.read(spark).count() == 180
    assert table.read(spark).filter("grp = 3").count() == 0
    removed = table.vacuum(keep_last=1, retention_seconds=0)
    assert any(f.startswith("dv-") for f in removed)
    assert table.read(spark).count() == 180


def test_read_where_applies_deletion_vectors(spark, table):
    df = (
        spark.range(0, 400)
        .withColumn("grp", (F.col("id") % 10).cast("int"))
        .repartition(1)
    )
    table.commit(df, mode="overwrite")
    table.compact(spark, target_partitions=8, cluster_by="id")
    table.delete_where(spark, "id >= 100 and id < 120")
    got = table.read_where(spark, "id", 90, 130)
    assert got.count() == 21  # 90..130 inclusive minus [100,120)
    assert got.filter("id = 105").count() == 0


def test_dv_read_path_is_broadcast_anti_join(spark, table):
    table.commit(_base(spark), mode="overwrite")
    table.delete_where(spark, "id < 10")
    plan = (
        table.read(spark)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus side never shuffles for the DV filter
    assert "Exchange hashpartitioning" not in plan


def test_delete_prune_ranges_scans_subset_and_matches(spark, table):
    df = spark.range(0, 400).withColumn(
        "grp", (F.col("id") % 10).cast("int")
    )
    table.commit(df.repartition(1), mode="overwrite")
    table.compact(spark, target_partitions=8, cluster_by="id")
    files = table.files_for_ranges({"id": (100, 119)})
    assert len(files) < 8  # clustered: the range lives in few files
    table.delete_where(
        spark, "id >= 100 and id < 120", prune_ranges={"id": (100, 119)}
    )
    assert table.read(spark).count() == 380
    assert table.read(spark).filter("id = 110").count() == 0


def test_delete_detects_interleaved_commit(spark, table, monkeypatch):
    table.commit(_base(spark), mode="overwrite")
    real_publish = table.publish
    state = {"raced": False}

    def racing_publish(*a, **kw):
        if not state["raced"]:
            state["raced"] = True
            VersionedTable(table.root).commit(
                _base(spark, n=10), mode="append"
            )
        return real_publish(*a, **kw)

    monkeypatch.setattr(table, "publish", racing_publish)
    with pytest.raises(ConcurrentCommitError):
        table.delete_where(spark, "grp = 3")
    # nothing lost: the interloper's append is visible, no delete applied
    monkeypatch.setattr(table, "publish", real_publish)
    assert table.read(spark).count() == 210
    assert table.read(spark).filter("grp = 3").count() >= 20


def test_append_after_delete_keeps_tombstones(spark, table):
    table.commit(_base(spark), mode="overwrite")
    table.delete_where(spark, "grp = 3")
    table.commit(_base(spark, n=10), mode="append")  # ids 0..9 again
    # deletes survive the append (manifest inheritance), new rows visible
    assert table.read(spark).count() == 180 + 10
    # the appended grp=3 row (id=3) IS visible: DVs are positional on
    # the old files, not value predicates
    assert table.read(spark).filter("grp = 3").count() == 1


# -- change data feed ------------------------------------------------------


def test_read_changes_keyed_classification(spark, table):
    table.commit(_base(spark, n=100), mode="overwrite")  # v0
    table.commit(
        spark.range(100, 120).withColumns(
            {"grp": F.lit(1).cast("int"), "val": F.lit(7).cast("int")}
        ),
        mode="append",
    )  # v1
    upd = spark.range(5, 8).withColumns(
        {"grp": F.lit(0).cast("int"), "val": F.lit(-1).cast("int")}
    )
    table.merge(spark, upd, "id")  # v2
    table.delete_where(spark, "id >= 110")  # v3

    rows = table.read_changes(spark, 0, 3, key="id").collect()
    c = Counter(r["_change_type"] for r in rows)
    assert c == {
        "insert": 10,
        "update_preimage": 3,
        "update_postimage": 3,
    }
    assert sorted(
        r["id"] for r in rows if r["_change_type"] == "insert"
    ) == list(range(100, 110))
    pre = {
        r["id"]: r["val"]
        for r in rows
        if r["_change_type"] == "update_preimage"
    }
    post = {
        r["id"]: r["val"]
        for r in rows
        if r["_change_type"] == "update_postimage"
    }
    assert pre == {5: 10, 6: 12, 7: 14}
    assert post == {5: -1, 6: -1, 7: -1}

    # narrower window: deletes of the appended tail
    rows2 = table.read_changes(spark, 1, 3, key="id").collect()
    c2 = Counter(r["_change_type"] for r in rows2)
    assert c2["delete"] == 10
    assert sorted(
        r["id"] for r in rows2 if r["_change_type"] == "delete"
    ) == list(range(110, 120))


def test_read_changes_compaction_nets_to_zero_keyed(spark, table):
    table.commit(_base(spark), mode="overwrite")
    v = table.compact(spark, target_partitions=2)
    assert (
        table.read_changes(spark, v - 1, v, key="id").count() == 0
    )
    # unkeyed: file-level truth — the rewrite shows as delete+insert
    unkeyed = {
        r["_change_type"]: r["n"]
        for r in table.read_changes(spark, v - 1, v)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert unkeyed == {"delete": 200, "insert": 200}


def test_read_changes_scans_only_changed_files(spark, table):
    """Carried (common) files are never read: CDF is O(changed data)."""
    table.commit(_base(spark), mode="overwrite")  # v0
    appended = spark.range(500, 520).withColumns(
        {"grp": F.lit(1).cast("int"), "val": F.lit(0).cast("int")}
    )
    table.commit(appended, mode="append")  # v1
    v0_files = set(table._manifest(0)["files"])
    added = set(table._manifest(1)["files"]) - v0_files
    scanned = {
        p.rsplit("/", 1)[-1]
        for p in table.read_changes(spark, 0, 1, key="id").inputFiles()
    }
    assert scanned  # sanity: something is read
    assert scanned <= added  # and it is ONLY the appended files
    # pure append with key: all inserts
    rows = table.read_changes(spark, 0, 1, key="id").collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert len(rows) == 20


def test_read_changes_dv_only_commit_reads_tombstoned_files_only(
    spark, table
):
    df = spark.range(0, 400).withColumn(
        "grp", (F.col("id") % 10).cast("int")
    )
    table.commit(df.repartition(1), mode="overwrite")
    table.compact(spark, target_partitions=8, cluster_by="id")  # v1
    v1 = table.latest_version()
    v2 = table.delete_where(
        spark, "id >= 100 and id < 110", prune_ranges={"id": (100, 109)}
    )
    ch = table.read_changes(spark, v1, v2, key="id")
    rows = ch.collect()
    assert Counter(r["_change_type"] for r in rows) == {"delete": 10}
    assert sorted(r["id"] for r in rows) == list(range(100, 110))
    # only the tombstoned data files (plus dv sidecars) are scanned —
    # the other 7 clustered files are common to both versions
    data_scanned = {
        p.rsplit("/", 1)[-1]
        for p in ch.inputFiles()
        if not p.rsplit("/", 1)[-1].startswith("dv-")
    }
    all_files = set(table._manifest(v2)["files"])
    assert data_scanned < all_files


def test_read_changes_validation(spark, table):
    with pytest.raises(FileNotFoundError):
        table.read_changes(spark, 0)
    table.commit(_base(spark), mode="overwrite")
    with pytest.raises(ValueError):
        table.read_changes(spark, 0, 0)
    table.commit(_base(spark, n=10), mode="append")
    with pytest.raises(ValueError):
        table.read_changes(spark, 1, 0)


def test_restore_then_rewrite_never_resurrects_deleted_rows(spark, table):
    """Round-6 advisor (high): a sidecar's cached refs must be its FULL
    reference list. Sequence: one delete spans files A+B; a merge
    rewrites A (only B's tombstone is live); restore() brings A back;
    a later merge rewrites B. A live-shrunk refs cache would now see
    zero live refs and prune the sidecar — silently resurrecting the
    deleted row of A. The full-refs cache keeps it."""
    # two key-disjoint single files
    table.commit(
        spark.range(0, 100).selectExpr("id AS k", "id AS v").coalesce(1)
    )
    table.commit(
        spark.range(1000, 1100).selectExpr("id AS k", "id AS v").coalesce(1),
        mode="append",
    )
    # ONE sidecar tombstoning a row in EACH file (pin the delete scan
    # to a single partition so both hits land in one sidecar part)
    prev = spark.conf.get("spark.sql.files.minPartitionNum", None)
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try:
        table.delete_where(spark, (F.col("k") == 5) | (F.col("k") == 1005))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.files.minPartitionNum")
        else:
            spark.conf.set("spark.sql.files.minPartitionNum", prev)
    assert len(table.dv_files()) == 1
    v_deleted = table.latest_version()
    # rewrite file A only (low key range)
    table.merge(
        spark, spark.createDataFrame([(7, 777)], "k bigint, v bigint"), "k"
    )
    table.restore(v_deleted)  # A returns; the sidecar must cover it again
    # rewrite file B only (high key range) — materializes 1005's delete;
    # the sidecar STILL tombstones k=5 in A and must survive the prune
    table.merge(
        spark,
        spark.createDataFrame([(1007, 1)], "k bigint, v bigint"),
        "k",
    )
    ks = {r["k"] for r in table.read(spark).collect()}
    assert 5 not in ks and 1005 not in ks
    assert 1007 in ks
    # and the change feed across the whole span never emits k=5 as a
    # live insert at the end state
    ch = table.read_changes(spark, v_deleted, key="k")
    final_inserts = {
        r["k"]
        for r in ch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).collect()
    }
    assert 5 not in final_inserts


def test_rewrite_of_every_ref_still_prunes_sidecar(spark, table):
    """Full-refs caching must not break pruning: when a rewrite
    retires EVERY file a sidecar references, the sidecar goes."""
    table.commit(
        spark.range(0, 50).selectExpr("id AS k", "id AS v").coalesce(1)
    )
    table.delete_where(spark, F.col("k") == 3)
    assert len(table.dv_files()) == 1
    table.compact(spark, target_partitions=1)
    assert table.dv_files() == []
    ks = {r["k"] for r in table.read(spark).collect()}
    assert 3 not in ks


def test_detail_propagates_corrupt_dv_sidecar(spark, table, tmp_path):
    """A damaged deletion-vector sidecar must surface, not silently
    count as zero tombstones (which would inflate detail()'s n_rows)."""
    import os

    table.commit(_base(spark), mode="overwrite")
    table.delete_where(spark, "grp = 3")
    dv = table.dv_files()[0]
    with open(os.path.join(table.root, dv), "wb") as fh:
        fh.write(b"not parquet")
    with pytest.raises(Exception):
        table.detail()
