"""Sharded training-data export (sources/training_shards.py): shard
membership as a pure function of pack id, one file per shard, a
manifest that describes the bytes on disk, partition-pruned subset
reads, order-independent integrity hashes, and the write-once
publish protocol."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators import corpus as C
from jde_to_datalake_spark.sources.training_shards import (
    read_manifest,
    read_training_shards,
    write_training_shards,
)
from tests.conftest import SF_DIR


def _packs(spark, n=25):
    rows = [
        (i, [f"tok{i}_{j}" for j in range(3 + i % 4)], 3 + i % 4)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "pack_id bigint, tokens array<string>, n_toks bigint"
    )


def test_round_trip_and_manifest_accounting(spark, tmp_path):
    root = str(tmp_path / "shards")
    packs = _packs(spark)
    manifest = write_training_shards(packs, root, rows_per_shard=10)
    assert manifest == read_manifest(root)
    assert manifest["n_shards"] == 3  # 25 ids / 10 per shard
    assert manifest["n_rows"] == 25
    assert manifest["n_tokens"] == sum(3 + i % 4 for i in range(25))
    back = read_training_shards(spark, root)
    got = {r["pack_id"]: r["tokens"] for r in back.collect()}
    exp = {r["pack_id"]: r["tokens"] for r in packs.collect()}
    assert got == exp
    # shard membership is id DIV rows_per_shard, independent of layout
    assert back.filter(
        F.col("shard") != F.expr("CAST(pack_id DIV 10 AS BIGINT)")
    ).count() == 0


def test_one_file_per_shard_directory(spark, tmp_path):
    root = str(tmp_path / "shards")
    write_training_shards(_packs(spark), root, rows_per_shard=10)
    data_dir = os.path.join(root, read_manifest(root)["data_dir"])
    shard_dirs = glob.glob(os.path.join(data_dir, "shard=*"))
    assert len(shard_dirs) == 3
    for d in shard_dirs:
        files = [f for f in glob.glob(os.path.join(d, "*.parquet"))]
        assert len(files) == 1, d


def test_subset_read_prunes_partitions(spark, tmp_path):
    root = str(tmp_path / "shards")
    write_training_shards(_packs(spark), root, rows_per_shard=10)
    sub = read_training_shards(spark, root, shards=[1])
    rows = sub.collect()
    assert {r["pack_id"] for r in rows} == set(range(10, 20))
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pruned = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pruned
    with pytest.raises(ValueError, match="unknown shards"):
        read_training_shards(spark, root, shards=[99])


def test_verify_detects_tampering(spark, tmp_path):
    root = str(tmp_path / "shards")
    write_training_shards(_packs(spark), root, rows_per_shard=10)
    # clean artifact verifies (full and subset)
    read_training_shards(spark, root, verify=True).count()
    read_training_shards(spark, root, shards=[0, 2], verify=True).count()
    # tamper: drop shard 1's data file
    data_dir = os.path.join(root, read_manifest(root)["data_dir"])
    victim = glob.glob(os.path.join(data_dir, "shard=1", "*.parquet"))[0]
    os.unlink(victim)
    with pytest.raises(ValueError, match="integrity"):
        read_training_shards(spark, root, verify=True).count()
    # untampered subset still verifies after the tamper elsewhere
    read_training_shards(spark, root, shards=[0], verify=True).count()


def test_write_once_and_guards(spark, tmp_path):
    root = str(tmp_path / "shards")
    packs = _packs(spark)
    write_training_shards(packs, root, rows_per_shard=10)
    with pytest.raises(FileExistsError):
        write_training_shards(packs, root, rows_per_shard=10)
    with pytest.raises(ValueError):
        write_training_shards(packs, str(tmp_path / "x"), rows_per_shard=0)


def test_export_composes_with_assemble_packs(spark, tmp_path):
    """Integration: the real pipeline tail — sequence_pack over corpus
    documents, assembled packs exported, read back byte-identically."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = C.sequence_pack(docs, budget=128)
    packs = C.assemble_packs(docs, plan)
    root = str(tmp_path / "export")
    manifest = write_training_shards(packs, root, rows_per_shard=64)
    back = read_training_shards(spark, root, verify=True)
    assert back.count() == manifest["n_rows"] == packs.count()
    # total exported tokens == total tokens the pack plan covers
    assert (
        manifest["n_tokens"]
        == packs.agg(F.sum("n_toks")).collect()[0][0]
    )


def test_empty_export_is_total(spark, tmp_path):
    """Zero packs (an over-aggressive gate, a not-yet-landed partition)
    must yield a valid empty artifact, not an unreadable directory —
    partitionBy writes no part files for an empty frame, so the read
    side pins the manifest's schema instead of inferring."""
    root = str(tmp_path / "empty")
    empty = _packs(spark).filter("1 = 0")
    manifest = write_training_shards(empty, root, rows_per_shard=10)
    assert manifest["n_shards"] == 0
    assert manifest["n_rows"] == 0
    back = read_training_shards(spark, root, verify=True)
    assert back.count() == 0
    assert "tokens" in back.columns and "shard" in back.columns


def test_clean_stale_stagings_spares_the_artifact(spark, tmp_path):
    import os

    from jde_to_datalake_spark.sources.training_shards import (
        clean_stale_stagings,
    )

    import time

    root = str(tmp_path / "shards")
    write_training_shards(_packs(spark), root, rows_per_shard=10)
    # simulate a crashed export's orphan data dir (died between the
    # data write and the manifest publish) + a legacy staging dir
    old = time.time() - 7200
    stale = os.path.join(root, "shards-deadbeef")
    os.makedirs(stale)
    open(os.path.join(stale, "part-x.parquet"), "w").close()
    legacy = os.path.join(root, "_shards-deadbeef")
    os.makedirs(legacy)
    for p in (stale, os.path.join(stale, "part-x.parquet"), legacy):
        os.utime(p, (old, old))
    # an IN-FLIGHT export (fresh unreferenced dir: data landed, the
    # manifest not yet published) must be SPARED by the retention
    # window — reclaiming it would let the manifest publish succeed
    # over deleted bytes, silently corrupting a write-once artifact
    inflight = os.path.join(root, "shards-cafebabe")
    os.makedirs(inflight)
    removed = clean_stale_stagings(root)  # default retention: 1 h
    assert sorted(removed) == sorted([stale, legacy])
    assert not os.path.exists(stale) and not os.path.exists(legacy)
    assert os.path.isdir(inflight)
    # stale dir timestamp but a FRESH file inside = active writer
    os.utime(inflight, (old, old))
    open(os.path.join(inflight, "part-y.parquet"), "w").close()
    assert clean_stale_stagings(root) == []
    assert os.path.isdir(inflight)
    # the manifest-referenced dir survives even past retention
    data_dir = os.path.join(root, read_manifest(root)["data_dir"])
    for dirpath, dirs, files in os.walk(data_dir):
        for n in dirs + files:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(data_dir, (old, old))
    assert clean_stale_stagings(root, retention_seconds=0) == [
        os.path.join(root, "shards-cafebabe")
    ]
    assert read_training_shards(spark, root, verify=True).count() == 25
    assert clean_stale_stagings(str(tmp_path / "nope")) == []


def test_epoch_ordering_is_seeded_and_deterministic(spark, tmp_path):
    from jde_to_datalake_spark.sources.training_shards import (
        epoch_shard_order,
        read_shard_shuffled,
    )

    root = str(tmp_path / "shards")
    write_training_shards(_packs(spark), root, rows_per_shard=5)  # 5 shards
    o1 = epoch_shard_order(root, seed=1)
    o2 = epoch_shard_order(root, seed=2)
    assert sorted(o1) == sorted(o2) == [0, 1, 2, 3, 4]
    assert o1 == epoch_shard_order(root, seed=1)  # replayable
    assert o1 != [0, 1, 2, 3, 4] or o2 != [0, 1, 2, 3, 4]  # some seed permutes

    ids_a = [r["pack_id"] for r in read_shard_shuffled(spark, root, 1, seed=7).collect()]
    ids_b = [r["pack_id"] for r in read_shard_shuffled(spark, root, 1, seed=8).collect()]
    assert sorted(ids_a) == sorted(ids_b) == list(range(5, 10))
    assert ids_a == [r["pack_id"] for r in read_shard_shuffled(spark, root, 1, seed=7).collect()]
    assert ids_a != ids_b  # different epoch, different order
    # the seeded order must be a GLOBAL sort: a per-partition sort
    # would order each input split independently, so the row order
    # would depend on spark.sql.files.maxPartitionBytes for shard
    # files larger than one split (round-4 advisor finding). One shard
    # is one task's data, so the range exchange is bounded by shard
    # size.
    plan = (
        read_shard_shuffled(spark, root, 1, seed=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan

    # and the order is split-invariant: force multi-split reads of the
    # same shard file and require the identical sequence
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
        ids_split = [
            r["pack_id"]
            for r in read_shard_shuffled(spark, root, 1, seed=7).collect()
        ]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert ids_split == ids_a
