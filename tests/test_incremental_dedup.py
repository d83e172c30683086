"""Batch-incremental dedup against persisted index artifacts
(operators/dedup.py: incremental_exact_dedup / band_index /
incremental_lsh_candidates) — model-checked flags, idempotence, the
versioned-table composition, and signature-estimator calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.dedup import (
    band_index,
    incremental_exact_dedup,
    incremental_lsh_candidates,
    minhash_lsh_pairs,
    minhash_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_exact_flags_match_set_model(spark):
    corpus = _docs(spark, [(1, "old content one"), (2, "old content two")])
    index = corpus.select(
        F.sha2(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 256
        ).alias("fingerprint")
    )
    batch = _docs(
        spark,
        [
            (10, "old content one"),     # known
            (11, "fresh material here"), # novel
            (12, "fresh material here"), # intra-batch dup of 11
            (13, "another new one"),     # novel
        ],
    )
    rows = {r["doc_id"]: r for r in incremental_exact_dedup(batch, index).collect()}
    assert rows[10]["is_known"] and not rows[10]["is_novel"]
    assert rows[11]["is_novel"] and rows[11]["is_batch_first"]
    assert not rows[12]["is_novel"] and not rows[12]["is_batch_first"]
    assert not rows[12]["is_known"]  # new content, just not the keeper
    assert rows[13]["is_novel"]
    # every row keeps its payload and gains a fingerprint
    assert all(r["fingerprint"] for r in rows.values())


def test_incremental_exact_is_idempotent_after_append(spark):
    """Re-running a batch after appending its novel fingerprints must
    find nothing novel — the ledger-idempotency contract."""
    index = _docs(spark, [(1, "seed")]).select(
        F.sha2(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 256
        ).alias("fingerprint")
    )
    batch = _docs(spark, [(2, "brand new doc"), (3, "seed")])
    first = incremental_exact_dedup(batch, index)
    novel_fps = first.filter("is_novel").select("fingerprint")
    assert novel_fps.count() == 1
    grown = index.unionAll(novel_fps)
    second = incremental_exact_dedup(batch, grown)
    assert second.filter("is_novel").count() == 0


def test_incremental_exact_composes_with_versioned_table(spark, tmp_path):
    """The production loop: fingerprint index lives in a versioned
    table; each batch appends only its novel fingerprints as a new
    version (history = ingestion audit trail)."""
    from jde_to_datalake_spark.sources.versioned import VersionedTable

    table = VersionedTable(str(tmp_path / "fps"))
    b1 = _docs(spark, [(1, "alpha doc"), (2, "beta doc")])
    empty_index = spark.createDataFrame([], "fingerprint string")
    r1 = incremental_exact_dedup(b1, empty_index)
    table.commit(r1.filter("is_novel").select("fingerprint"), mode="overwrite")
    b2 = _docs(spark, [(3, "alpha doc"), (4, "gamma doc")])
    r2 = incremental_exact_dedup(b2, table.read(spark))
    flags = {r["doc_id"]: r["is_novel"] for r in r2.collect()}
    assert flags == {3: False, 4: True}
    table.commit(r2.filter("is_novel").select("fingerprint"), mode="append")
    assert table.read(spark).count() == 3  # alpha, beta, gamma
    assert len(table.history()) == 2


def test_lsh_candidates_against_index_and_estimator(spark):
    """A batch near-dup of an indexed doc surfaces as a candidate via
    the persisted band keys, with the signature Jaccard estimate high
    for the near-dup and the unrelated doc absent."""
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different indexed material on other topics"),
        ],
    )
    bands = band_index(corpus)
    sigs = minhash_signatures(corpus)
    batch = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),
            (101, "nothing like anything indexed at all whatsoever"),
        ],
    )
    pairs = {
        (r["new_id"], r["indexed_id"]): r["est_jaccard"]
        for r in incremental_lsh_candidates(
            batch, bands, index_signatures=sigs
        ).collect()
    }
    assert (100, 1) in pairs
    assert pairs[(100, 1)] >= 0.5  # near-dup: most signature rows agree
    assert not any(n == 101 for n, _ in pairs)
    # without signatures: bare candidate pairs
    bare = {
        (r["new_id"], r["indexed_id"])
        for r in incremental_lsh_candidates(batch, bands).collect()
    }
    assert bare == set(pairs)


def test_incremental_candidates_consistent_with_batch_lsh(spark):
    """Index + batch candidates must agree with running the full batch
    LSH over the union: every (new, indexed) pair the one-shot batch
    operator verifies at threshold 0 appears in the incremental
    candidate set too (same banding — no recall loss from indexing)."""
    rows = [
        (i, f"shared boilerplate prefix sentence number {i % 3} with tail {i}")
        for i in range(12)
    ]
    corpus = _docs(spark, rows[:8])
    batch = _docs(spark, rows[8:])
    inc = {
        (r["new_id"], r["indexed_id"])
        for r in incremental_lsh_candidates(batch, band_index(corpus)).collect()
    }
    full = minhash_lsh_pairs(
        _docs(spark, rows), threshold=0.0
    ).collect()
    cross = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in full
        if (r["id_a"] >= 8) != (r["id_b"] >= 8)  # one side new, one indexed
    }
    assert cross <= inc  # incremental candidates never miss a verified pair


def test_streaming_band_keys_join_batch_index(spark, tmp_path):
    """The lambda split: band keys projected on a STREAM equi-join the
    batch-built index and surface the same candidates."""
    from jde_to_datalake_spark.streaming.corpus import minhash_band_stream

    corpus = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    idx = band_index(corpus).select(
        F.col("doc_id").alias("indexed_id"), "band", "band_hash"
    )
    src = str(tmp_path / "src")
    _docs(
        spark, [(50, "the quick brown fox jumps over the lazy dog")]
    ).repartition(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    keys = minhash_band_stream(stream)
    joined = keys.join(idx, ["band", "band_hash"]).select(
        F.col("doc_id").alias("new_id"), "indexed_id"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("inc_cands")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["new_id"], r["indexed_id"])
        for r in spark.sql("SELECT DISTINCT * FROM inc_cands").collect()
    }
    assert got == {(50, 1)}


def test_null_text_rows_stay_in_output_with_flags_false(spark):
    """NULL-text rows must not vanish (review finding): they stay in
    the output with all flags false — nothing NULL is ingested or
    appended to the index."""
    index = spark.createDataFrame([], "fingerprint string")
    batch = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "hello world")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in incremental_exact_dedup(batch, index).collect()}
    assert set(rows) == {1, 2, 3}  # nothing dropped
    assert rows[2]["fingerprint"] is None
    assert not rows[2]["is_known"] and not rows[2]["is_batch_first"]
    assert not rows[2]["is_novel"]
    assert rows[1]["is_novel"] and not rows[3]["is_novel"]
