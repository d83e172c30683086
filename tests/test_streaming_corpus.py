"""Streaming corpus dedup + band-key projection — stream/batch parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from jde_to_datalake_spark.session import load_table
from jde_to_datalake_spark.streaming import corpus as SC
from jde_to_datalake_spark.streaming import pipelines as P
from tests.conftest import SF_DIR


@pytest.fixture()
def docs_dir(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_stream")
    d.repartition(2).write.parquet(out)
    return out, d


def test_stream_dedup_matches_batch_fingerprints(spark, docs_dir):
    """The streamed dedup keeps exactly one doc per batch fingerprint."""
    directory, d = docs_dir
    stream = SC.dedup_document_stream(
        spark.readStream.schema(d.schema).parquet(directory)
    )
    assert stream.isStreaming
    P.run_available_now_to_memory(stream, "dedup_stream")
    got = spark.table("dedup_stream").collect()

    batch = {r.fingerprint: r for r in exact_dedup(d).collect()}
    assert len(got) == len(batch)  # one survivor per distinct content
    by_fp: dict = {}
    for r in got:
        assert r.fingerprint not in by_fp, "duplicate fingerprint survived"
        by_fp[r.fingerprint] = r
    assert set(by_fp) == set(batch)
    # every survivor is a genuine member of its content group: its own
    # normalized text hashes to the fingerprint it was kept under
    sample = got[:50]
    ids = [r.doc_id for r in sample]
    check = (
        exact_dedup(d.filter(F.col("doc_id").isin(ids)))
        .select("fingerprint")
        .collect()
    )
    assert {r.fingerprint for r in check} <= set(batch)


def test_stream_dedup_within_watermark_bounds_state(spark, docs_dir):
    """The watermarked form runs end-to-end with event-time state TTL."""
    directory, d = docs_dir
    src = (
        spark.readStream.schema(d.schema)
        .parquet(directory)
        .withColumn("ingested_at", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    )
    stream = SC.dedup_document_stream(
        src, event_time_col="ingested_at", watermark="1 hour"
    )
    P.run_available_now_to_memory(stream, "dedup_stream_wm")
    got = spark.table("dedup_stream_wm").select("fingerprint").collect()
    n_distinct = exact_dedup(d).count()
    # all rows share one event time -> within a single watermark window
    # the result equals the exact dedup
    assert len({r.fingerprint for r in got}) == len(got) == n_distinct


def test_stream_band_keys_match_batch_lsh_buckets(spark, docs_dir):
    """Streamed (id, band, band_hash) == the batch LSH banding."""
    directory, d = docs_dir
    stream = SC.minhash_band_stream(
        spark.readStream.schema(d.schema).parquet(directory)
    )
    P.run_available_now_to_memory(stream, "bands_stream")
    got = {
        (r.doc_id, r.band, r.band_hash)
        for r in spark.table("bands_stream").collect()
    }
    batch = {
        (r.doc_id, r.band, r.band_hash)
        for r in SC.minhash_band_stream(d).collect()
    }
    assert got == batch and len(got) > 0


def test_streamed_candidates_find_batch_near_dups(spark, docs_dir):
    """A streamed doc's band keys, joined to a batch-built bucket index,
    surface the same near-dup candidates the batch LSH finds."""
    directory, d = docs_dir
    # batch-side index: per-doc band keys from the same expressions
    index = SC.minhash_band_stream(d).withColumnRenamed("doc_id", "index_id")
    stream = SC.minhash_band_stream(
        spark.readStream.schema(d.schema).parquet(directory)
    )
    P.run_available_now_to_memory(stream, "bands_for_join")
    incoming = spark.table("bands_for_join")
    cand = (
        incoming.join(index, ["band", "band_hash"])
        .filter(F.col("doc_id") < F.col("index_id"))
        .select("doc_id", "index_id")
        .distinct()
        .collect()
    )
    cand_pairs = {(r.doc_id, r.index_id) for r in cand}
    verified = minhash_lsh_pairs(d, num_hashes=8, band_size=2, n=3, threshold=0.2)
    lsh_pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    # every verified near-dup pair must have been surfaced as a candidate
    assert lsh_pairs <= cand_pairs
