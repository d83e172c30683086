"""Corpus-prep operators: chunking invariants, PII detection on
crafted rows (the synthetic corpus contains no PII, so the regexes are
proven here), decontamination hits, and the keep/drop composite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators import corpus as C
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_plan_covers_every_token(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = C.chunk_plan(docs, chunk_size=20, overlap=5)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("start_tok").alias("first_start"),
            F.max("end_tok").alias("last_end"),
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .join(
            docs.select(
                "doc_id",
                F.size(F.split(F.trim("text"), "\\s+")).alias("n_tokens"),
            ),
            "doc_id",
        )
    )
    bad = per_doc.filter(
        (F.col("first_start") != 1)
        | (F.col("last_end") != F.col("n_tokens"))
        | (F.col("max_idx") != F.col("n_chunks") - 1)
    )
    assert bad.count() == 0


def test_chunk_plan_overlap_and_stride(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(47)))])
    rows = C.chunk_plan(docs, chunk_size=20, overlap=5).orderBy("chunk_idx").collect()
    assert [r["start_tok"] for r in rows] == [1, 16, 31, 46]
    assert [r["end_tok"] for r in rows] == [20, 35, 47, 47]
    # consecutive chunks share exactly `overlap` tokens (full chunks)
    assert rows[0]["end_tok"] - rows[1]["start_tok"] + 1 == 5
    assert rows[0]["chunk_text"].split() == [f"w{i}" for i in range(20)]


def test_chunk_plan_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        C.chunk_plan(_docs(spark, [(1, "a b")]), chunk_size=5, overlap=5)


def test_pii_metrics_and_redaction(spark):
    docs = _docs(
        spark,
        [
            (1, "contact bob@example.com or alice@mail.co today"),
            (2, "call +1 (555) 123-4567 now"),
            (3, "server at 10.0.255.1 responded"),
            (4, "nothing sensitive here"),
        ],
    )
    rows = {r["doc_id"]: r for r in C.pii_metrics(docs).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["n_phones"] == 0
    assert rows[2]["n_phones"] == 1
    assert rows[3]["n_ips"] == 1
    assert rows[4]["n_emails"] == rows[4]["n_phones"] == rows[4]["n_ips"] == 0
    red = docs.select("doc_id", C.redact(F.col("text")).alias("r")).collect()
    red = {r["doc_id"]: r["r"] for r in red}
    assert red[1] == "contact <EMAIL> or <EMAIL> today"
    assert red[2] == "call <PHONE> now"
    assert red[3] == "server at <IP> responded"
    assert red[4] == "nothing sensitive here"


def test_repetition_metrics(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a a"),  # one token repeated
            (2, "a b c d"),  # all distinct
            (3, "x y x y x"),  # repeated bigrams too
        ],
    )
    rows = {r["doc_id"]: r for r in C.repetition_metrics(docs).collect()}
    assert rows[1]["dup_token_frac"] == 0.75 and rows[1]["top_token_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 0.0 and rows[2]["top_token_frac"] == 0.25
    # doc 3 bigrams: "x y","y x","x y","y x" -> 2 dups of 4
    assert rows[3]["dup_bigram_frac"] == 0.5


def test_decontamination_hits(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox jumps over something else entirely"),
            (3, "completely different words in this one friend"),
        ],
    )
    hits = C.decontamination_hits(
        docs, docs.filter("doc_id = 1"), n=5
    ).collect()
    got = {r["doc_id"]: r["n_eval_hits"] for r in hits}
    # doc 2 shares 5-gram "quick brown fox jumps over" with eval doc 1
    assert got[2] == 1
    assert 3 not in got  # no shared shingles -> no row (inner join)
    assert got[1] >= 1  # eval doc trivially hits itself


def test_gopher_keep_thresholds(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 5.0, 0.1, False, True),   # all good
            (2, 5, 5.0, 0.1, False, False),    # too short
            (3, 100, 20.0, 0.1, False, False), # avg token too long
            (4, 100, 5.0, 0.9, False, False),  # too repetitive
            (5, 100, 5.0, 0.1, True, False),   # contaminated
        ],
        "id bigint, n bigint, avg double, top double, contam boolean, want boolean",
    )
    out = df.select(
        "id", "want",
        C.gopher_keep(
            F.col("n"), F.col("avg"), F.col("top"), F.col("contam")
        ).alias("keep"),
    ).collect()
    for r in out:
        assert r["keep"] == r["want"], r["id"]


def test_filter_report_flags_nontrivial(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    is_eval = F.col("doc_id") % 97 == 0
    rep = C.filter_report(docs, docs.filter(is_eval), is_eval, shingle_n=5)
    agg = rep.agg(
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.sum((~F.col("keep")).cast("int")).alias("dropped"),
        F.sum(F.col("is_eval").cast("int")).alias("evals"),
    ).collect()[0]
    assert agg["kept"] > 0 and agg["dropped"] > 0 and agg["evals"] > 0
