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


def test_sequence_pack_exact(spark):
    # token stream: doc1 |a b c| doc2 |d e f g| doc3 |h| doc4 |i..o|
    # budget 5 -> pack0 = doc1[1:3]+doc2[1:2], pack1 = doc2[3:4]+doc3+
    # doc4[1:2], pack2 = doc4[3:7]
    docs = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "d e f g"),
            (3, "h"),
            (4, "i j k l m n o"),
        ],
    )
    rows = {
        (r["doc_id"], r["pack_id"]): r
        for r in C.sequence_pack(docs, budget=5).collect()
    }
    want = {
        (1, 0): (1, 3, 0, 3),
        (2, 0): (1, 2, 3, 2),
        (2, 1): (3, 4, 0, 2),
        (3, 1): (1, 1, 2, 1),
        (4, 1): (1, 2, 3, 2),
        (4, 2): (3, 7, 0, 5),
    }
    assert set(rows) == set(want)
    for k, (s, e, p, n) in want.items():
        r = rows[k]
        assert (r["tok_start"], r["tok_end"], r["pos_in_pack"], r["n_toks"]) == (
            s, e, p, n
        ), k


def test_sequence_pack_invariants(spark):
    budget = 64
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packs = C.sequence_pack(docs, budget=budget)
    per_pack = packs.groupBy("pack_id").agg(
        F.sum("n_toks").alias("tot"),
        F.min("pos_in_pack").alias("first_pos"),
        F.max(F.col("pos_in_pack") + F.col("n_toks")).alias("end_pos"),
    )
    last = per_pack.agg(F.max("pack_id")).collect()[0][0]
    # every pack except the tail holds exactly `budget` tokens, starts
    # at offset 0, and its slices tile contiguously to the budget
    bad = per_pack.filter(
        (F.col("pack_id") != last)
        & (
            (F.col("tot") != budget)
            | (F.col("first_pos") != 0)
            | (F.col("end_pos") != budget)
        )
    )
    assert bad.count() == 0
    # per-document: slices tile 1..n_tokens with nothing lost
    per_doc = packs.groupBy("doc_id").agg(
        F.min("tok_start").alias("s"),
        F.max("tok_end").alias("e"),
        F.sum("n_toks").alias("n"),
    ).join(
        docs.select(
            "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n_tokens")
        ),
        "doc_id",
    )
    bad_docs = per_doc.filter(
        (F.col("s") != 1)
        | (F.col("e") != F.col("n_tokens"))
        | (F.col("n") != F.col("n_tokens"))
    )
    assert bad_docs.count() == 0


def test_sequence_pack_duckdb_parity(spark, duck):
    from tests.conftest import compare_frames

    got = C.sequence_pack(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), budget=512
    ).toPandas()
    exp = duck.execute(
        """
WITH tk AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
),
off AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
  FROM tk
),
packs AS (
  SELECT doc_id, n, o,
         UNNEST(generate_series(o // 512, (o + n - 1) // 512)) AS pack_id
  FROM off WHERE n > 0
)
SELECT doc_id,
       CAST(pack_id AS BIGINT) AS pack_id,
       CAST(GREATEST(pack_id * 512 - o + 1, 1) AS BIGINT) AS tok_start,
       CAST(LEAST((pack_id + 1) * 512 - o, n) AS BIGINT) AS tok_end,
       CAST(GREATEST(o - pack_id * 512, 0) AS BIGINT) AS pos_in_pack,
       CAST(LEAST((pack_id + 1) * 512 - o, n)
            - GREATEST(pack_id * 512 - o + 1, 1) + 1 AS BIGINT) AS n_toks
FROM packs
"""
    ).fetch_df()
    compare_frames(got, exp, "sequence_pack")


def test_assemble_packs_round_trip(spark):
    budget = 64
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packs = C.sequence_pack(docs, budget=budget)
    assembled = C.assemble_packs(docs, packs)
    rows = assembled.orderBy("pack_id").collect()
    # every pack except the tail is exactly the budget
    for r in rows[:-1]:
        assert r["n_toks"] == budget and len(r["tokens"]) == budget
    assert 0 < rows[-1]["n_toks"] <= budget
    # stitching all packs in order reproduces the document stream
    stream = [t for r in rows for t in r["tokens"]]
    want = [
        t
        for d in docs.select("doc_id", "text").orderBy("doc_id").collect()
        for t in d["text"].strip().split()
    ]
    assert stream == want


def test_sequence_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        C.sequence_pack(_docs(spark, [(1, "a b")]), budget=0)


def test_passage_dedup_exact(spark):
    # k=2 windows: doc1 ["a b","c d"], doc2 ["a b","x y"],
    # doc3 ["c d","c d"] -> only first occurrences survive
    docs = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "c d c d"),
        ],
    )
    rows = {r["doc_id"]: r for r in C.passage_dedup(docs, k=2).collect()}
    assert rows[1]["text"] == "a b c d" and rows[1]["n_kept"] == 2
    assert rows[2]["text"] == "x y" and rows[2]["n_kept"] == 1
    assert rows[3]["text"] == "" and rows[3]["n_kept"] == 0
    assert all(r["n_windows"] == 2 for r in rows.values())


def test_passage_dedup_duckdb_parity(spark, duck):
    """Parity against the SAME oracle the driver runs (imported, not
    duplicated — a copy here once drifted from the registry's SQL)."""
    from jde_to_datalake_spark.registry.pipeline_ops import (
        ORACLE_PASSAGE_DEDUP,
    )
    from tests.conftest import compare_frames

    got = C.passage_dedup(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), k=5
    ).toPandas()
    exp = duck.execute(ORACLE_PASSAGE_DEDUP).fetch_df()
    compare_frames(got, exp, "passage_dedup")


def test_passage_dedup_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        C.passage_dedup(_docs(spark, [(1, "a b")]), k=0)


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


def test_calibrate_threshold_exact_is_true_quantile(spark):
    from jde_to_datalake_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = docs.select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    cut = C.calibrate_threshold(scored, "q", keep_frac=0.6, exact=True)
    # contract: the exact cutoff is the true interpolated 0.4-quantile
    # (numpy 'linear' == Spark percentile == DuckDB quantile_cont)
    import numpy as np

    scores = np.array([r["q"] for r in scored.collect()], dtype=np.float64)
    # engines interpolate lower+(upper-lower)*frac with different
    # operation orders: equal to last-ulp tolerance, not bit-for-bit
    assert abs(cut - float(np.quantile(scores, 0.4, method="linear"))) < 1e-12
    kept = scored.filter(F.col("q") >= cut).count()
    assert kept >= int(0.6 * len(scores)) - 1


def test_calibrate_threshold_approx_tracks_exact(spark):
    from jde_to_datalake_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = docs.select(quality_score(F.col("text")).alias("q"))
    exact = C.calibrate_threshold(scored, "q", keep_frac=0.6, exact=True)
    approx = C.calibrate_threshold(
        scored, "q", keep_frac=0.6, relative_error=0.01
    )
    n = scored.count()
    # GK error is in rank: the approx cutoff's rank is within 1% + 1
    rank_exact = scored.filter(F.col("q") < exact).count()
    rank_approx = scored.filter(F.col("q") < approx).count()
    assert abs(rank_exact - rank_approx) <= 0.01 * n + 1
    with pytest.raises(ValueError):
        C.calibrate_threshold(scored, "q", keep_frac=0.0)


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


def test_token_df_and_rarity_metrics(spark):
    docs = _docs(
        spark,
        [
            (1, "common common unique1"),
            (2, "common other"),
            (3, "common other zzz"),
        ],
    )
    dfreq = {r["tok"]: r["df"] for r in C.token_df_counts(docs).collect()}
    # df = number of DOCS containing the token, not occurrences
    assert dfreq == {"common": 3, "other": 2, "unique1": 1, "zzz": 1}
    rows = {
        r["doc_id"]: r
        for r in C.rarity_metrics(docs, rare_df_threshold=1).collect()
    }
    # doc1 occurrences: common(3), common(3), unique1(1)
    assert rows[1]["mean_token_df"] == (3 + 3 + 1) / 3
    assert rows[1]["n_rare_tokens"] == 1 and rows[1]["rare_frac"] == 1 / 3
    # doc2: common(3), other(2) — nothing rare at threshold 1
    assert rows[2]["n_rare_tokens"] == 0 and rows[2]["rare_frac"] == 0.0
    # precomputed frequency table short-circuits the recount
    pre = C.token_df_counts(docs)
    rows2 = {
        r["doc_id"]: r
        for r in C.rarity_metrics(docs, pre, rare_df_threshold=1).collect()
    }
    assert rows2.keys() == rows.keys()
    assert all(rows2[k]["rare_frac"] == rows[k]["rare_frac"] for k in rows)


def test_sequence_pack_shuffle_salt_reorders_conserving_tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plain = C.sequence_pack(docs, budget=64)
    salted = C.sequence_pack(docs, budget=64, shuffle_salt="epoch1")
    # every document's tokens are fully conserved under the shuffled
    # order (the slices realign to the new grid, so spans may differ,
    # but they still tile 1..n_tokens with nothing lost)
    per_doc = salted.groupBy("doc_id").agg(
        F.min("tok_start").alias("s"),
        F.max("tok_end").alias("e"),
        F.sum("n_toks").alias("n"),
    ).join(
        docs.select(
            "doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n_tokens")
        ),
        "doc_id",
    )
    assert per_doc.filter(
        (F.col("s") != 1) | (F.col("e") != F.col("n_tokens"))
        | (F.col("n") != F.col("n_tokens"))
    ).count() == 0
    # the pack composition genuinely differs
    pa = {(r["doc_id"], r["pack_id"]) for r in plain.collect()}
    pb = {(r["doc_id"], r["pack_id"]) for r in salted.collect()}
    assert pa != pb
    # deterministic: same salt -> same packing, under any partitioning
    again = C.sequence_pack(docs.repartition(7), budget=64, shuffle_salt="epoch1")
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in again.collect()}
    # a different salt draws a different order
    other = C.sequence_pack(docs, budget=64, shuffle_salt="epoch2")
    assert {(r["doc_id"], r["pack_id"]) for r in other.collect()} != pb
    # full-budget invariant still holds when shuffled
    tot = salted.groupBy("pack_id").agg(F.sum("n_toks").alias("t"))
    last = tot.agg(F.max("pack_id")).collect()[0][0]
    assert tot.filter((F.col("pack_id") != last) & (F.col("t") != 64)).count() == 0


def test_top_ngrams_counts_and_determinism(spark, duck):
    from tests.conftest import compare_frames

    got = C.top_ngrams(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), n=2, k=25
    ).toPandas()
    exp = duck.execute(
        """
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents),
occ AS (
  SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS ngram
  FROM t, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
)
SELECT ngram,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM occ GROUP BY ngram
ORDER BY n_occurrences DESC, ngram LIMIT 25
"""
    ).fetch_df()
    compare_frames(got, exp, "top_ngrams")


def test_rarity_metrics_counts_oov_tokens_against_persisted_index(spark):
    """With a PRECOMPUTED frequency table, unseen tokens count as
    maximally rare (df=0) and all-OOV documents keep their row
    (review finding: the old inner join silently excluded both)."""
    index_docs = _docs(spark, [(1, "aaa bbb"), (2, "aaa ccc")])
    dfreq = C.token_df_counts(index_docs)
    batch = _docs(spark, [(10, "aaa zzz"), (11, "qqq www")])
    rows = {
        r["doc_id"]: r
        for r in C.rarity_metrics(batch, dfreq, rare_df_threshold=1).collect()
    }
    assert set(rows) == {10, 11}
    # doc 10: aaa df=2, zzz df=0 -> mean 1.0, one rare occurrence
    assert rows[10]["mean_token_df"] == 1.0
    assert rows[10]["n_rare_tokens"] == 1 and rows[10]["rare_frac"] == 0.5
    # doc 11: pure gibberish — the exact signal the metric exists for
    assert rows[11]["mean_token_df"] == 0.0
    assert rows[11]["n_rare_tokens"] == 2 and rows[11]["rare_frac"] == 1.0


def test_passage_dedup_preserves_untouched_text(spark):
    """Same fidelity contract as exact_substring_dedup: a document
    that keeps every passage keeps its ORIGINAL text byte-for-byte."""
    docs = _docs(
        spark,
        [
            (1, "alpha\tbeta  gamma\ndelta"),   # unique: untouched
            (2, "p q r s"),
            (3, "z p q r s w x y"),             # shares no 2-window start-
        ],
    )
    rows = {r["doc_id"]: r for r in C.passage_dedup(docs, k=2).collect()}
    assert rows[1]["text"] == "alpha\tbeta  gamma\ndelta"
    assert rows[1]["n_kept"] == rows[1]["n_windows"]


def test_passage_and_rarity_retain_null_text_docs(spark):
    """Every input row gets a verdict: NULL-text documents keep their
    rows (n_windows/n_rare 0, undefined means null) instead of
    silently vanishing from doc-keyed reports."""
    docs = _docs(
        spark,
        [(1, "alpha beta gamma delta epsilon"), (2, None)],
    )
    prows = {r["doc_id"]: r for r in C.passage_dedup(docs, k=2).collect()}
    assert set(prows) == {1, 2}
    assert prows[2]["text"] is None
    assert prows[2]["n_windows"] == 0 and prows[2]["n_kept"] == 0
    rrows = {r["doc_id"]: r for r in C.rarity_metrics(docs).collect()}
    assert set(rrows) == {1, 2}
    assert rrows[2]["mean_token_df"] is None
    assert rrows[2]["n_rare_tokens"] == 0 and rrows[2]["rare_frac"] is None


def test_compression_metrics_mirror_and_signal(spark):
    """zlib compression ratio (operators/corpus.py): matches the
    direct-zlib python mirror bit-for-bit, NULL/empty-total, and the
    signal separates repetitive text from diverse text."""
    import zlib

    from jde_to_datalake_spark.operators.corpus import compression_metrics

    rows = [
        (1, "spam spam spam " * 50),
        (2, "the quick brown fox jumps over the lazy dog near the river"),
        (3, None),
        (4, ""),
        (5, "9f8a7b 31xq zz91 kk2m-pp4r!! 77ua&3 vv0s^ jj6t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_metrics(docs).collect()
    }
    for i, t in rows:
        if t:
            raw = t.encode("utf-8")
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
        else:
            assert got[i] is None
    # repetitive << natural prose <= noisy text
    assert got[1] < 0.2 < got[2] < got[5]
    # Arrow path, not row-at-a-time Python
    plan = (
        compression_metrics(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
