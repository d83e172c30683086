"""Exact-substring dedup (operators/dedup.py:exact_substring_dedup):
crafted exact cases, DuckDB parity via an independent naive
derivation, and the scale plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.dedup import exact_substring_dedup
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_small_case(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e"),
            (2, "x a b c y"),   # "a b c" repeats doc1's run
            (3, "a b"),          # wholly duplicated content
            (4, "z"),            # shorter than min_len
        ],
    )
    rows = {r["doc_id"]: r for r in exact_substring_dedup(docs, min_len=2).collect()}
    # first occurrence keeps everything
    assert rows[1]["text"] == "a b c d e" and rows[1]["n_dup_tokens"] == 0
    # doc2: windows (a b)@2 and (b c)@3 are non-first -> tokens 2..4 cut
    assert rows[2]["text"] == "x y" and rows[2]["n_dup_tokens"] == 3
    # fully duplicated doc keeps its row, empty text
    assert rows[3]["text"] == "" and rows[3]["n_dup_tokens"] == 2
    # sub-min_len doc passes through
    assert rows[4]["text"] == "z" and rows[4]["n_dup_tokens"] == 0
    assert rows[4]["n_tokens"] == 1


def test_first_occurrence_is_lexicographic(spark):
    # same content at (1, pos 3) and (1, pos 1): earlier position wins
    docs = _docs(spark, [(1, "p q p q"), (2, "p q")])
    rows = {r["doc_id"]: r for r in exact_substring_dedup(docs, min_len=2).collect()}
    # doc1's window (p q)@1 is first; (q p)@2 unique; (p q)@3 dup -> cut 3..4
    assert rows[1]["text"] == "p q" and rows[1]["n_dup_tokens"] == 2
    assert rows[2]["text"] == "" and rows[2]["n_dup_tokens"] == 2


def test_rejects_bad_min_len(spark):
    with pytest.raises(ValueError):
        exact_substring_dedup(_docs(spark, [(1, "a b")]), min_len=0)


def test_duckdb_parity_naive_derivation(spark, duck):
    """The interval-merge + complement-slice rewrite must agree with a
    naive independent derivation: a token survives iff NO non-first
    duplicate window covers it (EXISTS probe per token)."""
    from tests.conftest import compare_frames

    L = 5
    got = exact_substring_dedup(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), min_len=L
    ).toPandas()
    exp = duck.execute(
        f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
w AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i:i+{L - 1}], ' ')) AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {L} + 1)) AS g(i)
),
ranked AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS cnt
  FROM w
),
dup AS (SELECT doc_id, start FROM ranked WHERE cnt > 1 AND rn > 1),
pos AS (
  SELECT doc_id, UNNEST(generate_series(1, len(t))) AS p, t FROM toks
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.t[pos.p] AS tok
  FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM dup
    WHERE dup.doc_id = pos.doc_id
      AND dup.start <= pos.p AND pos.p <= dup.start + {L} - 1
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(a.text, '') AS text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dup_tokens
FROM toks t LEFT JOIN agg a USING (doc_id)
"""
    ).fetch_df()
    compare_frames(got, exp, "exact_substring_dedup")
    # the corpus must actually contain >= L-token repeats, or the test
    # proves nothing
    assert (got["n_dup_tokens"] > 0).any()


def test_plan_shape(spark):
    """Scale posture: no cartesian/BNLJ; the shuffles are the window-
    hash agg + probe join, the per-doc island window, the interval
    collect, and the reassembly join — bounded, keyed, no global
    single-partition window."""
    df = exact_substring_dedup(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), min_len=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 7, plan.count("Exchange")
    # the islands window is keyed by doc — never a global window
    assert "windowspecdefinition()" not in plan.lower().replace(" ", "")


def test_empty_input_total(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert exact_substring_dedup(docs, min_len=3).count() == 0


def test_hot_passage_skew_correctness(spark):
    """A passage repeated across MANY documents (boilerplate) is the
    skew case the min-struct agg exists for: first occurrence wins,
    every other copy is cut, and the plan stays the agg shape (no
    per-passage window sort)."""
    boiler = "terms of service apply here always"
    rows = [(i, f"unique{i} " + boiler) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_dedup(docs, min_len=6).orderBy("doc_id").collect()
    # each doc is 7 tokens (uniqueN + 6 boiler) -> two 6-token windows:
    # start 1 (uniqueN + 5 boiler, unique per doc) and start 2 (the
    # all-boiler window, identical in EVERY doc — the hot key). Its
    # first occurrence is doc 0, which therefore keeps everything.
    assert out[0]["text"] == "unique0 " + boiler
    assert out[0]["n_dup_tokens"] == 0
    # every later doc loses exactly the 6 boiler tokens
    for r in out[1:]:
        assert r["text"] == f"unique{r['doc_id']}"
        assert r["n_dup_tokens"] == 6
    plan = exact_substring_dedup(docs, min_len=6)._jdf.queryExecution() \
        .executedPlan().toString()
    # first-occurrence selection must be the agg, not a window keyed by
    # the (hot) passage hash
    assert "windowspecdefinition(__h" not in plan.lower()


def test_untouched_docs_keep_original_whitespace(spark):
    """Documents with nothing to cut keep their ORIGINAL text
    byte-for-byte — newlines, tabs, and space runs survive (review
    finding: the old reassembly normalized all whitespace corpus-wide).
    NULL/empty text reports zero tokens and passes through."""
    docs = _docs(
        spark,
        [
            (1, "para1\n\npara2\tcode  indent"),
            (2, "a b c d e f"),
            (3, "x a b c d e y"),  # shares no 6-window with doc 2... craft:
            (4, ""),
            (5, None),
        ],
    )
    rows = {r["doc_id"]: r for r in exact_substring_dedup(docs, min_len=6).collect()}
    assert rows[1]["text"] == "para1\n\npara2\tcode  indent"
    assert rows[1]["n_dup_tokens"] == 0
    assert rows[4]["text"] == "" and rows[4]["n_tokens"] == 0
    assert rows[5]["text"] is None and rows[5]["n_tokens"] == 0
    # a doc that IS cut gets the single-space reassembly (documented)
    docs2 = _docs(spark, [(1, "one  two  three four"), (2, "z one two three w")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs2, min_len=3).collect()}
    # doc1 first occurrence: original byte-for-byte, double spaces kept
    assert out[1]["text"] == "one  two  three four"
    # doc2 loses the repeated run; survivors single-space joined
    assert out[2]["n_dup_tokens"] > 0
