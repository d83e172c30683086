"""Bloom-filter membership (operators/bloom.py): DuckDB parity on the
build+probe pipeline, the no-false-negatives contract, union
composition, the two-stage decontamination verdicts, and the
zero-shuffle probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, compare_frames
from jde_to_datalake_spark.operators.bloom import (
    _BITS_PER_WORD,
    bloom_build,
    bloom_decontaminate,
    bloom_probe,
    bloom_union,
    key_sql,
    optimal_params,
)
from jde_to_datalake_spark.session import load_table

NUM_BITS = 1 << 12  # deliberately small so false positives occur
K = 3


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _bench(spark):
    # benchmark set = every 5th document's text
    return _docs(spark).filter(F.col("doc_id") % 5 == 0)


# DuckDB mirror of build+probe: same sha256 prefixes, same mod-m
# double hashing, same 32-bit word layout
_KEY = key_sql(["text"])
_MIRROR_SQL = f"""
WITH bench AS (
  SELECT ('0x' || substr(sha256({_KEY}), 1, 15))::BIGINT % {NUM_BITS} AS h1,
         ('0x' || substr(sha256({_KEY}), 17, 15))::BIGINT % {NUM_BITS} AS h2
  FROM documents WHERE doc_id % 5 = 0
),
bits AS (
  SELECT DISTINCT (h1 + i * h2) % {NUM_BITS} AS p
  FROM bench, generate_series(0, {K - 1}) AS t(i)
),
words AS (
  SELECT (p >> 5) AS w, bit_or(1::BIGINT << (p % {_BITS_PER_WORD})::INT) AS word
  FROM bits GROUP BY 1
),
corpus AS (
  SELECT doc_id,
         ('0x' || substr(sha256({_KEY}), 1, 15))::BIGINT % {NUM_BITS} AS h1,
         ('0x' || substr(sha256({_KEY}), 17, 15))::BIGINT % {NUM_BITS} AS h2
  FROM documents
),
probes AS (
  SELECT c.doc_id,
         COALESCE(w.word, 0) & (1::BIGINT << (((c.h1 + i * c.h2) % {NUM_BITS}) % {_BITS_PER_WORD})::INT) AS hit
  FROM corpus c
  CROSS JOIN generate_series(0, {K - 1}) AS t(i)
  LEFT JOIN words w ON w.w = (((c.h1 + i * c.h2) % {NUM_BITS}) >> 5)
)
SELECT doc_id, bool_and(hit != 0) AS maybe_member
FROM probes GROUP BY doc_id
"""


def test_build_probe_matches_duckdb_mirror(spark, duck):
    words = bloom_build(_bench(spark), ["text"], NUM_BITS, K)
    got = (
        bloom_probe(_docs(spark), ["text"], words, K)
        .select("doc_id", "maybe_member")
        .toPandas()
    )
    exp = duck.execute(_MIRROR_SQL).fetch_df()
    compare_frames(got, exp, "bloom_mirror")


def test_no_false_negatives_and_some_false_positives(spark):
    # one word (32 bits) for ~10 benchmark keys x 3 probes: mostly
    # saturated, so non-members collide — the false-positive side of
    # the contract is observable at any corpus size
    words = bloom_build(_bench(spark), ["text"], _BITS_PER_WORD, K)
    rows = (
        bloom_probe(_docs(spark), ["text"], words, K)
        .select("doc_id", "maybe_member")
        .collect()
    )
    members = {r["doc_id"] for r in rows if r["doc_id"] % 5 == 0}
    flagged = {r["doc_id"] for r in rows if r["maybe_member"]}
    assert members <= flagged, "bloom dropped a true member"
    # the filter is sized far too small on purpose: non-members MUST
    # collide (otherwise the mirror test proves nothing about masks)
    assert flagged - members, "expected false positives at this sizing"


def test_union_equals_build_of_union(spark):
    docs = _docs(spark)
    a = bloom_build(docs.filter(F.col("doc_id") % 10 == 0), ["text"], NUM_BITS, K)
    b = bloom_build(docs.filter(F.col("doc_id") % 10 == 5), ["text"], NUM_BITS, K)
    both = bloom_build(docs.filter(F.col("doc_id") % 5 == 0), ["text"], NUM_BITS, K)
    assert bloom_union(a, b) == both


def test_optimal_params_sizing():
    m, k = optimal_params(1000, 0.01)
    assert m % _BITS_PER_WORD == 0
    # ~9.6 bits/item and ~7 probes at 1% fpr
    assert 9000 <= m <= 11000
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(10, 1.5)


def test_decontaminate_exact_verdicts(spark):
    docs = _docs(spark)
    bench = _bench(spark)
    out = bloom_decontaminate(docs, bench, ["text"], fpr=0.3).collect()
    bench_texts = {r["text"] for r in bench.collect()}
    for r in out:
        assert r["is_contaminated"] == (r["text"] in bench_texts)
        if r["is_contaminated"]:
            # exact hits can never have been pruned by the bloom stage
            assert r["bloom_flagged"]
    assert len(out) == docs.count()


def test_ngram_decontamination_contract(spark):
    """Shingle-level bloom decontamination: every document with a TRUE
    n-gram overlap against the benchmark is flagged (no false
    negatives), a clean verdict proves no overlap, and n_maybe_hits
    >= the true hit count per doc."""
    from jde_to_datalake_spark.operators.bloom import bloom_decontaminate_ngrams
    from jde_to_datalake_spark.operators.dedup import shingles

    docs = _docs(spark)
    bench = _bench(spark)
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate_ngrams(docs, bench, n=5).collect()
    }
    # ground truth: exact shingle intersection per doc
    true_hits = {
        r["doc_id"]: r["n"]
        for r in shingles(docs, 5)
        .join(shingles(bench, 5).select("shingle").distinct(), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(true_hits) <= {
        d for d, r in out.items() if r["maybe_contaminated"]
    }
    for d, n in true_hits.items():
        assert out[d]["n_maybe_hits"] >= n
    # benchmark docs ARE corpus docs here -> all flagged; and every
    # corpus row got a verdict
    assert len(out) == docs.count()
    assert all(out[r["doc_id"]]["maybe_contaminated"] for r in bench.collect())


def test_probe_is_zero_shuffle(spark):
    """100 TB posture: the probe side is a row-local projection over
    the broadcast word array — no Exchange on the corpus branch, no
    cartesian product (the 1-row crossJoin broadcasts)."""
    words = bloom_build(_bench(spark), ["text"], NUM_BITS, K)
    plan = (
        bloom_probe(_docs(spark), ["text"], words, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchange is the 1-row word-array broadcast; the corpus
    # branch itself never partitions
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("BroadcastExchange") == 1, plan
    assert "CartesianProduct" not in plan


def test_build_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        bloom_build(_docs(spark), ["text"], 100, 3)  # not a word multiple
    with pytest.raises(ValueError):
        bloom_build(_docs(spark), ["text"], NUM_BITS, 0)
    with pytest.raises(ValueError):
        bloom_probe(_docs(spark), ["text"], [], 3)  # empty word array


def test_empty_inputs_total(spark):
    """Totality: an empty benchmark builds an all-zero filter that
    flags nothing; an empty corpus probes/decontaminates to empty."""
    from jde_to_datalake_spark.operators.bloom import (
        bloom_decontaminate,
        bloom_decontaminate_ngrams,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = _docs(spark)
    words = bloom_build(empty, ["text"], NUM_BITS, K)
    assert all(w == 0 for w in words)
    flagged = bloom_probe(docs, ["text"], words, K).filter("maybe_member")
    assert flagged.count() == 0
    assert bloom_probe(empty, ["text"], words, K).count() == 0
    out = bloom_decontaminate(docs, empty, ["text"])
    assert out.filter("is_contaminated OR bloom_flagged").count() == 0
    ng = bloom_decontaminate_ngrams(docs, empty, n=5)
    assert ng.filter("maybe_contaminated").count() == 0
    assert bloom_decontaminate_ngrams(empty, docs, n=5).count() == 0


def test_null_keys_do_not_collide_across_positions(spark):
    """Round-4 advisor finding: under plain concat_ws the tuples
    ('x', NULL) and (NULL, 'x') produced identical keys, so a clean
    corpus row could be flagged as contaminated. The presence-tagged
    key keeps the positions distinct, and NULL still matches NULL
    (value semantics for membership)."""
    a = spark.createDataFrame([("x", None)], "c1 string, c2 string")
    b = spark.createDataFrame([(None, "x")], "c1 string, c2 string")
    wa = bloom_build(a, ["c1", "c2"], NUM_BITS, K)
    wb = bloom_build(b, ["c1", "c2"], NUM_BITS, K)
    assert wa != wb
    out = bloom_decontaminate(a, b, ["c1", "c2"]).collect()[0]
    assert not out["is_contaminated"]
    # NULL == NULL under the membership semantics
    same = bloom_decontaminate(a, a, ["c1", "c2"]).collect()[0]
    assert same["is_contaminated"] and same["bloom_flagged"]


def test_sharded_build_reassembles_to_flat_words(spark):
    """bloom_build_sharded + sharded_to_words == bloom_build bit-for-
    bit, shards are sparse (all-zero shards emit no row), union-OR
    matches a joint build, and the sharded probe agrees with the
    broadcast probe on hits AND misses."""
    from jde_to_datalake_spark.operators.bloom import (
        bloom_build,
        bloom_build_sharded,
        bloom_probe,
        bloom_probe_sharded,
        bloom_union_sharded,
        sharded_to_words,
    )

    num_bits, k, sw = 1 << 12, 4, 8
    a = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS key")
    b = spark.range(40, 80).selectExpr("CAST(id AS STRING) AS key")
    flat = bloom_build(a, ["key"], num_bits, k)
    sh = bloom_build_sharded(a, ["key"], num_bits, k, shard_words=sw)
    rows = sh.collect()
    assert sharded_to_words(rows, num_bits, sw) == flat
    # sparsity: with 40 keys x 4 bits over 128 words / 16 shards,
    # at least the empty shards are absent
    n_shards_total = (num_bits // 32) // sw
    assert len(rows) <= n_shards_total
    # union == joint build
    both = bloom_union_sharded(
        sh, bloom_build_sharded(b, ["key"], num_bits, k, shard_words=sw)
    )
    joint = bloom_build(a.unionAll(b), ["key"], num_bits, k)
    assert sharded_to_words(both.collect(), num_bits, sw) == joint
    # probe parity on a mixed member/non-member batch
    probe = spark.range(30, 50).selectExpr("CAST(id AS STRING) AS key")
    via_flat = {
        (r["key"], r["maybe_member"])
        for r in bloom_probe(probe, ["key"], flat, k).collect()
    }
    via_shards = {
        (r["key"], r["maybe_member"])
        for r in bloom_probe_sharded(
            probe, ["key"], sh, num_bits, k, shard_words=sw
        ).collect()
    }
    assert via_flat == via_shards
    # no false negatives: every true member of `a` flags maybe
    assert all(m for kk, m in via_flat if int(kk) < 40)
