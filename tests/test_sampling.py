"""Deterministic sampling ops (operators/sampling.py) — including
literal cross-engine parity: the same hash arithmetic runs in DuckDB
and must produce the SAME rows, not just similar fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from jde_to_datalake_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    hash_uniform,
    hash_uniform_sql,
    mixture_rates,
    mixture_sample,
    sample_per_group,
)
from tests.conftest import SF_DIR, compare_frames


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_split_disjoint_exhaustive_and_stable(spark):
    docs = _docs(spark)
    out = hash_split(docs, ["doc_id"], {"train": 8, "val": 1, "test": 1})
    n = docs.count()
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n  # exhaustive
    assert set(by) == {"train", "val", "test"}
    assert by["train"] > 0.7 * n  # ~80% within tolerance at n=500
    # stability: membership is per-key, so a subset of the input gets
    # the identical labels (append-stability seen from the other side)
    sub = hash_split(docs.limit(100), ["doc_id"], {"train": 8, "val": 1, "test": 1})
    joined = sub.select("doc_id", F.col("split").alias("s2")).join(
        out.select("doc_id", "split"), "doc_id"
    )
    assert joined.filter(F.col("split") != F.col("s2")).count() == 0


def test_sample_fraction_and_retry_stability(spark):
    docs = _docs(spark)
    s1 = deterministic_sample(docs, ["doc_id"], 0.25)
    s2 = deterministic_sample(docs.repartition(7), ["doc_id"], 0.25)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # partitioning-independent, unlike df.sample
    n = docs.count()
    assert 0.15 * n < len(ids1) < 0.35 * n
    # independent salts draw independent samples
    ids3 = {
        r["doc_id"]
        for r in deterministic_sample(docs, ["doc_id"], 0.25, salt="exp2")
        .select("doc_id").collect()
    }
    assert ids3 != ids1


def test_sample_matches_duckdb_exactly(spark, duck):
    got = (
        deterministic_sample(_docs(spark), ["doc_id"], 0.2)
        .select("doc_id", "lang")
        .toPandas()
    )
    u = hash_uniform_sql(["doc_id"])
    exp = duck.execute(
        f"SELECT doc_id, lang FROM documents WHERE {u} < 0.2"
    ).fetch_df()
    compare_frames(got, exp, "deterministic_sample")


def test_split_matches_duckdb_exactly(spark, duck):
    got = (
        hash_split(_docs(spark), ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    u = hash_uniform_sql(["doc_id"])
    exp = duck.execute(
        f"""
        SELECT CASE WHEN {u} < 0.8 THEN 'train'
                    WHEN {u} < 0.9 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
        """
    ).fetch_df()
    compare_frames(got, exp, "hash_split")


def test_sample_per_group_exact_k_and_parity(spark, duck):
    docs = _docs(spark)
    got = sample_per_group(docs, ["lang"], ["doc_id"], k=5).select(
        "lang", "doc_id"
    )
    sizes = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    group_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for g, n in sizes.items():
        assert n == min(5, group_sizes[g])
    exp = duck.execute(
        """
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY sha256(concat_ws(chr(31), CAST(doc_id AS VARCHAR), '')),
                            doc_id
                 ) AS rn
          FROM documents
        ) WHERE rn <= 5
        """
    ).fetch_df()
    compare_frames(got.toPandas(), exp, "sample_per_group")


def test_mixture_rates_math(spark):
    docs = _docs(spark)
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    langs = sorted(counts)[:2]
    target = {langs[0]: 3.0, langs[1]: 1.0}
    rates = mixture_rates(docs, "lang", target)
    t_max = min(counts[langs[0]] / 0.75, counts[langs[1]] / 0.25)
    assert rates[langs[0]][1] == int(t_max * 0.75)
    assert rates[langs[1]][1] == int(t_max * 0.25)
    assert all(0.0 < r <= 1.0 for r, _ in rates.values())
    # the binding domain keeps everything (rate 1, k == its count)
    binding = min(langs, key=lambda d: counts[d] / (0.75 if d == langs[0] else 0.25))
    assert rates[binding][1] == counts[binding]
    with pytest.raises(ValueError):
        mixture_rates(docs, "lang", {"no_such_lang": 1.0})
    with pytest.raises(ValueError):
        mixture_rates(docs, "lang", {})


def test_mixture_sample_exact_counts_and_parity(spark, duck):
    docs = _docs(spark)
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )[:2]
    target = {langs[0]: 0.5, langs[1]: 0.5}
    rates = mixture_rates(docs, "lang", target)
    got = mixture_sample(docs, "lang", target, ["doc_id"], exact=True).select(
        "lang", "doc_id"
    )
    sizes = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {d: k for d, (_, k) in rates.items()}
    # exact variant is the hash-order prefix per domain — DuckDB agrees
    ks = ", ".join(f"('{d}', {k})" for d, (_, k) in sorted(rates.items()))
    exp = duck.execute(
        f"""
        WITH ks(lang, k) AS (VALUES {ks})
        SELECT d.lang, d.doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY sha256(concat_ws(chr(31), CAST(doc_id AS VARCHAR), '')),
                            doc_id
                 ) AS rn
          FROM documents
        ) d JOIN ks USING (lang) WHERE d.rn <= ks.k
        """
    ).fetch_df()
    compare_frames(got.toPandas(), exp, "mixture_sample_exact")


def test_mixture_sample_bernoulli_parity_and_no_shuffle(spark, duck):
    docs = _docs(spark)
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )[:2]
    target = {langs[0]: 0.7, langs[1]: 0.3}
    rates = mixture_rates(docs, "lang", target)
    sampled = mixture_sample(docs, "lang", target, ["doc_id"])
    got = sampled.select("lang", "doc_id").toPandas()
    u = hash_uniform_sql(["doc_id"])
    cases = " ".join(
        f"WHEN lang = '{d}' THEN {r!r}" for d, (r, _) in sorted(rates.items())
    )
    exp = duck.execute(
        f"SELECT lang, doc_id FROM documents WHERE {u} < (CASE {cases} ELSE 0.0 END)"
    ).fetch_df()
    compare_frames(got, exp, "mixture_sample_bernoulli")
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter over the scan


def test_sample_filter_pushes_to_scan(spark):
    plan = (
        deterministic_sample(_docs(spark), ["doc_id"], 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the hash filter itself can't convert to a parquet predicate, but
    # it must evaluate scan-side (no shuffle, no extra stage)
    assert "Exchange" not in plan


def test_empty_and_degenerate_inputs(spark):
    docs = _docs(spark).limit(0)
    assert deterministic_sample(docs, ["doc_id"], 0.5).count() == 0
    assert hash_split(docs, ["doc_id"], {"a": 1.0}).count() == 0
    assert sample_per_group(docs, ["lang"], ["doc_id"], 3).count() == 0
    one = hash_split(_docs(spark), ["doc_id"], {"only": 1})
    assert one.filter(F.col("split") != "only").count() == 0


def test_temperature_weights_math_and_composition(spark):
    from jde_to_datalake_spark.operators.sampling import temperature_weights

    counts = {"en": 1600, "de": 100}
    # tau=1: natural proportions
    w1 = temperature_weights(counts, tau=1.0)
    assert abs(w1["en"] - 1600 / 1700) < 1e-12
    # tau=0.5: sqrt smoothing -> 40:10 -> 0.8/0.2
    w5 = temperature_weights(counts, tau=0.5)
    assert abs(w5["en"] - 0.8) < 1e-12 and abs(w5["de"] - 0.2) < 1e-12
    # lower tau always shifts mass toward the tail
    assert w5["de"] > w1["de"]
    assert abs(sum(w5.values()) - 1.0) < 1e-12
    # composes with the mixture planner on real data
    docs = _docs(spark)
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    target = temperature_weights(sizes, tau=0.5)
    rates = mixture_rates(docs, "lang", target)
    assert set(rates) == set(sizes)
    assert all(0 < r <= 1.0 for r, _ in rates.values())
    # the binding domain keeps everything
    assert any(k == sizes[d] for d, (_, k) in rates.items())
    with pytest.raises(ValueError):
        temperature_weights(counts, tau=0.0)
    with pytest.raises(ValueError):
        temperature_weights({}, tau=0.5)
