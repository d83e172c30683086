"""Learned quality filter (operators/quality_model.py): training
separates constructed good/junk text, the exported-expression scorer
matches MLlib's own probabilities, scoring is deterministic and total,
and the scoring plan is a zero-shuffle codegen projection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.quality_model import (
    FEATURE_NAMES,
    quality_features,
    quality_model_score,
    score_quality_model,
    train_quality_classifier,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog and runs into the field",
    "a committee of researchers published the report after months of work",
    "she walked to the market in the morning and bought fresh bread there",
    "the river flows through the valley and the town depends on its water",
    "of all the books on the shelf this one is the most carefully written",
    "the students discussed the results of the experiment with the teacher",
]
JUNK = [
    "$$$ CLICK >>> 11111 !!! %%% @@@ ###",
    "0x3f9a 0x77b2 0xdead 0xbeef 0x0000 0xffff",
    ">>=+ ~~~ ||| ??!!?? ***** ^^^^ &&&&",
    "9283 1123 5529 8847 2291 7733 0912",
    "!!@@##$$%%^^&&**(())__++{{}}||::<<>>??",
    "zzz8 qq7x vv9k jj3m ww1p rr5t yy2n",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_training_separates_constructed_classes(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled)
    assert len(model["weights"]) == len(FEATURE_NAMES)
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_model(labeled, model).collect()
    }
    good = [scored[i] for i in range(len(GOOD))]
    junk = [scored[100 + i] for i in range(len(JUNK))]
    assert min(good) > max(junk), (good, junk)
    assert all(p > 0.5 for p in good) and all(p < 0.5 for p in junk)


def test_expression_scorer_matches_mllib_transform(spark):
    """The exported-floats expression path must agree with MLlib's own
    probability output (same model, two evaluation engines). BLAS dot
    vs codegen fold can differ in rounding — tolerance 1e-9, not
    bit-exactness (documented in the module docstring)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    labeled = _labeled(spark)
    feats = quality_features(labeled).select(
        "doc_id", F.col("label").cast("double").alias("__label"), *FEATURE_NAMES
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURE_NAMES), outputCol="__features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="__features", labelCol="__label", maxIter=50, regParam=0.0
    ).fit(assembled)
    mllib_probs = {
        r["doc_id"]: float(r["probability"][1])
        for r in lr.transform(assembled).collect()
    }
    model = {
        "features": list(FEATURE_NAMES),
        "weights": [float(w) for w in lr.coefficients],
        "intercept": float(lr.intercept),
    }
    ours = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_model(labeled, model).collect()
    }
    for k in mllib_probs:
        assert math.isfinite(ours[k])
        assert abs(ours[k] - mllib_probs[k]) < 1e-9, (
            k, ours[k], mllib_probs[k],
        )


def test_scoring_total_and_deterministic(spark):
    model = {
        "features": list(FEATURE_NAMES),
        "weights": [0.8, 0.1, 2.0, -3.0, -1.5],
        "intercept": -0.25,
    }
    docs = spark.createDataFrame(
        [(1, "a plain sentence with words"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in score_quality_model(docs, model).collect()}
    assert len(rows) == 4
    # NULL/empty text -> all-zero features -> sigmoid(intercept)
    expected_empty = 1.0 / (1.0 + math.exp(0.25))
    for k in (2, 3, 4):
        assert rows[k]["quality_prob"] == pytest.approx(expected_empty, abs=0)
    # partitioning invariance: fixed fold order -> bit-identical
    again = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_model(docs.repartition(3), model).collect()
    }
    assert {k: v["quality_prob"] for k, v in rows.items()} == again


def test_score_matches_python_mirror(spark):
    """Strict-order python mirror of the fold: z = b + Σ w_i f_i in
    feature order, then 1/(1+e^-z). The multiply-add chain is
    bit-exact (same order, same doubles); the logistic LINK goes
    through exp(), where the JVM's Math.exp and CPython's libm may
    disagree in the final ulp — so the probability compares at
    1-ulp-scale relative tolerance, not ==. (Same reason the module
    docstring says rank/threshold decisions should use the monotone z
    when bit-stability across runtimes matters.)"""
    model = {
        "features": list(FEATURE_NAMES),
        "weights": [0.3, -0.7, 1.1, 0.9, -2.2],
        "intercept": 0.4,
    }
    labeled = _labeled(spark)
    feats = quality_features(labeled).select("doc_id", *FEATURE_NAMES).collect()
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_model(labeled, model).collect()
    }
    for r in feats:
        z = model["intercept"]
        for name, w in zip(FEATURE_NAMES, model["weights"]):
            z = z + r[name] * w
        mirror = 1.0 / (1.0 + math.exp(-z))
        assert math.isclose(got[r["doc_id"]], mirror, rel_tol=1e-15), (
            r["doc_id"], got[r["doc_id"]], mirror,
        )


def test_scoring_plan_is_zero_shuffle_projection(spark):
    from conftest import SF_DIR
    from jde_to_datalake_spark.session import load_table

    model = {
        "features": list(FEATURE_NAMES),
        "weights": [0.1] * len(FEATURE_NAMES),
        "intercept": 0.0,
    }
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        score_quality_model(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the '*(n)' prefix is the whole-stage-codegen marker in the
    # executedPlan toString; the scoring Project must carry it
    assert "*(1) Project" in plan, plan[:500]


def test_feature_contract_enforced():
    with pytest.raises(ValueError):
        quality_model_score(
            {"features": ["other"], "weights": [1.0], "intercept": 0.0}
        )


def test_model_artifact_round_trip_and_time_travel(spark, tmp_path):
    from jde_to_datalake_spark.operators.quality_model import (
        load_model,
        save_model,
    )
    from jde_to_datalake_spark.sources.versioned import VersionedTable

    table = VersionedTable(str(tmp_path / "model"))
    m0 = {
        "features": list(FEATURE_NAMES),
        "weights": [0.1, -0.2, 0.3, -0.4, 0.5],
        "intercept": 1.25,
    }
    v0 = save_model(spark, table, m0)
    assert load_model(spark, table) == m0
    m1 = dict(m0, intercept=-7.5)
    save_model(spark, table, m1)
    # latest is the retrain; time travel pins the original
    assert load_model(spark, table) == m1
    assert load_model(spark, table, version=v0) == m0
    # a loaded model scores bit-identically to the in-memory one
    docs = _labeled(spark)
    a = {r["doc_id"]: r["quality_prob"]
         for r in score_quality_model(docs, m1).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in score_quality_model(docs, load_model(spark, table)).collect()}
    assert a == b
