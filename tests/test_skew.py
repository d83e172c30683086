"""Skew diagnostics + the report->salt->join loop (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.relational import salted_join
from jde_to_datalake_spark.operators.skew import (
    key_histogram,
    skew_report,
    suggest_salt_buckets,
)


def _skewed(spark, hot_rows=900, cold_keys=100):
    hot = spark.range(hot_rows).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(cold_keys).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_skew_report_finds_the_hot_key(spark):
    rep = skew_report(_skewed(spark), ["k"], top_n=3)
    assert rep["total_rows"] == 1000
    assert rep["distinct_keys"] == 101
    assert rep["max_key_rows"] == 900
    assert rep["top_keys"][0]["k"] == "HOT"
    assert abs(rep["top_keys"][0]["share"] - 0.9) < 1e-9
    assert rep["skew_ratio"] > 50  # 900 / (1000/101)


def test_uniform_data_suggests_no_salt(spark):
    df = spark.range(1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    rep = skew_report(df, ["k"])
    assert rep["max_key_rows"] == 10
    assert suggest_salt_buckets(rep, shuffle_partitions=8) == 1


def test_empty_input_is_total(spark):
    df = _skewed(spark).limit(0)
    rep = skew_report(df, ["k"])
    assert rep["total_rows"] == 0 and rep["top_keys"] == []
    assert suggest_salt_buckets(rep, shuffle_partitions=8) == 1


def test_report_feeds_salted_join_and_preserves_results(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("HOT", "hot dim"), ("c1", "cold dim")], "k string, label string"
    )
    rep = skew_report(left, ["k"])
    buckets = suggest_salt_buckets(rep, shuffle_partitions=8)
    assert buckets > 1  # the hot key must trigger salting

    got = salted_join(left, right, "k", salt_buckets=buckets)
    want = left.join(right, "k")
    assert got.count() == want.count() == 901
    assert (
        got.agg(F.sum("v")).collect()[0][0]
        == want.agg(F.sum("v")).collect()[0][0]
    )


def test_histogram_is_one_shuffle(spark):
    plan = (
        key_histogram(_skewed(spark), ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1
