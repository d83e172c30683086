"""Bucketed tables remove the per-query shuffle (sources/bucketed.py)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.bucketed import (
    is_exchange_free,
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    """orders + lineitem bucketed by orderkey into the same bucket
    count, as a reconciliation lake would land them."""
    suffix = uuid.uuid4().hex[:8]
    names = (f"orders_b_{suffix}", f"lineitem_b_{suffix}")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, names[0], str(tmp_path / names[0]), ["o_orderkey"], 8,
        sort_by=["o_orderkey"],
    )
    write_bucketed(
        lineitem, names[1], str(tmp_path / names[1]), ["l_orderkey"], 8,
        sort_by=["l_orderkey"],
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    # broadcast off: at test scale the sides fit the broadcast
    # threshold and a BroadcastExchange would mask what's being proven
    # (at lake scale neither side of this join broadcasts)
    on, ln = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, l = read_bucketed(spark, on), read_bucketed(spark, ln)
        joined = o.join(l, o.o_orderkey == l.l_orderkey).where(
            F.col("l_quantity") > 0
        )
        assert is_exchange_free(joined)

        # identical logical join over the raw parquet shuffles both sides
        o_raw = spark.read.parquet(f"{SF}/orders.parquet")
        l_raw = spark.read.parquet(f"{SF}/lineitem.parquet")
        raw = o_raw.join(l_raw, o_raw.o_orderkey == l_raw.l_orderkey)
        assert not is_exchange_free(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, bucketed_pair):
    on, ln = bucketed_pair
    o, l = read_bucketed(spark, on), read_bucketed(spark, ln)
    got = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("sq"),
        )
        .collect()[0]
    )
    o_raw = spark.read.parquet(f"{SF}/orders.parquet")
    l_raw = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = (
        o_raw.join(l_raw, o_raw.o_orderkey == l_raw.l_orderkey)
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("sq"))
        .collect()[0]
    )
    assert got["n"] == want["n"] and got["sq"] == want["sq"]


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    _, ln = bucketed_pair
    l = read_bucketed(spark, ln)
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
    assert is_exchange_free(agg)
    # sanity: same agg over raw parquet needs the shuffle
    l_raw = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert not is_exchange_free(
        l_raw.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
    )


def test_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    on, _ = bucketed_pair
    files = [
        f for f in (tmp_path / on).iterdir()
        if f.name.endswith(".parquet") and not f.name.startswith(("_", "."))
    ]
    assert len(files) == 8  # repartition collapsed task x bucket fan-out
