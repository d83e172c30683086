"""Reconciliation operators — the reference's flagship query shapes.

These re-express the two headline endpoints of the reference as single
lazy Spark plans over the engine's tables:

- ``pivot_report``   <- GET /data/pivot_report   (backend/main.py:328-415)
- ``live_comparison`` <- GET /data/joined_df3    (backend/main.py:417-537)

On testdata the two "systems" being reconciled are: the order header
total (``orders.o_totalprice``) vs the total recomputed from its line
items (Σ extendedprice·(1-discount)·(1+tax)) — exactly the
header-vs-detail reconciliation semantics of JDE cardex vs bakery
on-hand, but runnable at any scale factor.

Scale: one shuffle on the join key for the detail aggregation; the
header side is joined post-aggregation (both sides already reduced to
one row per key). No collect, no driver loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.scalars import determine_status
from jde_to_datalake_spark.operators.relational import DEC


def lineitem_order_totals(lineitem: DataFrame) -> DataFrame:
    """Detail-side totals: Σ extendedprice·(1-discount)·(1+tax) per order.

    Exact decimal staging (18,9): the product of three (18,9) decimals
    stays within 38 digits after Spark's result-type rule, and decimal
    addition is associative — so the aggregate is bit-identical across
    partitionings (floats would not be).
    """
    charge = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))
    )
    return lineitem.groupBy("l_orderkey").agg(
        F.sum(charge).cast("decimal(38,6)").alias("detail_total")
    )


def pivot_report(orders: DataFrame, lineitem: DataFrame, customer: DataFrame) -> DataFrame:
    """Flagship reconciliation report (SURVEY §3.1 restated on testdata).

    Stages (all one lazy plan):
      1. detail aggregation (A2-shaped sum by key)
      2. full outer join headers <-> detail totals (J2)
      3. enrich with customer (J1; broadcast — dimension side is small
         after AQE stats, and at 100 TB customer is still the small side)
      4. status derivation via canonical-string compare (F12)
      5. per-status rollup (A4)
    """
    detail = lineitem_order_totals(lineitem).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    header = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast(DEC).cast("decimal(38,6)").alias("header_total"),
    )
    joined = header.join(detail, "o_orderkey", "outer")
    enriched = joined.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        joined.o_custkey == F.col("c_custkey"),
        "left",
    )
    with_status = enriched.withColumn(
        "status", determine_status(F.col("header_total"), F.col("detail_total"))
    )
    return (
        with_status.groupBy("c_mktsegment", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("header_total")).cast("decimal(38,2)").cast("double")
            .alias("sum_header_total"),
            F.sum(F.col("detail_total")).cast("decimal(38,2)").cast("double")
            .alias("sum_detail_total"),
        )
        .orderBy("c_mktsegment", "status")
    )


def live_comparison(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Live JDE<->bakery comparison restated (backend/main.py:417-537).

    Two independently aggregated totals keyed by a normalized key
    (priority bucket lower-cased — stand-in for lower(product name)),
    outer-joined, with the F12/F13 status ladder and the reference's
    0.001 mismatch tolerance (dag_cardex_changes_to_bakery_system.py:86).
    """
    a = orders.groupBy(F.lower("o_orderpriority").alias("k")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(38,2)").cast("double")
        .alias("total_a")
    )
    b = (
        lineitem.join(orders.select("o_orderkey", "o_orderpriority"),
                      lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.lower("o_orderpriority").alias("k"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(DEC)
                 * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)))
            ).cast("decimal(38,2)").cast("double").alias("total_b")
        )
    )
    return (
        a.join(b, "k", "outer")
        .withColumn(
            "status",
            F.when(F.col("total_a").isNull() | F.col("total_b").isNull(), "Missing Data")
            .when(F.abs(F.col("total_a") - F.col("total_b")) <= 0.001, "Match")
            .otherwise("Mismatch"),
        )
        .withColumn("diff", F.round(F.col("total_a") - F.col("total_b"), 4))
    )
