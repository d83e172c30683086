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

Arithmetic convention — FIXED-POINT INTEGER staging: money columns are
2-dp by contract (the reference's DECIMAL(15,2) DDL,
create_bakery_ops_tables.sql:45), so each factor is quantized to its
decimal contract once (a single narrow decimal cast) and then unscaled
to int64. Sums and products run in pure integer math — exact,
associative (bit-identical under any partitioning — the property the
DuckDB hash gate checks and the property that makes 1000-executor
retries safe), and 2-4x faster than wide-decimal accumulation. HALF_UP
rounding is `(x + half) div scale`, valid for the non-negative money
domain here. int64 bounds: the per-row charge product is < 2^40; a
per-group sum overflows int64 only past ~10^7 TB of lineitem — far
beyond the design target (switch the accumulator to decimal(38,0) if
that day comes).

Scale: one shuffle on the join key for the detail aggregation; the
header side is joined post-aggregation (both sides already reduced to
one row per key). No collect, no driver loops, no UDFs.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.session import spread_by


def _cents(money: Column) -> Column:
    """Exact int64 cents from a 2-dp-by-contract money column."""
    return (money.cast("decimal(18,2)") * 100).cast("long")


def _hundredths(frac_expr: Column) -> Column:
    """Exact int64 hundredths from a 2-dp fraction (1±discount/tax)."""
    return (frac_expr * 100).cast("long")


def _round_div(col_name: str, scale: int) -> Column:
    """HALF_UP integer rescale for non-negative sums: (x + s/2) div s."""
    return F.expr(f"({col_name} + {scale // 2}) div {scale}")


def charge_units(lineitem: DataFrame) -> tuple[Column, Column, Column]:
    """(cents, hundredths, hundredths) factors of the lineitem charge."""
    return _charge_unit_cols()


@lru_cache(maxsize=None)
def _charge_unit_cols() -> tuple[Column, Column, Column]:
    one = F.lit(1).cast("decimal(8,2)")
    e2 = _cents(F.col("l_extendedprice"))
    d2 = _hundredths(one - F.col("l_discount").cast("decimal(8,2)"))
    t2 = _hundredths(one + F.col("l_tax").cast("decimal(8,2)"))
    return e2, d2, t2


def lineitem_order_totals(lineitem: DataFrame) -> DataFrame:
    """Detail-side totals per order, in micro-units (scale 10^6).

    Σ extendedprice·(1-discount)·(1+tax) as int64: cents x hundredths
    x hundredths. Map-side partial sums are plain long adds inside
    whole-stage codegen.
    """
    e2, d2, t2 = charge_units(lineitem)
    # spread_by: single-row-group local scans can't parallelize the
    # map-side partial aggregation; distributing the narrow raw
    # columns by the grouping key runs the aggregation at cluster
    # width with no second exchange. No-op on a wide (100 TB) scan.
    li = spread_by(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount", "l_tax"),
        "l_orderkey",
    )
    return li.groupBy("l_orderkey").agg(
        F.sum(e2 * d2 * t2).alias("detail_micro")
    )


def pivot_report(orders: DataFrame, lineitem: DataFrame, customer: DataFrame) -> DataFrame:
    """Flagship reconciliation report (SURVEY §3.1 restated on testdata).

    Stages (all one lazy plan):
      1. detail aggregation (A2-shaped sum by key, integer-exact)
      2. full outer join headers <-> detail totals (J2)
      3. enrich with customer (J1; broadcast — dimension side is small
         after AQE stats, and at 100 TB customer is still the small side)
      4. status derivation by cents equality — identical to the
         reference's canonical-2dp-string compare (F12)
      5. per-status rollup (A4)
    """
    detail = lineitem_order_totals(lineitem).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    header = orders.select(
        "o_orderkey",
        "o_custkey",
        _cents(F.col("o_totalprice")).alias("header_cents"),
    )
    joined = header.join(detail, "o_orderkey", "outer").select(
        "o_custkey",
        "header_cents",
        _round_div("detail_micro", 10_000).alias("detail_cents"),
    )
    enriched = joined.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        joined.o_custkey == F.col("c_custkey"),
        "left",
    )
    with_status = enriched.withColumn(
        "status",
        F.when(
            F.col("header_cents").isNull() | F.col("detail_cents").isNull(),
            "Missing Data",
        )
        .when(F.col("header_cents") == F.col("detail_cents"), "Match")
        .otherwise("Mismatch"),
    )
    return (
        with_status.groupBy("c_mktsegment", "status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("header_cents").alias("hc"),
            F.sum("detail_cents").alias("dc"),
        )
        .select(
            "c_mktsegment",
            "status",
            "n_orders",
            (F.col("hc").cast("double") / 100).alias("sum_header_total"),
            (F.col("dc").cast("double") / 100).alias("sum_detail_total"),
        )
        # no final orderBy: the result is a ~10-row rollup — callers that
        # want a presentation order sort it themselves; a global sort
        # here costs an extra exchange on every run for nothing
    )


def live_comparison(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Live JDE<->bakery comparison restated (backend/main.py:417-537).

    Two independently aggregated totals keyed by a normalized key
    (priority bucket lower-cased — stand-in for lower(product name)),
    outer-joined, with the F12/F13 status ladder and the reference's
    0.001 mismatch tolerance (dag_cardex_changes_to_bakery_system.py:86).
    """
    a = (
        orders.groupBy(F.lower("o_orderpriority").alias("k"))
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("ac"))
        .select("k", (F.col("ac").cast("double") / 100).alias("total_a"))
    )
    e2, d2, _ = charge_units(lineitem)
    # Pre-aggregate the detail side to per-orderkey partial sums BEFORE
    # joining orders: at TPC-H ratios this shrinks the join input ~4x
    # (and far more at 100 TB), and integer sums are associative, so
    # partial-sum-then-resum is bit-identical to sum-after-join.
    b_pre = (
        spread_by(
            lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
            "l_orderkey",
        )
        .groupBy("l_orderkey")
        .agg(F.sum(e2 * d2).alias("b4"))
    )
    b = (
        b_pre.join(
            orders.select("o_orderkey", "o_orderpriority"),
            b_pre.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.lower("o_orderpriority").alias("k"))
        .agg(F.sum("b4").alias("b4s"))
        .select(
            "k",
            (_round_div("b4s", 100).cast("double") / 100).alias("total_b"),
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table snapshots: inserted/deleted/changed rows.

    The generalized form of the reference's system-vs-system
    reconciliation (backend/main.py:417-537 compares JDE cardex vs
    bakery on-hand; the lake keeps dated dispatch snapshots at
    backend/s3_helper.py:45 that this diffs directly). Output: one row
    per key present in either snapshot with ``diff_status`` in
    {inserted, deleted, changed, unchanged} and ``changed_cols`` (the
    non-equal column names; null-safe compare, so NULL->value and
    value->NULL count as changes while NULL->NULL does not).

    Scale: ONE full-outer shuffle join on the key (both sides shuffle
    once; AQE picks sort-merge vs shuffled-hash from runtime stats).
    The per-column compare is a row-local projection in codegen. At
    100 TB, writing both snapshots bucketed by ``keys`` makes this diff
    shuffle-free — the layout note on sources/parquet_lake.py applies.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c in set(new.columns) and c not in keys]

    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "outer")

    raw_changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")
    # only meaningful when the key exists on BOTH sides; inserted and
    # deleted rows get an empty list (every column would trivially
    # differ against the absent side)
    changed = F.when(
        F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), raw_changed
    ).otherwise(F.array().cast("array<string>"))

    status = (
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(F.size(F.col("changed_cols")) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("changed_cols", changed)
        .withColumn("diff_status", status)
        .select(
            *keys,
            "diff_status",
            "changed_cols",
            *[
                F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols
            ],
            *[
                F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols
            ],
        )
    )
