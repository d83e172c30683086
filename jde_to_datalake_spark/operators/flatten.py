"""Nested/JSON restructuring operators — SURVEY.md §2.8 (R1-R5).

The reference's most distinctive computation is the 4-level "action
document" flatten (backend/bakery_helper.py:379-570 and
dags/dag_bakery_system_to_jde.py:122-207):

    actions -> filter actionType=='ADDITION'
            -> explode actionData.ingredients[].batches[]
            -> explode actionData.lots[].vessels[].additions{map}
            -> join additions x batches on (action_id, ingredient_id)
            -> unique_transaction_id / lot extraction / zero-skip

Here it is a pure explode-chain + one equi-join: no UDFs, no driver
loops. ``synthesize_actions`` builds the same nested shape from the
flat testdata tables (struct/array/map construction, R4's inverse
packing), so flatten(synthesize(x)) is oracle-checkable against SQL
computed directly on the flat inputs.

Scale: each groupBy level shuffles on the same leading key
(order/action id), so Catalyst reuses one exchange; the final
intra-document join is keyed on (action_id, ingredient_id) — skew-safe
because documents are bounded.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.scalars import (
    lot_from_batch_number,
    unique_transaction_id,
)

# The nested struct/array expressions below are built from FIXED column
# names, so they are memoized at module level: each F.* call is a py4j
# round-trip and this operator's expression tree cost ~0.7 s of driver
# time per invocation before caching (the Columns are immutable and
# reusable across plans).


def expand_json_columns(
    df: DataFrame, cols: dict[str, object], drop: bool = True
) -> DataFrame:
    """R1: generic `expand_json_columns` (backend/main.py:128-150).

    For each (column -> StructType schema): parse the JSON text and
    project nested fields as `{col}_{field}` top-level columns —
    `pd.json_normalize` parity, but lazy/columnar via ``from_json``.
    """
    out = df
    for c, schema in cols.items():
        parsed = F.from_json(F.col(c), schema)
        tmp = f"__{c}_parsed"
        out = out.withColumn(tmp, parsed)
        for field in schema.fieldNames():  # type: ignore[attr-defined]
            out = out.withColumn(f"{c}_{field}", F.col(f"{tmp}.{field}"))
        out = out.drop(tmp)
        if drop:
            out = out.drop(c)
    return out


def synthesize_actions(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Build nested bakery-action documents from flat testdata (R4 packing).

    One action per order; ingredients keyed by part; batches per
    lineitem; lots/vessels derived from supplier keys; additions as a
    map ingredient_id -> Σ quantity. Shape mirrors
    backend/bakery_helper.py:453-563 / README.org:624-657.
    """
    # Pre-partition on the document key: every groupBy level below
    # clusters on a superset of (l_orderkey,), so each chain runs all
    # its aggregation levels off one exchange instead of re-shuffling
    # per level (verified: 2 data exchanges total — one per nesting
    # chain — and the orders sides broadcast). Only the 5 raw key/qty
    # columns go through the exchange; the derived string columns are
    # computed post-shuffle, at cluster width, without inflating the
    # shuffle payload.
    li = lineitem.select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_suppkey", "l_quantity"
    ).repartition("l_orderkey").select(*_li_cols())

    # ingredients[].batches[]
    ingredients = (
        li.groupBy("l_orderkey", "ingredient_id", "product_name", "addition_unit")
        .agg(_batches_agg())
        .groupBy("l_orderkey")
        .agg(_ingredients_agg())
    )

    # lots[].vessels[].additions{ingredient_id -> qty}
    additions = (
        li.groupBy("l_orderkey", "lot_code", "vessel_code", "ingredient_id")
        .agg(F.sum("qty").alias("qty"))
    )
    vessels = (
        additions.groupBy("l_orderkey", "lot_code", "vessel_code")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("ingredient_id"), F.col("qty")))
            ).alias("additions")
        )
    )
    lots = (
        vessels.groupBy("l_orderkey", "lot_code")
        .agg(
            F.collect_list(
                F.struct(F.col("vessel_code").alias("vesselCode"), F.col("additions"))
            ).alias("vessels")
        )
        .groupBy("l_orderkey")
        .agg(_lots_agg())
    )

    return (
        orders.select(
            F.concat(F.lit("act_"), F.col("o_orderkey").cast("string")).alias("_id"),
            F.when(F.col("o_orderkey") % 3 != 0, F.lit("ADDITION"))
            .otherwise(F.lit("TRANSFER")).alias("actionType"),
            F.col("o_orderdate").alias("effectiveAt"),
            F.col("o_orderkey"),
        )
        .join(ingredients, F.col("o_orderkey") == ingredients.l_orderkey, "inner")
        .drop(ingredients.l_orderkey)
        .join(lots, F.col("o_orderkey") == lots.l_orderkey, "inner")
        .drop(lots.l_orderkey)
        .select(
            "_id", "actionType", "effectiveAt",
            F.struct(F.col("ingredients"), F.col("lots")).alias("actionData"),
        )
    )


@lru_cache(maxsize=None)
def _li_cols() -> tuple:
    return (
        F.col("l_orderkey"),
        F.concat(F.lit("ing_"), F.col("l_partkey").cast("string")).alias("ingredient_id"),
        F.concat(F.lit("item_"), F.col("l_partkey").cast("string")).alias("product_name"),
        F.lit("kg").alias("addition_unit"),
        F.concat(
            F.lit("b_"), F.col("l_orderkey").cast("string"),
            F.lit("_"), F.col("l_linenumber").cast("string"),
        ).alias("batch_id"),
        F.concat(
            F.lit("item_"), F.col("l_partkey").cast("string"),
            F.lit("_LOT"), (F.col("l_linenumber") % 3).cast("string"),
        ).alias("batch_number"),
        (F.col("l_quantity") < 5).alias("depleted"),
        F.concat(F.lit("LOT"), (F.col("l_suppkey") % 3).cast("string")).alias("lot_code"),
        F.concat(F.lit("V"), (F.col("l_suppkey") % 10).cast("string")).alias("vessel_code"),
        F.col("l_quantity").alias("qty"),
    )


@lru_cache(maxsize=None)
def _batches_agg():
    # no sort_array: the arrays are exploded downstream, so the
    # flattened multiset is independent of collect order
    return F.collect_list(
        F.struct(
            F.struct(
                F.col("batch_id").alias("_id"),
                F.col("batch_number").alias("batchNumber"),
                F.col("depleted").alias("depleted"),
            ).alias("batch")
        )
    ).alias("batches")


@lru_cache(maxsize=None)
def _ingredients_agg():
    return F.collect_list(
        F.struct(
            F.struct(
                F.col("ingredient_id").alias("_id"),
                F.col("product_name").alias("productName"),
                F.col("addition_unit").alias("additionUnit"),
            ).alias("Ingredient"),
            F.col("batches").alias("batches"),
        )
    ).alias("ingredients")


@lru_cache(maxsize=None)
def _lots_agg():
    return F.collect_list(
        F.struct(
            F.col("lot_code").alias("lotCode"),
            F.lit("fermentation").alias("stage"),
            F.col("vessels").alias("vessels"),
        )
    ).alias("lots")


def flatten_actions(actions: DataFrame) -> DataFrame:
    """R2: the 4-level unnest + intra-document join (J9) + F7/F9/P9.

    Emits one row per (action, ingredient, vessel-addition, batch) —
    the exact output contract of the reference's streamlined parse
    (backend/bakery_helper.py:379-570).

    The ingredient-batches x vessel-additions join is INTRA-document
    (J9), so it is evaluated row-locally: each exploded addition row
    probes the action's own ingredients[] array with `filter` and
    expands the matching entries' batches with `transform`+`explode`.
    The whole operator is explode/project chains — ZERO shuffles at
    any scale (the equivalent shuffle-join formulation moves every
    exploded row through two exchanges).
    """
    additions = (
        actions.filter(F.col("actionType") == "ADDITION")
        .select(
            F.col("_id").alias("action_id"),
            F.col("effectiveAt").alias("effective_at"),
            F.col("actionData.ingredients").alias("ingredients"),
            F.explode("actionData.lots").alias("lot"),
        )
        .select(
            "action_id", "effective_at", "ingredients",
            F.col("lot.lotCode").alias("lot_code"),
            F.col("lot.stage").alias("stage"),
            F.explode("lot.vessels").alias("vessel"),
        )
        .select(
            "action_id", "effective_at", "ingredients", "lot_code", "stage",
            F.col("vessel.vesselCode").alias("vessel_code"),
            F.explode("vessel.additions").alias("ingredient_id", "quantity"),
        )
        .filter(F.col("quantity").isNotNull() & (F.col("quantity") != 0))  # P9
    )

    joined = additions.select(
        "action_id", "effective_at", "lot_code", "stage", "vessel_code",
        "ingredient_id", "quantity",
        # inner-join semantics: no match -> no row
        F.explode(_matches_col()).alias("m"),
    )
    return joined.select(*_flat_out_cols())


@lru_cache(maxsize=None)
def _matches_col():
    """Intra-document join: matching ingredient entries x their batches."""
    return F.flatten(
        F.transform(
            F.filter(
                F.col("ingredients"),
                lambda ing: ing["Ingredient"]["_id"] == F.col("ingredient_id"),
            ),
            lambda ing: F.transform(
                ing["batches"],
                lambda b: F.struct(
                    ing["Ingredient"]["productName"].alias("product_name"),
                    ing["Ingredient"]["additionUnit"].alias("addition_unit"),
                    b["batch"]["_id"].alias("batch_id"),
                    b["batch"]["batchNumber"].alias("batch_number"),
                    b["batch"]["depleted"].alias("depleted"),
                ),
            ),
        )
    )


@lru_cache(maxsize=None)
def _flat_out_cols() -> tuple:
    lot_number = lot_from_batch_number(
        F.col("m.batch_number"), F.col("m.product_name")
    )
    return (
        F.col("action_id"), F.col("effective_at"), F.col("ingredient_id"),
        F.col("m.product_name").alias("product_name"),
        F.col("m.addition_unit").alias("addition_unit"),
        F.col("lot_code"), F.col("stage"), F.col("vessel_code"), F.col("quantity"),
        F.col("m.batch_id").alias("batch_id"),
        F.col("m.batch_number").alias("batch_number"),
        lot_number.alias("lot_number"),
        F.col("m.depleted").alias("depleted"),
        unique_transaction_id(
            F.col("m.product_name"), lot_number, F.col("vessel_code"), F.col("quantity")
        ).alias("unique_transaction_id"),
    )
