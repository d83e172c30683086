"""Fuzzy string matching join — q-gram blocking + edit-distance verify.

The reference reconciles the two systems by EXACT lower-cased name
equality (backend/main.py:471-532 builds `name_lower` on both sides;
dag_cardex_changes_to_bakery_system.py:70-90 compares per product
name). Real catalogs drift ("Widget-2" vs "Widget 2"), so the natural
extension is a bounded-edit-distance join — and the naive form is an
all-pairs cartesian with a per-pair Levenshtein, quadratic at any
scale.

``fuzzy_join`` is the scale-shaped form:

1. BLOCK: each normalized name explodes to its distinct q-grams;
   pairs must share >= 1 q-gram to become candidates. Recall bound:
   an edit-distance-k pair is guaranteed a shared gram when the
   shorter string has > q*(k+1) - 1 characters (one edit can destroy
   at most q grams); strings shorter than q block on their whole
   self, which catches them against equal/near-equal strings — but
   lengths in [q, q*(k+1)-1] CAN miss when every gram is touched by
   an edit (e.g. q=2, "abc" vs "axc"). Callers matching very short
   codes should lower q to 1. One shuffle keyed by gram; stop-gram
   guard (``max_df``) bounds bucket blowup exactly like the shingle
   path in operators/dedup.py.
2. LENGTH PRUNE: |len(a) - len(b)| > k cannot be within distance k —
   filtered before the expensive verify.
3. VERIFY: exact ``levenshtein(a, b) <= k`` on candidates only
   (Spark's built-in, JVM-side).

Output: one row per matched (left, right) pair with the distance.
Deterministic: candidates are distinct pairs; no sampling, no order
dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.session import spread


def _norm(col):
    return F.lower(F.trim(col))


def _qgrams(col, q: int):
    """Distinct q-grams of a normalized string (positions 1..len-q+1).

    Guarded for len < q: such strings emit their whole self as one
    gram so short names still block against each other.
    """
    padded = col
    n = F.length(padded)
    positions = F.when(
        n >= q, F.sequence(F.lit(1), n - q + 1)
    ).otherwise(F.array(F.lit(1)))
    return F.array_distinct(
        F.transform(positions, lambda i: F.substring(padded, i, q))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    q: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """Bounded-Levenshtein join: pairs with distance <= max_distance.

    ``left_col``/``right_col`` name the input columns; the output is
    the distinct matched pairs as (left_name, right_name, distance).
    NOTE: the emitted names are the NORMALIZED (lower+trim) forms the
    operator matched on — callers joining other columns back must key
    on ``lower(trim(col))``, not the raw column (keeping the operator
    narrow keeps the q-gram shuffle payload minimal).
    """
    # each gram projection feeds the df-count aggregation AND the
    # candidate join; df_counts is joined on both sides — without
    # materialization every consumer re-runs the normalize/distinct/
    # explode pipeline (same multi-consumer hazard as the shingle path
    # in operators/dedup.py, same localCheckpoint cure)
    ga = spread(
        left.select(_norm(F.col(left_col)).alias("__a")).distinct(),
        keys=("__a",),
    ).select(
        "__a", F.explode(_qgrams(F.col("__a"), q)).alias("__g")
    ).localCheckpoint(eager=False)
    gb = spread(
        right.select(_norm(F.col(right_col)).alias("__b")).distinct(),
        keys=("__b",),
    ).select(
        "__b", F.explode(_qgrams(F.col("__b"), q)).alias("__g")
    ).localCheckpoint(eager=False)

    # stop-gram guard: a gram present in more than max_df names on
    # either side joins quadratically — drop it from BLOCKING only
    # (verification is exact, so recall is affected only for pairs
    # whose every shared gram is a stop-gram: boilerplate-only
    # near-names, the standard trade)
    df_counts = (
        ga.groupBy("__g").agg(F.count(F.lit(1)).alias("__dfa"))
        .join(
            gb.groupBy("__g").agg(F.count(F.lit(1)).alias("__dfb")), "__g"
        )
        .filter((F.col("__dfa") <= max_df) & (F.col("__dfb") <= max_df))
        .select("__g")
        .localCheckpoint(eager=False)  # consumed by BOTH join sides
    )
    candidates = (
        ga.join(df_counts, "__g")
        .join(gb.join(df_counts, "__g"), "__g")
        .select("__a", "__b")
        .distinct()
        # length prune before the O(len^2) verify
        .filter(
            F.abs(F.length("__a") - F.length("__b")) <= max_distance
        )
    )
    return (
        candidates.withColumn(
            "distance", F.levenshtein(F.col("__a"), F.col("__b"))
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("__a").alias("left_name"),
            F.col("__b").alias("right_name"),
            "distance",
        )
    )
