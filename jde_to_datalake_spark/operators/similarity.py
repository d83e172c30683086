"""Embedding similarity search for the training-data pipeline tier.

- ``cosine_topk``       brute-force exact top-k: queries broadcast
  against the corpus, one pass, no shuffle of the big side. The
  baseline and the verifier for approximate methods.
- ``lsh_bucketed_topk`` sign-bit LSH buckets (deterministic
  hyperplanes = coordinate axes): each query probes only its bucket —
  the scale path when the corpus side is 100 TB (bucket key becomes
  the partition key, so a query touches one partition family).

Determinism: dot products and norms are accumulated in exact DECIMAL
(element values quantized to 9 dp first), so scores are bit-identical
across engines and partitionings; the final cosine is computed in
double from those exact components. Ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EDEC = "decimal(18,9)"


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double").cast(EDEC) * y.cast("double").cast(EDEC))
    # merge result is cast back to the accumulator type: Spark widens
    # (38,18)+(38,18) to (38,17), which aggregate() rejects. The cast
    # never rounds here (values are tiny relative to 20 integer digits).
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,18)"),
        lambda acc, x: (acc + x.cast("decimal(38,18)")).cast("decimal(38,18)"),
    )


def _norm2_dec(a: Column) -> Column:
    return _dot_dec(a, a)


def _dec_to_double(c: Column) -> Column:
    """Rescale to 9 dp before the double cast so the unscaled value
    stays < 2^53 — both engines then round identically."""
    return F.round(c, 9).cast("double")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Plan shape: broadcast(queries) x corpus -> per-row cosine ->
    row_number window per query. The corpus never shuffles for the
    join (broadcast-nested-loop on a small query set); the only
    shuffle is the per-query top-k, keyed by query id (bounded
    cardinality, no skew).
    """
    # norms are per-row, not per-pair: compute each side's ||v|| once
    # before the join (N + M norm evaluations instead of N*M*2).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(_dec_to_double(_norm2_dec(F.col(vec_col)))).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(_dec_to_double(_norm2_dec(F.col(vec_col)))).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dec_to_double(_dot_dec(F.col("q_vec"), F.col("c_vec")))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def sign_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Deterministic LSH bucket: sign bits of the first n coordinates."""
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(
            F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    return out.cast("int")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    Recall/latency trade-off is controlled by n_bits (2^n buckets).
    At scale the corpus is written partitioned by bucket, so a query
    reads ~1/2^n of the data; here the bucket equi-join does the same
    pruning through the shuffle.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
        F.sqrt(_dec_to_double(_norm2_dec(F.col(vec_col)))).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
        F.sqrt(_dec_to_double(_norm2_dec(F.col(vec_col)))).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dec_to_double(_dot_dec(F.col("q_vec"), F.col("c_vec")))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "candidate_id", "cosine", "rank")
    )
