"""Embedding similarity search for the training-data pipeline tier.

- ``cosine_topk``       brute-force exact top-k: queries broadcast
  against the corpus, one pass, no shuffle of the big side. The
  baseline and the verifier for approximate methods.
- ``lsh_bucketed_topk`` sign-bit LSH buckets (deterministic
  hyperplanes = coordinate axes): each query probes only its bucket —
  the scale path when the corpus side is 100 TB (bucket key becomes
  the partition key, so a query touches one partition family).

Determinism: dot products and norms are strict LEFT FOLDS over the
array in element order, in double (`F.aggregate` here, `list_reduce`
in the oracle). IEEE-754 ops on identical operand sequences are
bit-identical in any engine, and the fold order is pinned by the
array — independent of partitioning. Ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Double dot product, left-folded in element order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


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
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
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
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
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
