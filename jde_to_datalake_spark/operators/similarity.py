"""Embedding similarity search for the training-data pipeline tier.

- ``cosine_topk``       brute-force exact top-k: queries broadcast
  against the corpus, one pass, no shuffle of the big side. The
  baseline and the verifier for approximate methods.
- ``lsh_bucketed_topk`` sign-bit LSH buckets (deterministic
  hyperplanes = coordinate axes): each query probes only its bucket —
  the scale path when the corpus side is 100 TB (bucket key becomes
  the partition key, so a query touches one partition family).
- ``ivf_topk``          inverted-file index: corpus vectors assigned
  to their nearest centroid cell; queries probe the ``n_probe``
  nearest cells only. The other standard ANN scale path (cell id is
  the partition/layout key). Centroid selection is pluggable; the
  default (lowest-id corpus vectors) is deterministic so the whole
  operator is oracle-checkable — swap in k-means centroids at scale,
  the assignment/probe plan is identical.

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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest centroid cells.

    Stages (all one lazy plan):
      1. centroids — ``centroids`` arg if given (k-means output in
         prod), else the n_centroids lowest-id corpus vectors
         (deterministic, so the driver oracle can replay it);
      2. assignment — corpus x broadcast(centroids), argmax cosine per
         vector with centroid-id tie-break (row_number): each vector
         gets ONE cell. At scale this is the indexing pass whose
         output is written partitioned by cell;
      3. probing — each query scores the same broadcast centroids and
         keeps its n_probe best cells;
      4. search — cell equi-join (query probes x assigned corpus),
         exact cosine, per-query top-k. A query touches only
         n_probe/n_centroids of the corpus — the IVF trade.
    """
    if centroids is None:
        # orderBy+limit lowers to TakeOrderedAndProject (distributed
        # top-n, no global sort); the global window then runs over the
        # n_centroids-row result only
        seeds = corpus.select(F.col(id_col), F.col(vec_col)).orderBy(
            F.col(id_col)
        ).limit(n_centroids)
        cent_w = Window.orderBy(F.col(id_col))
        centroids = seeds.select(
            (F.row_number().over(cent_w) - 1).alias("cell"),
            F.col(vec_col).alias("cent_vec"),
        )
    cent = centroids.select(
        "cell", "cent_vec", _norm(F.col("cent_vec")).alias("cent_norm")
    )

    def assign(side: DataFrame, out_id: str, keep: int):
        scored = (
            side.select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).alias(f"{out_id}_vec"),
                _norm(F.col(vec_col)).alias(f"{out_id}_norm"),
            )
            .crossJoin(F.broadcast(cent))
            .withColumn(
                "cent_cos",
                _dot(F.col(f"{out_id}_vec"), F.col("cent_vec"))
                / F.col(f"{out_id}_norm")
                / F.col("cent_norm"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("cent_cos").desc(), F.col("cell")
        )
        return (
            scored.withColumn("__crn", F.row_number().over(w))
            .filter(F.col("__crn") <= keep)
            .select(out_id, f"{out_id}_vec", f"{out_id}_norm", "cell")
        )

    assigned = assign(corpus, "candidate_id", 1)
    probes = assign(queries, "query_id", n_probe)
    scored = (
        assigned.join(probes, "cell")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("query_id_vec"), F.col("candidate_id_vec"))
            / F.col("query_id_norm")
            / F.col("candidate_id_norm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "candidate_id", "cosine", "rank")
    )
