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
  operator is oracle-checkable.
- ``kmeans_centroids``  spherical k-means training for the IVF cells
  (driver-looped Lloyd's; only the bounded centroid set is ever
  collected) — its output plugs straight into ``ivf_scored``'s
  ``centroids`` parameter; the assignment/probe plan is identical.

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


def topk_ranked(
    scored: DataFrame,
    k: int,
    *extra_partition_cols: str,
    score_col: str = "cosine",
) -> DataFrame:
    """Per-query top-k over a scored candidate frame.

    One row_number window keyed by (query_id, *extra) — callers that
    union several scored candidate sets (see ``q_ann_suite``) tag each
    set and rank the union in a SINGLE window pass instead of one
    window (= one shuffle) per set. ``score_col`` is higher-is-closer
    (cosine; pass a negated distance for metric scores).
    """
    w = Window.partitionBy("query_id", *extra_partition_cols).orderBy(
        F.col(score_col).desc(), F.col("candidate_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_scored(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine scores: (query_id, candidate_id, cosine).

    broadcast(queries) x corpus: the corpus never shuffles for the
    join (broadcast-nested-loop on a small query set).
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
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Plan shape: broadcast(queries) x corpus -> per-row cosine ->
    row_number window per query; the only shuffle is the per-query
    top-k, keyed by query id (bounded cardinality, no skew).
    """
    return topk_ranked(cosine_scored(corpus, queries, vec_col, id_col), k).select(
        "query_id", "candidate_id", "cosine", "rank"
    )


def sign_bucket(vec: Column, n_bits: int = 4) -> Column:
    """Deterministic LSH bucket: sign bits of the first n coordinates."""
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(
            F.element_at(vec, j + 1).cast("double") > 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    return out.cast("int")


def lsh_scored(
    corpus: DataFrame,
    queries: DataFrame,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Bucket-pruned cosine scores: (query_id, bucket, candidate_id, cosine)."""
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
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )


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
    return topk_ranked(
        lsh_scored(corpus, queries, n_bits, vec_col, id_col), k
    ).select("query_id", "bucket", "candidate_id", "cosine", "rank")


def centroid_array(centroids: DataFrame) -> DataFrame:
    """Public form of the centroid fold: build it ONCE and pass it via
    the ``cents_arr`` hooks (assign_cells / ivf_scored /
    prototypicality / diversity_filter / semantic_dedup) when several
    passes share the same centroid set, so the seed/fold pipeline is
    one shared subplan instead of one copy per consumer."""
    return _cent_array(centroids)


def _cent_array(centroids: DataFrame) -> DataFrame:
    """Fold the (bounded-by-construction) centroid set into ONE array
    row for broadcasting: cell assignment/probing become ROW-LOCAL
    array reductions — zero shuffles, zero windows. (The former shape
    — crossJoin x centroids + argmax window — paid an n_centroids row
    blow-up plus a shuffle per side.)"""
    return centroids.select(
        "cell", "cent_vec", _norm(F.col("cent_vec")).alias("cent_norm")
    ).agg(
        F.collect_list(F.struct("cell", "cent_vec", "cent_norm")).alias("cents")
    )


def _cell_scores(vec: Column, nrm: Column) -> Column:
    """Per-centroid cosine structs over the broadcast ``cents`` array.

    Struct ordering (cos, -cell, cell): max = best cosine, ties broken
    toward the LOWEST cell id — same contract as the
    ORDER BY cent_cos DESC, cell oracle."""
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (_dot(vec, c["cent_vec"]) / nrm / c["cent_norm"]).alias("cos"),
            (-c["cell"]).alias("negcell"),
            c["cell"].alias("cell"),
        ),
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents_arr: DataFrame | None = None,
) -> DataFrame:
    """IVF indexing pass: (id, vec, nrm, cell) with each vector's
    nearest-centroid cell — a row-local reduction over the broadcast
    centroid array, zero shuffles. At scale this output is what gets
    written ``partitionBy(cell)`` (see operators/ann_index.py), making
    every later probe a partition-pruned scan.

    ``cents_arr``: pass an already-folded ``_cent_array`` frame when
    the caller also probes with it (``ivf_scored``) so the centroid
    derivation stays ONE shared subplan instead of two independent
    copies of the seed/fold pipeline."""
    if cents_arr is None:
        cents_arr = _cent_array(centroids)
    return (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .crossJoin(F.broadcast(cents_arr))
        .select(
            id_col, vec_col, "nrm",
            F.array_max(
                _cell_scores(F.col(vec_col), F.col("nrm"))
            )["cell"].alias("cell"),
        )
    )


def ivf_scored(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF candidate scores: probe the n_probe nearest centroid cells.

    Stages (all one lazy plan):
      1. centroids — ``centroids`` arg if given (k-means output in
         prod), else the n_centroids lowest-id corpus vectors
         (deterministic, so the driver oracle can replay it);
      2. assignment — ROW-LOCAL argmax over the broadcast centroid
         array: each vector gets ONE cell, zero shuffles. At scale
         this is the indexing pass whose output is written
         partitioned by cell;
      3. probing — each query scores the same broadcast centroid
         array row-locally and keeps its n_probe best cells;
      4. search — cell equi-join (query probes x assigned corpus),
         exact cosine. A query touches only n_probe/n_centroids of
         the corpus — the IVF trade.
    """
    if centroids is None:
        # orderBy+limit lowers to TakeOrderedAndProject (distributed
        # top-n, no global sort). The cell id = rank of the seed id
        # among the n seeds, computed as a broadcast self-join count
        # (n^2 pairs over n<=few-hundred rows) — avoids a global
        # row_number window, which would move the frame to a single
        # partition and is the one WindowExec shape banned at scale.
        # Seeds are collapsed to one row per id first, so the
        # rank-by-count stays dense 0..k-1 even if the id column
        # carries duplicates (ids are unique by contract — the
        # collapse is a guard, and which duplicate's vector survives
        # is then immaterial to the contract being guarded).
        seeds = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.col(id_col))
            .limit(n_centroids)
            .groupBy(id_col)
            .agg(F.first(vec_col).alias(vec_col))
        )
        others = seeds.select(F.col(id_col).alias("__other_id"))
        centroids = (
            seeds.join(
                F.broadcast(others), F.col("__other_id") < F.col(id_col), "left"
            )
            .groupBy(id_col)
            .agg(
                F.count("__other_id").cast("int").alias("cell"),
                F.first(vec_col).alias("cent_vec"),
            )
            .select("cell", "cent_vec")
        )
    cent_arr = _cent_array(centroids)
    assigned = assign_cells(
        corpus, centroids, vec_col, id_col, cents_arr=cent_arr
    ).select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("candidate_id_vec"),
        F.col("nrm").alias("candidate_id_norm"),
        "cell",
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_id_vec"),
            _norm(F.col(vec_col)).alias("query_id_norm"),
        )
        .crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id", "query_id_vec", "query_id_norm",
            F.explode(
                F.slice(
                    F.reverse(
                        F.array_sort(
                            _cell_scores(
                                F.col("query_id_vec"), F.col("query_id_norm")
                            )
                        )
                    ),
                    1,
                    n_probe,
                )["cell"]
            ).alias("cell"),
        )
    )
    # no broadcast hint on the cell join: the query side is small in
    # the suite but unbounded in general — AQE picks broadcast when
    # the probe side's runtime stats allow it
    return (
        assigned.join(probes, "cell")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("query_id_vec"), F.col("candidate_id_vec"))
            / F.col("query_id_norm")
            / F.col("candidate_id_norm"),
        )
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
    """IVF approximate top-k (see ``ivf_scored`` for the plan shape)."""
    return topk_ranked(
        ivf_scored(
            corpus, queries, n_centroids, n_probe, vec_col, id_col, centroids
        ),
        k,
    ).select("query_id", "cell", "candidate_id", "cosine", "rank")


def _kmeans_iter_kernel(cents_rows: "list[list[float]]"):
    """mapInPandas kernel for ONE Lloyd's iteration: per Arrow batch,
    assign every vector to its argmax-cosine centroid with a single
    numpy matmul, and fold per-partition (cell, count, vector-sum)
    partials — output bounded by n_partitions x n_centroids rows.
    Ties pick the LOWEST cell (np.argmax first-max), matching the
    serving-side ``assign_cells`` tie-break."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        C = np.asarray(cents_rows, dtype=np.float64)  # (k, d)
        cn = np.linalg.norm(C, axis=1)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        sums = np.zeros_like(C)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                vn = np.linalg.norm(V, axis=1)
                cos = (V @ C.T) / vn[:, None] / cn[None, :]
            cells = np.argmax(cos, axis=1)
            np.add.at(counts, cells, 1)
            np.add.at(sums, cells, V)
        live = np.nonzero(counts > 0)[0]
        yield pd.DataFrame(
            {
                "pid": pd.Series([pid] * len(live), dtype="int32"),
                "cell": pd.Series(live, dtype="int32"),
                "cnt": pd.Series(counts[live], dtype="int64"),
                "sums": pd.Series(
                    [sums[c].tolist() for c in live], dtype="object"
                ),
            }
        )

    return kernel


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Spherical k-means (Lloyd's) centroid training for the IVF index.

    One ``mapInPandas`` job per iteration: each Arrow batch assigns
    its vectors with a single numpy matmul (argmax cosine, lowest
    cell on ties — the ``assign_cells`` tie-break) and folds
    partition-local (cell, count, vector-sum) partials, so the
    per-iteration network cost is a collect of at most n_partitions x
    n_centroids tiny rows — ZERO shuffles, never the n_rows x dim
    exploded relation a groupBy(cell, dim) update would move, and no
    per-iteration codegen rebuild (the round-2 py4j finding: a big
    rebuilt expression tree costs ~0.7 s per iteration before any
    data moves). Iterative training is the documented exception to
    "UDFs are the slow path": the SERVING kernels (``ivf_scored``,
    ``assign_cells``) stay whole-stage codegen, while the training
    loop — whose per-element work is a dense matmul numpy does via
    BLAS — runs Arrow-batched. Partials are combined on the driver in
    (cell, partition_id) order, so the fp sum order — hence the
    trained centroids — is deterministic for a given input
    partitioning. Only the centroid set itself — bounded by the
    n_centroids PARAMETER, metadata scale by construction — is
    collected between iterations; the corpus never moves. Cosine
    assignment is scale-invariant, so the un-normalized cell mean is
    the spherical k-means update.

    Seeds are the n_centroids lowest-id corpus vectors (deterministic
    restarts). Empty cells keep their previous centroid. Returns a
    (cell, cent_vec) DataFrame directly pluggable into
    ``ivf_scored(..., centroids=...)``.
    """
    spark = corpus.sparkSession
    seed_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    if not seed_rows:
        raise ValueError("kmeans_centroids: corpus is empty")
    cents: list[list[float]] = [
        [float(x) for x in r[vec_col]] for r in seed_rows
    ]

    base = corpus.select(F.col(vec_col).alias("__vec"))
    for _ in range(n_iters):
        partials = base.mapInPandas(
            _kmeans_iter_kernel(cents),
            "pid int, cell int, cnt bigint, sums array<double>",
        ).collect()
        acc: dict[int, list] = {}
        for r in sorted(partials, key=lambda r: (r["cell"], r["pid"])):
            e = acc.setdefault(r["cell"], [0, None])
            e[0] += r["cnt"]
            e[1] = (
                list(r["sums"])
                if e[1] is None
                else [a + b for a, b in zip(e[1], r["sums"])]
            )
        cents = [
            [s / e[0] for s in e[1]]
            if (e := acc.get(cell)) and e[0] > 0
            else prev
            for cell, prev in enumerate(cents)
        ]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cents)], ["cell", "cent_vec"]
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    ``k`` most-cosine-similar corpus vectors with a DIFFERENT label —
    (query_id, query_label, candidate_id, candidate_label, cosine,
    rank).

    Same plan family as ``cosine_topk`` (broadcast(queries) x corpus,
    label-mismatch filter before the ranking window), so the corpus
    never shuffles for the join and the only shuffle is the per-query
    top-k. The query side must be a bounded batch (mining loops feed
    batches); for whole-corpus mining at scale, generate candidates
    with the LSH/IVF bucket paths first and rank the label-filtered
    union through ``topk_ranked`` exactly as ``q_ann_suite`` does.

    Determinism: scores are strict left folds (see module docstring);
    ties break on candidate_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(label_col).alias("candidate_label"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("candidate_label") != F.col("query_label"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )
    return topk_ranked(scored, k).select(
        "query_id", "query_label", "candidate_id", "candidate_label",
        "cosine", "rank",
    )


def pool_embeddings(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    mode: str = "mean",
) -> DataFrame:
    """Pool member vectors into one vector per group (chunk embeddings
    -> document embedding, member embeddings -> class centroid).

    Element-wise ``mean`` or ``max`` across the group's vectors. The
    shape is posexplode -> aggregate keyed by (group, dimension) ->
    reassemble ordered by dimension; both aggregations are map-side
    combinable and the shuffle volume is rows x dim — the same data
    that came in, never a per-group in-memory list of member vectors
    (a ``collect_list(vec)`` pooling implementation holds an entire
    group's vectors in one task's heap; this one never does, so a
    group with millions of members is just more partial aggregates).

    Float caveat: ``max`` is order-independent and cross-engine exact;
    ``mean`` sums in partial-aggregation order, so it is deterministic
    only to FP addition reordering (tests mirror it in DuckDB exactly
    for ``max`` and to 1e-12 for ``mean``).
    """
    if mode not in ("mean", "max"):
        raise ValueError("mode must be 'mean' or 'max'")
    agg = F.avg if mode == "mean" else F.max
    exploded = df.select(
        *[F.col(c) for c in group_cols],
        F.posexplode(F.col(vec_col)).alias("__pos", "__v"),
    ).select(
        *group_cols, "__pos", F.col("__v").cast("double").alias("__v")
    )
    per_dim = exploded.groupBy(*group_cols, "__pos").agg(
        agg("__v").alias("__pv")
    )
    return per_dim.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__pv"))),
            lambda s: s["__pv"],
        ).alias(vec_col)
    )


def rerank_topk(
    candidates: DataFrame,
    k: int = 5,
    kernel=None,
    batch_score_col: str = "rerank_score",
) -> DataFrame:
    """Second-stage rerank over first-stage ANN candidates: re-score
    each (query, candidate) pair with an expensive pairwise model and
    keep the new top-k per query.

    ``candidates`` is any scored frame with (query_id, candidate_id,
    cosine) — the output shape of ``cosine_topk`` / ``lsh_bucketed_topk``
    / ``ivf_topk`` / ``hard_negatives``. This is the standard two-stage
    retrieval composition: a cheap recall stage prunes 100 TB to
    k_first rows per query, then the rerank touches ONLY those — its
    cost is queries x k_first, independent of corpus size.

    ``kernel`` is a pandas function (DataFrame batch -> float Series of
    scores) run through Arrow-batched ``mapInPandas`` — the cross-
    encoder slot. The container ships no model runtime, so the default
    kernel is an honest DETERMINISTIC FAKE (a logistic squash of the
    stage-1 cosine): the plumbing — batch shape, schema, the final
    per-query window — is the real, tested part, exactly like the
    multimodal decode tier. Ties break on candidate_id.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if kernel is None:

        def kernel(pdf: "pd.DataFrame") -> "pd.Series":
            # STUB cross-encoder: monotone in stage-1 cosine so rank
            # behavior is predictable in tests; a real model replaces
            # this one function and nothing else changes
            import numpy as np

            return 1.0 / (1.0 + np.exp(-4.0 * pdf["cosine"].to_numpy()))

    # id dtypes come from the INPUT frame — the upstream operators
    # parameterize id_col, so candidates may carry string/int ids; a
    # hardcoded LongType here broke any non-bigint caller at the Arrow
    # boundary (round-3 advisor finding)
    in_fields = {f.name: f for f in candidates.schema.fields}
    schema = StructType(
        [
            StructField("query_id", in_fields["query_id"].dataType),
            StructField("candidate_id", in_fields["candidate_id"].dataType),
            StructField("cosine", DoubleType()),
            StructField(batch_score_col, DoubleType()),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = pdf[["query_id", "candidate_id", "cosine"]].copy()
            out[batch_score_col] = pd.Series(
                kernel(pdf), index=pdf.index, dtype="float64"
            )
            yield out

    scored = candidates.select(
        "query_id", "candidate_id", F.col("cosine").cast("double").alias("cosine")
    ).mapInPandas(score_batches, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col(batch_score_col).desc(), F.col("candidate_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project vectors
    through a deterministic Gaussian matrix, scaled 1/sqrt(out_dim) so
    pairwise distances are preserved in expectation.

    This is the engine's vectorized-Python tier done right: an
    Arrow-batched ``mapInPandas`` whose kernel is ONE numpy matmul per
    batch — no per-row Python, no per-element loops. The projection
    matrix is regenerated inside each task from the seed (a few KB of
    deterministic RNG work) rather than broadcast, so the operator is
    a pure flat map: no shuffle, no driver state, retry-safe. Use it
    to cut embedding width before the ANN paths when the stored
    dimension is larger than ranking needs.

    Numeric caveat: the matrix is seed-exact, but BLAS accumulates the
    matmul in a blocking order that depends on batch shape, so values
    are reproducible to last-ulp tolerance (not bit-for-bit) across
    repartitioning — unlike the strict-fold cosine scores above.
    """
    if out_dim <= 0 or in_dim <= 0:
        raise ValueError("in_dim and out_dim must be positive")
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(vec_col, ArrayType(DoubleType())),
        ]
    )
    scale = 1.0 / float(out_dim) ** 0.5

    def kernel(batches):
        m = np.random.default_rng(seed).standard_normal((in_dim, out_dim))
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = (v @ m) * scale
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: list(out)}
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def binary_quantize(
    corpus: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-bit binary quantization: ``dim`` floats -> ceil(dim/64)
    packed int64 code words (32x smaller than float32 at dim=64).

    The standard embedding-compression path for ANN at corpus scales
    where float vectors don't fit the scan budget: Hamming distance
    on the codes approximates angular distance (each sign bit is a
    fixed random-hyperplane hash; here the hyperplanes are coordinate
    axes, matching ``sign_bucket``'s convention so the bucket id is a
    prefix of the code). Row-local — zero shuffles, the indexing pass
    writes (id, code[]) beside the table.

    Physical path: an Arrow-batched numpy kernel (vectorized shift-OR
    over the batch). The obvious pure-expression form — 64 chained
    CASE WHEN adds per word — stays INSIDE whole-stage codegen yet
    compiles to a method past the JVM's ~8 KB JIT limit, so it runs
    in the bytecode interpreter at ~16 us/row; the kernel measured
    3.2x faster at 100k rows and the gap widens with corpus size.
    Output is integer, so the kernel is exactly reproducible across
    engines (no float-summation-order caveat — tests pin bit-level
    numpy parity and the registry oracle recomputes the same bits in
    SQL).

    Bit layout: word w bit j (LSB-first) = sign(vec[w*64 + j]).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType,
    )

    n_words = (dim + 63) // 64
    id_type = {f.name: f.dataType for f in corpus.schema.fields}[id_col]
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("code", ArrayType(LongType())),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = vecs > 0  # (n, dim) sign bits
            words = np.zeros((len(pdf), n_words), dtype=np.uint64)
            for j in range(dim):
                words[:, j // 64] |= bits[:, j].astype(np.uint64) << np.uint64(
                    j % 64
                )
            signed = words.view(np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "code": [list(r) for r in signed],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(kernel, schema)


def hamming_scored(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs Hamming distances over packed binary codes:
    (query_id, candidate_id, hamming).

    broadcast(queries) x corpus with a per-word XOR+bit_count fold —
    pure codegen integer ops over 1/32nd of the float payload; zero
    shuffles (the per-query top-k shuffle belongs to the caller, so
    suite callers can rank several scored sets in one window pass).
    """
    q = query_codes.select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    c = corpus_codes.select(
        F.col(id_col).alias("candidate_id"), F.col("code").alias("c_code")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("q_code"),
            F.col("c_code"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("candidate_id") != F.col("query_id"))
        .withColumn("hamming", dist)
        .select("query_id", "candidate_id", "hamming")
    )


def hamming_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k nearest by Hamming distance over packed binary codes.

    ``hamming_scored`` + one per-query top-k window (the only
    shuffle). The standard two-stage pattern reranks these candidates
    with exact cosine on the surviving ids (see tests for the
    composition).
    """
    scored = hamming_scored(corpus_codes, query_codes, id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "hamming", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 8,
    n_iters: int = 3,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    emit: str = "verdicts",
    max_cell_size: int | None = None,
    cents_arr: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    2303.09540): k-means cells localize the pairwise cosine search,
    then within each cell any vector whose cosine to a SMALLER-id
    cell-mate reaches ``threshold`` is marked a duplicate of its
    smallest such mate. One verdict row per input vector:
    (id, cell, keep, dup_of, max_cosine) — ``dup_of``/``max_cosine``
    null for keepers.

    Conventions and scope:

    - min-id keeper, not the paper's random/farthest exemplar — the
      repo's deterministic keeper rule (retry-safe, mirror-testable);
    - verdicts use DIRECT in-cell neighbors: a chain a~b~c where
      cos(a,c) < threshold drops both b and c (each has a smaller-id
      neighbor) with ``dup_of`` naming the direct partner. Callers
      needing full transitive groups feed near-dup PAIRS (the
      embedding-cosine pair path) to ``dedup.duplicate_clusters``;
    - like the paper, cross-cell near-dups are invisible by design —
      recall comes from cell count ∝ corpus size (50k cells for 100M
      embeddings in the paper), which also bounds |cell| and with it
      the quadratic in-cell term and the per-cell collected row;
    - ``emit="pairs"`` returns the raw above-threshold edge list
      (id_a, id_b, cosine; id_a < id_b) instead of verdicts — the
      input shape ``dedup.duplicate_clusters`` takes for the full
      transitive grouping.

    Plan: centroid training collects only the bounded centroid set;
    assignment is row-local over the broadcast centroid array; ONE
    shuffle on the cell key builds sorted member lists; pairs come
    from in-list enumeration (no self-join — the same shape as the
    LSH bucket path); the verdict join is |hits|-sized.
    """
    if emit not in ("verdicts", "pairs"):
        raise ValueError("emit must be 'verdicts' or 'pairs'")
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(
            corpus, n_centroids=n_centroids, n_iters=n_iters,
            vec_col=vec_col, id_col=id_col,
        )
    )
    cells = assign_cells(corpus, cents, vec_col, id_col, cents_arr=cents_arr)
    return _semantic_verdicts(
        cells, threshold, vec_col, id_col, emit, max_cell_size
    )


def prototypicality(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents_arr: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, cent_cos): each vector's nearest cell and its cosine
    to that cell's centroid — the PROTOTYPICALITY score (high = the
    vector sits near the center of a semantic cluster; low = an
    outlier/diverse point). The signal behind D4-style diversity
    pruning (Tirumala et al. 2023, arXiv 2308.12284): after dedup,
    dropping the most prototypical points re-weights the corpus
    toward its diverse tail.

    Same plan shape as :func:`assign_cells` (which discards the
    score): one row-local reduction over the broadcast centroid
    array — zero shuffles, corpus never moves."""
    if cents_arr is None:
        cents_arr = _cent_array(centroids)
    best = F.array_max(_cell_scores(F.col(vec_col), F.col("nrm")))
    return (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .crossJoin(F.broadcast(cents_arr))
        .select(
            id_col,
            best["cell"].alias("cell"),
            best["cos"].alias("cent_cos"),
        )
    )


def diversity_filter(
    corpus: DataFrame,
    centroids: DataFrame,
    drop_frac: float = 0.25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents_arr: DataFrame | None = None,
) -> DataFrame:
    """D4-style diversity pruning verdicts: per cell, the
    ``drop_frac`` most-prototypical vectors (highest centroid cosine,
    ties broken by id — deterministic, retry-safe) are marked
    ``keep = false``. One verdict row per input vector:
    (id, cell, cent_cos, keep).

    Drop count per cell is ``floor(drop_frac * |cell|)`` — floor, not
    ceil, so small cells are not over-pruned: a singleton cell keeps
    its only vector at any drop_frac < 1, and the effective drop rate
    never exceeds the requested fraction (round-5 advice).

    Plan: the prototypicality pass is row-local; the per-cell ranking
    is ONE shuffle on the cell key with two window functions over it —
    cells are bounded by construction (cell count ∝ corpus size keeps
    |cell| manageable, the SemDeDup sizing rule), so no single
    partition degenerates. Keep-side selection composes after
    :func:`semantic_dedup` the way the D4 recipe orders its stages
    (dedup first, then prune prototypes)."""
    if not 0.0 <= drop_frac < 1.0:
        raise ValueError("drop_frac must be in [0, 1)")
    proto = prototypicality(
        corpus, centroids, vec_col, id_col, cents_arr=cents_arr
    )
    w = Window.partitionBy("cell")
    rank_w = w.orderBy(F.desc("cent_cos"), F.col(id_col))
    ranked = proto.select(
        id_col, "cell", "cent_cos",
        F.row_number().over(rank_w).alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__n"),
    )
    return ranked.select(
        id_col, "cell", "cent_cos",
        (
            F.col("__rn") > F.floor(F.lit(float(drop_frac)) * F.col("__n"))
        ).alias("keep"),
    )


def semantic_dedup_indexed(
    index,
    threshold: float = 0.9,
    emit: str = "verdicts",
    spark: "SparkSession | None" = None,
    max_cell_size: int | None = None,
) -> "DataFrame":
    """:func:`semantic_dedup` over a persisted ``AnnIndex``
    (operators/ann_index.py): the stored (id, vec, nrm, cell) corpus
    copy already carries the cell assignment, so the dedup pass skips
    centroid training AND assignment entirely — it reads the
    cell-partitioned artifact and goes straight to in-cell pair
    enumeration. The offline indexing pass is paid once; dedup,
    search, and incremental append all reuse it.
    """
    if emit not in ("verdicts", "pairs"):
        raise ValueError("emit must be 'verdicts' or 'pairs'")
    from pyspark.sql import SparkSession

    meta = index.meta
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "no active SparkSession — pass spark= explicitly"
            )
    cells = index.corpus(spark).select(
        meta["id_col"], meta["vec_col"], "nrm", "cell"
    )
    return _semantic_verdicts(
        cells, threshold, meta["vec_col"], meta["id_col"], emit,
        max_cell_size,
    )


def _semantic_verdicts(
    cells: DataFrame,
    threshold: float,
    vec_col: str,
    id_col: str,
    emit: str,
    max_cell_size: int | None = None,
) -> DataFrame:
    """Shared back half of the SemDeDup pass over an assigned
    (id, vec, nrm, cell) frame — see :func:`semantic_dedup` for the
    contract and scale notes."""
    from jde_to_datalake_spark.operators.dedup import pair_enumeration

    members = (
        cells.repartition("cell")
        .groupBy("cell")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), F.col(vec_col), F.col("nrm")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    if max_cell_size is not None:
        # operational guard for the quadratic in-cell term: a cell
        # larger than the budget means n_centroids is undersized for
        # this corpus — fail with the remedy instead of letting one
        # hot cell OOM an executor mid-job. The assert lives in a
        # FILTER (assert_true yields NULL on success -> coalesce TRUE)
        # because a projected-then-dropped guard column gets pruned by
        # the optimizer and never evaluates.
        members = members.filter(
            F.coalesce(
                F.assert_true(
                    F.size("members") <= F.lit(int(max_cell_size)),
                    F.concat(
                        F.lit("semantic_dedup: cell "),
                        F.col("cell").cast("string"),
                        F.lit(" holds "), F.size("members").cast("string"),
                        F.lit(f" vectors (> max_cell_size={max_cell_size})"
                              " — increase n_centroids"),
                    ),
                ).isNull(),
                F.lit(True),
            )
        )
    pairs = members.select(
        F.explode(pair_enumeration("members")).alias("p")
    ).select(
        F.col("p.a")[id_col].alias("__keeper"),
        F.col("p.b")[id_col].alias("__dup"),
        (
            _dot(F.col("p.a")[vec_col], F.col("p.b")[vec_col])
            / F.col("p.a")["nrm"] / F.col("p.b")["nrm"]
        ).alias("__cosine"),
    )
    if emit == "pairs":
        return pairs.filter(F.col("__cosine") >= threshold).select(
            F.col("__keeper").alias("id_a"),
            F.col("__dup").alias("id_b"),
            F.col("__cosine").alias("cosine"),
        )
    hits = (
        pairs.filter(F.col("__cosine") >= threshold)
        .groupBy("__dup")
        .agg(
            F.min("__keeper").alias("dup_of"),
            F.max("__cosine").alias("max_cosine"),
        )
    )
    return (
        cells.select(F.col(id_col), "cell")
        .join(hits, F.col(id_col) == F.col("__dup"), "left")
        .drop("__dup")
        .withColumn("keep", F.col("dup_of").isNull())
        .select(id_col, "cell", "keep", "dup_of", "max_cosine")
    )
