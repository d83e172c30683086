"""k-means IVF centroid training — numpy-mirror parity + IVF integration.

The operator is iterative (driver-looped Lloyd's with bounded
centroid-set collects), so it has no DuckDB oracle; parity here is
against an independent numpy implementation of the same contract:
cosine argmax assignment with lowest-cell tie-break, per-cell mean
update, empty cells keep their previous centroid, seeds = lowest-id
corpus vectors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    hard_negatives,
    kmeans_centroids,
    pool_embeddings,
    random_projection,
    rerank_topk,
)
from jde_to_datalake_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"
N_CENTROIDS = 4
N_ITERS = 3


def _numpy_kmeans(ids, vecs, n_centroids, n_iters):
    order = np.argsort(ids, kind="stable")
    seeds = vecs[order[:n_centroids]].astype(np.float64)
    cents = seeds.copy()
    x = vecs.astype(np.float64)
    xn = np.linalg.norm(x, axis=1)

    def assignments(c):
        cn = np.linalg.norm(c, axis=1)
        cos = (x @ c.T) / xn[:, None] / cn[None, :]
        return np.argmax(cos, axis=1)  # first max = lowest cell

    assign = assignments(cents)
    for _ in range(n_iters):
        for cell in range(n_centroids):
            members = x[assign == cell]
            if len(members):
                cents[cell] = members.mean(axis=0)
        assign = assignments(cents)
    return cents, assign


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def np_corpus(corpus):
    rows = corpus.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, vecs


def test_kmeans_matches_numpy_mirror(spark, corpus, np_corpus):
    ids, vecs = np_corpus
    expected, _ = _numpy_kmeans(ids, vecs, N_CENTROIDS, N_ITERS)
    got_rows = (
        kmeans_centroids(corpus, n_centroids=N_CENTROIDS, n_iters=N_ITERS)
        .orderBy("cell")
        .collect()
    )
    assert [r.cell for r in got_rows] == list(range(N_CENTROIDS))
    got = np.array([list(r.cent_vec) for r in got_rows])
    assert got.shape == expected.shape
    # float64 summation order differs (distributed partial sums vs
    # numpy fold) — tolerance, not bit-equality, is the right contract
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-9)


def test_kmeans_improves_spherical_objective(np_corpus):
    ids, vecs = np_corpus
    x = vecs.astype(np.float64)
    xn = np.linalg.norm(x, axis=1)

    def objective(cents):
        cn = np.linalg.norm(cents, axis=1)
        cos = (x @ cents.T) / xn[:, None] / cn[None, :]
        return cos.max(axis=1).mean()

    seeds, _ = _numpy_kmeans(ids, vecs, N_CENTROIDS, 0)
    trained, _ = _numpy_kmeans(ids, vecs, N_CENTROIDS, N_ITERS)
    assert objective(trained) >= objective(seeds) - 1e-12


def test_empty_cells_keep_previous_centroid(spark):
    # 3 identical vectors -> every vector lands in cell 0; cells 1-2
    # must keep their seed vectors instead of degenerating to NaN
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {
        r.cell: list(r.cent_vec)
        for r in kmeans_centroids(df, n_centroids=3, n_iters=2).collect()
    }
    assert got[0] == [1.0, 0.0]
    assert got[1] == [1.0, 0.0] and got[2] == [1.0, 0.0]
    assert all(not np.isnan(v).any() for v in got.values())


def test_trained_centroids_plug_into_ivf(spark, corpus):
    cents = kmeans_centroids(corpus, n_centroids=N_CENTROIDS, n_iters=2)
    out = ivf_topk(
        corpus,
        corpus.filter(F.col("vec_id") < 3),
        k=4,
        n_probe=2,
        centroids=cents,
    ).collect()
    assert out, "trained-centroid IVF returned no rows"
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
        assert all(r.candidate_id != q for r in rows)


# -- binary quantization ----------------------------------------------------


def test_binary_quantize_matches_numpy_bits(spark, corpus, np_corpus):
    from jde_to_datalake_spark.operators.similarity import binary_quantize

    ids, vecs = np_corpus
    dim = vecs.shape[1]
    got = {
        r.vec_id: list(r.code)
        for r in binary_quantize(corpus, dim=dim).collect()
    }
    assert len(got) == len(ids)
    n_words = (dim + 63) // 64
    for i, vid in enumerate(ids[:50]):
        expected = [0] * n_words
        for d in range(dim):
            if vecs[i, d] > 0:
                expected[d // 64] |= 1 << (d % 64)
        # numpy's |= above is arbitrary-precision python int; fold to
        # signed int64 like Spark's long
        expected = [
            e - (1 << 64) if e >= (1 << 63) else e for e in expected
        ]
        assert got[vid] == expected, f"vec {vid}"


def test_hamming_topk_two_stage_rerank(spark, corpus, np_corpus):
    """Hamming candidates reranked by exact cosine contain the true
    top-1 neighbor for most queries (the standard two-stage ANN)."""
    from jde_to_datalake_spark.operators.similarity import (
        binary_quantize,
        cosine_topk,
        hamming_topk,
    )

    ids, vecs = np_corpus
    dim = vecs.shape[1]
    codes = binary_quantize(corpus, dim=dim)
    queries = corpus.filter(F.col("vec_id") < 10)
    cand = hamming_topk(codes, binary_quantize(queries, dim=dim), k=50)
    assert cand.count() == 10 * 50
    # ranks are dense 1..50 and hamming distances are within [0, dim]
    r1 = cand.filter(F.col("rank") == 1).collect()
    assert len(r1) == 10
    assert all(0 <= r.hamming <= dim for r in r1)

    # two-stage: exact top-1 (excluding self) should appear in the
    # 50-candidate hamming set for >= 70% of queries on real data
    exact1 = {
        r.query_id: r.candidate_id
        for r in cosine_topk(corpus, queries, k=1).collect()
    }
    cand_sets: dict[int, set] = {}
    for r in cand.collect():
        cand_sets.setdefault(r.query_id, set()).add(r.candidate_id)
    hits = sum(
        1 for q, c in exact1.items() if c in cand_sets.get(q, set())
    )
    assert hits >= 7, f"two-stage recall too low: {hits}/10"


def test_pool_embeddings_exact_small(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])],
        "g bigint, embedding array<double>",
    )
    mean = {
        r["g"]: r["embedding"]
        for r in pool_embeddings(df, ["g"], mode="mean").collect()
    }
    assert mean[1] == [2.0, 3.0] and mean[2] == [5.0, 6.0]
    mx = {
        r["g"]: r["embedding"]
        for r in pool_embeddings(df, ["g"], mode="max").collect()
    }
    assert mx[1] == [3.0, 4.0] and mx[2] == [5.0, 6.0]
    with pytest.raises(ValueError):
        pool_embeddings(df, ["g"], mode="median")


def test_pool_embeddings_max_matches_duckdb(spark, corpus, duck):
    # compare per-dimension (exploded) to avoid list-dtype comparison:
    # max pooling is order-independent, so cross-engine equality is exact
    from tests.conftest import compare_frames

    pooled = pool_embeddings(corpus, ["label"], mode="max")
    got = pooled.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).toPandas()
    exp = duck.execute(
        """
        SELECT label, CAST(pos - 1 AS INT) AS pos, MAX(v) AS v FROM (
          SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings
        ) GROUP BY label, pos
        """
    ).fetch_df()
    compare_frames(got, exp, "pool_embeddings_max")


def test_pool_embeddings_mean_matches_numpy(spark, corpus, np_corpus):
    ids, vecs = np_corpus
    labels = {
        r["vec_id"]: r["label"]
        for r in corpus.select("vec_id", "label").collect()
    }
    want = {}
    for lbl in set(labels.values()):
        members = vecs[[i for i, v in enumerate(ids) if labels[v] == lbl]]
        want[lbl] = members.mean(axis=0)
    got = {
        r["label"]: np.array(r["embedding"])
        for r in pool_embeddings(corpus, ["label"], mode="mean").collect()
    }
    assert set(got) == set(want)
    for lbl in want:
        # mean sums in partial-agg order: equal up to FP reordering
        assert np.allclose(got[lbl], want[lbl], atol=1e-12, rtol=0)


def _fold_cosine(a, b):
    # strict left folds in float64 — bit-identical to the engine's
    # F.aggregate expression, so ranks compare exactly
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (na ** 0.5) / (nb ** 0.5)


def test_hard_negatives_matches_fold_mirror(spark, corpus):
    rows = corpus.select("vec_id", "label", "embedding").collect()
    by_id = {r.vec_id: (r.label, list(r.embedding)) for r in rows}
    q_ids = sorted(by_id)[:5]
    queries = corpus.filter(F.col("vec_id").isin([int(i) for i in q_ids]))
    got = hard_negatives(corpus, queries, k=3).collect()
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append(r)
    assert set(got_by_q) == set(q_ids)
    for qid in q_ids:
        q_label, q_vec = by_id[qid]
        cands = sorted(
            (
                (-_fold_cosine(q_vec, v), cid)
                for cid, (lbl, v) in by_id.items()
                if lbl != q_label and cid != qid
            ),
        )[:3]
        want_ids = [cid for _, cid in cands]
        got_rows = sorted(got_by_q[qid], key=lambda r: r.rank)
        assert [r.candidate_id for r in got_rows] == want_ids, qid
        # every mined negative really is a different label
        assert all(r.candidate_label != q_label for r in got_rows)


def test_random_projection_matches_numpy_and_is_stable(spark, corpus, np_corpus):
    ids, vecs = np_corpus
    in_dim = vecs.shape[1]
    out = random_projection(corpus, in_dim=in_dim, out_dim=8, seed=7)
    got = {r.vec_id: np.array(r.embedding) for r in out.collect()}
    m = np.random.default_rng(7).standard_normal((in_dim, 8))
    want = (vecs @ m) / np.sqrt(8.0)
    for i, vid in enumerate(ids):
        # same math; BLAS accumulation order varies with batch shape,
        # so equality holds to last-ulp tolerance, not bit-for-bit
        assert np.allclose(got[vid], want[i], rtol=1e-10, atol=1e-13), vid
    # partitioning-independent: the matrix comes from the seed, not the task
    got2 = {
        r.vec_id: np.array(r.embedding)
        for r in random_projection(
            corpus.repartition(7), in_dim=in_dim, out_dim=8, seed=7
        ).collect()
    }
    assert all(
        np.allclose(got[k], got2[k], rtol=1e-10, atol=1e-13) for k in got
    )
    # JL sanity: pairwise distances roughly preserved on a sample
    sample = ids[:20]
    idx = {v: i for i, v in enumerate(ids)}
    for a in sample[:5]:
        for b in sample[5:10]:
            d_hi = np.linalg.norm(vecs[idx[a]] - vecs[idx[b]])
            d_lo = np.linalg.norm(got[a] - got[b])
            if d_hi > 0:
                assert 0.2 < d_lo / d_hi < 3.0, (a, b)


def test_random_projection_rejects_bad_dims(spark, corpus):
    with pytest.raises(ValueError):
        random_projection(corpus, in_dim=64, out_dim=0)


def test_rerank_topk_two_stage_composition(spark, corpus):
    # stage 1: brute-force top-10, stage 2: rerank down to top-3
    queries = corpus.filter(F.col("vec_id") < 5)
    stage1 = cosine_topk(corpus, queries, k=10)
    out = rerank_topk(stage1, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {r.vec_id for r in queries.select("vec_id").collect()}
    stage1_by_q = {}
    for r in stage1.collect():
        stage1_by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.rank)
        assert len(rows) == 3
        # the default kernel is monotone in cosine, so the rerank must
        # reproduce stage 1's top-3 order exactly
        want = sorted(
            stage1_by_q[qid], key=lambda r: (-r.cosine, r.candidate_id)
        )[:3]
        assert [r.candidate_id for r in rows] == [r.candidate_id for r in want]
        # scores came through the Arrow kernel
        assert all(0.0 < r.rerank_score < 1.0 for r in rows)


def test_rerank_topk_custom_kernel_reorders(spark, corpus):
    queries = corpus.filter(F.col("vec_id") < 3)
    stage1 = cosine_topk(corpus, queries, k=5)

    def inverse(pdf):
        return -pdf["cosine"].to_numpy()  # worst-first: reverses ranking

    out = rerank_topk(stage1, k=5, kernel=inverse).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.rank)
        # reranked order is the exact reverse of stage-1 cosine order
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines)


def test_rerank_topk_string_ids(spark):
    """Id dtypes are derived from the input frame, not hardcoded —
    a candidates frame with string doc ids must round-trip intact
    (round-3 advisor finding)."""
    cand = spark.createDataFrame(
        [
            ("qa", "d1", 0.9), ("qa", "d2", 0.5), ("qa", "d3", 0.1),
            ("qb", "d1", 0.2), ("qb", "d4", 0.8),
        ],
        "query_id string, candidate_id string, cosine double",
    )
    out = rerank_topk(cand, k=2).collect()
    assert {type(r.query_id) for r in out} == {str}
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == ["qa", "qb"]
    top_a = sorted(by_q["qa"], key=lambda r: r.rank)
    assert [r.candidate_id for r in top_a] == ["d1", "d2"]
    assert len(by_q["qb"]) == 2
    assert all(0.0 < r.rerank_score < 1.0 for r in out)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_crafted_verdicts(spark):
    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell int, cent_vec array<double>"
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),      # keeper of the x-axis group
            (2, [1.0, 0.0]),      # identical -> dup_of 1, cosine 1.0
            (3, [0.96, 0.28]),    # unit vector, cos 0.96 to 1 -> dup_of 1
            (10, [0.0, 1.0]),     # keeper of the y-axis group
            (11, [0.28, 0.96]),   # cos 0.96 to 10 -> dup_of 10
            (20, [-1.0, -0.1]),   # lands in cell 1, negative cosines -> kept
        ],
        "vec_id bigint, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(vecs, threshold=0.95, centroids=cents).collect()
    }
    assert set(rows) == {1, 2, 3, 10, 11, 20}
    assert rows[1]["keep"] and rows[1]["dup_of"] is None
    assert not rows[2]["keep"] and rows[2]["dup_of"] == 1
    assert rows[2]["max_cosine"] == 1.0
    assert not rows[3]["keep"] and rows[3]["dup_of"] == 1
    assert rows[10]["keep"]
    assert not rows[11]["keep"] and rows[11]["dup_of"] == 10
    assert rows[20]["keep"] and rows[20]["max_cosine"] is None


def test_semantic_dedup_matches_strict_fold_mirror(spark, corpus, np_corpus):
    """Full-corpus parity against a python mirror that replays the
    engine's exact arithmetic (strict left folds, same division
    order, smallest-cell argmax tie-break) — verdicts, dup_of, and
    max_cosine bit-identical."""
    import math

    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    ids, vecs = np_corpus
    order = np.argsort(ids, kind="stable")
    cents = spark.createDataFrame(
        [
            (c, [float(v) for v in vecs[order[c]]])
            for c in range(N_CENTROIDS)
        ],
        "cell int, cent_vec array<double>",
    )
    threshold = 0.3
    got = {
        r["vec_id"]: (r["cell"], r["keep"], r["dup_of"], r["max_cosine"])
        for r in semantic_dedup(
            corpus, threshold=threshold, centroids=cents
        ).collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    rows = corpus.select("vec_id", "embedding").collect()
    cent_vecs = [[float(v) for v in vecs[order[c]]] for c in range(N_CENTROIDS)]
    cent_norms = [math.sqrt(fold_dot(c, c)) for c in cent_vecs]
    cells: dict[int, list] = {}
    norms: dict[int, float] = {}
    assigned: dict[int, int] = {}
    for r in rows:
        v = list(r.embedding)
        nrm = math.sqrt(fold_dot(v, v))
        best_cell, best_cos = None, None
        for c in range(N_CENTROIDS):
            cos = fold_dot(v, cent_vecs[c]) / nrm / cent_norms[c]
            if best_cos is None or cos > best_cos:  # tie -> smallest cell
                best_cell, best_cos = c, cos
        cells.setdefault(best_cell, []).append((r.vec_id, v))
        norms[r.vec_id] = nrm
        assigned[r.vec_id] = best_cell
    exp = {}
    for cell, members in cells.items():
        members.sort()
        hits: dict[int, tuple] = {}
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ida, va = members[i]
                idb, vb = members[j]
                cos = fold_dot(va, vb) / norms[ida] / norms[idb]
                if cos >= threshold:
                    prev = hits.get(idb)
                    hits[idb] = (
                        ida if prev is None else min(prev[0], ida),
                        cos if prev is None else max(prev[1], cos),
                    )
        for vid, _ in members:
            h = hits.get(vid)
            exp[vid] = (
                cell,
                h is None,
                None if h is None else h[0],
                None if h is None else h[1],
            )
    assert got == exp
    # the test must actually exercise drops at this threshold
    assert any(not keep for (_, keep, _, _) in exp.values())


def test_semantic_dedup_empty_corpus_is_total(spark):
    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell int, cent_vec array<double>"
    )
    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    assert semantic_dedup(empty, centroids=cents).count() == 0


def test_semantic_dedup_pairs_feed_transitive_clustering(spark):
    """emit='pairs' composes with duplicate_clusters: a chain a~b~c
    where cos(a,c) < threshold still lands all three in one cluster
    under the transitive closure, keeper = min id."""
    import math

    from jde_to_datalake_spark.operators.dedup import duplicate_clusters
    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell int, cent_vec array<double>"
    )
    # unit vectors at 0, 18 and 36 degrees: cos(18deg)=0.951 links
    # neighbors, cos(36deg)=0.809 does NOT link the endpoints
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    vecs = spark.createDataFrame(
        [(1, v(0)), (2, v(18)), (3, v(36))],
        "vec_id bigint, embedding array<double>",
    )
    pairs = semantic_dedup(
        vecs, threshold=0.95, centroids=cents, emit="pairs"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (2, 3)}  # the endpoints are not an edge
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, "id_a", "id_b").collect()
    }
    assert clusters == {1: 1, 2: 1, 3: 1}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        semantic_dedup(vecs, centroids=cents, emit="edges")


def test_semantic_dedup_cell_size_guard(spark):
    """An oversized cell fails with the remedy in the message instead
    of OOMing an executor — and a sufficient budget passes."""
    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell int, cent_vec array<double>"
    )
    vecs = spark.createDataFrame(
        [(i, [1.0, float(i) / 100.0]) for i in range(5)],
        "vec_id bigint, embedding array<double>",
    )
    ok = semantic_dedup(vecs, threshold=2.0, centroids=cents, max_cell_size=5)
    assert len(ok.collect()) == 5
    bad = semantic_dedup(vecs, threshold=2.0, centroids=cents, max_cell_size=3)
    # NB: a bare count() ELIMINATES the non-expanding left join — and
    # with it the whole quadratic pair subtree, so there is nothing to
    # guard; the assert fires exactly when the dangerous work runs
    # (any evaluation that needs the verdict columns)
    with pytest.raises(Exception, match="increase n_centroids"):
        bad.collect()


def test_diversity_filter_contracts(spark):
    """D4-style pruning (operators/similarity.py::diversity_filter):
    exactly floor(drop_frac * |cell|) vectors drop per cell (floor —
    singleton and small cells are never over-pruned, round-5 advice),
    the dropped set is the per-cell prototypicality top (highest
    centroid cosine, id tie-break), verdicts are total and
    partitioning-invariant."""
    import math

    from jde_to_datalake_spark.operators.similarity import (
        diversity_filter,
        prototypicality,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cell int, cent_vec array<double>",
    )
    # cell 0: ids 0..6 increasingly off-axis; cell 1: ids 10..13
    rows = [(i, [1.0, 0.05 * i]) for i in range(7)] + [
        (10 + j, [0.05 * j, 1.0]) for j in range(4)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in diversity_filter(vecs, cents, 0.25).collect()}
    assert len(out) == len(rows)  # total: one verdict per vector
    for cell, ids in ((0, range(7)), (1, range(10, 14))):
        dropped = [i for i in ids if not out[i]["keep"]]
        assert len(dropped) == math.floor(0.25 * len(list(ids)))
        # dropped = EXACTLY the per-cell prototypicality top: every
        # dropped sort key must outrank every kept one (min over
        # dropped vs max over kept — a wrong selection like ranks
        # {1,5} would slip past a min-vs-each comparison)
        best_kept = max(
            (out[i]["cent_cos"], -i) for i in ids if out[i]["keep"]
        )
        worst_dropped = min((out[i]["cent_cos"], -i) for i in dropped)
        assert worst_dropped >= best_kept
    # prototypicality scores agree with the filter's
    proto = {r["vec_id"]: r for r in prototypicality(vecs, cents).collect()}
    for i in proto:
        assert proto[i]["cell"] == out[i]["cell"]
        assert proto[i]["cent_cos"] == out[i]["cent_cos"]
    # partitioning invariance
    again = {
        r["vec_id"]: r["keep"]
        for r in diversity_filter(vecs.repartition(5), cents, 0.25).collect()
    }
    assert again == {k: v["keep"] for k, v in out.items()}
    # drop_frac=0 keeps everything; bad fractions rejected
    allkeep = diversity_filter(vecs, cents, 0.0).filter("NOT keep").count()
    assert allkeep == 0
    # floor semantics: a singleton cell NEVER loses its only vector
    # (ceil would have dropped it at any drop_frac > 0)
    solo = spark.createDataFrame(
        [(99, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    solo_out = diversity_filter(solo, cents, 0.25).collect()
    assert len(solo_out) == 1 and solo_out[0]["keep"] is True
    import pytest as _pt

    with _pt.raises(ValueError):
        diversity_filter(vecs, cents, 1.0)
