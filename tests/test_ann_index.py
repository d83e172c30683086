"""Persisted ANN index (operators/ann_index.py): build-once artifacts,
search parity with the on-the-fly operators, and the partition-pruning
plan shape that justifies the cell layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.ann_index import AnnIndex
from jde_to_datalake_spark.operators.similarity import (
    binary_quantize,
    cosine_topk,
    hamming_topk,
    ivf_topk,
)
from jde_to_datalake_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann") / "idx")
    return AnnIndex.build(corpus, root, dim=64, n_centroids=4, n_iters=2)


def _by_query(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r.query_id, []).append(r)
    return {q: sorted(v, key=lambda r: r.rank) for q, v in out.items()}


def test_artifacts_exist_and_layout_is_by_cell(spark, index):
    for part in ("corpus", "codes", "centroids", "meta.json"):
        assert os.path.exists(os.path.join(index.root, part)), part
    cells = sorted(
        d for d in os.listdir(os.path.join(index.root, "corpus"))
        if d.startswith("cell=")
    )
    assert len(cells) >= 2, cells  # physically partitioned by cell
    # the stored corpus carries precomputed norms
    assert "nrm" in index.corpus(spark).columns


def test_search_exact_matches_on_the_fly(spark, corpus, index):
    queries = corpus.filter(F.col("vec_id") < 5)
    got = _by_query(index.search_exact(queries, k=5).collect())
    want = _by_query(cosine_topk(corpus, queries, k=5).collect())
    assert got.keys() == want.keys()
    for q in want:
        assert [r.candidate_id for r in got[q]] == [r.candidate_id for r in want[q]]
        # stored norms, same fold: cosines are bit-identical
        assert [r.cosine for r in got[q]] == [r.cosine for r in want[q]]


def test_search_ivf_matches_on_the_fly_with_same_centroids(spark, corpus, index):
    queries = corpus.filter(F.col("vec_id") < 10)
    got = _by_query(index.search_ivf(queries, k=4, n_probe=2).collect())
    want = _by_query(
        ivf_topk(
            corpus, queries, k=4, n_probe=2,
            centroids=index.centroids(spark),
        ).collect()
    )
    assert got.keys() == want.keys()
    for q in want:
        assert [r.candidate_id for r in got[q]] == [r.candidate_id for r in want[q]]
        assert [r.cosine for r in got[q]] == [r.cosine for r in want[q]]


def test_search_hamming_matches_on_the_fly(spark, corpus, index):
    queries = corpus.filter(F.col("vec_id") < 10)
    got = _by_query(index.search_hamming(queries, k=5).collect())
    want = _by_query(
        hamming_topk(
            binary_quantize(corpus, dim=64),
            binary_quantize(queries, dim=64),
            k=5,
        ).collect()
    )
    assert got.keys() == want.keys()
    for q in want:
        assert [(r.candidate_id, r.hamming) for r in got[q]] == [
            (r.candidate_id, r.hamming) for r in want[q]
        ]


def test_ivf_probe_scan_is_partition_pruned(spark, corpus, index):
    """The point of the cell layout: the probe join's corpus scan is
    dynamically pruned to the probed cells' partitions."""
    queries = corpus.filter(F.col("vec_id") < 3)
    plan = (
        index.search_ivf(queries, k=3, n_probe=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "PartitionFilters: [" in plan


def test_append_grows_index_and_search_matches_full_rebuild(
    spark, corpus, tmp_path_factory
):
    """Build on half the corpus, append the other half: exact search
    over the appended index equals brute force over the FULL corpus
    (bit-identical cosines), IVF stays consistent with the on-the-fly
    operator given the same (unchanged) centroids, and the Hamming
    codes cover everything."""
    from jde_to_datalake_spark.operators.ann_index import append_to_index

    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path_factory.mktemp("ann_inc") / "idx")
    idx = AnnIndex.build(half_a, root, dim=64, n_centroids=4, n_iters=2)
    append_to_index(idx, half_b)

    queries = corpus.filter(F.col("vec_id") < 5)
    got = _by_query(idx.search_exact(queries, k=5).collect())
    want = _by_query(cosine_topk(corpus, queries, k=5).collect())
    assert got.keys() == want.keys()
    for q in want:
        assert [r.candidate_id for r in got[q]] == [r.candidate_id for r in want[q]]
        assert [r.cosine for r in got[q]] == [r.cosine for r in want[q]]
    # IVF against the same stored centroids agrees with on-the-fly
    got_ivf = _by_query(idx.search_ivf(queries, k=3, n_probe=2).collect())
    want_ivf = _by_query(
        ivf_topk(corpus, queries, k=3, n_probe=2,
                 centroids=idx.centroids(spark)).collect()
    )
    for q in want_ivf:
        assert [r.candidate_id for r in got_ivf[q]] == [
            r.candidate_id for r in want_ivf[q]
        ]
    # codes cover the whole corpus exactly once
    assert idx.codes(spark).count() == corpus.count()
    assert idx.codes(spark).select("vec_id").distinct().count() == corpus.count()


def test_append_retry_is_idempotent(spark, corpus, tmp_path_factory):
    """Re-running an append (the retry after a partial failure) must
    not double-index anything: per-artifact anti-join guards make each
    write idempotent."""
    from jde_to_datalake_spark.operators.ann_index import append_to_index

    half_a = corpus.filter(F.col("vec_id") % 2 == 0)
    half_b = corpus.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path_factory.mktemp("ann_retry") / "idx")
    idx = AnnIndex.build(half_a, root, dim=64, n_centroids=4, n_iters=2)
    append_to_index(idx, half_b)
    append_to_index(idx, half_b)  # the retry
    n = corpus.count()
    assert idx.corpus(spark).count() == n
    assert idx.codes(spark).count() == n
    assert idx.corpus(spark).select("vec_id").distinct().count() == n


def test_two_stage_search_scores_exact_and_recall(spark, corpus, index):
    """Two-stage search over the index: whenever the true neighbor
    survives the Hamming stage its cosine is bit-identical to brute
    force, and with a generous k_first the top-1 recall is high."""
    from jde_to_datalake_spark.operators.ann_index import search_two_stage

    queries = corpus.filter(F.col("vec_id") < 10)
    got = _by_query(search_two_stage(index, queries, k=3, k_first=50).collect())
    want = _by_query(cosine_topk(corpus, queries, k=1).collect())
    hits = 0
    for q, rows in want.items():
        true_top = rows[0]
        two_stage = {r.candidate_id: r.cosine for r in got[q]}
        if true_top.candidate_id in two_stage:
            hits += 1
            assert two_stage[true_top.candidate_id] == true_top.cosine
    assert hits >= 7, f"two-stage top-1 recall too low: {hits}/10"
    # ranks dense, k respected
    for q, rows in got.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3


def test_semantic_dedup_over_index_matches_on_the_fly(spark, corpus, index):
    """semantic_dedup_indexed reads the stored (id, vec, nrm, cell)
    artifact instead of re-training/re-assigning; given the SAME
    centroids (the index's stored ones), the on-the-fly pass must
    produce identical verdicts — the artifact is a cache, never a
    semantics change."""
    from jde_to_datalake_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_indexed,
    )

    threshold = 0.3
    via_index = {
        r["vec_id"]: (r["cell"], r["keep"], r["dup_of"], r["max_cosine"])
        for r in semantic_dedup_indexed(index, threshold=threshold).collect()
    }
    on_the_fly = {
        r["vec_id"]: (r["cell"], r["keep"], r["dup_of"], r["max_cosine"])
        for r in semantic_dedup(
            corpus, threshold=threshold, centroids=index.centroids(spark)
        ).collect()
    }
    assert via_index == on_the_fly
    assert any(not keep for (_, keep, _, _) in via_index.values())
    # pairs emission agrees too
    pi = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_indexed(
            index, threshold=threshold, emit="pairs"
        ).collect()
    }
    pf = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup(
            corpus, threshold=threshold,
            centroids=index.centroids(spark), emit="pairs",
        ).collect()
    }
    assert pi == pf and pi


def test_probe_semantic_matches_strict_fold_mirror(spark, corpus, index):
    """Incremental SemDeDup probe vs a bit-exact python mirror: same
    strict left-fold dots, same argmax-cosine cell assignment (ties to
    the lowest cell), stored norms on the indexed side."""
    import math

    new = corpus.filter(F.col("vec_id") % 7 == 3)
    got = {
        (r["new_id"], r["indexed_id"]): r["cosine"]
        for r in index.probe_semantic(new, threshold=0.3).collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    cents = sorted(index.centroids(spark).collect(), key=lambda r: r["cell"])
    cnorm = {r["cell"]: math.sqrt(dot(r["cent_vec"], r["cent_vec"])) for r in cents}
    stored = index.corpus(spark).collect()
    by_cell: dict = {}
    for s in stored:
        by_cell.setdefault(s["cell"], []).append(s)

    want = {}
    for r in new.collect():
        v = r["embedding"]
        vn = math.sqrt(dot(v, v))
        best = None
        for c in cents:  # ascending cell: strict > keeps lowest on ties
            cos = dot(v, c["cent_vec"]) / vn / cnorm[c["cell"]]
            if best is None or cos > best[0]:
                best = (cos, c["cell"])
        for s in by_cell.get(best[1], []):
            if s["vec_id"] == r["vec_id"]:
                continue
            cos = dot(v, s["embedding"]) / vn / s["nrm"]
            if cos >= 0.3:
                want[(r["vec_id"], s["vec_id"])] = cos
    assert got == want
    assert want, "fixture produced no candidates — threshold too high"


def test_probe_semantic_scan_is_partition_pruned(spark, corpus, index):
    """The probe's corpus scan must be dynamically pruned to the
    batch's assigned cells — the same layout payoff as the IVF path —
    and stay free of cartesian products."""
    new = corpus.filter(F.col("vec_id") < 3)
    plan = (
        index.probe_semantic(new, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "PartitionFilters: [" in plan
    assert "CartesianProduct" not in plan
