"""Dedup keep-policy finisher (operators/dedup.py::apply_keep_policy):
SQL-oracle parity for every policy, composition with the real
pairs -> clusters graph, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, compare_frames
from jde_to_datalake_spark.operators import dedup as D
from jde_to_datalake_spark.operators.dedup import apply_keep_policy
from jde_to_datalake_spark.session import load_table

DOCS = [
    # (doc_id, text, q) — cluster {1,2,3}: 2 longest, 3 best quality;
    # cluster {10, 11}: tie on length -> min id keeps; 20/21 singletons
    (1, "short", 0.5),
    (2, "the longest copy here", 0.1),
    (3, "mid text", 0.9),
    (10, "aaaa", 0.2),
    (11, "bbbb", 0.8),
    (20, "solo", 0.3),
    (21, None, 0.4),
]
CLUSTERS = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, q double")
    clusters = spark.createDataFrame(CLUSTERS, "doc_id long, cluster_id long")
    return docs, clusters


def _oracle(duck, policy: str) -> "pd.DataFrame":
    import pandas as pd

    duck.register("tdocs", pd.DataFrame(DOCS, columns=["doc_id", "text", "q"]))
    duck.register(
        "tclus", pd.DataFrame(CLUSTERS, columns=["doc_id", "cluster_id"])
    )
    if policy == "min_id":
        keeper = "SELECT DISTINCT cluster_id, cluster_id AS keeper_id FROM tclus"
    else:
        score = "length(coalesce(text, ''))" if policy == "longest" else "q"
        keeper = f"""
        SELECT cluster_id, doc_id AS keeper_id FROM (
          SELECT c.cluster_id, d.doc_id,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY {score} DESC, d.doc_id) AS rn
          FROM tclus c JOIN tdocs d USING (doc_id)
        ) WHERE rn = 1
        """
    return duck.execute(
        f"""
        SELECT d.doc_id, d.text, d.q, c.cluster_id, k.keeper_id,
               (c.cluster_id IS NULL OR d.doc_id = k.keeper_id) AS keep
        FROM tdocs d
        LEFT JOIN tclus c USING (doc_id)
        LEFT JOIN ({keeper}) k USING (cluster_id)
        """
    ).fetch_df()


@pytest.mark.parametrize("policy", ["min_id", "longest", "best"])
def test_policy_matches_sql_oracle(spark, duck, policy):
    docs, clusters = _frames(spark)
    got = apply_keep_policy(
        docs, clusters, policy=policy, score_col="q" if policy == "best" else None
    ).toPandas()
    compare_frames(got, _oracle(duck, policy), f"keep_policy_{policy}")


def test_expected_keepers():
    # pin the fixture's intent so the oracle test can't go vacuous
    import duckdb

    con = duckdb.connect()
    try:
        exp = {
            "min_id": {1, 10},
            "longest": {2, 10},  # 10/11 tie on length -> min id
            "best": {3, 11},
        }
        for policy, want in exp.items():
            df = _oracle(con, policy)
            kept_clustered = set(
                df[df.cluster_id.notna() & df.keep].doc_id.tolist()
            )
            assert kept_clustered == want, (policy, kept_clustered)
    finally:
        con.close()


def test_composes_with_real_cluster_graph(spark):
    """pairs -> duplicate_clusters -> keep verdicts on the documents
    table: exactly one keeper per cluster, singletons untouched,
    min_id keeper equals the cluster label."""
    docs = load_table(spark, SF_DIR, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=8, band_size=2, n=3, threshold=0.2
    )
    clusters = D.duplicate_clusters(pairs)
    rows = apply_keep_policy(docs, clusters, policy="longest").collect()
    assert len(rows) == docs.count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        if r["cluster_id"] is None:
            assert r["keep"] and r["keeper_id"] is None
        else:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert by_cluster, "expected at least one near-dup cluster"
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1, (cid, keepers)
        k = keepers[0]
        best = max(
            members,
            key=lambda r: (len(r["text"] or ""), -r["doc_id"]),
        )
        assert k["doc_id"] == best["doc_id"]
    min_rows = apply_keep_policy(docs, clusters).collect()
    for r in min_rows:
        if r["cluster_id"] is not None:
            assert r["keep"] == (r["doc_id"] == r["cluster_id"])


def test_partitioning_invariant(spark):
    docs, clusters = _frames(spark)
    baseline = apply_keep_policy(docs, clusters, policy="longest").toPandas()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = apply_keep_policy(
            docs.repartition(3), clusters.repartition(2), policy="longest"
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    compare_frames(again, baseline, "keep_policy@3-partitions")


def test_policy_validation(spark):
    docs, clusters = _frames(spark)
    with pytest.raises(ValueError):
        apply_keep_policy(docs, clusters, policy="nope")
    with pytest.raises(ValueError):
        apply_keep_policy(docs, clusters, policy="best")  # no score_col


def test_empty_inputs_total(spark):
    """Totality: empty cluster relation -> everything kept untouched;
    empty docs -> empty verdicts, schema intact."""
    docs, clusters = _frames(spark)
    no_clusters = spark.createDataFrame([], "doc_id long, cluster_id long")
    rows = apply_keep_policy(docs, no_clusters, policy="longest").collect()
    assert len(rows) == len(DOCS)
    assert all(r["keep"] and r["cluster_id"] is None for r in rows)
    empty_docs = spark.createDataFrame([], "doc_id long, text string, q double")
    out = apply_keep_policy(empty_docs, clusters, policy="longest")
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "text", "q", "cluster_id", "keeper_id", "keep",
    }
