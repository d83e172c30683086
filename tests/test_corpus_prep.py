"""End-to-end corpus preparation (operators/corpus_prep.py): the
composition preserves every stage's invariants and the funnel
accounting is consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.text import fingerprint
from jde_to_datalake_spark.operators.corpus_prep import prepare_corpus
from jde_to_datalake_spark.session import load_table
from tests.conftest import SF_DIR


def _pipeline(spark):
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # the synthetic corpus has no EXACT duplicates (fingerprints are
    # all distinct); append copies of a few docs under new ids so the
    # exact-dedup gate provably fires in the funnel
    copies = base.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    docs = base.unionByName(copies)
    did = F.col("doc_id")
    with_urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://site"), (did % 11).cast("string"),
            F.lit(".com/d/"), did.cast("string"),
        ),
    )
    is_eval = did % 97 == 0
    return prepare_corpus(
        with_urls,
        with_urls.filter(is_eval),
        is_eval,
        url_col="url",
        blocklist=["site3.com", "site7.com"],
        pack_budget=64,
    )


def test_funnel_is_consistent_and_monotone(spark):
    out = _pipeline(spark)
    funnel = out["funnel"].orderBy("stage_idx").collect()
    assert [r["stage"] for r in funnel] == [
        "input", "url_filter", "quality_filter", "exact_dedup", "passage_dedup",
    ]
    for prev, cur in zip(funnel, funnel[1:]):
        assert cur["n_in"] == prev["n_out"]
        assert cur["n_dropped"] == cur["n_in"] - cur["n_out"]
        assert 0 <= cur["n_out"] <= cur["n_in"]  # gates only drop
    # every gate in this fixture actually fires
    assert all(r["n_dropped"] > 0 for r in funnel[1:]), funnel
    assert funnel[-1]["n_out"] > 0


def test_output_honors_every_gate(spark):
    out = _pipeline(spark)
    final = out["documents"]
    # no blocklisted domain's documents survive (doc_id % 11 in {3, 7})
    assert final.filter((F.col("doc_id") % 11).isin(3, 7)).count() == 0
    # no duplicate content survives (exact dedup + passage rewrite)
    n = final.count()
    assert final.select(fingerprint(F.col("text"))).distinct().count() == n
    # split labels are exhaustive over the configured names
    labels = {r["split"] for r in final.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # no empty documents leak through the passage rewrite
    assert final.filter(F.length(F.trim("text")) == 0).count() == 0


def test_train_packs_tile_and_exclude_heldout(spark):
    out = _pipeline(spark)
    final = out["documents"]
    packs = out["train_packs"]
    train_ids = {r["doc_id"] for r in final.filter("split = 'train'").collect()}
    pack_ids = {r["doc_id"] for r in packs.select("doc_id").distinct().collect()}
    # packs cover exactly the train split — val/test never leak in
    assert pack_ids == train_ids
    # packs tile each train document's tokens exactly
    per_doc = packs.groupBy("doc_id").agg(F.sum("n_toks").alias("n")).join(
        final.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
        ),
        "doc_id",
    )
    assert per_doc.filter(F.col("n") != F.col("n_tokens")).count() == 0
    # every non-tail pack is exactly the budget
    tot = packs.groupBy("pack_id").agg(F.sum("n_toks").alias("t"))
    last = tot.agg(F.max("pack_id")).collect()[0][0]
    assert tot.filter((F.col("pack_id") != last) & (F.col("t") != 64)).count() == 0


def test_stage_cache_modes_agree(spark):
    """stage_cache='local' is a pure execution-strategy knob: the
    returned documents and funnel are identical to the lazy mode."""
    import pytest as _pytest

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    outs = {}
    for mode in ("none", "local"):
        out = prepare_corpus(
            docs, docs.filter(is_eval), is_eval,
            pack_budget=64, stage_cache=mode,
        )
        outs[mode] = (
            {r["doc_id"]: (r["split"], r["text"]) for r in out["documents"].collect()},
            [tuple(r) for r in out["funnel"].orderBy("stage_idx").collect()],
        )
    assert outs["none"] == outs["local"]
    with _pytest.raises(ValueError):
        prepare_corpus(docs, docs.filter(is_eval), is_eval, stage_cache="disk")


def test_optional_substring_stage(spark):
    """With substring_min_len set, the pipeline runs the Lee et al.
    finishing pass: repeated >=L-token runs survive only once across
    the final corpus, and the funnel grows the extra stage."""
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    out = prepare_corpus(
        base, base.filter(is_eval), is_eval,
        pack_budget=64, substring_min_len=5, stage_cache="local",
    )
    funnel = [r["stage"] for r in out["funnel"].orderBy("stage_idx").collect()]
    assert funnel == [
        "input", "quality_filter", "exact_dedup", "passage_dedup",
        "substring_dedup",
    ]
    final = out["documents"]
    # no >=5-token run appears twice in the surviving corpus: a second
    # substring pass over the OUTPUT finds nothing left to cut
    from jde_to_datalake_spark.operators.dedup import exact_substring_dedup

    recheck = exact_substring_dedup(final, min_len=5)
    assert recheck.filter(F.col("n_dup_tokens") > 0).count() == 0
    assert final.count() > 0


def test_stage_cache_lake_agrees_and_resumes(spark, tmp_path):
    """stage_cache='lake' (a) produces the same documents/funnel as the
    lazy mode, (b) actually RESUMES from the persisted stages — proven
    by editing a committed stage on disk and observing the second run
    read it instead of recomputing — and (c) refuses to resume under
    different pipeline parameters."""
    import pytest as _pytest

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    cache = str(tmp_path / "stages")

    lazy = prepare_corpus(docs, docs.filter(is_eval), is_eval, pack_budget=64)
    lake = prepare_corpus(
        docs, docs.filter(is_eval), is_eval, pack_budget=64,
        stage_cache="lake", cache_dir=cache,
    )
    as_map = lambda out: {  # noqa: E731
        r["doc_id"]: (r["split"], r["text"]) for r in out["documents"].collect()
    }
    assert as_map(lazy) == as_map(lake)
    assert [tuple(r) for r in lazy["funnel"].orderBy("stage_idx").collect()] == [
        tuple(r) for r in lake["funnel"].orderBy("stage_idx").collect()
    ]

    # resume: shrink the LAST committed stage (passage_dedup — the one
    # the outputs hang off) by one document; a re-run must READ that
    # stage (missing doc stays gone), not recompute it from the inputs
    import os

    stage = os.path.join(cache, "passage_dedup")
    kept = spark.read.parquet(stage)
    victim = kept.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    shrunk = kept.filter(F.col("doc_id") != victim)
    tmp_stage = os.path.join(cache, "_passage_dedup_tmp")
    shrunk.write.parquet(tmp_stage)
    spark.read.parquet(tmp_stage).write.mode("overwrite").parquet(stage)
    resumed = prepare_corpus(
        docs, docs.filter(is_eval), is_eval, pack_budget=64,
        stage_cache="lake", cache_dir=cache,
    )
    assert resumed["documents"].filter(F.col("doc_id") == victim).count() == 0

    # config drift: same cache_dir + different parameters must raise
    with _pytest.raises(ValueError, match="different pipeline"):
        prepare_corpus(
            docs, docs.filter(is_eval), is_eval, pack_budget=128,
            stage_cache="lake", cache_dir=cache,
        )
    # and lake mode without a cache_dir is an explicit error
    with _pytest.raises(ValueError, match="requires cache_dir"):
        prepare_corpus(
            docs, docs.filter(is_eval), is_eval, stage_cache="lake"
        )


def test_full_recipe_packs_to_shards(spark, tmp_path):
    """The complete training-data recipe end-to-end: prepare_corpus ->
    assemble_packs over the train split -> sharded export; the export
    verifies, and its token total equals the pack plan's."""
    from jde_to_datalake_spark.operators import corpus as C
    from jde_to_datalake_spark.sources.training_shards import (
        read_training_shards,
        write_training_shards,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    out = prepare_corpus(
        docs, docs.filter(is_eval), is_eval,
        pack_budget=64, stage_cache="local",
    )
    train = out["documents"].filter("split = 'train'")
    packs = C.assemble_packs(train, out["train_packs"])
    root = str(tmp_path / "export")
    manifest = write_training_shards(packs, root, rows_per_shard=32)
    back = read_training_shards(spark, root, verify=True)
    assert back.count() == manifest["n_rows"] > 0
    assert (
        manifest["n_tokens"]
        == out["train_packs"].agg(F.sum("n_toks")).collect()[0][0]
    )


def test_semantic_gate_drops_embedding_near_dups(spark):
    """With an embeddings frame, the SemDeDup gate drops embedding-
    space near-dups of a smaller-id survivor between the exact and
    passage passes; docs without an embedding pass through un-judged."""
    def _body(prefix):
        # 16 distinct tokens: clears the Gopher min-token, avg-length,
        # and top-token-fraction gates
        return " ".join(f"{prefix}{i:02d}word" for i in range(16))

    docs = spark.createDataFrame(
        [
            (1, _body("alpha")),
            (2, _body("beta")),
            (3, _body("gamma")),
            (4, _body("delta")),
        ],
        "doc_id bigint, text string",
    )
    # doc 2's vector is nearly doc 1's -> dropped; doc 3 orthogonal
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.0447]),
            (3, [0.0, 1.0]),
        ],
        "doc_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell int, cent_vec array<double>"
    )
    is_eval = F.col("doc_id") < 0
    out = prepare_corpus(
        docs, docs.filter(is_eval), is_eval,
        pack_budget=16, embeddings=emb, semantic_threshold=0.95,
        semantic_centroids=cents,
    )
    ids = {r["doc_id"] for r in out["documents"].collect()}
    assert ids == {1, 3, 4}  # 2 dropped; 4 (no vector) passes through
    funnel = {r["stage"]: r for r in out["funnel"].collect()}
    assert funnel["semantic_dedup"]["n_dropped"] == 1
    assert funnel["semantic_dedup"]["n_in"] == funnel["exact_dedup"]["n_out"]


def test_model_quality_gate_fires_and_is_honored(spark):
    """The learned-quality gate drops below-threshold survivors of the
    heuristic gate, shows up in the funnel, and every surviving
    document re-scores at or above the threshold."""
    import pandas as pd

    from jde_to_datalake_spark.operators import corpus as C
    from jde_to_datalake_spark.operators.quality_model import (
        FEATURE_NAMES,
        score_quality_model,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    eval_docs = docs.filter(is_eval)
    model = {
        "features": list(FEATURE_NAMES),
        "weights": [1.0, 0.2, -0.5, -2.0, -1.0],
        "intercept": -2.0,
    }
    # pick the threshold from the data: the median score of the
    # heuristic gate's survivors — guarantees the gate both fires and
    # spares, whatever the synthetic corpus looks like
    heur = docs.join(
        C.filter_report(docs, eval_docs, is_eval)
        .filter(F.col("keep")).select("doc_id"),
        "doc_id",
    )
    scores = sorted(
        r["__q"]
        for r in score_quality_model(heur, model, score_col="__q")
        .select("__q").collect()
    )
    cut = scores[len(scores) // 2]

    out = prepare_corpus(
        docs, eval_docs, is_eval,
        quality_model=model, quality_model_min=cut,
    )
    funnel = {r["stage"]: r for r in out["funnel"].collect()}
    assert "model_quality_filter" in funnel
    gate = funnel["model_quality_filter"]
    assert 0 < gate["n_dropped"] < gate["n_in"], dict(gate.asDict())
    # gate honored: every surviving document re-scores >= threshold
    # (scored on the ORIGINAL text — passage rewriting can only have
    # happened after this gate, so re-score pre-rewrite survivors)
    final_ids = [r["doc_id"] for r in out["documents"].select("doc_id").collect()]
    rescored = score_quality_model(
        docs.filter(F.col("doc_id").isin(final_ids)), model, score_col="__q"
    )
    assert rescored.filter(F.col("__q") < cut).count() == 0


def test_near_dedup_gate_drops_one_copy_per_group(spark):
    """MinHash near-dup gate: appended-token variants of corpus docs
    are NOT exact dups (different fingerprints) but are near-dups; the
    gate fires, and under keep-longest no (original, variant) pair
    survives together — the longer variant wins whenever both reach
    the gate."""
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    variants = base.filter(F.col("doc_id") % 40 == 2).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat("text", F.lit(" trailing marker token")).alias("text"),
    )
    n_variants = variants.count()
    assert n_variants > 0
    docs = base.unionByName(variants)
    is_eval = F.col("doc_id") % 97 == 0
    out = prepare_corpus(
        docs, docs.filter(is_eval), is_eval,
        near_dedup_threshold=0.2, near_dedup_policy="longest",
    )
    funnel = {r["stage"]: r for r in out["funnel"].collect()}
    assert "near_dedup" in funnel
    assert funnel["near_dedup"]["n_dropped"] > 0
    final_ids = {r["doc_id"] for r in out["documents"].select("doc_id").collect()}
    originals = {r["doc_id"] for r in base.filter(F.col("doc_id") % 40 == 2).collect()}
    both = {o for o in originals if o in final_ids and o + 20_000 in final_ids}
    assert not both, f"near-dup pairs survived together: {sorted(both)[:5]}"
    # the policy favored the longer variant at least once
    assert any(
        o + 20_000 in final_ids and o not in final_ids for o in originals
    )


def test_near_dedup_policy_validation(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_eval = F.col("doc_id") % 97 == 0
    import pytest

    with pytest.raises(ValueError):
        prepare_corpus(
            docs, docs.filter(is_eval), is_eval,
            near_dedup_threshold=0.2, near_dedup_policy="best",
        )
