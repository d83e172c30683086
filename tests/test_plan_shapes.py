"""Physical-plan regression tests — the 100 TB posture, asserted.

Correctness tests prove WHAT each query computes; these prove HOW:
no accidental cartesian products, predicates/projections reaching the
parquet scan, broadcasts where dimensions are small, and bounded
exchange counts on the headline plans. A plan that silently grows an
extra shuffle or loses pushdown still returns right answers at
sf0.001 — these tests are what catches it.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR


def _fresh(spark, name: str):
    """Build the query bypassing the registry's plan cache: a cached
    DataFrame that another test already executed carries AQE's final
    adaptive QueryExecution, whose toString prints Final+Initial plan
    sections and double-counts Exchanges."""
    import __spark_entry__ as E

    fn = E.queries()[name]
    return getattr(fn, "__wrapped__", fn)(spark, SF_DIR)


def _executed(spark, name: str) -> str:
    return _fresh(spark, name)._jdf.queryExecution().executedPlan().toString()


def _all_query_names():
    import __spark_entry__ as E

    return sorted(E.queries())


# Deliberate broadcast-nested-loop plans: ann_suite's exact branch is
# the documented verifier (broadcast(queries) x corpus) and its ivf
# branch broadcasts the tiny centroid table for assignment;
# date_windows joins a broadcast 1-row anchor on a range predicate;
# histogram_drift cross-joins its broadcast 1-row totals onto the
# |buckets|-row report (documented in operators/quality.py — chosen
# over a single-partition global window); embedding_dedup_suite's
# semdedup branch assigns cells via the same broadcast 1-row centroid
# array crossJoin as ann_suite's ivf branch (assign_cells).
BNLJ_ALLOWED = {
    "ann_suite", "date_windows", "monitor_suite",
    "embedding_dedup_suite",
    # round 5: corpus_filters carries the bloom probe's broadcast
    # 1-row word-array crossJoin (operators/bloom.py — the _cent_array
    # pattern; the corpus branch itself never partitions)
    "corpus_filters",
}


@pytest.mark.parametrize("name", _all_query_names())
def test_no_cartesian_and_no_accidental_bnlj(spark, name):
    plan = _executed(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected broadcast-nested-loop join"
        )


def test_filters_push_down_to_parquet_scan(spark):
    plan = _executed(spark, "filters_inlist_range")
    assert "PushedFilters: [" in plan
    # all three predicates reach the scan (IN-list, range, >)
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderstatus" in pushed
    assert "o_orderdate" in pushed
    assert "o_totalprice" in pushed


def test_column_pruning_reaches_scan(spark):
    plan = _executed(spark, "sampling_suite")
    # documents has (doc_id, text, lang, n_chars, ...); the sampling
    # suite needs only doc_id + lang — every scan in the plan must
    # prune the text column
    schemas = [p.split("\n", 1)[0] for p in plan.split("ReadSchema: ")[1:]]
    assert schemas, "no parquet scans found"
    for read_schema in schemas:
        assert "doc_id" in read_schema
        assert "text" not in read_schema
    # at least one branch needs lang; the split branch prunes it away
    # entirely (doc_id-only scan) — both prunings must appear
    assert any("lang" in s for s in schemas)
    assert any("lang" not in s for s in schemas)


def test_pivot_report_shape(spark):
    plan = _executed(spark, "pivot_report")
    # customer is the broadcast dimension side
    assert "BroadcastHashJoin" in plan
    # the final global orderBy was removed: no top-level Sort+Exchange
    # beyond the 4 expected data exchanges (detail agg, header join
    # side, final rollup, AQE reads)
    assert plan.count("Exchange") <= 4, plan.count("Exchange")


def test_live_comparison_preaggregates_before_join(spark):
    df = _fresh(spark, "live_comparison")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # detail side: Aggregate(l_orderkey) must sit BELOW the orders join
    # (partial-sum-then-join); textually, the innermost Join must have
    # an Aggregate descendant on the lineitem branch
    assert "Join" in optimized
    assert "Aggregate [l_orderkey" in optimized, optimized[:2000]
    n_ex = _executed(spark, "live_comparison").count("Exchange")
    assert n_ex <= 4, n_ex


def test_ann_suite_single_window_pass(spark):
    """The three ANN variants rank through ONE window (one top-k
    shuffle for the whole suite) and the IVF indexing pass is
    row-local: no per-variant Window nodes, no global-partition
    window anywhere."""
    plan = _executed(spark, "ann_suite")
    # "Window [" is the window exec node; WindowGroupLimit nodes are
    # Spark's rank-limit pushdown around it and are expected
    assert plan.count("Window [") == 1, plan.count("Window [")
    # the old per-vector argmax window partitioned by candidate_id —
    # the row-local IVF indexing must not reintroduce it
    assert "windowspecdefinition(candidate_id" not in plan.lower()


@pytest.mark.parametrize(
    ("name", "max_exchanges"),
    [
        ("action_flatten", 4),       # 2 nesting chains + 2 join sides
        # the union of both branches' former budgets (5 lsh + 8 ngram)
        ("text_neardup_suite", 13),
        ("pricing_summary", 1),      # single agg over one scan
        # transaction_ids/text_quality are pure projections; their one
        # exchange is session.spread widening the unsplittable local
        # single-row-group scan — a no-op on a wide (cluster-scale) scan
        ("transaction_ids", 1),
        ("text_quality", 1),
        ("multimodal_decode", 0),    # mapInPandas over the scan, no shuffle
        ("range_join", 1),           # bin equi-join, no BNL
        # round-4 second-session promotions
        # every monitor_suite exchange is metadata-scale: 5-bucket
        # aggs + broadcast grids + 1-row totals on the drift branch
        # (evaluated once per consumer side), ngram agg pair, spread
        ("monitor_suite", 13),
        ("incremental_dedup", 4),    # keeper agg + index/keeper joins
        ("flag_join_suite", 4),      # anti join + exists join + rollup
        ("conditional_agg", 3),      # two tiny agg branches + union
        ("unit_conversion", 0),      # pure projection (is_valid incl.)
    ],
)
def test_exchange_budget(spark, name, max_exchanges):
    plan = _executed(spark, name)
    got = plan.count("Exchange")
    assert got <= max_exchanges, f"{name}: {got} exchanges > {max_exchanges}"


def test_sketch_suite_percentiles_not_rekeyed_by_distinct(spark):
    """Round 12: the exact count-distinct runs as its own aggregation
    joined back on the group key. Mixed into the main agg, Spark's
    single-distinct rewrite re-keys the WHOLE first aggregation level
    by (l_returnflag, l_suppkey) — the exact-percentile accumulators
    get built per (group x suppkey) micro-group and pairwise-merged,
    roughly doubling the ObjectHashAggregate update+merge work
    (measured 2.58s -> 1.40s at sf0.1 when split). This pins that no
    percentile function is evaluated under a (returnflag, suppkey)
    grouping, and that the distinct side attaches as a broadcast
    join rather than re-entering the percentile pipeline."""
    import re

    plan = _executed(spark, "sketch_suite")
    assert not re.search(
        r"keys=\[l_returnflag[^\]]*l_suppkey[^\]]*\],\s*functions=\[[^\]]*percentile",
        plan,
    ), plan
    assert "Expand" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_sketch_suite_near_distinct_percentile_runs_as_window(spark):
    """Round 13: the near-distinct exact percentile (l_extendedprice
    p25) runs as a codegen window sort + two-row pick, NOT as a
    Percentile aggregate — its ObjectHashAggregate counts-map is
    data-sized for a ~1-distinct-value-per-row column (isolated A/B at
    sf0.1: 1.12 s aggregate vs 0.73 s window; full query 1.65 ->
    1.20 s). The low-cardinality qty percentile deliberately STAYS in
    the main agg (50 distinct values: tiny map, 0.18 s vs 0.52 s)."""
    import re

    plan = _executed(spark, "sketch_suite")
    # no percentile aggregate over the near-distinct price column
    assert not re.search(r"percentile\(l_extendedprice", plan), plan
    # the qty percentile stays an aggregate; the price p25 is a window
    assert re.search(r"percentile\(l_quantity", plan), plan
    assert "row_number()" in plan, plan


def test_corpus_filters_single_scan_shared_base(spark):
    """Round 13: every corpus_filters branch (metrics, corpus/eval
    shingles, occurrences, token-df, bloom probe + bench keys) reads
    the ONE lazily-checkpointed (doc_id, text, __toks) base instead of
    re-scanning + re-splitting documents.parquet per branch (the
    pre-r13 plan had SEVEN parquet scans, six of them re-tokenizing).
    The parquet scan happens exactly once, inside the checkpoint
    materialization — so the query plan itself must contain no parquet
    scan at all, only ExistingRDD reads of the base."""
    plan = _executed(spark, "corpus_filters")
    assert plan.count("Scan parquet") == 0, plan.count("Scan parquet")
    assert "Scan ExistingRDD" in plan
    # tokenization must not be re-derived from text in any branch:
    # split() may appear only where text itself is the operand of a
    # row-local quality feature, never as a shingle/token source
    # (those read the materialized __toks column). The gram transform
    # references __toks; assert no branch re-splits for exploding.
    for frag in plan.split("Generate ")[1:]:
        head = frag.split("\n", 1)[0]
        assert "split(" not in head, head


def test_shuffled_hash_join_still_splits_skew(spark):
    """Round 13 guard for the round-12 session conf
    ``spark.sql.join.preferSortMergeJoin=false``: the argued safety of
    preferring shuffled-hash joins was that AQE's skew-join splitting
    applies to SHJ exactly as to sort-merge, so a hot key cannot pin
    one build-side partition. This turns that argument into evidence:
    a deliberately skewed join (92% of the big side on one key) that
    the planner executes as ShuffledHashJoin must come out of AQE with
    the skewed partition split (skew=true on the join node and a
    skewed AQEShuffleRead on the big side)."""
    from pyspark.sql import functions as F

    tuned = {
        # keep the skew detectable at test scale: the 256 MB default
        # threshold is a production constant, not part of the claim
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # no broadcast escape hatch: the join must shuffle both sides
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.join.preferSortMergeJoin") == "false"
        big = spark.range(0, 300000).select(
            F.when(F.col("id") % 13 == 0, F.col("id") % 97)
            .otherwise(F.lit(0)).alias("k"),
            F.lpad(F.col("id").cast("string"), 48, "x").alias("pad"),
        )
        small = spark.range(0, 97).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(small.hint("SHUFFLE_HASH"), "k").select("k")
        assert len(j.collect()) == 300000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin(skew=true)" in plan, plan[:1500]
        assert "AQEShuffleRead coalesced and skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_corpus_pipeline_op_shapes(spark):
    """The non-registry training-pipeline ops keep their scale shapes:
    no cartesian/BNLJ anywhere, and bounded exchanges — sequence_pack's
    final plan carries only the per-partition window hash plus the
    broadcast of partition prefixes (the range shuffle runs inside the
    checkpointed staging job); passage_dedup's checkpointed window
    relation keeps it at 3 (firsts agg, join probe, reassembly);
    exact mixture_sample is the one domain-window shuffle."""
    from jde_to_datalake_spark.operators import corpus as C
    from jde_to_datalake_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())[:2]
    for name, df, budget in [
        ("sequence_pack", C.sequence_pack(docs, budget=64), 3),
        # 5th exchange: the doc-keyed join attaching the ORIGINAL text
        # for untouched docs (the fidelity contract) — text moves once
        # per doc, never per window
        ("passage_dedup", C.passage_dedup(docs, k=5), 5),
        (
            "mixture_sample_exact",
            mixture_sample(
                docs, "lang", {langs[0]: 1, langs[1]: 1}, ["doc_id"], exact=True
            ),
            1,
        ),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        got = plan.count("Exchange")
        assert got <= budget, f"{name}: {got} exchanges > {budget}"


def test_semantic_dedup_shape(spark):
    """semantic_dedup: cell assignment is the broadcast 1-row centroid
    array (the deliberate BNLJ shared with ann_suite), members build on
    ONE cell shuffle, pairs come from in-list enumeration — no
    self-join, no cartesian; the verdict join adds the only other
    exchanges."""
    from jde_to_datalake_spark.operators.similarity import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell int, cent_vec array<double>"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        semantic_dedup(emb, threshold=0.5, centroids=cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the centroid-array broadcast is the only nested-loop join
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # one per consumer
    # only TWO exchanges move data-sized rows: the cell repartition and
    # the hits aggregation; the rest are the bounded centroid fold +
    # its broadcast (paid once per cells consumer — assignment is
    # row-local, so the second consumer recomputes instead of
    # shuffling) and the |hits| verdict broadcast
    got = plan.count("Exchange")
    assert got <= 7, f"semantic_dedup: {got} exchanges"
    data_scale = plan.count("REPARTITION_BY_COL") + plan.count(
        "Exchange hashpartitioning(__dup"
    )
    assert data_scale <= 2, plan


def test_sharded_bloom_probe_plans_equi_join_not_cartesian(spark):
    """Round 6: the beyond-broadcast bloom probe must join batch bit
    positions to their shard rows as a plain EQUI-join (hash/SMJ on
    the shard id) — no cartesian, no nested-loop, and the filter side
    never collects to the driver."""
    from jde_to_datalake_spark.operators.bloom import (
        bloom_build_sharded,
        bloom_probe_sharded,
    )

    keys = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS k")
    shards = bloom_build_sharded(keys, ["k"], 1 << 12, 3, shard_words=16)
    probe = bloom_probe_sharded(
        spark.range(500, 1500).selectExpr("CAST(id AS STRING) AS k"),
        ["k"], shards, 1 << 12, 3, shard_words=16,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the shard equi-join is present as a hash or sort-merge join
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_band_pruned_probe_scans_file_subset_in_plan(spark, tmp_path):
    """Round 6: the band-index probe's parquet scan must list ONLY the
    stats-overlapping files (manifest-level skipping is visible in the
    FileScan's location list)."""
    from jde_to_datalake_spark.sources.versioned import VersionedTable
    import pyspark.sql.functions as F

    t = VersionedTable(str(tmp_path / "b"))
    for lo in (0, 100, 200):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr("CAST(id AS STRING) AS band_hash", "id AS doc_id")
            .coalesce(1)
        )
    pruned = t.read_where_in(spark, "doc_id", [42])
    # only the one overlapping file is planned, and it's a real scan
    # (IN-filter applied on top)
    assert len(t.files_for_values("doc_id", [42])) == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count(".parquet") <= 1 or "1 paths" in plan
    assert pruned.count() == 1
    assert pruned.first()["doc_id"] == 42


def test_rename_projection_keeps_pushdown_at_the_scan(spark, tmp_path):
    """Column mapping is a boundary PROJECTION: a read_where filter on
    a renamed column must still reach the parquet scan as a pushed
    filter on the PHYSICAL name, and the scan must prune to the
    stats-overlapping file subset — a rename that broke either would
    silently turn clustered reads into full scans at 100 TB."""
    from jde_to_datalake_spark.sources.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.range(0, 1000).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v"
        )
    )
    t.compact(spark, target_partitions=8, cluster_by="k")
    t.rename_column("k", "key_id")
    df = t.read_where(spark, "key_id", 10, 20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # the physical column name carries the predicate into the scan
    assert "k" in pushed and "GreaterThanOrEqual" in pushed
    # file-list pruning happened before the scan was planned
    assert len(t.files_for_range("key_id", 10, 20)) < 8
    assert {r["key_id"] for r in df.collect()} == set(range(10, 21))


def test_shj_session_conf_keeps_aqe_skew_split(spark):
    """Round 13 (VERDICT r12 #7): the session-global
    ``preferSortMergeJoin=false`` (round 12) is safe under skew only
    because AQE's skew-join handling applies to ShuffledHashJoin as it
    does to SortMergeJoin. This pins that claim as a regression guard:
    a deliberately skewed shuffle join under the engine session must
    either execute as a skew-split join (``(skew=true)`` with a skewed
    AQEShuffleRead) or fall back to a strategy that still splits —
    a Spark upgrade or conf change that silently stopped splitting
    would turn the conf into a straggler factory at 100 TB."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.join.preferSortMergeJoin") == "false"
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink the skew thresholds so a ~1.5 MB hot partition counts
        # as skewed, and size the broadcast threshold so the build side
        # is NOT broadcast but still passes canBuildLocalHashMap
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "262144")
        big = spark.range(0, 120_000).select(
            F.when(F.col("id") < 100_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias(
                "v"
            ),
        )
        # build side sized ABOVE the broadcast threshold (so no BHJ)
        # and below threshold x partitions (so canBuildLocalHashMap
        # admits the hash join): 50k x 2 longs ~ 800 KB estimated
        small = spark.range(0, 50_000).select(
            (F.col("id") % 1_000).alias("k"), F.col("id").alias("w")
        )
        # count INSIDE the same QueryExecution (a separate .count()
        # would plan and execute a fresh QE, leaving j's adaptive plan
        # unfinalized and the skew markers invisible); reference both
        # payload columns so column pruning keeps the sides at their
        # intended sizes (pruned to bare keys, the "much smaller build
        # side" precondition stops holding and the planner reverts to
        # SMJ — which also skew-splits, but it is SHJ we are pinning)
        j = big.join(small, "k", "inner").agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.length("v")).alias("mv"),
            F.max("w").alias("mw"),
        )
        # hot key 0 matches the 50 small rows with id % 1000 == 0;
        # uniform tail ids >= 100k never match
        assert j.collect()[0]["n"] == 100_000 * 50
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # the engine conf's runtime selection picked a hash join here
        # (the size guard passes by construction) ...
        assert "ShuffledHashJoin" in final, final
        # ... and AQE split the skewed build-side partition
        assert "(skew=true)" in final, final
        assert "skewed" in final, final  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_binary_column_stats_prune_files(spark, tmp_path):
    """Round 13 (VERDICT r12 #6): BINARY key columns get order-
    preserving footer stats (tagged hex — versioned._footer_stats) so
    min/max file pruning fires on them exactly as on strings. The band
    artifact stores its 16-byte md5 bucket key as BINARY now; without
    this the stats were poisoned (bytes rarely decode as UTF-8) and
    every probe scanned the whole artifact."""
    from pyspark.sql import functions as F

    from jde_to_datalake_spark.sources.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "bt"))
    # 8 commits, each a narrow contiguous slice of the key space:
    # key = unhex(md5-like fixed-width hex) built from a zero-padded
    # counter so file ranges are disjoint by construction
    for lo in range(0, 800, 100):
        t.commit(
            spark.range(lo, lo + 100)
            .selectExpr(
                "unhex(lpad(hex(id), 32, '0')) AS bkey", "id AS doc_id"
            )
            .coalesce(1)
        )
    probe = bytes.fromhex("0" * 29 + "2a0")  # id 672 = 0x2a0
    assert len(t.files_for_values("bkey", [probe])) == 1
    assert len(t.files_for_values("bkey", [bytearray(probe)])) == 1
    pruned = t.read_where_in(spark, "bkey", [probe])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count(".parquet") <= 1 or "1 paths" in plan
    rows = pruned.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 672
    # range probe over binary bounds prunes too
    lo_b = bytes.fromhex("0" * 29 + "190")  # 400
    hi_b = bytes.fromhex("0" * 29 + "1f3")  # 499
    assert len(t.files_for_range("bkey", lo_b, hi_b)) == 1
