"""Deduplication operators for the training-data pipeline tier.

Four strategies, each chosen per scale regime:

- ``exact_dedup``            hash-groupBy on a normalized fingerprint.
  One shuffle keyed by a 256-bit hash — uniformly distributed, so no
  skew even at 100 TB. This is the always-first pass.
- ``ngram_jaccard_pairs``    exact shingle-overlap Jaccard via a
  shingle self-join. Quadratic in the worst case — the reference
  implementation for correctness and for verifying candidates from
  the approximate methods.
- ``minhash_signatures`` / ``minhash_lsh_pairs``   the scale path:
  per-doc k-min-hash signature, banded LSH bucketing, bucket-join for
  candidates, exact-Jaccard verification of candidates only. Work is
  O(docs x k) + O(candidate pairs), never all-pairs.
- ``simhash``                32-bit near-dup fingerprint; hamming-ball
  lookup via banded bucket join.

Determinism: all hash families derive from md5/sha2 (bit-identical in
any engine), never from JVM/Python ``hash``.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.text import fingerprint, tokens
from jde_to_datalake_spark.session import spread

# Column-builder memoization: every F.* call is a py4j round-trip, and
# the fragments below are built from FIXED column names — the same
# immutable unresolved expression serves every plan that embeds it.
# Measured: rebuilding the LSH pipeline's expressions cost ~0.7 s of
# driver time per query invocation before caching. Columns survive
# session restarts (the py4j gateway/JVM outlives SparkSessions).

SIMHASH_BITS = 32

# MinHash affine family over Z_p: h_i(x) = (A_i * x + B_i) mod p with
# x = first 15 hex chars of md5(shingle) reduced mod p. One md5 per
# shingle + integer math per hash — engine-portable (md5 + 64-bit ops)
# and ~8x cheaper than k md5 evaluations per shingle.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
MINHASH_A = [(i * 2_654_435_761 + 1) % MINHASH_P for i in range(64)]
MINHASH_B = [(i * 40_503 + 7) % MINHASH_P for i in range(64)]


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group by normalized-text SHA-256, keep min-id doc.

    Returns one row per distinct content: (fingerprint, keeper_id,
    n_dups). Scale: single shuffle on the hash; map-side partial agg.
    The shuffle key is the 32-byte BINARY digest (unhex of the hex
    fingerprint — injective, so grouping is unchanged); the public
    lowercase-hex ``fingerprint`` column is reconstructed after the
    aggregation (lower(hex(unhex(x))) == x for sha2's lowercase hex,
    NULL rides through every step), so only half the key bytes cross
    the operator's single exchange — the dominant relation is one row
    per document at any scale.
    """
    return (
        docs.select(
            F.col(id_col),
            F.unhex(fingerprint(F.col(text_col))).alias("__fpb"),
        )
        .groupBy("__fpb")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(
            F.lower(F.hex("__fpb")).alias("fingerprint"),
            "keeper_id",
            "n_dups",
        )
    )


def with_shingle_col(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """(id, sh_arr): distinct token n-gram shingles per doc, row-local.

    Two deliberate plan shapes, both verified in `.explain`:
    - tokens are PROJECTED first, then the gram lambda references the
      column — higher-order functions are interpreted, and an embedded
      `split()` expression would re-evaluate per `element_at` probe
      (3n per row). CollapseProject keeps multi-referenced non-trivial
      expressions in their own Project, pinning one split per row.
    - `try_element_at` probes rather than `slice` — O(1) indexing
      instead of a per-position sub-array allocation. The `try_`
      variant is REQUIRED, not style: downstream explodes infer a
      `size(sh_arr) > 0` predicate that gets merged with the
      token-count filter, and predicate codegen's common-subexpression
      elimination evaluates the gram transform BEFORE the AND can
      short-circuit — a plain `element_at` then throws under ANSI for
      docs with < n tokens (found by hypothesis, not the fixtures).
      For rows that survive the filter the indexes are always in
      bounds, so try/plain are value-identical.
    Docs with < n tokens are dropped by the CHEAP pre-filter (not a
    filter on sh_arr, which pushdown would inline below the spread()
    exchange, serializing the work onto the scan partition).

    ``toked``: a prebuilt (ideally checkpointed) ``(id, __toks)``
    tokenization of the SAME docs — callers sharing one tokenize pass
    across several consumers (the corpus_filters shape) pass it so the
    scan + split run once, not once per branch. The < n filter then
    runs on the materialized array, which is cheaper than re-splitting.
    """
    if toked is not None:
        toked = toked.filter(F.size(F.col("__toks")) >= n).select(
            F.col(id_col), "__toks"
        )
    else:
        toked = (
            spread(docs, keys=(id_col,))
            .filter(F.size(tokens(F.col(text_col))) >= n)
            .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        )
    return toked.select(
        F.col(id_col), _gram_col(n).alias("sh_arr")
    )


@lru_cache(maxsize=None)
def _gram_col(n: int):
    """Distinct n-gram array over the fixed '__toks' column (cached)."""
    tk = F.col("__toks")
    # guard the position range too: sequence(0, negative) DESCENDS,
    # which would probe index 0 (invalid even for try_element_at)
    positions = F.when(
        F.size(tk) >= n, F.sequence(F.lit(0), F.size(tk) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        positions,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(tk, i + j + 1) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle).

    ``explode_outer`` + post-filter rather than plain ``explode``:
    InferFiltersFromGenerate adds ``size(child)>0 AND isnotnull(child)``
    above a non-outer Generate, and predicate pushdown then INLINES the
    whole gram expression (including one split() re-evaluation per
    element_at probe) into a Filter below — measured ~8x the cost of
    the explode itself at sf0.1. Outer generates infer nothing; the
    null padding rows from empty arrays are dropped by a cheap
    column-level filter on the exploded output (gram elements
    themselves are concat_ws results, never null).
    """
    return (
        with_shingle_col(docs, n, text_col, id_col, toked=toked)
        .select(F.col(id_col), F.explode_outer("sh_arr").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_base: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    ``max_df`` drops stop-shingles (present in more than max_df docs)
    before the self-join — the standard guard against the quadratic
    blowup on boilerplate n-grams. At 100 TB this operator is only run
    on LSH candidates; standalone it is the small-corpus/oracle path.

    ``shingle_base``: a prebuilt (ideally checkpointed)
    :func:`with_shingle_col` frame for the SAME (docs, n) — callers
    running several near-dup algorithms over one corpus (the
    text_neardup_suite shape) pass it so the tokenize+gram scan is
    paid once, not once per algorithm.
    """
    # The shingle projection feeds the rare-filter AND the join; the
    # filtered set then feeds sizes AND both self-join sides. Without
    # materialization each consumer re-evaluates the whole
    # tokenize+shingle+explode pipeline (22 exchanges in the executed
    # plan); lazily checkpointing the two shared relations computes
    # each once (plan drops to 6 exchanges).
    src = (
        shingle_base
        if shingle_base is not None
        else with_shingle_col(docs, n, text_col, id_col)
    )
    sh = src.select(*_sh_explode_cols(id_col)).filter(
        _frag("sh_notnull")
    )
    if shingle_base is None:
        # standalone path: the exploded relation feeds the rare-filter
        # agg AND the join input — checkpoint so the full
        # tokenize+shingle pipeline below it runs once. With a PREBUILT
        # (checkpointed) shingle_base the arrays are already
        # materialized blocks and the explode is a cheap narrow op per
        # consumer — a checkpoint here would only add a third
        # materialization of the same rows plus an analysis pass per
        # build (round 13).
        sh = sh.localCheckpoint(eager=False)
    rare = (
        sh.groupBy("shingle")
        .agg(_frag("df_agg"))
        .filter(_rare_pred(max_df))
        .select("shingle")
    )
    sh = sh.join(rare, "shingle").localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(_frag("sz_agg"))

    a = sh.select(_alias_id(id_col, "id_a"), "shingle")
    b = sh.select(_alias_id(id_col, "id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(_frag("pair_ordered"))
        .groupBy("id_a", "id_b")
        .agg(_frag("ncommon_agg"))
    )
    out = (
        inter.join(sizes.select(_alias_id(id_col, "id_a"), _frag("sz_a")), "id_a")
        .join(sizes.select(_alias_id(id_col, "id_b"), _frag("sz_b")), "id_b")
        .withColumn("jaccard", _frag("jaccard"))
        .filter(_jac_thresh(threshold))
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# memoized fixed-name fragments for the near-dup pipelines (round 13):
# these two operators rebuild their plans on EVERY bench run (their
# checkpointed bases keep the suite out of the registry's plan memo),
# and each fragment below is a handful of py4j round-trips per
# construction — the round-2 "memoize fixed-name Column fragments"
# discipline, same as _gram_col/_bands_arr above. Unresolved Columns
# are immutable and safely shared across plans.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sh_explode_cols(id_col: str) -> tuple:
    return (F.col(id_col), F.explode_outer("sh_arr").alias("shingle"))


@lru_cache(maxsize=None)
def _alias_id(id_col: str, alias: str):
    return F.col(id_col).alias(alias)


@lru_cache(maxsize=None)
def _rare_pred(max_df: int):
    return F.col("df") <= max_df


@lru_cache(maxsize=None)
def _jac_thresh(threshold: float):
    return F.col("jaccard") >= threshold


@lru_cache(maxsize=None)
def _band_unhex_cols() -> tuple:
    # 16-byte binary bucket key instead of the 32-char md5 hex string:
    # unhex is injective on md5 output, so bucket membership — and the
    # verified pair set — is unchanged while the bucket exchange
    # carries half the key bytes (r12; r13 extends binary to the
    # persisted band artifact via band_index).
    return (
        F.col("bb.band").alias("band"),
        F.unhex(F.col("bb.band_hash")).alias("band_hash"),
    )


@lru_cache(maxsize=None)
def _ids_agg(id_col: str):
    return F.sort_array(F.collect_list(id_col)).alias("ids")


@lru_cache(maxsize=None)
def _sets_cols() -> tuple:
    return (
        F.col("sh_arr").alias("sh_set"),
        F.size("sh_arr").cast("long").alias("sz"),
    )


@lru_cache(maxsize=None)
def _melt_col(id_col: str):
    return F.explode(F.array("id_a", "id_b")).alias(id_col)


@lru_cache(maxsize=None)
def _side_expr(id_col: str):
    return F.when(F.col(id_col) == F.col("id_a"), F.lit("a")).otherwise(
        F.lit("b")
    )


@lru_cache(maxsize=None)
def _lsh_verify_aggs() -> tuple:
    return (
        F.min(F.when(F.col("side") == "a", F.col("sz"))).alias("sz_a"),
        F.min(F.when(F.col("side") == "b", F.col("sz"))).alias("sz_b"),
        F.first(
            F.when(F.col("side") == "a", F.col("sh_set")), ignorenulls=True
        ).alias("sh_a"),
        F.first(
            F.when(F.col("side") == "b", F.col("sh_set")), ignorenulls=True
        ).alias("sh_b"),
    )


# thunks, not module constants: building a Column needs the py4j
# gateway, which does not exist at import time in a driver that
# imports the entry module before creating its session
@lru_cache(maxsize=None)
def _frag(name: str):
    return {
        "sh_notnull": lambda: F.col("shingle").isNotNull(),
        "bucket_multi": lambda: F.size("ids") > 1,
        "pair_explode": lambda: F.explode(
            pair_enumeration("ids")
        ).alias("p"),
        "pair_a": lambda: F.col("p.a").alias("id_a"),
        "pair_b": lambda: F.col("p.b").alias("id_b"),
        "ncommon_set": lambda: F.size(
            F.array_intersect("sh_a", "sh_b")
        ).cast("long"),
        "df_agg": lambda: F.count(F.lit(1)).alias("df"),
        "sz_agg": lambda: F.count(F.lit(1)).alias("sz"),
        "sz_a": lambda: F.col("sz").alias("sz_a"),
        "sz_b": lambda: F.col("sz").alias("sz_b"),
        "pair_ordered": lambda: F.col("id_a") < F.col("id_b"),
        "ncommon_agg": lambda: F.count(F.lit(1)).alias("n_common"),
        "jaccard": lambda: F.col("n_common")
        / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
    }[name]()


def pair_enumeration(arr_col):
    """All (i < j) element pairs of an array as structs (a, b).

    The outer position range is when-guarded for arrays of size < 2:
    downstream explodes infer a size predicate over this expression,
    and predicate codegen's subexpression elimination can evaluate it
    before an adjacent size filter short-circuits (same hazard as
    with_shingle_col) — an unguarded sequence(1, size-1) would descend
    through index 0 on single-element arrays and throw under ANSI.
    Inner probes are bounded by construction, so plain element_at is
    safe (and cheaper than try_element_at).

    Pass a column NAME (str) to get the memoized form.
    """
    if isinstance(arr_col, str):
        return _pair_enumeration_by_name(arr_col)
    return _build_pair_enumeration(arr_col)


@lru_cache(maxsize=None)
def _pair_enumeration_by_name(name: str):
    return _build_pair_enumeration(F.col(name))


def _build_pair_enumeration(arr_col):
    positions = F.when(
        F.size(arr_col) >= 2, F.sequence(F.lit(1), F.size(arr_col) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.flatten(
        F.transform(
            positions,
            lambda j: F.transform(
                F.sequence(F.lit(0), j - 1),
                lambda i: F.struct(
                    F.element_at(arr_col, i + 1).alias("a"),
                    F.element_at(arr_col, j + 1).alias("b"),
                ),
            ),
        )
    )


def shingle_hash_base(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """(id, sh_arr, h0) where h0[j] = int64(md5(shingle_j)) mod p —
    the shared pre-LSH projection. Callers running BOTH a shingle-set
    algorithm and MinHash over one corpus (the text_neardup_suite
    shape) checkpoint THIS frame once and pass it to both: the
    shingle-only consumer ignores h0, and minhash_lsh_pairs skips its
    own re-checkpoint (one materialization of the shingle arrays
    instead of two, one driver-side analysis pass less per build)."""
    return with_shingle_col(
        docs, n, text_col, id_col, toked=toked
    ).withColumn("h0", _h0_col())


def _with_shingle_hashes(docs, n, text_col, id_col):
    """(id, sh_arr, h0) where h0[j] = int64(md5(shingle_j)) mod p."""
    return shingle_hash_base(docs, n, text_col, id_col)


@lru_cache(maxsize=None)
def _h0_col():
    return F.transform(
        F.col("sh_arr"),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
        .cast("bigint") % F.lit(MINHASH_P),
    )


@lru_cache(maxsize=None)
def _minhash_col(i: int):
    """min over shingles of the i-th affine hash (operands < 2^62)."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return F.array_min(
        F.transform(
            F.col("h0"),
            lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-MinHash signature rows: (id, hash_idx, minhash:bigint).

    Entirely ROW-LOCAL: one md5 per shingle reduced to Z_p, then k
    affine transforms (MINHASH_A/B) and an array_min each — a pure
    projection with zero shuffles, embarrassingly parallel at any
    scale. Docs with no shingle (< n tokens) emit no rows.
    """
    base = _with_shingle_hashes(docs, n, text_col, id_col)
    return base.select(
        F.col(id_col), F.explode(_sig_structs(num_hashes)).alias("s")
    ).select(
        id_col, F.col("s.hash_idx").alias("hash_idx"), F.col("s.minhash").alias("minhash")
    )


@lru_cache(maxsize=None)
def _sig_structs(num_hashes: int):
    return F.array(
        *[
            F.struct(F.lit(i).alias("hash_idx"), _minhash_col(i).alias("minhash"))
            for i in range(num_hashes)
        ]
    )


@lru_cache(maxsize=None)
def _min_cols(num_hashes: int) -> tuple:
    return tuple(_minhash_col(i).alias(f"m{i}") for i in range(num_hashes))


@lru_cache(maxsize=None)
def _bands_arr(num_hashes: int, band_size: int):
    def band_hash(b: int):
        ms = F.sort_array(
            F.array(*[F.col(f"m{b * band_size + j}") for j in range(band_size)])
        )
        return F.md5(F.array_join(F.transform(ms, lambda x: x.cast("string")), "|"))

    n_bands = num_hashes // band_size
    return F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_hash(b).alias("band_hash"))
            for b in range(n_bands)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_base: DataFrame | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard verified.

    bands = num_hashes/band_size; docs sharing any band hash become
    candidates (bucket join — work proportional to bucket sizes, not
    |docs|^2), then candidates are verified with exact n-gram Jaccard
    and filtered by ``threshold``.

    ``shingle_base``: a prebuilt :func:`with_shingle_col` frame for the
    same (docs, n) — see :func:`ngram_jaccard_pairs`.
    """
    # Signatures AND band keys are row-local expressions over the doc's
    # shingle set — the whole pre-join pipeline is a projection with
    # zero shuffles (the grouped/exploded form this replaces shuffled
    # twice before the first join).
    #
    # The projection has TWO consumers (bucket path + exact-Jaccard
    # verification) and no exchange Catalyst could reuse between them,
    # so without materialization the scan+tokenize+shingle+md5 pipeline
    # runs twice. localCheckpoint (lazy) computes it once and shares the
    # blocks — the standard "persist the signature projection" move for
    # MinHash at scale. Deliberate trade: on executor loss those blocks
    # recompute from the truncated lineage's source scan.
    if shingle_base is not None and "h0" in shingle_base.columns:
        # a prebuilt shingle_hash_base (ideally already checkpointed):
        # use it as-is — re-checkpointing here would materialize the
        # shingle arrays a second time and pay a second driver-side
        # analysis/planning pass per build (round 13: the suite's 4
        # localCheckpoint calls were 1.1 s of every bench-run build)
        base = shingle_base
    else:
        base = (
            shingle_base.withColumn("h0", _h0_col())
            if shingle_base is not None
            else _with_shingle_hashes(docs, n, text_col, id_col)
        ).localCheckpoint(eager=False)
    sig = base.select(F.col(id_col), F.col("sh_arr"), *_min_cols(num_hashes))
    band_keys = sig.select(
        F.col(id_col), F.explode(_bands_arr(num_hashes, band_size)).alias("bb")
    ).select(id_col, *_band_unhex_cols())
    # Candidate pairs WITHOUT a self-join: group ids per (band, bucket)
    # and enumerate in-bucket pairs from the sorted id list. One
    # evaluation of the signature pipeline and one shuffle — a
    # self-join would re-evaluate the whole md5/minhash projection for
    # each side. Bucket sizes bound the pair blowup exactly as the
    # self-join would (a giant bucket is quadratic either way; the
    # exact-Jaccard gate keeps only true near-dups).
    buckets = (
        band_keys.groupBy("band", "band_hash")
        .agg(_ids_agg(id_col))
        .filter(_frag("bucket_multi"))
    )
    candidates = (
        buckets.select(_frag("pair_explode"))
        .select(_frag("pair_a"), _frag("pair_b"))
        .distinct()
    )
    # Exact-Jaccard verification on CANDIDATES ONLY — the whole point of
    # LSH. The pair list is melted to one row per (pair, member) and
    # joined to the per-doc shingle sets ONCE (not once per side), then
    # folded back — each candidate pair intersects two bounded arrays.
    # Work is O(docs x k) + O(candidate pairs), never all-pairs.
    sets = base.select(F.col(id_col), *_sets_cols())
    melted = candidates.select("id_a", "id_b", _melt_col(id_col))
    return (
        melted.join(sets, id_col)
        .withColumn("side", _side_expr(id_col))
        .groupBy("id_a", "id_b")
        .agg(*_lsh_verify_aggs())
        .withColumn("n_common", _frag("ncommon_set"))
        .withColumn("jaccard", _frag("jaccard"))
        .filter(_jac_thresh(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id).

    The dedup finisher: LSH/Jaccard emit PAIRS, but "keep one copy per
    duplicate group" needs the transitive closure — A~B, B~C puts A,C
    in one cluster even if never directly compared. cluster_id is the
    MIN doc id in the component (the canonical keeper, matching
    exact_dedup's min-id convention).

    Algorithm: iterative min-label propagation —
    label(v) <- min(label(v), min over neighbors' labels), repeated to
    fixpoint (<= component-diameter iterations; near-dup clusters are
    shallow). Each iteration is one shuffle join + groupBy, and the
    label frontier is lazily checkpointed per iteration: REQUIRED for
    iterative DataFrame algorithms — without it the lineage doubles
    every pass and analysis goes exponential. Convergence is detected
    with a changed-label count (a tiny action per iteration; at 100 TB
    the label relation is |docs-in-pairs|, far smaller than the
    corpus). ``max_iters`` bounds pathological chains.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        proposed = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = proposed.filter(F.col("__changed")).limit(1).count()
        labels = proposed.drop("__changed")
        if n_changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def apply_keep_policy(
    docs: DataFrame,
    clusters: DataFrame,
    policy: str = "min_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
) -> DataFrame:
    """Turn duplicate clusters into per-document keep verdicts under a
    configurable keeper rule — the last step between pair generation
    (:func:`minhash_lsh_pairs` et al.), :func:`duplicate_clusters`,
    and the actual corpus filter.

    ``clusters`` is a ``(id_col, cluster_id)`` frame (the
    :func:`duplicate_clusters` output) covering only documents that
    HAVE near-dups; everything else is kept untouched. Policies:

    - ``min_id``   — keeper = the cluster label itself (the min id by
      construction; the repo's default retry-safe convention);
    - ``longest``  — keep the longest ``text_col`` per cluster (the
      C4/RefinedWeb-style rule: prefer the most complete copy);
    - ``best``     — keep the highest ``score_col`` per cluster (e.g.
      a quality score from operators/corpus.py).
    Ties break toward the smallest id, so every policy is
    deterministic and retry/partitioning-invariant.

    Output: all ``docs`` columns + ``cluster_id`` (null = no dup
    group), ``keeper_id`` (null for singletons), ``keep`` boolean.

    Scale: one equi-join docs x clusters on the id (the cluster
    relation is |docs-with-dups|, far smaller than the corpus; AQE
    broadcasts when it fits), and for the scored policies a per-cluster
    min-struct aggregate — map-side combinable, skew-safe (the same
    shape as passage_dedup's firsts agg), never a per-cluster window
    sort. The verdict join is |clusters|-sized.
    """
    if policy not in ("min_id", "longest", "best"):
        raise ValueError("policy must be 'min_id', 'longest', or 'best'")
    if policy == "best" and not score_col:
        raise ValueError("policy='best' requires score_col")
    joined = docs.join(clusters.select(id_col, "cluster_id"), id_col, "left")
    if policy == "min_id":
        out = joined.withColumn(
            "keeper_id",
            F.when(F.col("cluster_id").isNotNull(), F.col("cluster_id")),
        )
    else:
        score = (
            F.col(score_col).cast("double")
            if policy == "best"
            else F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("double")
        )
        keepers = (
            joined.filter(F.col("cluster_id").isNotNull())
            .select(
                "cluster_id",
                F.struct(
                    (-score).alias("negscore"), F.col(id_col).alias("kid")
                ).alias("__cand"),
            )
            .groupBy("cluster_id")
            .agg(F.min("__cand").alias("__best"))
            .select("cluster_id", F.col("__best.kid").alias("keeper_id"))
        )
        out = joined.join(keepers, "cluster_id", "left")
    return out.withColumn(
        "keep",
        F.col("cluster_id").isNull() | (F.col(id_col) == F.col("keeper_id")),
    ).select(*docs.columns, "cluster_id", "keeper_id", "keep")


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash per document.

    Per-token 32-bit hash from the first 8 hex chars of md5; each bit
    votes +1/-1 weighted by occurrence; simhash bit j = majority > 0.
    One explode + one groupBy with 32 conditional sums — no UDF.
    """
    tok = spread(docs, keys=(id_col,)).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return voted.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def exact_substring_dedup(
    docs: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_windows: bool = False,
) -> DataFrame:
    """Exact-substring dedup: cut every repeated run of >= ``min_len``
    tokens, keeping only its corpus-wide first occurrence.

    The semantics of suffix-array training-data dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): any
    substring of at least ``min_len`` tokens that appears more than
    once in the corpus survives only at its first occurrence
    (lexicographic (doc_id, position)); every other occurrence is cut
    from its document. Re-expressed for Spark — a single sequential
    suffix array over a 100 TB corpus is the one shape a cluster
    cannot build, but the SAME decision function factors through
    fixed-width windows:

    a token is cut  <=>  it lies inside some ``min_len``-token window
    whose content also occurs earlier in the corpus

    because every repeated run of length >= min_len contains a
    repeated min_len-window through each of its tokens, and every
    repeated min_len-window is itself a repeated run.

    Plan (all built-ins, no UDF):
    1. one row per window position with md5(window tokens) — a
       zero-shuffle flat map (O(n x min_len) row-local work; the
       Rabin-Karp rolling hash would make it O(n) but needs a
       sequential per-doc scan — the constant is cheap next to the
       shuffle below);
    2. first-occurrence selection per window hash via a MAP-SIDE
       COMBINABLE min(struct(doc, pos)) + count (same skew-safe agg
       discipline as ``passage_dedup`` — a boilerplate window with
       10M occurrences collapses map-side instead of sorting one hot
       partition);
    3. non-first occurrences become [start, start+L-1] intervals;
       overlapping intervals merge per doc (gaps-and-islands window —
       per-doc data, keyed shuffle);
    4. each doc reassembles from the complement slices of its merged
       intervals — one row-local projection over the sorted interval
       array.

    The shuffled payload is (id, pos, 16-byte binary md5) per window —
    never the window text. Output: (id, text, n_tokens, n_dup_tokens); a
    fully duplicated doc keeps its row with text='' (callers see the
    cut). Documents with NOTHING to cut keep their ORIGINAL text
    byte-for-byte (including shorter-than-``min_len`` docs and
    NULL/empty text, which report n_tokens=0); only documents that
    lose a span are reassembled, and reassembly joins the surviving
    tokens with single spaces — cutting from the middle cannot
    preserve the original inter-token whitespace.

    ``materialize_windows``: the window relation has two consumers
    (first-occurrence agg + probe join); by default it is RECOMPUTED
    per consumer rather than localCheckpoint'd — unlike the LSH
    signature projection (small next to its text), a window row is
    ~64 bytes per corpus TOKEN (~10x the text bytes), so
    materializing it at 100 TB would mean a petabyte of block
    storage versus one extra scan+tokenize+md5 pass of CPU. Pass
    True on small corpora where the rescan dominates (measured:
    within ~15% either way at test SFs).
    """
    from pyspark.sql import Window

    if min_len <= 0:
        raise ValueError("min_len must be positive")
    L = min_len
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    # well-defined degenerate inputs: NULL/empty text has ZERO tokens
    # (split('') returns [''], which would count 1)
    n_raw = F.size(F.col("__toks"))
    n = F.when(
        F.col("__text").isNull() | (F.length(F.trim(F.col("__text"))) == 0),
        F.lit(0),
    ).otherwise(n_raw)
    # guarded: sequence(1, stop) with stop < 1 would DESCEND in Spark
    starts = F.when(n >= L, F.sequence(F.lit(1), n - L + 1)).otherwise(
        F.array().cast("array<int>")
    )
    wins = (
        toked.select(F.col(id_col), F.col("__toks"), F.explode(starts).alias("start"))
        .select(
            F.col(id_col),
            F.col("start"),
            # unhex: 16-byte binary key instead of the 32-char hex
            # string — same grouping/join decisions, half the key
            # bytes on this operator's dominant shuffle (the window
            # relation is ~1 row per corpus token)
            F.unhex(
                F.md5(
                    F.array_join(
                        F.slice(F.col("__toks"), F.col("start"), F.lit(L)), " "
                    ).cast("binary")
                )
            ).alias("__h"),
        )
    )
    if materialize_windows:
        wins = wins.localCheckpoint(eager=False)
    firsts = (
        wins.groupBy("__h")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .filter(F.col("__cnt") > 1)
        .select("__h", "__first")
    )
    dups = (
        wins.join(firsts, "__h")
        .filter(F.struct(F.col(id_col), F.col("start")) != F.col("__first"))
        .select(
            F.col(id_col),
            F.col("start").cast("long").alias("s"),
            (F.col("start") + (L - 1)).cast("long").alias("e"),
        )
    )
    w_ord = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dups.withColumn(
        "__new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = (
        flagged.groupBy(id_col, "__island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__ivs")
        )
    )
    joined = toked.join(merged, id_col, "left").select(
        F.col(id_col),
        F.col("__text"),
        F.col("__toks"),
        F.coalesce(
            F.col("__ivs"), F.array().cast("array<struct<s:bigint,e:bigint>>")
        ).alias("__ivs"),
    )
    # complement slices: gaps before/between/after the merged intervals
    slice_starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(F.col("__ivs"), lambda iv: iv["e"] + 1),
    )
    slice_ends = F.concat(
        F.transform(F.col("__ivs"), lambda iv: iv["s"] - 1),
        F.array(F.size(F.col("__toks")).cast("long")),
    )
    kept = F.flatten(
        F.zip_with(
            slice_starts,
            slice_ends,
            lambda s, e: F.when(
                e >= s, F.slice(F.col("__toks"), s.cast("int"), (e - s + 1).cast("int"))
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    n_dup = F.aggregate(
        F.col("__ivs"),
        F.lit(0).cast("long"),
        lambda acc, iv: acc + (iv["e"] - iv["s"] + 1),
    )
    return joined.select(
        F.col(id_col),
        # nothing cut -> the ORIGINAL text survives byte-for-byte;
        # only reassembled documents pay the single-space rejoin
        F.when(F.size(F.col("__ivs")) == 0, F.col("__text"))
        .otherwise(F.array_join(kept, " "))
        .alias(text_col),
        n.cast("long").alias("n_tokens"),
        n_dup.alias("n_dup_tokens"),
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    known_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom: "tuple[list[int], int] | dict | None" = None,
) -> DataFrame:
    """Split an incoming batch against a persisted fingerprint index —
    the batch-incremental form of the reference's ledger dedup
    (dispatch only what the ledger has not seen), applied to corpus
    ingestion so a re-crawl never rescans the accumulated corpus.

    ``known_fingerprints`` is a one-column (``fingerprint``) relation —
    a parquet/versioned-table artifact appended after every accepted
    batch. Output = the batch plus:

    - ``fingerprint``       the batch row's content hash;
    - ``is_known``          content already in the index;
    - ``is_batch_first``    first occurrence WITHIN the batch
      (min-id keeper — intra-batch dups are real in any crawl);
    - ``is_novel``          the rows to ingest AND whose fingerprints
      to append: first-in-batch and not in the index.

    Plan: one skew-safe min agg on the (uniform 256-bit) fingerprint
    for the intra-batch keeper, one left join against the index keyed
    the same way — the index side carries only fingerprints, never
    text, so the join payload is hash-width regardless of corpus size.
    Idempotent by construction: re-running a batch after its novel
    fingerprints were appended yields is_novel = false everywhere.

    NULL-text rows have no content to fingerprint: they stay in the
    output (accounting — every batch row gets a verdict) with all
    three flags false, so nothing NULL is ever ingested or appended
    to the index.

    ``bloom``: an optional filter built over the SAME index relation
    (operators/bloom.py) — either the legacy ``(words, k)`` word array
    (zero-shuffle broadcast probe) or the sharded dict
    streaming/ingest.py loads (``mode='shards'`` probes via the
    word-index equi-join, so the filter never materializes on the
    driver). Rows whose fingerprint fails the probe CANNOT be in the
    index (no false negatives), so only the maybe-known sliver joins
    against it — at 100 TB the index join is the one shuffle whose
    batch side this prunes; a mostly-novel crawl batch skips it almost
    entirely. Verdicts are IDENTICAL with and without the filter
    (parity-tested); a filter built over a STALE index snapshot is NOT
    safe here (a missing fingerprint would mis-verdict known content
    as novel) — callers gate on index version (see
    streaming/ingest.py).
    """
    fp = fingerprint(F.col(text_col))
    batch = new_docs.withColumn("fingerprint", fp)
    keepers = (
        batch.filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.min(F.col(id_col)).alias("__keeper"))
    )
    known = known_fingerprints.select(
        F.col(known_fingerprints.columns[0]).alias("fingerprint"),
        F.lit(True).alias("__known"),
    ).distinct()
    if bloom is not None:
        from jde_to_datalake_spark.operators.bloom import (
            bloom_probe,
            bloom_probe_sharded,
        )

        if isinstance(bloom, dict) and bloom.get("mode") == "shards":
            batch = bloom_probe_sharded(
                batch, ["fingerprint"], bloom["shards"],
                bloom["num_bits"], bloom["k"],
                shard_words=bloom["shard_words"], flag_col="__maybe",
            )
        else:
            if isinstance(bloom, dict):
                words, k = bloom["words"], bloom["k"]
            else:
                words, k = bloom
            batch = bloom_probe(
                batch, ["fingerprint"], words, k, flag_col="__maybe"
            )
        # the definitely-unknown slice never shuffles for the index
        # join; a NULL fingerprint rides with it (its verdict is
        # all-false either way, and the equi-join would drop it)
        probed = batch.filter(
            F.col("__maybe") & F.col("fingerprint").isNotNull()
        ).join(known, "fingerprint", "left")
        skipped = batch.filter(
            ~F.col("__maybe") | F.col("fingerprint").isNull()
        ).withColumn("__known", F.lit(None).cast("boolean"))
        joined = probed.unionByName(skipped).drop("__maybe")
    else:
        # LEFT join: a NULL fingerprint never equi-joins, and an inner
        # join here silently DROPPED such rows from the output,
        # violating the "batch plus flags" contract
        joined = batch.join(known, "fingerprint", "left")
    out = (
        joined.join(keepers, "fingerprint", "left")
        .withColumn("is_known", F.coalesce(F.col("__known"), F.lit(False)))
        .withColumn(
            "is_batch_first",
            F.coalesce(F.col(id_col) == F.col("__keeper"), F.lit(False)),
        )
        .withColumn(
            "is_novel", F.col("is_batch_first") & ~F.col("is_known")
        )
        .drop("__keeper", "__known")
    )
    return out


def band_index(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_hash) LSH bucket keys for an indexed corpus —
    the batch twin of ``streaming.corpus.minhash_band_stream`` (same
    banding expressions, so streamed and indexed keys equi-join).
    Row-local projection; persist it beside the corpus as the
    near-dup index artifact.

    ``band_hash`` is the 16-byte BINARY md5 digest (round 13): unhex
    is injective on md5 hex, so bucket membership — and every
    candidate join — is unchanged, while the persisted artifact, its
    probe scans, and the candidate-join exchange all carry half the
    key bytes (the r12 batch-LSH key narrowing, extended to the
    STORED format now that the versioned table's footer stats handle
    BINARY min/max order-preservingly — see versioned._footer_stats).
    """
    base = _with_shingle_hashes(docs, n, text_col, id_col)
    sig = base.select(F.col(id_col), *_min_cols(num_hashes))
    return sig.select(
        F.col(id_col), F.explode(_bands_arr(num_hashes, band_size)).alias("bb")
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.unhex(F.col("bb.band_hash")).alias("band_hash"),
    )


def incremental_lsh_candidates(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_signatures: DataFrame | None = None,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates between an incoming batch and an INDEXED
    corpus, without touching the corpus text: the batch's band keys
    (row-local) equi-join the persisted ``band_index`` artifact.
    ``new_bands``: the batch's own precomputed ``band_index`` frame,
    when the caller already built it (streaming/ingest.py computes it
    once and reuses it for the probe-value collect, this join, and
    the guarded append) — must be the same (num_hashes, band_size, n)
    banding or candidates are garbage.

    Output: distinct (new_id, indexed_id) pairs; when
    ``index_signatures`` (a persisted ``minhash_signatures`` artifact)
    is given, each pair also carries ``est_jaccard`` — the fraction of
    agreeing MinHash components, the standard signature-based Jaccard
    estimator (E[agreement] = J). Exact verification then fetches only
    the candidate pairs' texts — work proportional to candidates, not
    corpus.

    Scale: batch-side keys are a projection; the only join is keyed by
    (band, band_hash) — the same bucket-join as the batch LSH, with
    the corpus side reduced to its key artifact.
    """
    if new_bands is None:
        new_bands = band_index(
            new_docs, num_hashes, band_size, n, text_col, id_col
        )
    new_bands = new_bands.select(
        F.col(id_col).alias("new_id"), "band", "band_hash"
    )
    idx = index_bands.select(
        F.col(index_bands.columns[0]).alias("indexed_id"), "band", "band_hash"
    )
    pairs = (
        new_bands.join(idx, ["band", "band_hash"])
        .filter(F.col("new_id") != F.col("indexed_id"))
        .select("new_id", "indexed_id")
        .distinct()
    )
    if index_signatures is None:
        return pairs
    new_sigs = minhash_signatures(
        new_docs, num_hashes, n, text_col, id_col
    ).select(
        F.col(id_col).alias("new_id"), "hash_idx",
        F.col("minhash").alias("__new_mh"),
    )
    idx_sigs = index_signatures.select(
        F.col(index_signatures.columns[0]).alias("indexed_id"),
        "hash_idx",
        F.col("minhash").alias("__idx_mh"),
    )
    est = (
        pairs.join(new_sigs, "new_id")
        .join(idx_sigs, ["indexed_id", "hash_idx"])
        .groupBy("new_id", "indexed_id")
        .agg(
            (
                F.sum((F.col("__new_mh") == F.col("__idx_mh")).cast("bigint"))
                / F.count(F.lit(1))
            ).alias("est_jaccard")
        )
    )
    return est
