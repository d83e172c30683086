"""Query registry: LLM-training-data pipeline operators.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash), embedding
similarity (brute-force + LSH-bucketed ANN), and text analysis
(quality, lang-ID, tokens, fingerprints) over the `documents` and
`embeddings` tables — the beyond-reference tier required by
BASELINE.json's north star. Every query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions import text as T
from jde_to_datalake_spark.operators import corpus as C
from jde_to_datalake_spark.operators import dedup as D
from jde_to_datalake_spark.operators import similarity as SIM
from jde_to_datalake_spark.session import load_table, spread

# shared SQL fragments -------------------------------------------------------

_SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

_SQL_SHINGLES = f"""
toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
sh0 AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)
"""

_SQL_JACCARD_FROM_SH = """
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM shr a JOIN shr b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, n_common,
         n_common / (sa.sz + sb.sz - n_common) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
"""


# text analysis --------------------------------------------------------------

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality/token stats + rolling-hash fingerprint + marker-stopword
    language ID — the full per-document text-analysis pass, zero
    shuffles (lang-ID columns merged in round 2 to keep the registry
    inside the driver's 50-entry cap).

    Every per-token fold is expressed as codegen string arithmetic
    (token_len_sum / token_match_count over the doubled-space padded
    form) rather than a higher-order array function — HOFs are
    CodegenFallback and Catalyst does not subexpression-eliminate
    them, so the fold forms evaluated each O(n_tokens) pass 2-3x per
    row outside codegen. The shared padded-string child is
    subexpression-eliminated inside whole-stage codegen. Stage 2 is
    arithmetic over the stage-1 counters; same operand order as the
    oracle -> bit-identical.
    """
    # the per-token fold expressions are the dominant per-row CPU:
    # spread the (unsplittable single-row-group) local scan so they
    # run at cluster width — no-op on a wide scan
    d = spread(load_table(spark, sf_dir, "documents"), keys=("doc_id",))
    t = F.col("text")
    stage1 = d.select(
        "doc_id", "lang",
        F.size(T.tokens(t)).alias("n_tokens"),
        T.bpe_token_count(t).alias("n_bpe_tokens"),
        T.token_len_sum(t).alias("__len_sum"),
        T.token_match_count(t, T.STOPWORDS).alias("__n_stop"),
        T.punct_ratio(t).alias("punct_ratio"),
        T.fingerprint(t).alias("fingerprint"),
        *[
            T.token_match_count(t, markers).alias(f"score_{lang}")
            for lang, markers in T.LANG_MARKERS.items()
        ],
    )
    nt = F.col("n_tokens")
    avg_len = F.col("__len_sum") / nt
    stop_ratio = F.col("__n_stop") / nt
    quality = (
        F.least(F.lit(1.0), nt / F.lit(100.0)) * 0.4
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(F.lit(1.0), avg_len / F.lit(8.0)) * 0.3
    )
    scores = {lang: F.col(f"score_{lang}") for lang in T.LANG_MARKERS}
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    for lang in ["de", "fr", "es", "en"]:
        guess = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(guess)
    return stage1.select(
        "doc_id", "n_tokens", "n_bpe_tokens",
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stop_ratio"),
        "punct_ratio",
        quality.alias("quality_score"),
        "fingerprint", "lang",
        "score_en", "score_es", "score_fr", "score_de",
        guess.alias("lang_guess"),
    )


def _lang_scores_sql() -> str:
    parts = []
    for lang, markers in T.LANG_MARKERS.items():
        inlist = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"len(list_filter(toks, x -> x IN ({inlist}))) AS score_{lang}"
        )
    return ",\n    ".join(parts)


ORACLE_TEXT_QUALITY = f"""
WITH t AS (SELECT doc_id, text, lang, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, lang,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
    list_sum(list_transform(toks, x -> length(x))) / len(toks) AS avg_token_len,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))
      / len(toks) AS stop_ratio,
    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
      / length(text) AS punct_ratio,
    {_lang_scores_sql()}
  FROM t
)
SELECT m.doc_id, n_tokens, n_bpe_tokens, avg_token_len, stop_ratio, punct_ratio,
  least(1.0, n_tokens / 100.0) * 0.4 + (1.0 - stop_ratio) * 0.3
    + least(1.0, avg_token_len / 8.0) * 0.3 AS quality_score,
  sha256(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fingerprint,
  m.lang, score_en, score_es, score_fr, score_de,
  CASE
    WHEN score_en > 0 AND score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
    WHEN score_es > 0 AND score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
    WHEN score_fr > 0 AND score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
    WHEN score_de > 0 AND score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
    ELSE 'und' END AS lang_guess
FROM m JOIN documents d ON d.doc_id = m.doc_id
"""


# dedup ----------------------------------------------------------------------

def q_dedup_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup + SimHash, tagged and unioned on (op, id, hash, n)
    — round 4 merged the former `dedup_exact` and `dedup_simhash` rows
    to fund a driver slot for `substring_dedup`; both proof shapes
    stay fully value-checked.

    - ``exact``: normalized-SHA-256 groupBy (keeper id + dup count);
    - ``simhash``: the 32-bit majority-vote fingerprint per document
      (rendered as a decimal string to share the hash column).
    """
    docs = load_table(spark, sf_dir, "documents")
    exact = D.exact_dedup(docs).select(
        F.lit("exact").alias("op"),
        F.col("keeper_id").alias("id"),
        F.col("fingerprint").alias("hash"),
        F.col("n_dups").alias("n"),
    )
    sim = D.simhash(docs).select(
        F.lit("simhash").alias("op"),
        F.col("doc_id").alias("id"),
        F.col("simhash").cast("string").alias("hash"),
        F.lit(None).cast("bigint").alias("n"),
    )
    return exact.unionAll(sim)


ORACLE_DEDUP_EXACT = """
SELECT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (operators/dedup.py:exact_substring_dedup):
    every repeated run of >= 5 tokens survives only at its corpus-wide
    first occurrence; later occurrences are cut and each document is
    reassembled from the complement. The engine merges duplicate
    windows into intervals and slices the complement row-locally; the
    oracle is the NAIVE independent derivation — a token survives iff
    no non-first duplicate window covers it (per-token EXISTS probe) —
    so the interval-merge rewrite is value-checked against first
    principles."""
    return D.exact_substring_dedup(
        load_table(spark, sf_dir, "documents"), min_len=5
    )


_SUB_L = 5

ORACLE_SUBSTRING_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
w AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i:i+{_SUB_L - 1}], ' ')) AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {_SUB_L} + 1)) AS g(i)
),
ranked AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS cnt
  FROM w
),
dup AS (SELECT doc_id, start FROM ranked WHERE cnt > 1 AND rn > 1),
pos AS (
  SELECT doc_id, UNNEST(generate_series(1, len(t))) AS p, t FROM toks
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.t[pos.p] AS tok
  FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM dup
    WHERE dup.doc_id = pos.doc_id
      AND dup.start <= pos.p AND pos.p <= dup.start + {_SUB_L} - 1
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
-- nothing cut -> the ORIGINAL text byte-for-byte (mirrors the
-- operator's contract); only reassembled docs are single-space joins.
-- The dup-cut arithmetic is COALESCE-wrapped so a NULL-text doc
-- (len(t.t) IS NULL) lands in the nothing-cut branch: text NULL,
-- n_dup_tokens 0 — exactly the operator's verdict.
SELECT t.doc_id,
       CASE WHEN COALESCE(len(t.t) - COALESCE(a.n_kept, 0), 0) = 0 THEN d.text
            ELSE COALESCE(a.text, '') END AS text,
       CAST(CASE WHEN d.text IS NULL OR length(trim(d.text)) = 0
                 THEN 0 ELSE len(t.t) END AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(t.t) - COALESCE(a.n_kept, 0), 0) AS BIGINT)
         AS n_dup_tokens
FROM toks t
JOIN documents d USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.2, max_df=1000
    )


ORACLE_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES},
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
{_SQL_JACCARD_FROM_SH}
SELECT id_a, id_b, n_common, jaccard FROM jac WHERE jaccard >= 0.2
"""


# round 4: the standalone `dedup_minhash_sig` registry row was dropped
# (its signature pipeline is evaluated end-to-end inside
# `dedup_minhash_lsh`/`dedup_clusters`, which consume the identical
# _SQL_MINHASH_SIG fragment below); the freed slot went to the
# promoted corpus tier (registry/pipeline_ops.py).

# the affine MinHash family, mirrored from operators.dedup constants
_A8 = "[" + ", ".join(str(a) for a in D.MINHASH_A[:8]) + "]"
_B8 = "[" + ", ".join(str(b) for b in D.MINHASH_B[:8]) + "]"

_SQL_MINHASH_SIG = f"""
h0 AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {D.MINHASH_P} AS h
  FROM sh
),
hashed AS (
  SELECT doc_id, i AS hash_idx,
         (h * ({_A8}[i + 1]) + ({_B8}[i + 1])) % {D.MINHASH_P} AS hv
  FROM h0, UNNEST(generate_series(0, 7)) AS g(i)
),
sig AS (SELECT doc_id, hash_idx, MIN(hv) AS minhash FROM hashed GROUP BY 1, 2)
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no explicit spread here: with_shingle_col (inside
    # minhash_lsh_pairs) already spreads the scan before the
    # md5-per-shingle pipeline
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=8, band_size=2, n=3, threshold=0.2,
    )


ORACLE_MINHASH_LSH = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_SIG},
bands AS (
  SELECT doc_id, hash_idx // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash)) AS band_hash
  FROM sig GROUP BY doc_id, hash_idx // 2
),
candidates AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
shr AS (SELECT doc_id, shingle FROM sh),
{_SQL_JACCARD_FROM_SH}
SELECT c.id_a, c.id_b, j.jaccard
FROM candidates c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.2
"""


def q_text_neardup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-dup pair generation as one tagged suite (fourth
    round-4 session: the `dedup_ngram_jaccard` + `dedup_minhash_lsh`
    rows merged to fund the `snapshot_diff` promotion — both branches
    run their full operators unchanged and share the pair schema).

    - ``ngram``: exact n-gram Jaccard pairs with the ``max_df``
      stop-shingle guard (the verify/oracle path);
    - ``lsh``: the full MinHash pipeline end-to-end — row-local
      signatures, banded buckets, in-bucket candidate enumeration,
      exact-Jaccard verification on candidates only (the scale path).

    Same structure as ``embedding_dedup_suite``: two genuinely
    different candidate-pruning strategies over one corpus, one
    driver row each branch must hash-match through. Both branches run
    off ONE checkpointed tokenize+gram base (``shingle_base``) — the
    shared-prefix move that makes the suite cost branch-work, not
    2x the corpus scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    # ONE checkpointed base carrying BOTH branch prefixes (sh_arr for
    # the exact-Jaccard branch, h0 for MinHash): round 13 — the prior
    # shape checkpointed with_shingle_col here and minhash_lsh_pairs
    # re-checkpointed base+h0 on top, materializing the shingle arrays
    # twice and paying 2 extra driver-side analysis passes per build
    # (the suite rebuilds its plan every bench run: _PLAN_CACHE_SKIP).
    base = D.shingle_hash_base(docs, n=3).localCheckpoint(eager=False)
    ng = D.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=1000, shingle_base=base
    ).select(F.lit("ngram").alias("op"), "id_a", "id_b", "jaccard")
    lsh = D.minhash_lsh_pairs(
        docs, num_hashes=8, band_size=2, n=3, threshold=0.2,
        shingle_base=base,
    ).select(F.lit("lsh").alias("op"), "id_a", "id_b", "jaccard")
    return ng.unionAll(lsh)


# parenthesized WITH branches: DuckDB rejects a CTE inside a FROM
# subquery or after a bare UNION ALL, but accepts full parenthesized
# query expressions on both sides of the union
ORACLE_TEXT_NEARDUP_SUITE = f"""
(WITH {_SQL_SHINGLES},
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
{_SQL_JACCARD_FROM_SH}
SELECT 'ngram' AS op, id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.2)
UNION ALL
(WITH {_SQL_SHINGLES},
{_SQL_MINHASH_SIG},
bands AS (
  SELECT doc_id, hash_idx // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash)) AS band_hash
  FROM sig GROUP BY doc_id, hash_idx // 2
),
candidates AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
shr AS (SELECT doc_id, shingle FROM sh),
{_SQL_JACCARD_FROM_SH}
SELECT 'lsh' AS op, c.id_a, c.id_b, j.jaccard
FROM candidates c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
WHERE j.jaccard >= 0.2)
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> keep-policy verdicts.

    The dedup finisher: transitive closure over the LSH pair graph
    (same params as the ``text_neardup_suite`` lsh branch), one row
    per doc that has a near-dup, labeled with the min doc_id of its
    cluster PLUS the keep-longest policy verdict (fourth round-4
    session: ``apply_keep_policy`` joined the row so the keeper rule
    is driver-checked, not just mirror-tested). The oracle recomputes
    the closure with a recursive CTE over the identical pair set and
    the keeper with a per-cluster length argmax — pair generation,
    iterative label propagation, AND the policy are value-checked
    end-to-end.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=8, band_size=2, n=3, threshold=0.2,
    )
    clusters = D.duplicate_clusters(pairs)
    return (
        D.apply_keep_policy(
            docs.select("doc_id", "text"), clusters, policy="longest"
        )
        .filter(F.col("cluster_id").isNotNull())
        .select("doc_id", "cluster_id", "keeper_id", "keep")
    )


# the recursive closure must be the outermost WITH RECURSIVE, so the
# whole LSH pair pipeline rides along as plain CTEs
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SQL_SHINGLES},
{_SQL_MINHASH_SIG},
bands AS (
  SELECT doc_id, hash_idx // 2 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY minhash)) AS band_hash
  FROM sig GROUP BY doc_id, hash_idx // 2
),
candidates AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
),
shr AS (SELECT doc_id, shingle FROM sh),
{_SQL_JACCARD_FROM_SH},
pairs AS (
  SELECT c.id_a, c.id_b
  FROM candidates c JOIN jac j ON j.id_a = c.id_a AND j.id_b = c.id_b
  WHERE j.jaccard >= 0.2
),
nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
keepers AS (
  SELECT cluster_id, doc_id AS keeper_id FROM (
    SELECT comp.cluster_id, comp.doc_id,
           row_number() OVER (
             PARTITION BY comp.cluster_id
             ORDER BY length(coalesce(d.text, '')) DESC, comp.doc_id
           ) AS rn
    FROM comp JOIN documents d USING (doc_id)
  ) WHERE rn = 1
)
SELECT c.doc_id, c.cluster_id, k.keeper_id,
       (c.doc_id = k.keeper_id) AS keep
FROM comp c JOIN keepers k USING (cluster_id)
"""


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(D.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(D.SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM tok
),
v AS (
  SELECT doc_id,
    {votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM v
"""


# similarity -----------------------------------------------------------------

def q_ann_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force + LSH-bucketed + IVF + binary-Hamming +
    pooled-centroid top-k, tagged and unioned.

    exact: broadcast(queries) x corpus, the baseline/verifier; lsh:
    sign-bucket pruned candidates; ivf: nearest-centroid cells with
    n_probe probing (the scale path); hamming: sign-bit binary
    quantization (round 4 — 64 floats packed into ONE int64 word) with
    XOR+bit_count distances, the 32x-compressed scale path; pooled
    (round 4): queries vs MAX-pooled per-label centroids, driver
    evidence for pool_embeddings. One registry slot, all five proof
    shapes value-checked; `cell` is the LSH bucket / IVF cell (null
    otherwise); `score` is higher-is-closer — cosine for the float
    variants, NEGATED Hamming distance for the binary one (so -score
    is the distance and any quantization bit error shifts the checked
    values).
    """
    # The candidate generators are unioned SCORED (pre-rank) and
    # ranked in ONE window pass keyed by (op, query_id) — one shuffle
    # for the whole suite instead of one per variant. No spread: the
    # corpus here is small enough that the extra exchange costs more
    # than the parallel folds save (and a 100 TB corpus scan is wide
    # on its own).
    e = load_table(spark, sf_dir, "embeddings")
    exact = SIM.cosine_scored(e, e.filter(F.col("vec_id") < 5)).select(
        F.lit("exact").alias("op"),
        "query_id",
        F.lit(None).cast("int").alias("cell"),
        "candidate_id", F.col("cosine").alias("score"),
    )
    lsh = SIM.lsh_scored(e, e.filter(F.col("vec_id") < 20), n_bits=4).select(
        F.lit("lsh").alias("op"),
        "query_id",
        F.col("bucket").alias("cell"),
        "candidate_id", F.col("cosine").alias("score"),
    )
    ivf = SIM.ivf_scored(
        e, e.filter(F.col("vec_id") < 20), n_centroids=8, n_probe=2
    ).select(
        F.lit("ivf").alias("op"),
        "query_id",
        F.col("cell").cast("int").alias("cell"),
        "candidate_id", F.col("cosine").alias("score"),
    )
    codes = SIM.binary_quantize(e, dim=64)
    qcodes = SIM.binary_quantize(e.filter(F.col("vec_id") < 20), dim=64)
    ham = SIM.hamming_scored(codes, qcodes).select(
        F.lit("hamming").alias("op"),
        "query_id",
        F.lit(None).cast("int").alias("cell"),
        "candidate_id",
        (-F.col("hamming")).cast("double").alias("score"),
    )
    # pooled (round 4, driver evidence for pool_embeddings): score each
    # query against the MAX-pooled per-label centroid — max pooling is
    # order-independent, so the pooled vectors (and hence the cosines)
    # are cross-engine exact, unlike mean pooling (FP-reorder caveat in
    # the operator docstring; the mean path keeps its numpy-parity
    # pytest). candidate_id = 100 + label: offset out of the query-id
    # space so cosine_scored's self-pair exclusion can't drop a
    # (query, centroid) pair.
    pooled = SIM.pool_embeddings(e, ["label"], mode="max")
    pool = SIM.cosine_scored(
        pooled.select(
            (F.col("label").cast("bigint") + 100).alias("vec_id"), "embedding"
        ),
        e.filter(F.col("vec_id") < 20),
    ).select(
        F.lit("pooled").alias("op"),
        "query_id",
        F.lit(None).cast("int").alias("cell"),
        "candidate_id",
        F.col("cosine").alias("score"),
    )
    scored = exact.unionAll(lsh).unionAll(ivf).unionAll(ham).unionAll(pool)
    return SIM.topk_ranked(scored, 5, "op", score_col="score").select(
        "op", "query_id", "cell", "candidate_id", "score", "rank"
    )


# dot/norm = strict left fold in element order, matching Spark's
# F.aggregate(..., 0.0, acc + x): IEEE doubles on the same operand
# sequence are bit-identical across engines. The 0.0 seed is prepended
# because DuckDB's list_reduce seeds with the first element.
_SQL_VEC = """
vecs AS (
  SELECT vec_id,
         embedding,
         sqrt(list_reduce(
           list_prepend(0.0, list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (acc, x) -> acc + x)) AS nrm
  FROM embeddings
)
"""

_SQL_PAIR_DOT = """list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, len(q.embedding)),
             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
           (acc, x) -> acc + x)"""

def _binary_code_sql() -> str:
    """Sign-bit packing of a 64-dim embedding into ONE signed int64 —
    the SQL mirror of operators.similarity.binary_quantize's bit
    layout (LSB-first; bit 63's weight wraps to int64 min). Partial
    sums stay inside int64: j=0..62 top out at 2^63-1, then the
    negative bit-63 weight lands the total in range."""
    terms = []
    for j in range(64):
        w = (1 << j) - ((1 << 64) if j == 63 else 0)
        terms.append(
            f"(CASE WHEN CAST(embedding[{j + 1}] AS DOUBLE) > 0"
            f" THEN CAST({w} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


ORACLE_ANN_SUITE = f"""
WITH {_SQL_VEC},
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
         {_SQL_PAIR_DOT} / q.nrm / c.nrm AS score
  FROM vecs c CROSS JOIN vecs q
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
),
bucketed AS (
  SELECT vec_id, embedding, nrm,
    (CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END)
    + (CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 2 ELSE 0 END)
    + (CASE WHEN CAST(embedding[3] AS DOUBLE) > 0 THEN 4 ELSE 0 END)
    + (CASE WHEN CAST(embedding[4] AS DOUBLE) > 0 THEN 8 ELSE 0 END) AS bucket
  FROM vecs
),
lsh_scored AS (
  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS candidate_id,
         {_SQL_PAIR_DOT} / q.nrm / c.nrm AS score
  FROM bucketed c JOIN bucketed q USING (bucket)
  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
),
codes AS (
  SELECT vec_id, CAST({_binary_code_sql()} AS BIGINT) AS code
  FROM embeddings
),
ham_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
         -CAST(bit_count(xor(q.code, c.code)) AS DOUBLE) AS score
  FROM codes c JOIN codes q ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 20
),
pooledv AS (
  SELECT label, mv_list AS embedding,
         sqrt(list_reduce(
           list_prepend(0.0, list_transform(mv_list, x -> x * x)),
           (acc, x) -> acc + x)) AS nrm
  FROM (
    SELECT label, list(mv ORDER BY pos) AS mv_list FROM (
      SELECT label, pos, MAX(v) AS mv FROM (
        SELECT label, generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
      ) GROUP BY label, pos
    ) GROUP BY label
  )
),
pool_scored AS (
  SELECT q.vec_id AS query_id, CAST(100 + c.label AS BIGINT) AS candidate_id,
         {_SQL_PAIR_DOT} / q.nrm / c.nrm AS score
  FROM pooledv c CROSS JOIN vecs q
  WHERE q.vec_id < 20
),
{{IVF_CTES}}
SELECT 'exact' AS op, query_id, CAST(NULL AS INTEGER) AS cell,
       candidate_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, candidate_id) AS rank
  FROM exact_scored
) WHERE rank <= 5
UNION ALL
SELECT 'lsh' AS op, query_id, CAST(bucket AS INTEGER) AS cell,
       candidate_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, candidate_id) AS rank
  FROM lsh_scored
) WHERE rank <= 5
UNION ALL
SELECT 'ivf' AS op, query_id, CAST(cell AS INTEGER) AS cell,
       candidate_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, candidate_id) AS rank
  FROM ivf_scored
) WHERE rank <= 5
UNION ALL
SELECT 'hamming' AS op, query_id, CAST(NULL AS INTEGER) AS cell,
       candidate_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, candidate_id) AS rank
  FROM ham_scored
) WHERE rank <= 5
UNION ALL
SELECT 'pooled' AS op, query_id, CAST(NULL AS INTEGER) AS cell,
       candidate_id, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, candidate_id) AS rank
  FROM pool_scored
) WHERE rank <= 5
"""

# centroid-vs-vector cosine (v = vector side, c = centroid side)
_SQL_CENT_DOT = """list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, len(v.embedding)),
             i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cent_vec[i] AS DOUBLE))),
           (acc, x) -> acc + x)"""

_SQL_IVF_CTES = f"""
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         embedding AS cent_vec, nrm AS cent_norm
  FROM vecs ORDER BY vec_id LIMIT 8
),
assigned AS (
  SELECT candidate_id, c_vec, c_norm, cell FROM (
    SELECT v.vec_id AS candidate_id, v.embedding AS c_vec, v.nrm AS c_norm,
           c.cell,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_SQL_CENT_DOT} / v.nrm / c.cent_norm DESC, c.cell) AS crn
    FROM vecs v CROSS JOIN cent c
  ) WHERE crn = 1
),
probes AS (
  SELECT query_id, q_vec, q_norm, cell FROM (
    SELECT v.vec_id AS query_id, v.embedding AS q_vec, v.nrm AS q_norm,
           c.cell,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_SQL_CENT_DOT} / v.nrm / c.cent_norm DESC, c.cell) AS crn
    FROM vecs v CROSS JOIN cent c WHERE v.vec_id < 20
  ) WHERE crn <= 2
),
ivf_scored AS (
  SELECT p.query_id, a.cell, a.candidate_id,
         list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, len(p.q_vec)),
             i -> CAST(p.q_vec[i] AS DOUBLE) * CAST(a.c_vec[i] AS DOUBLE))),
           (acc, x) -> acc + x) / p.q_norm / a.c_norm AS score
  FROM assigned a JOIN probes p USING (cell)
  WHERE a.candidate_id <> p.query_id
)
"""

# splice the IVF CTE chain into the three-way suite oracle
ORACLE_ANN_SUITE = ORACLE_ANN_SUITE.replace("{IVF_CTES}", _SQL_IVF_CTES)


# corpus preparation ---------------------------------------------------------

def q_corpus_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunk plan (size 20, overlap 5): one row per
    (doc, chunk) with the 1-indexed token span and the chunk text.
    Pure sequence/posexplode/slice built-ins — a zero-shuffle flat map
    over the documents scan."""
    return C.chunk_plan(
        load_table(spark, sf_dir, "documents"), chunk_size=20, overlap=5
    )


ORACLE_CORPUS_CHUNKING = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
c AS (
  SELECT doc_id, t, g.s AS start_tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY g.s) - 1 AS chunk_idx
  FROM t, UNNEST(generate_series(1, greatest(len(t), 1), 15)) AS g(s)
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least(start_tok + 19, len(t)) AS BIGINT) AS end_tok,
       CAST(least(start_tok + 19, len(t)) - start_tok + 1 AS BIGINT) AS n_toks,
       array_to_string(t[start_tok:least(start_tok + 19, len(t))], ' ') AS chunk_text
FROM c
"""


# the learned quality filter's pinned artifact: exported once by
# operators/quality_model.train_quality_classifier on the fixed
# GOOD/JUNK seed set (tests/test_quality_model.py), then versioned
# here as literals — the "export once, score forever" contract. The
# driver row checks the monotone linear score z (bit-exact
# cross-engine: sqrt + ratio features, fixed-order multiply-add), not
# the sigmoid (exp() ulp caveat, quality_model.py docstring).
QUALITY_MODEL = {
    "features": [
        "f_sqrt_tokens", "f_avg_token_len", "f_stopword_ratio",
        "f_punct_ratio", "f_digit_ratio",
    ],
    "weights": [
        11.012497425587101, 0.20577592720281251, 67.69434434338586,
        -7.635871180396483, -18.389878942754848,
    ],
    "intercept": -43.4885512231035,
}

# pinned bloom sizing for the corpus_filters branch: fixed (not
# fpr-derived) so the oracle mirror is scale-independent
_CF_BLOOM_BITS = 1 << 15
_CF_BLOOM_K = 5


def q_corpus_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style corpus filter report: repetition metrics + PII
    counts + benchmark decontamination + composite keep/drop +
    CCNet-style token-rarity signals + (round 5) the learned quality
    model's linear score and the bloom two-stage exact-text
    decontamination verdicts, one row per document.

    Plan: all per-doc metrics are ONE zero-shuffle projection
    (row-local array folds); decontamination joins the doc shingles
    against a BROADCAST distinct-shingle set from the held-out docs
    (doc_id % 97 = 0 stands in for the benchmark suite), then a single
    doc_id-keyed left join attaches the hit counts. The rarity columns
    (mean_token_df / n_rare_tokens / rare_frac over corpus document
    frequencies, operators/corpus.py:rarity_metrics) join on the same
    doc key — the integer-rational stand-in for LM-perplexity quality
    bucketing, chosen because it is exactly cross-engine reproducible.
    The quality_z / model_keep columns are the operators/quality_model
    codegen fold over the pinned artifact above; bloom_flagged /
    bloom_contaminated are operators/bloom.bloom_decontaminate against
    the eval slice (probe = zero-shuffle broadcast-word projection,
    exact stage touches only the flagged sliver).
    """
    from jde_to_datalake_spark.functions.text import tokens
    from jde_to_datalake_spark.operators.bloom import bloom_decontaminate
    from jde_to_datalake_spark.operators.quality_model import (
        quality_features,
        quality_model_linear,
    )
    from jde_to_datalake_spark.session import spread

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    # ONE shared tokenized base for every branch (round 13, guide §1.2
    # "don't compute things you throw away" / §2.4 share one exchange):
    # the un-shared plan re-scanned documents.parquet SEVEN times and
    # re-split the text in six of them (metrics, corpus shingles, eval
    # shingles, occurrences, token-df, bloom probe + bloom bench keys).
    # Lazily checkpointing (id, text, tokens) pays the scan + split
    # once; every branch reads the materialized base. Same pattern as
    # text_neardup_suite's checkpointed shingle base — and like it,
    # corpus_filters is in __spark_entry__._PLAN_CACHE_SKIP so repeat
    # bench runs re-materialize instead of reusing blocks.
    base = (
        spread(docs, keys=("doc_id",))
        .select("doc_id", "text", tokens(F.col("text")).alias("__toks"))
        .localCheckpoint(eager=False)
    )
    report = C.filter_report(
        docs, docs.filter(is_eval), is_eval, shingle_n=5, toked=base
    )
    rarity = C.rarity_metrics(docs, rare_df_threshold=2, toked=base)
    # quality features and the bloom probe are BOTH row-local over the
    # documents scan, so they compose into ONE projection frame and
    # attach with a single doc_id join (not one join per family)
    extra = quality_features(
        bloom_decontaminate(
            base.select("doc_id", "text"),
            base.filter(is_eval).select("text"),
            ["text"],
            num_bits=_CF_BLOOM_BITS,
            k=_CF_BLOOM_K,
        )
    ).select(
        "doc_id",
        quality_model_linear(QUALITY_MODEL).alias("quality_z"),
        "bloom_flagged",
        F.col("is_contaminated").alias("bloom_contaminated"),
    ).withColumn("model_keep", F.col("quality_z") > F.lit(0.0))
    return report.join(rarity, "doc_id").join(extra, "doc_id")


def _corpus_filters_oracle() -> str:
    from jde_to_datalake_spark.operators.bloom import key_sql
    from jde_to_datalake_spark.operators.quality_model import (
        quality_model_linear_sql,
    )

    email, phone, ip = C.EMAIL_RE, C.PHONE_RE, C.IP_RE
    stops = ", ".join(f"'{w}'" for w in T.STOPWORDS)
    nonempty = "text IS NOT NULL AND length(trim(text)) > 0"
    bkey = key_sql(["text"])
    nb, bk = _CF_BLOOM_BITS, _CF_BLOOM_K
    return f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS tk FROM documents),
qf AS (
  SELECT doc_id,
    CASE WHEN {nonempty} THEN sqrt(len(tk)) ELSE 0.0 END AS f_sqrt_tokens,
    CASE WHEN {nonempty}
         THEN list_sum(list_transform(tk, x -> length(x))) / len(tk)
         ELSE 0.0 END AS f_avg_token_len,
    CASE WHEN {nonempty}
         THEN len(list_filter(tk, x -> x IN ({stops}))) / len(tk)
         ELSE 0.0 END AS f_stopword_ratio,
    CASE WHEN {nonempty}
         THEN (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
              / length(text)
         ELSE 0.0 END AS f_punct_ratio,
    CASE WHEN {nonempty}
         THEN len(regexp_extract_all(text, '[0-9]')) / length(text)
         ELSE 0.0 END AS f_digit_ratio
  FROM t
),
qz AS (
  SELECT doc_id, {quality_model_linear_sql(QUALITY_MODEL)} AS quality_z
  FROM qf
),
bl_bench AS (
  SELECT ('0x' || substr(sha256({bkey}), 1, 15))::BIGINT % {nb} AS h1,
         ('0x' || substr(sha256({bkey}), 17, 15))::BIGINT % {nb} AS h2
  FROM documents WHERE doc_id % 97 = 0
),
bl_bits AS (
  SELECT DISTINCT (h1 + i * h2) % {nb} AS p
  FROM bl_bench, generate_series(0, {bk - 1}) AS g(i)
),
bl_words AS (
  SELECT (p >> 5) AS w, bit_or(1::BIGINT << (p % 32)::INT) AS word
  FROM bl_bits GROUP BY 1
),
bl_corpus AS (
  SELECT doc_id,
         ('0x' || substr(sha256({bkey}), 1, 15))::BIGINT % {nb} AS h1,
         ('0x' || substr(sha256({bkey}), 17, 15))::BIGINT % {nb} AS h2
  FROM documents
),
bl_probe AS (
  SELECT c.doc_id,
         COALESCE(w.word, 0) & (1::BIGINT << (((c.h1 + i * c.h2) % {nb}) % 32)::INT) AS hit
  FROM bl_corpus c
  CROSS JOIN generate_series(0, {bk - 1}) AS g(i)
  LEFT JOIN bl_words w ON w.w = (((c.h1 + i * c.h2) % {nb}) >> 5)
),
bl AS (
  SELECT doc_id, bool_and(hit != 0) AS bloom_flagged
  FROM bl_probe GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 2 THEN
           list_transform(generate_series(1, len(tk) - 1),
                          i -> array_to_string(tk[i:i+1], ' '))
         ELSE [] END AS bgs
  FROM t
),
top_tok AS (
  SELECT doc_id, MAX(c) AS max_cnt FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(tk) AS tok FROM t)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
),
sh5 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS shingle
    FROM t, UNNEST(generate_series(1, len(tk) - 4)) AS g(i)
  )
),
ev AS (SELECT DISTINCT shingle FROM sh5 WHERE doc_id % 97 = 0),
hits AS (
  SELECT doc_id, COUNT(*) AS n_eval_hits
  FROM sh5 JOIN ev USING (shingle) GROUP BY doc_id
),
dfreq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM (
    SELECT DISTINCT doc_id, unnest(tk) AS tok FROM t
  ) GROUP BY tok
),
rar AS (
  SELECT occ.doc_id,
         CAST(SUM(df) AS DOUBLE) / COUNT(*) AS mean_token_df,
         CAST(count_if(df <= 2) AS BIGINT) AS n_rare_tokens,
         CAST(count_if(df <= 2) AS BIGINT) / COUNT(*) AS rare_frac
  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) occ
  JOIN dfreq USING (tok)
  GROUP BY occ.doc_id
)
SELECT t.doc_id,
  CAST(len(tk) AS BIGINT) AS n_tokens,
  (len(tk) - len(list_distinct(tk))) / len(tk) AS dup_token_frac,
  top_tok.max_cnt / len(tk) AS top_token_frac,
  CASE WHEN len(bgs) > 0
       THEN (len(bgs) - len(list_distinct(bgs))) / len(bgs)
       ELSE 0.0 END AS dup_bigram_frac,
  CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ips,
  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
    '{email}', '<EMAIL>', 'g'), '{phone}', '<PHONE>', 'g'),
    '{ip}', '<IP>', 'g')) AS BIGINT) AS redacted_len,
  list_sum(list_transform(tk, x -> length(x))) / len(tk) AS avg_token_len,
  CAST(coalesce(hits.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
  t.doc_id % 97 = 0 AS is_eval,
  (NOT t.doc_id % 97 = 0) AND coalesce(hits.n_eval_hits, 0) >= {C.CONTAM_MIN_HITS}
    AS contaminated,
  len(tk) >= {C.KEEP_MIN_TOKENS} AND len(tk) <= {C.KEEP_MAX_TOKENS}
    AND list_sum(list_transform(tk, x -> length(x))) / len(tk)
          BETWEEN {C.KEEP_MIN_AVG_TOKEN_LEN} AND {C.KEEP_MAX_AVG_TOKEN_LEN}
    AND top_tok.max_cnt / len(tk) <= {C.KEEP_MAX_TOP_TOKEN_FRAC}
    AND NOT ((NOT t.doc_id % 97 = 0) AND coalesce(hits.n_eval_hits, 0) >= {C.CONTAM_MIN_HITS})
    AS keep,
  rar.mean_token_df,
  CAST(COALESCE(rar.n_rare_tokens, 0) AS BIGINT) AS n_rare_tokens,
  rar.rare_frac,
  qz.quality_z,
  qz.quality_z > 0.0 AS model_keep,
  bl.bloom_flagged,
  bl.bloom_flagged AND t.text IN (SELECT text FROM documents WHERE doc_id % 97 = 0)
    AS bloom_contaminated
FROM t
LEFT JOIN bg USING (doc_id)
LEFT JOIN top_tok USING (doc_id)
LEFT JOIN hits ON hits.doc_id = t.doc_id
LEFT JOIN rar ON rar.doc_id = t.doc_id
JOIN qz ON qz.doc_id = t.doc_id
JOIN bl ON bl.doc_id = t.doc_id
"""


def _dedup_fingerprints_oracle() -> str:
    return f"""
SELECT 'exact' AS op, keeper_id AS id, fingerprint AS hash, n_dups AS n
FROM ({ORACLE_DEDUP_EXACT})
UNION ALL
SELECT 'simhash' AS op, doc_id AS id, CAST(simhash AS VARCHAR) AS hash,
       CAST(NULL AS BIGINT) AS n
FROM ({_simhash_oracle()})
"""


QUERIES = {
    "text_quality": q_text_quality,
    "corpus_chunking": q_corpus_chunking,
    "corpus_filters": q_corpus_filters,
    "dedup_fingerprints": q_dedup_fingerprints,
    "text_neardup_suite": q_text_neardup_suite,
    "dedup_clusters": q_dedup_clusters,
    "substring_dedup": q_substring_dedup,
    "ann_suite": q_ann_suite,
}

ORACLES = {
    "text_quality": ORACLE_TEXT_QUALITY,
    "corpus_chunking": ORACLE_CORPUS_CHUNKING,
    "corpus_filters": _corpus_filters_oracle(),
    "dedup_fingerprints": _dedup_fingerprints_oracle(),
    "text_neardup_suite": ORACLE_TEXT_NEARDUP_SUITE,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "substring_dedup": ORACLE_SUBSTRING_DEDUP,
    "ann_suite": ORACLE_ANN_SUITE,
}
