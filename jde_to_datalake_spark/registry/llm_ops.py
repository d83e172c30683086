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
from jde_to_datalake_spark.operators import dedup as D
from jde_to_datalake_spark.operators import similarity as SIM
from jde_to_datalake_spark.session import load_table

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
    """Quality/token stats + the rolling-hash document fingerprint —
    the full per-document text-analysis pass in one projection."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        T.bpe_token_count(t).alias("n_bpe_tokens"),
        T.avg_token_len(t).alias("avg_token_len"),
        T.stopword_ratio(t).alias("stop_ratio"),
        T.punct_ratio(t).alias("punct_ratio"),
        T.quality_score(t).alias("quality_score"),
        T.fingerprint(t).alias("fingerprint"),
    )


ORACLE_TEXT_QUALITY = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
    list_sum(list_transform(toks, x -> length(x))) / len(toks) AS avg_token_len,
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it')))
      / len(toks) AS stop_ratio,
    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
      / length(text) AS punct_ratio
  FROM t
)
SELECT m.doc_id, n_tokens, n_bpe_tokens, avg_token_len, stop_ratio, punct_ratio,
  least(1.0, n_tokens / 100.0) * 0.4 + (1.0 - stop_ratio) * 0.3
    + least(1.0, avg_token_len / 8.0) * 0.3 AS quality_score,
  sha256(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fingerprint
FROM m JOIN documents d ON d.doc_id = m.doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scores = T.lang_scores(t)
    return d.select(
        "doc_id",
        "lang",
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
        T.lang_guess(t).alias("lang_guess"),
    )


def _lang_scores_sql() -> str:
    parts = []
    for lang, markers in T.LANG_MARKERS.items():
        inlist = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"len(list_filter(toks, x -> x IN ({inlist}))) AS score_{lang}"
        )
    return ",\n    ".join(parts)


ORACLE_LANG_ID = f"""
WITH t AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
    {_lang_scores_sql()}
  FROM t
)
SELECT doc_id, lang, score_en, score_es, score_fr, score_de,
  CASE
    WHEN score_en > 0 AND score_en = greatest(score_en, score_es, score_fr, score_de) THEN 'en'
    WHEN score_es > 0 AND score_es = greatest(score_en, score_es, score_fr, score_de) THEN 'es'
    WHEN score_fr > 0 AND score_fr = greatest(score_en, score_es, score_fr, score_de) THEN 'fr'
    WHEN score_de > 0 AND score_de = greatest(score_en, score_es, score_fr, score_de) THEN 'de'
    ELSE 'und' END AS lang_guess
FROM s
"""


# dedup ----------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


ORACLE_DEDUP_EXACT = """
SELECT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
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


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = D.minhash_signatures(load_table(spark, sf_dir, "documents"), num_hashes=8)
    return sig.withColumn("hash_idx", F.col("hash_idx").cast("bigint"))


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

ORACLE_MINHASH_SIG = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_SIG}
SELECT doc_id, hash_idx, minhash FROM sig
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> canonical keeper.

    The dedup finisher: transitive closure over the LSH pair graph
    (same params as ``dedup_minhash_lsh``), one row per doc that has a
    near-dup, labeled with the min doc_id of its cluster. The oracle
    recomputes the closure with a recursive CTE over the identical
    pair set — so both the pair generation AND the iterative label
    propagation are value-checked end-to-end.
    """
    pairs = D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=8, band_size=2, n=3, threshold=0.2,
    )
    return D.duplicate_clusters(pairs)


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
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, sf_dir, "documents"))


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
    """Exact brute-force top-k + LSH-bucketed top-k, tagged and unioned.

    exact: broadcast(queries) x corpus, the baseline/verifier; lsh:
    sign-bucket pruned candidates. One registry slot, both proof
    shapes value-checked; `cell` is the LSH bucket (null for exact).
    """
    e = load_table(spark, sf_dir, "embeddings")
    exact = SIM.cosine_topk(e, e.filter(F.col("vec_id") < 5), k=5).select(
        F.lit("exact").alias("op"),
        "query_id",
        F.lit(None).cast("int").alias("cell"),
        "candidate_id", "cosine", "rank",
    )
    lsh = SIM.lsh_bucketed_topk(e, e.filter(F.col("vec_id") < 20), k=5, n_bits=4).select(
        F.lit("lsh").alias("op"),
        "query_id",
        F.col("bucket").alias("cell"),
        "candidate_id", "cosine", "rank",
    )
    return exact.unionAll(lsh)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: nearest-centroid cells, n_probe probing (scale path)."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(
        e, e.filter(F.col("vec_id") < 20), k=5, n_centroids=8, n_probe=2
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

ORACLE_ANN_SUITE = f"""
WITH {_SQL_VEC},
exact_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
         {_SQL_PAIR_DOT} / q.nrm / c.nrm AS cosine
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
         {_SQL_PAIR_DOT} / q.nrm / c.nrm AS cosine
  FROM bucketed c JOIN bucketed q USING (bucket)
  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
)
SELECT 'exact' AS op, query_id, CAST(NULL AS INTEGER) AS cell,
       candidate_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, candidate_id) AS rank
  FROM exact_scored
) WHERE rank <= 5
UNION ALL
SELECT 'lsh' AS op, query_id, CAST(bucket AS INTEGER) AS cell,
       candidate_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, candidate_id) AS rank
  FROM lsh_scored
) WHERE rank <= 5
"""

# centroid-vs-vector cosine (v = vector side, c = centroid side)
_SQL_CENT_DOT = """list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, len(v.embedding)),
             i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cent_vec[i] AS DOUBLE))),
           (acc, x) -> acc + x)"""

ORACLE_ANN_IVF = f"""
WITH {_SQL_VEC},
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
scored AS (
  SELECT p.query_id, a.cell, a.candidate_id,
         list_reduce(
           list_prepend(0.0, list_transform(generate_series(1, len(p.q_vec)),
             i -> CAST(p.q_vec[i] AS DOUBLE) * CAST(a.c_vec[i] AS DOUBLE))),
           (acc, x) -> acc + x) / p.q_norm / a.c_norm AS cosine
  FROM assigned a JOIN probes p USING (cell)
  WHERE a.candidate_id <> p.query_id
)
SELECT query_id, cell, candidate_id, cosine, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, candidate_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


QUERIES = {
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_sig": q_dedup_minhash_sig,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "ann_suite": q_ann_suite,
    "ann_ivf": q_ann_ivf,
}

ORACLES = {
    "text_quality": ORACLE_TEXT_QUALITY,
    "lang_id": ORACLE_LANG_ID,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_minhash_sig": ORACLE_MINHASH_SIG,
    "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_simhash": _simhash_oracle(),
    "ann_suite": ORACLE_ANN_SUITE,
    "ann_ivf": ORACLE_ANN_IVF,
}
