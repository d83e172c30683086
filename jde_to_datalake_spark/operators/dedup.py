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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.text import fingerprint, tokens

SIMHASH_BITS = 32


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group by normalized-text SHA-256, keep min-id doc.

    Returns one row per distinct content: (fingerprint, keeper_id,
    n_dups). Scale: single shuffle on the hash; map-side partial agg.
    """
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle)."""
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    ``max_df`` drops stop-shingles (present in more than max_df docs)
    before the self-join — the standard guard against the quadratic
    blowup on boilerplate n-grams. At 100 TB this operator is only run
    on LSH candidates; standalone it is the small-corpus/oracle path.
    """
    sh = shingles(docs, n, text_col, id_col)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """k-MinHash signature rows: (id, hash_idx, minhash).

    Hash family: md5("{i}|{shingle}") compared lexicographically —
    engine-portable and uniform. Long format (one row per hash) keeps
    the shuffle key small and lets the band step regroup cheaply.
    """
    sh = shingles(docs, n, text_col, id_col)
    hashed = sh.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: F.struct(
                    i.alias("hash_idx"),
                    F.md5(
                        F.concat_ws("|", i.cast("string"), F.col("shingle"))
                    ).alias("h"),
                ),
            )
        ).alias("ih"),
    ).select(id_col, F.col("ih.hash_idx").alias("hash_idx"), F.col("ih.h").alias("h"))
    return hashed.groupBy(id_col, "hash_idx").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard verified.

    bands = num_hashes/band_size; docs sharing any band hash become
    candidates (bucket join — work proportional to bucket sizes, not
    |docs|^2), then candidates are verified with exact n-gram Jaccard
    and filtered by ``threshold``.
    """
    sh = shingles(docs, n, text_col, id_col)
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    # integer division (not cast-of-float-division: engines round casts
    # differently; `div` truncates identically everywhere)
    banded = sig.withColumn("band", F.expr(f"CAST(hash_idx div {band_size} AS INT)"))
    band_keys = banded.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias("band_hash")
    )
    a = band_keys.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = band_keys.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact-Jaccard verification on CANDIDATES ONLY — the whole point of
    # LSH. Shingle sets are collected per doc once; each candidate pair
    # probes two rows and intersects two bounded arrays. Work is
    # O(docs x k) + O(candidates), never all-pairs: at 100 TB the
    # all-pairs shingle self-join this replaces would be the bottleneck.
    sets = sh.groupBy(id_col).agg(
        F.collect_set("shingle").alias("sh_set"),
        F.count(F.lit(1)).alias("sz"),
    )
    return (
        candidates.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("sh_set").alias("sh_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("sh_set").alias("sh_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash per document.

    Per-token 32-bit hash from the first 8 hex chars of md5; each bit
    votes +1/-1 weighted by occurrence; simhash bit j = majority > 0.
    One explode + one groupBy with 32 conditional sums — no UDF.
    """
    tok = docs.select(
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
