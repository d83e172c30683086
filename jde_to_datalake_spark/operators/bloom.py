"""Bloom-filter membership: exact-match decontamination at corpus scale.

The missing membership structure next to the repo's LSH/minhash tier:
an LLM training corpus must not contain benchmark / eval / blocklist
rows, and at 100 TB the check must not shuffle the corpus. The bloom
shape does exactly that:

- **build** over the SMALL side (the benchmark set): k bit positions
  per key, one metadata-scale shuffle on the word index, and ONE
  bounded collect — the word array is ``num_bits/64`` longs by
  construction (2^24 bits = 2 MB), never data-scale;
- **probe** the corpus with a row-local projection over the broadcast
  word array (the ``_cent_array`` crossJoin pattern from
  operators/similarity.py) — zero shuffles, the corpus never moves;
- false positives only (rate set by :func:`optimal_params`), NEVER
  false negatives — so ``maybe_member = false`` is a safe keep verdict
  and flagged rows go to an exact broadcast semi-join that touches
  candidates only (:func:`bloom_decontaminate`), the same two-stage
  candidates-then-verify discipline as the LSH and ANN paths.

Hashing is the repo's engine-portable sha256 convention
(operators/sampling.py): ``h1``/``h2`` come from disjoint 15-hex-char
(60-bit) prefixes of ``sha2(key, 256)``, both reduced mod ``num_bits``
BEFORE the Kirsch-Mitzenmacher combine ``bit_i = (h1 + i*h2) % m`` so
the arithmetic stays inside int64 on both engines. Words hold 32 bits
each (mask <= 2^31): DuckDB raises on ``1::BIGINT << 63`` while Spark
wraps, so 32-bit masks are the widest form both engines evaluate
identically — the word array is 2x longer, the semantics are exact.

The reference has no membership tier (its datasets fit in pandas);
this exists for the training-data pipeline the engine targets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.sampling import _SEP

_BITS_PER_WORD = 32

# Version stamp of the key encoding below. Any change to _key's byte
# layout MUST bump this: persisted filters built under another format
# hash differently, and probing them would return false NEGATIVES —
# the one failure mode a bloom filter must never have. Consumers that
# store filters (streaming/ingest.py) persist this stamp next to the
# words and treat a mismatch as stale (rebuild), never as fresh.
KEY_FORMAT = "nskey-v1"


def _key(cols: list[str], salt: str) -> Column:
    """Null-safe multi-column key: each column is tagged with a
    presence byte (\\x01 + value, or \\x00 alone for NULL) before the
    separator join, so ``('x', NULL)`` and ``(NULL, 'x')`` can never
    collide (plain ``concat_ws`` silently SKIPS nulls — round-4
    advisor finding). NULL therefore compares as a value here: a NULL
    benchmark key matches a NULL corpus key, the right semantics for
    membership/decontamination."""
    parts = [
        F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
            F.concat(F.lit("\x01"), F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.concat_ws(_SEP, *parts, F.lit(salt))


def key_sql(cols: list[str], salt: str = "") -> str:
    """The DuckDB-equivalent null-safe key expression, for oracle SQL
    construction (tests and registry share this so the two engines'
    keys can never skew)."""
    parts = ", ".join(
        [
            f"CASE WHEN {c} IS NULL THEN chr(0) "
            f"ELSE chr(1) || CAST({c} AS VARCHAR) END"
            for c in cols
        ]
        + [f"'{salt}'"]
    )
    return f"concat_ws(chr(31), {parts})"


def optimal_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Standard bloom sizing: bits m = -n ln p / (ln 2)^2 rounded up to
    a word multiple, probes k = (m/n) ln 2 (>= 1)."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not 0.0 < fpr < 1.0:
        raise ValueError("fpr must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + _BITS_PER_WORD - 1) // _BITS_PER_WORD) * _BITS_PER_WORD
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _hash_pair(cols: list[str], num_bits: int, salt: str) -> tuple[Column, Column]:
    digest = F.sha2(_key(cols, salt), 256)
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % num_bits
    h2 = F.conv(F.substring(digest, 17, 15), 16, 10).cast("bigint") % num_bits
    return h1, h2


def _positions_sql(num_bits: int, k: int) -> str:
    """Spark-SQL fragment: array of k bit positions from __h1/__h2."""
    return (
        f"transform(sequence(0, {k - 1}), "
        f"i -> (__h1 + CAST(i AS BIGINT) * __h2) % {num_bits})"
    )


def bloom_build(
    df: DataFrame,
    cols: list[str],
    num_bits: int,
    k: int,
    salt: str = "",
) -> list[int]:
    """Build the filter over ``df``'s key columns; returns the word
    array (``num_bits / 32`` Python ints, each < 2^32).

    Plan: positions are a row-local projection; the only shuffle is
    groupBy(word_idx) over at most ``num_bits/32`` groups — metadata
    scale by the sizing PARAMETER, independent of |df|. The collect is
    the bounded word aggregate, never the data.
    """
    if num_bits % _BITS_PER_WORD != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of {_BITS_PER_WORD}")
    if k < 1:
        raise ValueError("k must be >= 1")
    h1, h2 = _hash_pair(cols, num_bits, salt)
    words = (
        df.select(h1.alias("__h1"), h2.alias("__h2"))
        .select(F.explode(F.expr(_positions_sql(num_bits, k))).alias("p"))
        .select(
            F.shiftright("p", 5).cast("int").alias("w"),
            (F.col("p") % _BITS_PER_WORD).cast("int").alias("b"),
        )
        .select("w", F.expr("shiftleft(CAST(1 AS BIGINT), b)").alias("mask"))
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    out = [0] * (num_bits // _BITS_PER_WORD)
    for r in words:
        out[r["w"]] = r["word"]
    return out


def bloom_union(a: list[int], b: list[int]) -> list[int]:
    """OR-merge two filters built with identical (num_bits, k, salt) —
    the incremental-ingest composition (per-batch build + union)."""
    if len(a) != len(b):
        raise ValueError("bloom_union: filters have different sizes")
    return [x | y for x, y in zip(a, b)]


def bloom_probe(
    df: DataFrame,
    cols: list[str],
    words: list[int],
    k: int,
    salt: str = "",
    flag_col: str = "maybe_member",
) -> DataFrame:
    """Row-local membership probe: ``df`` + a boolean ``flag_col``.

    The word array rides in as a broadcast 1-row frame (a 2^24-bit
    filter is 2 MB — the ``_cent_array`` shape), and the probe is a
    forall over the k positions: zero shuffles, the corpus never
    moves. False positives possible at the sized rate; false negatives
    never.
    """
    if not words:
        raise ValueError("bloom_probe: empty word array (build with num_bits > 0)")
    num_bits = len(words) * _BITS_PER_WORD
    spark = df.sparkSession
    warr = spark.createDataFrame([(words,)], "__bloom_words: array<long>")
    h1, h2 = _hash_pair(cols, num_bits, salt)
    hit_all = F.expr(
        f"forall({_positions_sql(num_bits, k)}, "
        "p -> (element_at(__bloom_words, CAST(shiftright(p, 5) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(p % {_BITS_PER_WORD} AS INT)))"
        " != 0)"
    )
    return (
        df.withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .crossJoin(F.broadcast(warr))
        .withColumn(flag_col, hit_all)
        .drop("__h1", "__h2", "__bloom_words")
    )


def bloom_decontaminate_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    fpr: float = 0.001,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_items: int | None = None,
) -> DataFrame:
    """N-gram-overlap decontamination through a bloom filter: per
    corpus document, how many of its token n-grams MIGHT appear in the
    benchmark set (``n_maybe_hits``) and the ``maybe_contaminated``
    flag (any hit).

    The broadcast-set form (operators/corpus.py::decontaminate) ships
    the eval shingle set itself to every executor — right up to the
    point where a large benchmark's shingle set no longer fits a
    broadcast. This is the scale form: the shingle set compresses to
    ``~1.44 log2(1/fpr)`` bits per shingle (2.4 MB per 10M shingles at
    0.1%), the probe stays a zero-shuffle row-local pass over the
    corpus shingles, and the no-false-negative contract means
    ``maybe_contaminated = false`` is PROOF of no n-gram overlap —
    flagged docs go to the exact broadcast path (or human review)
    while the clean bulk flows on. One sized false-positive rate per
    SHINGLE inflates n_maybe_hits slightly; it never clears a truly
    contaminated document.

    ``n_items`` sizes the filter (default: one count of the distinct
    benchmark shingles — a metadata-scale job over the small side).
    """
    from jde_to_datalake_spark.operators.dedup import shingles

    bench_sh = shingles(benchmark, n, text_col, id_col).select("shingle").distinct()
    if n_items is None:
        n_items = max(1, bench_sh.count())
    num_bits, k = optimal_params(n_items, fpr)
    words = bloom_build(bench_sh, ["shingle"], num_bits, k)
    corpus_sh = shingles(corpus, n, text_col, id_col)
    hits = (
        bloom_probe(corpus_sh, ["shingle"], words, k, flag_col="__hit")
        .groupBy(id_col)
        .agg(F.sum(F.col("__hit").cast("bigint")).alias("n_maybe_hits"))
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn(
            "n_maybe_hits",
            F.coalesce(F.col("n_maybe_hits"), F.lit(0).cast("bigint")),
        )
        .withColumn("maybe_contaminated", F.col("n_maybe_hits") > 0)
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    on: list[str],
    fpr: float = 0.01,
    n_items: int | None = None,
    salt: str = "",
    num_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Two-stage exact-match decontamination: bloom probe prunes, an
    exact broadcast semi-join confirms. Output: ``corpus`` +
    ``bloom_flagged`` (the probe verdict) + ``is_contaminated`` (exact).

    Scale: the corpus-side cost is the zero-shuffle probe; the exact
    join's left side is only the flagged sliver (at the sized fpr,
    ~fpr x |corpus| plus true hits), and the benchmark key set is
    broadcast — the corpus never shuffles. ``n_items`` sizes the
    filter; when omitted it is taken from ``benchmark.count()`` (one
    metadata-scale job over the SMALL side). Passing ``num_bits`` and
    ``k`` explicitly pins the sizing (e.g. for a scale-independent
    oracle mirror) and skips the count.
    """
    if num_bits is None or k is None:
        if n_items is None:
            n_items = max(1, benchmark.count())
        nb, nk = optimal_params(n_items, fpr)
        num_bits, k = num_bits or nb, k or nk
    words = bloom_build(benchmark, on, num_bits, k, salt=salt)
    probed = bloom_probe(corpus, on, words, k, salt=salt, flag_col="bloom_flagged")
    bench_keys = benchmark.select(
        _key(on, salt).alias("__bench_key")
    ).distinct()
    return (
        probed.withColumn("__probe_key", _key(on, salt))
        .join(
            F.broadcast(bench_keys),
            (F.col("bloom_flagged"))
            & (F.col("__probe_key") == F.col("__bench_key")),
            "left",
        )
        .withColumn("is_contaminated", F.col("__bench_key").isNotNull())
        .drop("__probe_key", "__bench_key")
    )
