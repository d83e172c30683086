"""Text-analysis Column builders for the training-data pipeline tier.

Beyond-reference operators (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All pure
Spark built-ins — string/array expressions stay in whole-stage
codegen; there is no Python in the hot path, so these scale linearly
over a 100 TB documents table with zero serialization overhead.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker stopwords for the n-gram-free heuristic lang-ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "is"],
    "es": ["el", "la", "de", "los", "y"],
    "fr": ["le", "les", "et", "un", "des"],
    "de": ["der", "die", "und", "das", "ein"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), "\\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter/digit runs + symbols).
    `regexp_count` counts matches without materializing the match
    array that `size(regexp_extract_all(...))` would build."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def _padded(text: Column) -> Column:
    """Token stream re-joined with DOUBLED interior spaces and padded
    on both ends: every token is flanked by spaces it does not share
    with its neighbors, so a literal ``" tok "`` match can never
    overlap the next token's match."""
    return F.concat(
        F.lit(" "), F.regexp_replace(F.trim(text), "\\s+", "  "), F.lit(" ")
    )


def token_match_count(text: Column, words: list[str]) -> Column:
    """# of whitespace tokens of `text` exactly equal (case-sensitive)
    to any of `words` — semantically identical to
    ``size(filter(split(trim(text),'\\s+'), t -> t IN words))`` but as
    one `regexp_count` scan over the doubled-space padded form.
    Higher-order array functions are CodegenFallback (interpreted,
    per-row closure dispatch); this stays inside whole-stage codegen."""
    alt = "|".join(re.escape(w) for w in words)
    return F.regexp_count(_padded(text), F.lit(f" ({alt}) "))


def token_len_sum(text: Column) -> Column:
    """Σ length(token) == count of non-whitespace chars — string
    arithmetic instead of an interpreted transform+aggregate fold."""
    return F.length(F.regexp_replace(text, "\\s+", ""))


def avg_token_len(text: Column) -> Column:
    return token_len_sum(text) / F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    return token_match_count(text, STOPWORDS) / F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    # count of punct chars == chars a strip-replace would remove,
    # without building the stripped string
    return F.regexp_count(text, F.lit("[^a-zA-Z0-9\\s]")) / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (length, stopwords, token shape).

    Mirrors the class of filters used in large-scale web-corpus
    cleaning (C4/Gopher-style rules) with a deterministic formula.
    """
    return (
        F.least(F.lit(1.0), token_count(text) / F.lit(100.0)) * 0.4
        + (F.lit(1.0) - stopword_ratio(text)) * 0.3
        + F.least(F.lit(1.0), avg_token_len(text) / F.lit(8.0)) * 0.3
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: token_match_count(text, markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess(text: Column) -> Column:
    """Marker-stopword language ID; ties broken en > es > fr > de."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # build when-chain in reverse priority so earlier langs win ties
    for lang in ["de", "fr", "es", "en"]:
        out = F.when((s[lang] > 0) & (s[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: SHA-256 of the normalized form
    (lower-cased, whitespace collapsed) — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.sha2(normalized, 256)
