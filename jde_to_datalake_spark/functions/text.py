"""Text-analysis Column builders for the training-data pipeline tier.

Beyond-reference operators (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All pure
Spark built-ins — string/array expressions stay in whole-stage
codegen; there is no Python in the hot path, so these scale linearly
over a 100 TB documents table with zero serialization overhead.
"""

from __future__ import annotations

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
    """Count of BPE-ish pre-tokens (letter/digit runs + symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return total / F.size(toks)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return n_stop / F.size(toks)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    return (F.length(text) - F.length(stripped)) / F.length(text)


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
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
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
