"""Deterministic sampling & dataset splitting for training pipelines.

A 100 TB corpus is never consumed whole: it is split into train/val/
test, subsampled for ablations, and stratum-sampled for evaluation
sets. Doing that with ``rand()`` breaks at scale in three distinct
ways: task retries/speculation re-roll the dice (the same row lands in
two splits on different attempts), adding data reshuffles previous
membership, and no oracle can ever re-check the result. Everything
here is keyed instead: membership is a pure function of the row's
stable key — retry-safe, append-stable (old rows keep their split as
the corpus grows), reproducible on any engine that has SHA-256 —
which also makes these the rare sampling ops a cross-engine oracle
can verify exactly (tests compare against DuckDB literally).

- ``hash_uniform``        key -> deterministic U[0,1) Column
- ``deterministic_sample``keyed Bernoulli sample (a WHERE, no shuffle)
- ``hash_split``          train/val/test labels from cumulative weights
                          (a projection, no shuffle)
- ``sample_per_group``    exactly-k-per-stratum (hash-ordered window,
                          one shuffle on the stratum key)

The uniform comes from the first 8 hex chars of ``sha2(key, 256)``
(Spark) / ``sha256(key)`` (DuckDB): 32 bits of hash scaled by 2^-32.
32 bits is plenty for split assignment (collisions only make two keys
share a fate, never corrupt a fraction) and is the widest prefix both
engines convert to an integer identically.

The reference has no sampling tier at all (its datasets fit in pandas);
this one exists for the training-data pipeline the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator: keeps ("ab","c") != ("a","bc")
_DENOM = float(1 << 32)


def _key(cols: list[str], salt: str) -> Column:
    return F.concat_ws(_SEP, *[F.col(c).cast("string") for c in cols], F.lit(salt))


def hash_uniform(cols: list[str], salt: str = "") -> Column:
    """Deterministic U[0,1) from a row key. ``salt`` derives
    independent uniforms from the same key (one per experiment)."""
    return (
        F.conv(F.substring(F.sha2(_key(cols, salt), 256), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(_DENOM)
    )


def hash_uniform_sql(cols: list[str], salt: str = "") -> str:
    """The DuckDB-equivalent expression, for oracle SQL construction."""
    parts = ", ".join([f"CAST({c} AS VARCHAR)" for c in cols] + [f"'{salt}'"])
    key = f"concat_ws(chr(31), {parts})"
    return f"(('0x' || substr(sha256({key}), 1, 8))::BIGINT / {_DENOM})"


def deterministic_sample(
    df: DataFrame, cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keyed Bernoulli sample: keep rows with u < fraction. A pure
    filter — pushes to the scan, shuffles nothing, and the kept set is
    stable under appends and retries (unlike ``df.sample``, whose
    output changes with partitioning)."""
    return df.filter(hash_uniform(cols, salt) < F.lit(float(fraction)))


def hash_split(
    df: DataFrame,
    cols: list[str],
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Label rows train/val/test-style by cumulative weight buckets.

    Splits are disjoint and exhaustive by construction (every u lands
    in exactly one half-open bucket). Weights are normalized, so
    {80,10,10} and {0.8,0.1,0.1} agree. A projection — no shuffle, no
    state; the same row always gets the same label.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = hash_uniform(cols, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += float(weights[name]) / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order.

    The hash makes the choice pseudo-random but deterministic; the key
    columns break hash ties so the result is total-ordered and
    engine-portable. One shuffle on the group key — same cost class as
    any per-group top-k (argmax_per_group), and AQE's skew handling
    applies to hot strata.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.sha2(_key(key_cols, salt), 256).asc(),
        *[F.col(c).asc() for c in key_cols],
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
