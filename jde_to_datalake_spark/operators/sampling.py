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


def mixture_rates(
    df: DataFrame, domain_col: str, target: dict[str, float]
) -> dict[str, tuple[float, int]]:
    """Per-domain (keep_rate, exact_k) achieving a target corpus mix.

    Training corpora are rebalanced to a prescribed domain mixture
    (web/code/books/... proportions). Downsampling only — the largest
    feasible output size is ``T = min_d(n_d / t_d)``; each domain then
    keeps ``T * t_d`` of its ``n_d`` rows. The counts aggregation is
    one map-side-combined groupBy collapsing to |domains| rows —
    metadata scale at any corpus size.

    Raises if a target domain has no rows (the mix is infeasible
    without upsampling, which a dedup-conscious pipeline never does
    silently). Domains absent from ``target`` get rate 0.
    """
    if not target:
        raise ValueError("target must be non-empty")
    total_w = float(sum(target.values()))
    fracs = {d: float(w) / total_w for d, w in target.items()}
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).agg(F.count("*").alias("n")).collect()
    }
    missing = [d for d, f in fracs.items() if f > 0 and counts.get(d, 0) == 0]
    if missing:
        raise ValueError(f"target domains with no rows: {sorted(missing)}")
    t_max = min(counts[d] / f for d, f in fracs.items() if f > 0)
    return {
        d: (t_max * f / counts[d], int(t_max * f))
        for d, f in fracs.items()
        if f > 0
    }


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target: dict[str, float],
    key_cols: list[str],
    salt: str = "",
    exact: bool = False,
) -> DataFrame:
    """Downsample each domain so the output matches a target mixture.

    Two physical strategies, same semantics family:

    - ``exact=False`` (the 100 TB path): keyed Bernoulli filter at the
      per-domain rate from ``mixture_rates`` — a pure WHERE over the
      scan, zero shuffles, mix holds in expectation with relative
      error ~1/sqrt(n_d).
    - ``exact=True``: exactly ``floor(T * t_d)`` rows per domain,
      chosen by hash order (deterministic, append-unstable — adding
      rows to a domain changes which prefix survives). One shuffle on
      the domain key via the same window shape as
      ``sample_per_group``; for a handful of domains at 100 TB prefer
      the Bernoulli path or a (domain, hash-bucket) two-level key —
      a per-domain window makes each domain ONE task's sort.

    Both are pure functions of the row key: retry-safe and
    oracle-checkable (tests mirror them in DuckDB literally).
    """
    rates = mixture_rates(df, domain_col, target)
    dom = F.col(domain_col)
    if not exact:
        rate_expr = F.lit(0.0)
        for d, (rate, _) in rates.items():
            rate_expr = F.when(dom == F.lit(d), F.lit(rate)).otherwise(rate_expr)
        return df.filter(hash_uniform(key_cols, salt) < rate_expr)
    k_expr = F.lit(0)
    for d, (_, k) in rates.items():
        k_expr = F.when(dom == F.lit(d), F.lit(k)).otherwise(k_expr)
    w = Window.partitionBy(dom).orderBy(
        F.sha2(_key(key_cols, salt), 256).asc(),
        *[F.col(c).asc() for c in key_cols],
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_expr)
        .drop("__rn")
    )


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


def temperature_weights(
    counts: dict[str, int], tau: float = 0.7
) -> dict[str, float]:
    """Temperature-smoothed mixture weights from domain sizes:
    w_d ∝ n_d^tau — the standard multilingual/multi-domain sampling
    convention (tau=1 reproduces natural proportions, tau->0
    approaches uniform; 0.3-0.7 is the usual range that up-weights
    low-resource domains without drowning the head).

    Driver-side arithmetic over the |domains|-sized count dict (the
    output of a metadata-scale groupBy count, or ``domain_stats``);
    feed the result straight into ``mixture_rates``/``mixture_sample``
    as the target. Weights are normalized to sum to 1 for
    readability — mixture_rates renormalizes anyway.
    """
    if tau <= 0:
        raise ValueError("tau must be positive (tau->0 is uniform)")
    if not counts:
        raise ValueError("counts must be non-empty")
    if any(n < 0 for n in counts.values()):
        raise ValueError("counts must be non-negative")
    raw = {d: float(n) ** tau for d, n in counts.items()}
    total = sum(raw.values())
    if total == 0:
        raise ValueError("at least one domain must have rows")
    return {d: w / total for d, w in raw.items()}
