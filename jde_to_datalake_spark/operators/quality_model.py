"""Model-based document quality scoring: train distributed, score in
codegen.

The heuristic quality gates (functions/text.py::quality_score,
operators/corpus.py's Gopher-style rules) are fixed formulas; web-scale
corpus pipelines typically also run a LEARNED quality filter (a small
linear classifier over cheap text statistics, scored against every
document — the fasttext-style "looks like reference text" model). This
module is that stage, split along Spark's grain:

- **train** on the labeled set with ``pyspark.ml`` LogisticRegression
  (distributed L-BFGS; the labeled set is the small side, but nothing
  here requires it to fit on one machine);
- **export** the fitted model as plain floats (weights + intercept) —
  the model artifact is a dict, storable anywhere, no MLlib runtime
  needed to score;
- **score** with a pure column expression: ``sigmoid(b + Σ w_i f_i)``
  over the same feature projection. Zero UDFs, zero shuffles, whole-
  stage codegen — at 100 TB the scoring pass is a projection fused
  into whatever scan already runs, unlike ``model.transform`` which
  drags vector UDTs through the plan.

Scoring is deterministic given the exported weights (fixed fold order),
so downstream keep/drop decisions are retry-safe; training itself is
L-BFGS float accumulation and NOT bit-reproducible across cluster
layouts — export once, version the artifact (a 1-row table beside the
corpus), score forever. One nuance: the multiply-add chain is
bit-exact across engines, but the logistic link runs through exp(),
which JVM Math.exp and other libms may round differently in the final
ulp — when a decision must be bit-identical across RUNTIMES (not just
across partitionings), threshold on the monotone linear score z
instead of the probability.

Features are null-safe (empty/NULL text scores as all-zero features),
so the scorer is total over crawl data.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.text import (
    avg_token_len,
    punct_ratio,
    stopword_ratio,
    token_count,
)

# fixed feature order — the contract between train and score.
# The length feature is sqrt(token_count), not log1p: IEEE-754
# requires sqrt to be CORRECTLY rounded, so the whole feature vector
# (sqrt + exact int-ratio divisions) is bit-identical across engines
# and runtimes — measured: Spark log1p vs DuckDB ln(1+n) disagreed in
# the last ulp on ~0.8% of integer inputs, sqrt on none. Same
# heavy-tail compression role, zero cross-engine skew.
FEATURE_NAMES = (
    "f_sqrt_tokens",
    "f_avg_token_len",
    "f_stopword_ratio",
    "f_punct_ratio",
    "f_digit_ratio",
)


def _safe(expr: Column) -> Column:
    """Total form of a ratio feature: NULL (empty text, 0/0) -> 0.0."""
    return F.coalesce(expr.cast("double"), F.lit(0.0))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` + the FEATURE_NAMES columns — one row-local projection,
    shared verbatim by training and scoring so the two can never skew.
    """
    return docs.select("*", *_feature_cols(text_col))


@lru_cache(maxsize=None)
def _feature_cols(text_col: str) -> tuple:
    """The feature projection fragments, memoized per text column name
    (unresolved Columns are immutable and safely shared across plans —
    rebuilding this is ~400 py4j round-trips per call)."""
    t = F.col(text_col)
    nonempty = t.isNotNull() & (F.length(F.trim(t)) > 0)
    feats = {
        # sqrt compresses the heavy-tailed length feature (and is
        # bit-exact cross-engine, unlike log1p — see FEATURE_NAMES)
        "f_sqrt_tokens": F.when(nonempty, F.sqrt(token_count(t))),
        "f_avg_token_len": F.when(nonempty, avg_token_len(t)),
        "f_stopword_ratio": F.when(nonempty, stopword_ratio(t)),
        "f_punct_ratio": F.when(nonempty, punct_ratio(t)),
        "f_digit_ratio": F.when(
            nonempty, F.regexp_count(t, F.lit("[0-9]")) / F.length(t)
        ),
    }
    return tuple(_safe(feats[n]).alias(n) for n in FEATURE_NAMES)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> dict:
    """Fit the linear quality model on a labeled frame (label 1 = keep-
    worthy, 0 = junk). Returns the portable artifact:
    ``{"features": [...], "weights": [...], "intercept": float}``.

    MLlib's LogisticRegression runs distributed over the labeled set;
    only the fitted coefficient vector (len(FEATURE_NAMES) floats)
    comes back to the driver.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(labeled, text_col).select(
        F.col(label_col).cast("double").alias("__label"), *FEATURE_NAMES
    )
    assembled = VectorAssembler(
        inputCols=list(FEATURE_NAMES), outputCol="__features"
    ).transform(feats)
    model = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
    ).fit(assembled)
    return {
        "features": list(FEATURE_NAMES),
        "weights": [float(w) for w in model.coefficients],
        "intercept": float(model.intercept),
    }


def quality_model_linear(model: dict) -> Column:
    """The monotone linear score ``z = b + Σ w_i f_i`` as a Column —
    the runtime-bit-stable decision value (the logistic link goes
    through exp(), which libms round differently in the final ulp;
    z is a fixed-order multiply-add chain of IEEE-exact ops, so
    thresholds and cross-engine oracles on z are bit-reproducible)."""
    if list(model["features"]) != list(FEATURE_NAMES):
        raise ValueError(
            f"model features {model['features']} do not match this "
            f"build's contract {list(FEATURE_NAMES)}"
        )
    if len(model["weights"]) != len(FEATURE_NAMES):
        # zip would silently truncate a corrupted artifact and score
        # with missing terms (round-4 advisor finding)
        raise ValueError(
            f"model has {len(model['weights'])} weights for "
            f"{len(FEATURE_NAMES)} features — corrupted artifact"
        )
    return _linear_col(
        float(model["intercept"]),
        tuple(float(w) for w in model["weights"]),
    )


@lru_cache(maxsize=None)
def _linear_col(intercept: float, weights: tuple) -> Column:
    z = F.lit(intercept)
    for name, w in zip(FEATURE_NAMES, weights):
        z = z + F.col(name) * F.lit(w)
    return z


def quality_model_linear_sql(model: dict) -> str:
    """The DuckDB-equivalent z fold (same order, same double literals)
    over columns named as FEATURE_NAMES — for oracle construction."""
    if list(model["features"]) != list(FEATURE_NAMES):
        raise ValueError("model features do not match the build contract")
    # literals as CAST('...' AS DOUBLE): DuckDB parses a bare decimal
    # literal as DECIMAL, and even CAST(<decimal literal> AS DOUBLE)
    # does not round-trip the shortest repr (measured:
    # 11.012497425587101 came back one ulp off). The string cast goes
    # through strtod, which IS correctly rounded.
    terms = "".join(
        f" + {name} * CAST('{float(w)!r}' AS DOUBLE)"
        for name, w in zip(FEATURE_NAMES, model["weights"])
    )
    return f"(CAST('{float(model['intercept'])!r}' AS DOUBLE){terms})"


def quality_model_score(model: dict, text_col: str = "text") -> Column:
    """The scoring EXPRESSION for a model artifact — usable inside any
    select/filter. Left-fold multiply-add in the fixed feature order,
    then the logistic link: deterministic, pure codegen."""
    z = quality_model_linear(model)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality_model(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    score_col: str = "quality_prob",
) -> DataFrame:
    """``docs`` + the model's keep probability. The feature projection
    and the dot product fuse into one codegen stage over the scan."""
    return (
        quality_features(docs, text_col)
        .withColumn(score_col, quality_model_score(model, text_col))
        .drop(*FEATURE_NAMES)
    )


_MODEL_SCHEMA = (
    "features array<string>, weights array<double>, intercept double"
)


def save_model(spark, table, model: dict) -> int:
    """Version the model artifact in a 1-row VersionedTable
    (sources/versioned.py) — the "export once, score forever" half of
    the module contract. Doubles round-trip parquet exactly, so a
    loaded model scores bit-identically to the saved one; every
    retrain is a new version, and time travel pins any corpus release
    to the exact filter that built it."""
    df = spark.createDataFrame(
        [(
            list(model["features"]),
            [float(w) for w in model["weights"]],
            float(model["intercept"]),
        )],
        _MODEL_SCHEMA,
    )
    return table.commit(df, mode="overwrite")


def load_model(spark, table, version: int | None = None) -> dict:
    """The saved artifact (optionally a historical ``version``)."""
    rows = table.read(spark, version=version).collect()
    if len(rows) != 1:
        raise ValueError(
            f"{table.root}: expected exactly 1 model row, got {len(rows)}"
        )
    r = rows[0]
    return {
        "features": list(r["features"]),
        "weights": [float(w) for w in r["weights"]],
        "intercept": float(r["intercept"]),
    }
