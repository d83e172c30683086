"""Declarative data-quality expectations over any engine table.

The reference validates inputs imperatively and one rule at a time
(unit whitelists at backend/utility.py:50-75, zero/null-quantity skips
at dags/dag_bakery_system_to_jde.py:176-179, key dropna at
backend/main.py:201,238) — each rule is a separate pass over a pandas
frame. Here the same class of rules is declared as a check list and
compiled into the MINIMUM number of distributed passes:

- all row-level checks (not_null / accepted_values / in_range /
  matches / arbitrary predicate) fold into ONE aggregation job over
  the table: each check is a conditional count inside a single
  groupBy().agg(...), so the map side computes every check's partial
  count in one scan inside whole-stage codegen and the final agg is a
  1-row reduce. Adding a check adds a column, never a pass.
- each ``unique`` check is one hash-groupBy on its key columns
  (map-side partial counts; surplus rows summed from group sizes).
- each ``referential`` check is one anti-join against the referenced
  dimension (broadcast when the dimension is small — the usual case).

The report is a LAZY DataFrame with one row per check:
(check_name, kind, column, n_rows, n_violations, passed) — so it can
be filtered/joined/sinked like any relation, and a scheduler can gate
a pipeline on ``passed`` without a driver-side loop.

Scale: the row-check pass is a full scan with a 1-row output — no
shuffle pressure at any size. Unique/referential checks shuffle on
their own keys only. Nothing collects to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLUMNS = ("check_name", "kind", "column", "n_rows", "n_violations", "passed")


def not_null(column: str, name: str | None = None) -> dict:
    """Violation: NULL key/value — the reference's dropna-on-key rule
    (backend/main.py:201,238,270-272)."""
    return {
        "name": name or f"not_null__{column}",
        "kind": "not_null",
        "column": column,
        "violation": F.col(column).isNull(),
    }


def accepted_values(
    column: str, values: Sequence, name: str | None = None
) -> dict:
    """Violation: value outside the whitelist — the reference's unit
    validation (backend/utility.py:50-75). NULLs count as violations
    (``isin`` yields NULL for NULL input; we coalesce to violating)."""
    return {
        "name": name or f"accepted_values__{column}",
        "kind": "accepted_values",
        "column": column,
        "violation": ~F.coalesce(F.col(column).isin(list(values)), F.lit(False)),
    }


def in_range(
    column: str, lo=None, hi=None, name: str | None = None
) -> dict:
    """Violation: value outside [lo, hi] (either bound optional).
    NULLs are NOT violations here — compose with ``not_null`` when a
    column must be both present and bounded."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(column) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(column) > F.lit(hi))
    return {
        "name": name or f"in_range__{column}",
        "kind": "in_range",
        "column": column,
        "violation": F.coalesce(cond, F.lit(False)),
    }


def matches(column: str, pattern: str, name: str | None = None) -> dict:
    """Violation: non-NULL value not fully matching ``pattern``."""
    return {
        "name": name or f"matches__{column}",
        "kind": "matches",
        "column": column,
        "violation": F.col(column).isNotNull()
        & ~F.col(column).rlike(f"^(?:{pattern})$"),
    }


def predicate(name: str, expect: Column, column: str = "") -> dict:
    """Generic row check: violation when ``expect`` is not TRUE.
    (NULL predicate result counts as a violation — ANSI three-valued
    logic would otherwise silently drop those rows from both sides.)"""
    return {
        "name": name,
        "kind": "predicate",
        "column": column,
        "violation": ~F.coalesce(expect, F.lit(False)),
    }


def unique(columns: Sequence[str] | str, name: str | None = None) -> dict:
    """Violation count: surplus rows beyond the first per duplicate
    key — the reference's UNIQUE(unique_transaction_id) ledger
    constraint (dags/dag_bakery_system_to_jde.py:38-59) as a check."""
    cols = [columns] if isinstance(columns, str) else list(columns)
    return {
        "name": name or f"unique__{'_'.join(cols)}",
        "kind": "unique",
        "columns": cols,
    }


def referential(
    column: str, ref: DataFrame, ref_column: str, name: str | None = None
) -> dict:
    """Violation count: rows whose non-NULL ``column`` has no match in
    ``ref.ref_column`` (orphan foreign keys)."""
    return {
        "name": name or f"referential__{column}",
        "kind": "referential",
        "column": column,
        "ref": ref,
        "ref_column": ref_column,
    }


def expectations_report(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Compile ``checks`` into the minimal set of jobs; one row each.

    Row-level checks share ONE aggregation pass; unique and referential
    checks contribute one keyed job apiece. The union of 1-row results
    is itself lazy — a single action materializes the whole report.
    """
    spark = df.sparkSession
    row_checks = [c for c in checks if "violation" in c]
    parts: list[DataFrame] = []

    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        for i, c in enumerate(row_checks):
            aggs.append(
                F.sum(F.when(c["violation"], 1).otherwise(0))
                .cast("long")
                .alias(f"__v{i}")
            )
        wide = df.agg(*aggs)
        # unpivot the 1-row wide aggregate into one row per check;
        # stack() is evaluated on a single row — negligible at any scale
        stack_args = ", ".join(
            f"'{c['name']}', '{c['kind']}', '{c.get('column', '')}', __v{i}"
            for i, c in enumerate(row_checks)
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(row_checks)}, {stack_args}) "
                    "as (check_name, kind, column, n_violations)"
                ),
                F.col("__n_rows").alias("n_rows"),
            ).select(
                "check_name", "kind", "column", "n_rows", "n_violations"
            )
        )

    n_rows_total = df.agg(F.count(F.lit(1)).alias("n")).select("n")
    for c in checks:
        if c["kind"] == "unique":
            cols = c["columns"]
            surplus = (
                df.groupBy(*[F.col(k) for k in cols])
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt") - 1)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_violations")
                )
            )
            parts.append(
                surplus.crossJoin(n_rows_total).select(
                    F.lit(c["name"]).alias("check_name"),
                    F.lit("unique").alias("kind"),
                    F.lit(",".join(cols)).alias("column"),
                    F.col("n").alias("n_rows"),
                    "n_violations",
                )
            )
        elif c["kind"] == "referential":
            ref_keys = c["ref"].select(
                F.col(c["ref_column"]).alias(c["column"])
            ).distinct()
            orphans = (
                df.filter(F.col(c["column"]).isNotNull())
                .join(ref_keys, c["column"], "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            parts.append(
                orphans.crossJoin(n_rows_total).select(
                    F.lit(c["name"]).alias("check_name"),
                    F.lit("referential").alias("kind"),
                    F.lit(c["column"]).alias("column"),
                    F.col("n").alias("n_rows"),
                    "n_violations",
                )
            )

    if not parts:
        return spark.createDataFrame([], schema=_empty_schema())

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def _empty_schema():
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("check_name", StringType()),
            StructField("kind", StringType()),
            StructField("column", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_violations", LongType()),
            StructField("passed", BooleanType()),
        ]
    )


def histogram_drift(
    baseline: DataFrame,
    current: DataFrame,
    column: str,
    edges: Sequence[float] | None = None,
    n_buckets: int = 10,
) -> DataFrame:
    """Distribution-drift report between two snapshots of a numeric
    column: one row per bucket with both sides' counts, fractions, and
    the chi-square drift term — the monitoring primitive behind
    "did this feed's distribution move?" gates.

    ``edges`` are the interior bucket boundaries (k edges -> k+1
    buckets over (-inf, e1], (e1, e2], ..., (ek, +inf)). When omitted
    they come from the BASELINE's approx quantiles (GK sketch, one
    pass — the scale path; pass explicit edges when the report must be
    exactly reproducible, e.g. for a cross-engine oracle, since sketch
    cut points are engine-specific).

    Every emitted statistic is counts or ratios-of-counts arithmetic
    (chi2_term = (frac_cur - frac_base)^2 / frac_base), so with fixed
    edges the report is EXACTLY cross-engine reproducible — the same
    design rule as the token-rarity metrics (PSI's log term is
    deliberately left to callers who accept FP-transcendental drift).

    Plan: one conditional-sum aggregation per side (single scan each,
    map-side combined, |buckets| output rows), one broadcast-size join
    on the bucket index. Nothing scales with row count but the scans.
    """
    if edges is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        edges = baseline.approxQuantile(column, qs, 0.001)
    edges = sorted(set(float(e) for e in edges))
    if not edges:
        raise ValueError("need at least one bucket edge")

    def bucket_expr():
        c = F.col(column)
        b = F.lit(len(edges))  # last bucket: > all edges
        for i in reversed(range(len(edges))):
            b = F.when(c <= F.lit(edges[i]), F.lit(i)).otherwise(b)
        return b.alias("bucket")

    def side_counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(F.col(column).isNotNull())
            .select(bucket_expr())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    base = side_counts(baseline, "n_base")
    cur = side_counts(current, "n_cur")
    spark = baseline.sparkSession
    lo = [float("-inf")] + list(edges)
    hi = list(edges) + [float("inf")]
    buckets = spark.createDataFrame(
        [(i, lo[i], hi[i]) for i in range(len(edges) + 1)],
        "bucket int, lo double, hi double",
    )
    joined = (
        buckets.join(base, "bucket", "left")
        .join(cur, "bucket", "left")
        .select(
            "bucket", "lo", "hi",
            F.coalesce(F.col("n_base"), F.lit(0).cast("bigint")).alias("n_base"),
            F.coalesce(F.col("n_cur"), F.lit(0).cast("bigint")).alias("n_cur"),
        )
    )
    # totals via a broadcast 1-row cross join, not a global window —
    # the frame is |buckets| rows so either is safe, but the repo rule
    # is "no single-partition window shapes anywhere"
    totals = joined.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    joined = joined.crossJoin(F.broadcast(totals))
    # try_divide: an EMPTY snapshot (total 0) must yield null fractions,
    # not an ANSI DIVIDE_BY_ZERO — a zero-row side is normal when a
    # drift gate runs against a partition that hasn't landed yet
    frac_b = F.try_divide(F.col("n_base"), F.col("__tb"))
    frac_c = F.try_divide(F.col("n_cur"), F.col("__tc"))
    # try_divide, not `/`: ANSI throws DIVIDE_BY_ZERO and codegen's
    # subexpression elimination can evaluate the division before the
    # n_base > 0 guard short-circuits (the round-1 ANSI lesson)
    chi2 = F.when(
        F.col("n_base") > 0,
        F.try_divide((frac_c - frac_b) * (frac_c - frac_b), frac_b),
    ).otherwise(F.lit(None).cast("double"))
    return joined.select(
        "bucket", "lo", "hi", "n_base", "n_cur",
        frac_b.alias("frac_base"),
        frac_c.alias("frac_cur"),
        chi2.alias("chi2_term"),
    )
