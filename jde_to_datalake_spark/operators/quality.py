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
