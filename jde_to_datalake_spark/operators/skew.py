"""Skew diagnostics: measure key distribution, recommend a mitigation.

The reference never has this problem — pandas on one box has no
partitions to skew — but its workloads do: cardex rows concentrate on
a handful of fast-moving items, dispatch ledgers concentrate on the
busiest business units. On a cluster those hot keys decide the
wall-clock of every shuffle join/agg (one task gets the whole key).

``skew_report`` quantifies this in ONE aggregation pass: per-key
counts, then a single driver-side summary row (total, distinct keys,
max/avg key count, top-N heavy hitters with their share). The heavy
part is a map-side-combinable groupBy count — the same cost as any
count-by-key — and only top_n + 1 rows ever reach the driver.

``suggest_salt_buckets`` turns the report into the parameter the
mitigation operators take: enough salt that the hottest key spreads to
roughly per-partition-average size, clamped to [1, max_buckets]
(replicating the right side beyond that buys nothing —
relational.salted_join docs). 1 means "don't salt" (AQE's skew split
handles mild skew on its own).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per-key row counts — the distributed input to the report."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


def skew_report(
    df: DataFrame, keys: list[str], top_n: int = 10
) -> dict:
    """One summary dict: total/distinct/max/avg and the top-N keys.

    Driver-safe by construction: two metadata-scale collects (one
    1-row summary, one top_n-row ordered limit) over the shared
    per-key histogram.
    """
    hist = key_histogram(df, keys).localCheckpoint(eager=False)
    summary = hist.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.coalesce(F.max("n_rows"), F.lit(0)).alias("max_key_rows"),
        F.avg("n_rows").alias("avg_key_rows"),
    ).collect()[0]
    top = (
        hist.orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(top_n)
        .collect()
    )
    total = summary["total_rows"]
    return {
        "keys": keys,
        "total_rows": total,
        "distinct_keys": summary["distinct_keys"],
        "max_key_rows": summary["max_key_rows"],
        "avg_key_rows": summary["avg_key_rows"] or 0.0,
        "skew_ratio": (
            summary["max_key_rows"] / summary["avg_key_rows"]
            if summary["avg_key_rows"]
            else 0.0
        ),
        "top_keys": [
            {
                **{k: r[k] for k in keys},
                "n_rows": r["n_rows"],
                "share": r["n_rows"] / total if total else 0.0,
            }
            for r in top
        ],
    }


def suggest_salt_buckets(
    report: dict, shuffle_partitions: int, max_buckets: int = 64
) -> int:
    """Salt so the hottest key ~ matches the average partition load.

    target_per_task = total/partitions; buckets = ceil(max_key /
    target). <=1 -> no salting needed (the hot key already fits the
    average task).
    """
    total = report["total_rows"]
    if not total or not report["max_key_rows"]:
        return 1
    target = total / shuffle_partitions
    if target <= 0:
        return 1
    return max(1, min(max_buckets, math.ceil(report["max_key_rows"] / target)))
