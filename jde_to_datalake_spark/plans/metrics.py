"""Executed-plan observability: per-node SQL metrics + query profiles.

The reference aspires to "Performance Monitoring" (README.org:864-870)
but records nothing; its only runtime signals are HTTP logs. Spark
already accumulates detailed per-operator SQLMetrics (rows, shuffle
bytes, spills, scan stats) on every executed plan — this module
surfaces them as plain Python data so a pipeline can log, assert on,
or ship them without the Spark UI (disabled in headless runs).

Two entry points:

- ``plan_metrics(df)``  walk the (already executed) physical plan and
  return one dict per node: {node, metrics{...}} — descends through
  AQE wrappers (AdaptiveSparkPlanExec / QueryStageExec) so the FINAL
  adaptive plan is reported, not the initial guess.
- ``profile(df)``       materialize the DataFrame ONCE through its own
  QueryExecution (RDD-level count: fully distributed, only
  per-partition counts return to the driver) and roll the node metrics
  up into a flat summary (rows scanned/produced, shuffle volume,
  spills, peak memory, exchange count, wall seconds).

Used for the same purpose at 100 TB as at test scale: assert a
query's shuffle volume/spill budget in CI, or emit one summary line
per production run. Driver-side diagnostic tool — py4j traversal is
per-node, never per-row, so cost is proportional to plan size.

Requires a classic (py4j) session; Spark Connect exposes no
``_jdf``. All access is defensive — a node without metrics simply
contributes nothing.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

# rollup -> (metric key, aggregation) over all plan nodes
_SUM_KEYS = {
    "shuffle_bytes_written": "shuffleBytesWritten",
    "shuffle_records_written": "shuffleRecordsWritten",
    "shuffle_bytes_read": ("localBytesRead", "remoteBytesRead"),
    "spill_bytes": "spillSize",
    "scan_rows": None,  # special-cased: numOutputRows on scan nodes only
    "scan_files": "numFiles",
    "scan_bytes": "filesSize",
}


def _scala_map_items(jmap) -> dict[str, Any]:
    out = {}
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _walk(node, acc: list[dict], depth: int = 0) -> None:
    try:
        metrics = _scala_map_items(node.metrics())
    except Exception:
        metrics = {}
    name = node.nodeName()
    acc.append({"node": name, "depth": depth, "metrics": metrics})
    cls = node.getClass().getSimpleName()
    # AQE wrappers: report the FINAL plan the runtime actually chose
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), acc, depth + 1)
        return
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), acc, depth + 1)
        return
    children = node.children()
    for i in range(children.length()):
        _walk(children.apply(i), acc, depth + 1)


def plan_metrics(df: DataFrame) -> list[dict]:
    """Per-node metrics of ``df``'s physical plan (post-AQE where
    executed). Zero-valued metrics are kept — absence of work is data
    too (e.g. spillSize == 0 is the assertion a spill-budget test
    wants)."""
    acc: list[dict] = []
    _walk(df._jdf.queryExecution().executedPlan(), acc)
    return acc


def summarize(nodes: list[dict]) -> dict:
    """Flat rollup of a ``plan_metrics`` listing."""
    out = {
        "output_rows": None,
        "scan_rows": 0,
        "scan_files": 0,
        "scan_bytes": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "shuffle_bytes_read": 0,
        "spill_bytes": 0,
        "peak_memory_bytes": 0,
        "n_exchanges": 0,
        "n_nodes": len(nodes),
    }
    for nd in nodes:
        name, m = nd["node"], nd["metrics"]
        if out["output_rows"] is None and "numOutputRows" in m:
            # first node (top-down) with row metrics = the query output
            out["output_rows"] = m["numOutputRows"]
        if name.startswith("Scan"):
            out["scan_rows"] += m.get("numOutputRows", 0)
            out["scan_files"] += m.get("numFiles", 0)
            out["scan_bytes"] += m.get("filesSize", 0)
        if name == "Exchange":
            out["n_exchanges"] += 1
        out["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
        out["shuffle_records_written"] += m.get("shuffleRecordsWritten", 0)
        out["shuffle_bytes_read"] += m.get("localBytesRead", 0) + m.get(
            "remoteBytesRead", 0
        )
        out["spill_bytes"] += m.get("spillSize", 0)
        out["peak_memory_bytes"] = max(
            out["peak_memory_bytes"], m.get("peakMemory", 0)
        )
    return out


def profile(df: DataFrame) -> dict:
    """Execute ``df`` once and return its metric summary.

    Materialization runs the DataFrame's OWN QueryExecution at the RDD
    layer (``executedPlan().execute().count()``), so the metrics land
    on exactly the plan being inspected — a ``df.write``/``df.count``
    would build a separate QueryExecution and leave this one cold.
    Nothing but per-partition counts crosses to the driver.
    """
    qe = df._jdf.queryExecution()
    t0 = time.perf_counter()
    n = qe.executedPlan().execute().count()
    wall = time.perf_counter() - t0
    nodes = plan_metrics(df)
    summary = summarize(nodes)
    summary["output_rows"] = n  # authoritative (root metric can be
    # absent when the top node is a wrapper without row metrics)
    summary["wall_s"] = round(wall, 4)
    return summary
