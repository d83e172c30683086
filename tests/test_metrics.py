"""Executed-plan metrics harvesting (plans/metrics.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.plans.metrics import plan_metrics, profile, summarize
from jde_to_datalake_spark.session import load_table

from tests.conftest import SF_DIR


def test_profile_agg_query(spark, duck):
    orders = load_table(spark, SF_DIR, "orders")
    prof = profile(orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")))
    n_groups = duck.execute(
        "SELECT COUNT(DISTINCT o_orderstatus) FROM orders"
    ).fetchone()[0]
    n_rows = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]

    assert prof["output_rows"] == n_groups
    assert prof["scan_rows"] == n_rows
    assert prof["scan_files"] >= 1 and prof["scan_bytes"] > 0
    # one shuffle for the groupBy; map-side partial agg means far fewer
    # records cross the exchange than were scanned
    assert prof["n_exchanges"] == 1
    assert 0 < prof["shuffle_records_written"] <= n_groups * 64
    assert prof["shuffle_bytes_written"] > 0
    assert prof["spill_bytes"] == 0
    assert prof["wall_s"] > 0


def test_profile_counts_scan_once_per_side(spark):
    cust = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    prof = profile(joined)
    assert prof["output_rows"] == cust.count()
    # broadcast join: no shuffle exchange at all
    assert prof["n_exchanges"] == 0


def test_plan_metrics_reports_final_adaptive_plan(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    profile(df)  # execute so AQE finalizes
    nodes = plan_metrics(df)
    names = [n["node"] for n in nodes]
    # the walk descends THROUGH the AQE wrapper to real operators
    assert names[0] == "AdaptiveSparkPlan"
    assert any(n.startswith("Scan") for n in names)
    assert "Exchange" in names
    # every node entry carries a plain dict of plain values
    for n in nodes:
        for k, v in n["metrics"].items():
            assert isinstance(k, str) and isinstance(v, int)


def test_summarize_is_pure_rollup():
    nodes = [
        {"node": "HashAggregate", "depth": 0, "metrics": {"numOutputRows": 3, "spillSize": 7}},
        {"node": "Exchange", "depth": 1, "metrics": {"shuffleBytesWritten": 100, "shuffleRecordsWritten": 3, "localBytesRead": 100}},
        {"node": "Scan parquet", "depth": 2, "metrics": {"numOutputRows": 1500, "numFiles": 2, "filesSize": 999}},
    ]
    s = summarize(nodes)
    assert s["output_rows"] == 3
    assert s["scan_rows"] == 1500 and s["scan_files"] == 2 and s["scan_bytes"] == 999
    assert s["n_exchanges"] == 1
    assert s["shuffle_bytes_written"] == 100 and s["shuffle_bytes_read"] == 100
    assert s["spill_bytes"] == 7
    assert s["n_nodes"] == 3
