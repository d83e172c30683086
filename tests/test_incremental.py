"""Incremental high-watermark ingestion (sources/incremental.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jde_to_datalake_spark.plans.ledger import IdempotencyLedger
from jde_to_datalake_spark.sources.incremental import (
    Watermark,
    incremental_batch,
    incremental_scan,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2026, 1, 1) + dt.timedelta(hours=h)) for k, h in rows],
        "k string, ts timestamp",
    )


def test_first_run_is_full_backfill(spark):
    src = _events(spark, [("a", 0), ("b", 1)])
    assert incremental_scan(src, "ts", None).count() == 2


def test_watermark_roundtrip_and_monotonic(spark, tmp_path):
    wm = Watermark(str(tmp_path / "wm"))
    assert wm.get(spark) is None
    b1 = _events(spark, [("a", 0), ("b", 5)])
    v = wm.advance(spark, b1, "ts")
    assert v == dt.datetime(2026, 1, 1, 5)
    assert wm.get(spark) == v
    # replaying an OLDER batch must not rewind
    old = _events(spark, [("z", 2)])
    assert wm.advance(spark, old, "ts") == v
    assert wm.get(spark) == v
    # empty batch is a no-op
    assert wm.advance(spark, b1.limit(0), "ts") == v


def test_incremental_scan_with_overlap(spark, tmp_path):
    wm = Watermark(str(tmp_path / "wm"))
    batch1 = _events(spark, [("a", 0), ("b", 4)])
    wm.advance(spark, batch1, "ts")
    # source now holds batch1 + one late row INSIDE overlap (h=3) +
    # genuinely new rows (h=6,7)
    src = _events(spark, [("a", 0), ("b", 4), ("late", 3), ("c", 6), ("d", 7)])
    got = incremental_batch(spark, src, "ts", wm, overlap="2 hours")
    keys = sorted(r["k"] for r in got.collect())
    # hwm=4h, overlap 2h -> reads ts > 2h: late(3), b(4), c(6), d(7)
    assert keys == ["b", "c", "d", "late"]


def test_overlap_rereads_cancelled_by_ledger(spark, tmp_path):
    """The reference's days_back re-fetch relies on transaction-id
    dedup (dag_cardex_changes_to_bakery_ops.py:24-33); here the same
    cancellation is the ledger anti-join over the overlap re-reads."""
    wm = Watermark(str(tmp_path / "wm"))
    ledger = IdempotencyLedger(str(tmp_path / "ledger"), key="k")

    # --- poll 1: backfill
    src1 = _events(spark, [("a", 0), ("b", 4)])
    batch = incremental_batch(spark, src1, "ts", wm, overlap="2 hours")
    todo = ledger.pending_only(spark, batch)
    assert sorted(r["k"] for r in todo.collect()) == ["a", "b"]
    ledger.mark_done(spark, todo)          # sink commits...
    wm.advance(spark, batch, "ts")         # ...THEN the clock moves

    # --- poll 2: b re-enters via overlap, only c/late are new work
    src2 = _events(spark, [("a", 0), ("b", 4), ("late", 3), ("c", 6)])
    batch = incremental_batch(spark, src2, "ts", wm, overlap="2 hours")
    assert sorted(r["k"] for r in batch.collect()) == ["b", "c", "late"]
    todo = ledger.pending_only(spark, batch)
    assert sorted(r["k"] for r in todo.collect()) == ["c", "late"]


def test_predicate_prunes_hive_partitions(spark, tmp_path):
    """The watermark filter must reach partition pruning — an
    incremental poll over a day-partitioned lake lists only new
    days."""
    root = str(tmp_path / "lake")
    df = _events(spark, [(f"k{i}", i * 24) for i in range(6)]).withColumn(
        "day", F.dayofmonth("ts")
    )
    df.repartition("day").write.partitionBy("day").parquet(root)
    src = spark.read.parquet(root)
    hwm = dt.datetime(2026, 1, 4)  # days 1-4 already ingested
    plan = (
        incremental_scan(src.filter(F.col("day") >= F.dayofmonth(F.lit(hwm))), "ts", hwm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # dayofmonth(lit) constant-folds, so the scan carries a static
    # partition predicate — exactly what makes the poll list-only-new
    assert "PartitionFilters: [isnotnull(day" in plan and "(day#" in plan
    assert ">= 4" in plan
