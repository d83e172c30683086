"""Streaming (T1-T3), stateful A10, and window pipelines."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.session import load_table
from jde_to_datalake_spark.streaming import pipelines as P
from jde_to_datalake_spark.streaming.stateful import running_inventory_ordered
from tests.conftest import SF_DIR


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Stage events as a streaming source directory (2 files = 2 slices)."""
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_stream")
    ev.repartition(2).write.parquet(out)
    return out, ev


def test_windowed_counts_stream_matches_batch(spark, events_dir):
    """One code path: the streamed tumbling agg == the batch result."""
    directory, ev = events_dir
    schema = ev.schema
    stream = P.read_event_stream(spark, directory, schema)
    assert stream.isStreaming
    agg = P.windowed_counts(stream)
    P.run_available_now_to_memory(agg, "win_counts", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }
    exp_df = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("s"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    exp = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in exp_df.collect()}
    assert got == exp


def test_watermark_dedup_drops_duplicates(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").limit(200)
    doubled = ev.union(ev)  # simulate lookback re-scan (T2)
    src = str(tmp_path / "dup_events")
    doubled.write.parquet(src)
    stream = P.read_event_stream(spark, src, ev.schema)
    deduped = P.with_late_data_dedup(stream, "ts", ["event_id"])
    P.run_available_now_to_memory(deduped, "dedup_out")
    assert spark.table("dedup_out").count() == ev.count()


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """T3: dedup-probe -> side effect -> ledger MERGE, replay-safe."""
    from jde_to_datalake_spark.plans.ledger import IdempotencyLedger

    ev = load_table(spark, SF_DIR, "events").limit(100).select(
        F.concat(F.lit("utid_"), F.col("event_id").cast("string"))
        .alias("unique_transaction_id"),
        "value", "ts",
    )
    src = str(tmp_path / "sink_events")
    ev.write.parquet(src)
    ledger = IdempotencyLedger(str(tmp_path / "ledger"))
    sent: list[int] = []

    def batch_fn(batch_df, batch_id):
        pending = ledger.pending_only(batch_df.sparkSession, batch_df)
        n = pending.count()
        sent.append(n)  # the "POST" side effect
        ledger.mark_done(batch_df.sparkSession, pending)

    stream = P.read_event_stream(spark, src, ev.schema)
    P.run_foreach_batch_available_now(stream, batch_fn, str(tmp_path / "cp1"))
    assert sum(sent) == 100

    # replay the same data with a fresh checkpoint: ledger absorbs it
    stream2 = P.read_event_stream(spark, src, ev.schema)
    P.run_foreach_batch_available_now(stream2, batch_fn, str(tmp_path / "cp2"))
    assert sum(sent) == 100  # nothing re-sent
    done = ledger.load(spark).filter(F.col("status") == "done").count()
    assert done == 100


def test_running_inventory_ordered_clamp(spark):
    """Order-dependent clamp != batch signed-sum when balance dips < 0."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", "click", 10.0),   # -10 -> clamp 0
        (1, 2, "2024-01-01 00:01:00", "purchase", 5.0),  # +5 -> 5
        (2, 3, "2024-01-01 00:00:00", "purchase", 7.0),  # +7
        (2, 4, "2024-01-01 00:01:00", "click", 3.0),     # -3 -> 4
    ]
    df = spark.createDataFrame(
        rows, "product_id long, event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["product_id"]: r["on_hand"]
        for r in running_inventory_ordered(df).collect()
    }
    assert got == {1: 5.0, 2: 4.0}
    # batch signed-sum would say product 1 == max(0, -5) = 0 at the END
    # only; the ordered fold clamps at each step -> 5.0. Assert they
    # really differ on this input:
    from jde_to_datalake_spark.operators.relational import running_inventory_batch

    batch = {
        r["product_id"]: r["on_hand"]
        for r in running_inventory_batch(
            df, "product_id", F.col("value"),
            F.col("event_type").isin("click", "view"),
        ).collect()
    }
    assert batch[1] == 0.0 and got[1] == 5.0


def test_running_inventory_stream_matches_ordered(spark, tmp_path):
    """Stream (applyInPandasWithState) == batch ordered fold on one batch."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .limit(500)
        .select(
            F.col("user_id").alias("product_id"),
            F.col("event_id").alias("__id"),
            F.col("ts").alias("__ts"),
            F.when(
                F.col("event_type").isin("click", "view"), -F.col("value")
            ).otherwise(F.col("value")).alias("__signed"),
            "event_type", "value", "event_id", "ts",
        )
    )
    src = str(tmp_path / "inv_events")
    ev.write.parquet(src)

    from jde_to_datalake_spark.streaming.stateful import running_inventory_stream

    stream = P.read_event_stream(spark, src, ev.schema)
    out = running_inventory_stream(
        stream.select("product_id", "__ts", "__id", "__signed")
    )
    P.run_available_now_to_memory(out, "inv_stream", output_mode="update")
    got = {
        r["product_id"]: (r["on_hand"], r["n_movements"])
        for r in spark.table("inv_stream").collect()
    }
    exp = {
        r["product_id"]: (r["on_hand"], r["n_movements"])
        for r in running_inventory_ordered(
            ev, "product_id", "ts", "event_id", "value"
        ).collect()
    }
    assert got == exp


def test_running_inventory_tws_matches_ordered(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 API) == the batch fold.

    The TWS state-server protocol needs protobuf; skip where absent
    (this container ships without it — applyInPandasWithState above is
    the tested stateful path here).
    """
    pytest.importorskip("google.protobuf.descriptor")
    from jde_to_datalake_spark.streaming.stateful import running_inventory_tws

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_id") % 7 == 0)
    signed = ev.select(
        (F.col("user_id") % 50).alias("product_id"),
        F.col("ts").alias("__ts"),
        F.col("event_id").alias("__id"),
        F.when(F.col("event_type").isin("click", "view"), -F.col("value"))
        .otherwise(F.col("value")).alias("__signed"),
    )
    src = str(tmp_path / "mov_stream")
    signed.coalesce(1).write.parquet(src)  # single slice => one batch, ordered fold
    stream = spark.readStream.schema(signed.schema).parquet(src)
    q = (
        running_inventory_tws(stream)
        .writeStream.format("memory")
        .queryName("inv_tws")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["product_id"]: (round(r["on_hand"], 6), r["n_movements"])
        for r in spark.table("inv_tws").collect()
    }
    exp = {
        r["product_id"]: (round(r["on_hand"], 6), r["n_movements"])
        for r in running_inventory_ordered(
            ev, product_col="product_id", ts_col="ts", id_col="event_id",
            qty_col="value",
        ).collect()
    }
    # ordered-batch fold must agree when the stream arrives as one batch
    assert got == exp


def test_stream_windows_to_lake_closed_windows_only(spark, events_dir, tmp_path):
    """Append-mode windows land in the partitioned lake exactly once,
    and only windows closed by the final watermark are emitted."""
    directory, ev = events_dir
    stream = P.read_event_stream(spark, directory, ev.schema)
    out = str(tmp_path / "win_lake")
    P.stream_windows_to_lake(stream, out, str(tmp_path / "ckpt"))

    got_df = spark.read.parquet(out)
    assert "year" in got_df.columns  # hive layout present
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got_df.collect()
    }

    max_ts = ev.select(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    exp_df = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("s"),
        )
        .filter(F.col("w.end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
    )
    exp = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in exp_df.collect()}
    assert got == exp and len(got) > 0


def test_stream_static_snapshot_join(spark, tmp_path):
    """Stream-static join against a fixed dimension snapshot enriches
    every batch; the snapshot caveat (a path-based dim pins its file
    listing) is what enrich_foreach_batch exists for."""
    from jde_to_datalake_spark.streaming.pipelines import enrich_stream

    dim_dir = str(tmp_path / "dim")
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "bread"), (2, "cake")], ["pid", "pname"]) \
        .repartition(1).write.parquet(dim_dir)
    spark.createDataFrame([(1, 5.0), (2, 7.0), (9, 1.0)], ["pid", "qty"]) \
        .repartition(1).write.parquet(src_dir)
    stream = spark.readStream.schema("pid long, qty double").parquet(src_dir)
    enriched = enrich_stream(stream, spark.read.parquet(dim_dir), "pid")
    q = (enriched.writeStream.format("memory").queryName("enr_snap")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["pid"], r["qty"]): r["pname"]
           for r in spark.sql("SELECT * FROM enr_snap").collect()}
    assert got == {(1, 5.0): "bread", (2, 7.0): "cake", (9, 1.0): None}


def test_enrich_foreach_batch_picks_up_dim_updates(spark, tmp_path):
    """The live-dimension variant re-resolves the dimension every
    micro-batch: an overwrite between runs is reflected without
    restarting anything (where the pinned stream-static snapshot
    would FAIL on the replaced files)."""
    from jde_to_datalake_spark.streaming.pipelines import enrich_foreach_batch

    dim_dir = str(tmp_path / "dim")
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "bread"), (2, "cake")], ["pid", "pname"]) \
        .repartition(1).write.parquet(dim_dir)
    spark.createDataFrame([(1, 5.0)], ["pid", "qty"]) \
        .repartition(1).write.parquet(src_dir)
    stream = spark.readStream.schema("pid long, qty double").parquet(src_dir)

    collected: list = []
    writer = enrich_foreach_batch(
        lambda s: s.read.parquet(dim_dir),
        "pid",
        lambda df, bid: collected.extend(df.collect()),
    )

    def run(i):
        q = (stream.writeStream.foreachBatch(writer)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run(1)
    assert {(r["pid"], r["pname"]) for r in collected} == {(1, "bread")}
    collected.clear()
    # dimension overwritten + new source file: the shared checkpoint
    # means only the NEW batch is processed, against the NEW dim
    spark.createDataFrame([(1, "sourdough"), (2, "cake")], ["pid", "pname"]) \
        .repartition(1).write.mode("overwrite").parquet(dim_dir)
    spark.createDataFrame([(2, 7.0)], ["pid", "qty"]) \
        .repartition(1).write.mode("append").parquet(src_dir)
    run(2)
    assert {(r["pid"], r["pname"]) for r in collected} == {(2, "cake")}


def test_stream_stream_interval_join_bounds_and_matches(spark, tmp_path):
    """Two live feeds joined within an event-time tolerance: matching
    keys inside the window join, outside-the-window pairs drop, and
    both sides' clocks survive in the output."""
    import datetime as dt

    from jde_to_datalake_spark.streaming.pipelines import interval_join_streams

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(dirname, rows):
        p = str(tmp_path / dirname)
        spark.createDataFrame(rows, ["k", "ts", "v"]).repartition(1) \
            .write.parquet(p)
        return spark.readStream.schema("k long, ts timestamp, v string").parquet(p)

    left = mk("l", [
        (1, t0, "l1"),
        (2, t0, "l2"),
        (3, t0, "l3"),
    ])
    right = mk("r", [
        (1, t0 + dt.timedelta(minutes=30), "r1"),   # inside 1h tolerance
        (2, t0 + dt.timedelta(hours=3), "r2"),      # outside -> dropped
        (9, t0, "r9"),                              # no matching key
    ])
    joined = interval_join_streams(
        left, right, key="k", tolerance="1 hour", watermark="2 hours"
    )
    q = (joined.writeStream.format("memory").queryName("ssj")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM ssj").collect()
    assert {(r["k"], r["v"]) for r in rows} == {(1, "l1")}
    r = rows[0]
    assert r["ts"] == t0 and r["ts_r"] == t0 + dt.timedelta(minutes=30)


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    """The streaming interval join's output equals the same predicate
    evaluated as a plain batch join over the same data — streaming
    adds state management, never different join semantics."""
    import datetime as dt

    from jde_to_datalake_spark.streaming.pipelines import interval_join_streams

    t0 = dt.datetime(2024, 3, 1, 8, 0, 0)
    lrows = [(i % 5, t0 + dt.timedelta(minutes=7 * i), f"l{i}") for i in range(20)]
    rrows = [(i % 4, t0 + dt.timedelta(minutes=11 * i), f"r{i}") for i in range(15)]

    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(lrows, ["k", "ts", "v"]).repartition(1).write.parquet(ld)
    spark.createDataFrame(rrows, ["k", "ts", "v"]).repartition(1).write.parquet(rd)
    ls = spark.readStream.schema("k long, ts timestamp, v string").parquet(ld)
    rs = spark.readStream.schema("k long, ts timestamp, v string").parquet(rd)
    joined = interval_join_streams(ls, rs, key="k", tolerance="30 minutes",
                                   watermark="1 hour")
    q = (joined.writeStream.format("memory").queryName("ssj_par")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {
        (r["k"], r["v"], r["v_r"])
        for r in spark.sql("SELECT * FROM ssj_par").collect()
    }
    # batch model: same predicate on static frames
    tol = dt.timedelta(minutes=30)
    want = {
        (lk, lv, rv)
        for (lk, lts, lv) in lrows
        for (rk, rts, rv) in rrows
        if lk == rk and abs((lts - rts).total_seconds()) <= tol.total_seconds()
    }
    assert got == want and got


def test_session_windows_stream_matches_batch(spark, events_dir):
    """Streamed session windows == the batch session_window result
    (complete mode; same expression as the time_windows suite)."""
    directory, ev = events_dir
    stream = P.read_event_stream(spark, directory, ev.schema)
    agg = P.session_counts(stream)
    P.run_available_now_to_memory(agg, "sess_counts", output_mode="complete")
    got = {
        (r["user_id"], r["session_start"], r["session_end"]):
            (r["n_events"], r["sum_value"])
        for r in spark.table("sess_counts").collect()
    }
    exp_df = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("s"),
        )
        .select("user_id", F.col("w.start").alias("ws"),
                F.col("w.end").alias("we"), "n", "s")
    )
    exp = {
        (r["user_id"], r["ws"], r["we"]): (r["n"], r["s"])
        for r in exp_df.collect()
    }
    assert got == exp and got


def test_running_inventory_stream_validates_columns(spark):
    """Missing ordering/qty columns are rejected at plan time with the
    projection mapping spelled out — not as an opaque KeyError inside
    the executor's Python worker mid-query (round-11 review). Custom
    column names are accepted."""
    import pytest as _pytest

    from jde_to_datalake_spark.streaming.stateful import (
        running_inventory_stream,
        running_inventory_tws,
    )

    raw = spark.readStream.format("rate").load()  # timestamp, value
    with _pytest.raises(ValueError, match="running_inventory_stream"):
        running_inventory_stream(raw, product_col="value")
    # custom names resolve (plan builds; no KeyError at definition)
    shaped = raw.selectExpr(
        "value AS product_id",
        "CAST(value AS DOUBLE) AS qty",
        "timestamp AS event_ts",
        "value AS event_id",
    )
    out = running_inventory_stream(
        shaped, qty_col="qty", ts_col="event_ts", id_col="event_id"
    )
    assert set(out.columns) == {"product_id", "on_hand", "n_movements"}
    with _pytest.raises(ValueError, match="running_inventory_tws"):
        running_inventory_tws(shaped)
