"""Structured Streaming pipelines — SURVEY.md §2.10 (T1-T6).

The reference's Airflow DAGs poll every 5/10/30 min with a
``days_back`` re-scan window and rely on an ON CONFLICT ledger for
idempotency (T1-T3). Here each pattern is the canonical Spark
construct:

- T1 poll micro-batch  -> ``trigger(availableNow=True)`` per run (or
  ``processingTime`` for a resident stream)
- T2 lookback + dedup  -> ``withWatermark`` + ``dropDuplicates`` on
  the idempotency key
- T3 at-least-once + idempotent sink -> ``foreachBatch`` + ledger
  MERGE (plans/ledger.py) — the exactly-once-effective sink
- T6 backpressure      -> ``maxFilesPerTrigger`` source option

At scale: state size for dropDuplicates is bounded by the watermark
horizon; the ledger MERGE joins only the micro-batch against the
ledger (broadcast when the batch is small).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_event_stream(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based micro-batch source (the lake landing zone pattern).

    Mirrors the reference's 'fetch since days_back' REST poll
    (dag_bakery_system_to_jde.py:107-109): new files appearing under
    ``directory`` are the incremental slices.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(directory)


def with_late_data_dedup(
    stream: DataFrame,
    event_time_col: str,
    key_cols: list[str],
    watermark: str = "5 days",
) -> DataFrame:
    """T2: lookback-window reprocessing made idempotent.

    The reference re-reads up to 5 days and dedups via the unique
    transaction id (main.py:423-432 + A12); the streaming-native form
    is a watermark bounding state + dropDuplicates on the key.
    """
    # watermarks require TIMESTAMP (with zone); NTZ event times are cast
    # (session tz is UTC, so the wall clock is unchanged)
    stream = stream.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    return stream.withWatermark(event_time_col, watermark).dropDuplicates(
        key_cols + [event_time_col]
    )


def windowed_counts(
    stream: DataFrame,
    event_time_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate (same expression as the
    tumbling branch of registry.windows.q_time_windows — one code path)."""
    stream = stream.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_available_now_to_memory(
    stream: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain all available input in one run (T1's per-DAG-run analog)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_available_now(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """T3: the idempotent side-effecting sink harness.

    ``batch_fn`` must (1) anti-join the ledger, (2) perform the side
    effect, (3) MERGE results back — in that order, inside the batch
    (outside Catalyst's reach, per SURVEY §4 side-effect ordering).
    """
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_windows_to_lake(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    event_time_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Watermarked windows -> hive-partitioned lake, append mode.

    The streaming composition of T2 + S6: only CLOSED windows (end <=
    final watermark) are appended, each exactly once, into the same
    year=/month=/day= layout the batch sink uses — so downstream
    partition-pruned readers (S8) work identically on streamed and
    batch-written data. At scale the file sink commits via the
    checkpoint manifest: restart-safe, no duplicate windows.
    """
    stream = stream.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    agg = (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
            F.year("w.start").alias("year"),
            F.month("w.start").alias("month"),
            F.dayofmonth("w.start").alias("day"),
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("year", "month", "day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join against a FIXED dimension
    snapshot (the reference's "join the pull against the JDE master"
    pattern, main.py:417-537, as a resident stream).

    Stateless: no watermark, no join state; AQE broadcasts the static
    side when small, which is the dimension case by definition.
    Supported join types for stream-static are inner/left (the stream
    must be the preserved side).

    SNAPSHOT caveat (measured, not theory): a path-based parquet
    ``dim`` pins its FILE LISTING when the DataFrame is created —
    rows appended later are silently invisible to subsequent batches,
    and an overwrite makes them FAIL with FILE_NOT_EXIST. For a
    dimension that changes while the query runs, use
    ``enrich_foreach_batch``, which re-resolves the dimension every
    micro-batch.
    """
    return stream.join(dim, on, how)


def enrich_foreach_batch(
    dim_loader: Callable[[SparkSession], DataFrame],
    on: str | list[str],
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
) -> Callable[[DataFrame, int], None]:
    """Live-dimension enrichment: a ``foreachBatch`` function that
    re-invokes ``dim_loader`` on EVERY micro-batch (fresh file
    listing / fresh table version), joins, and hands the enriched
    batch to ``sink``. This is the canonical Structured Streaming
    shape for slowly-changing dimensions — batch code inside
    foreachBatch re-plans from scratch, so nothing is pinned.

    ``dim_loader`` receives the batch's SparkSession (e.g.
    ``lambda s: s.read.parquet(path)`` or a VersionedTable read —
    which also gives each batch a CONSISTENT dimension version
    instead of a listing race).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        sink(batch_df.join(dim, on, how), batch_id)

    return write


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join within an event-time tolerance: the
    two-live-feeds comparison (cardex feed vs bakery feed) as one
    resident query instead of the reference's poll-and-diff loop.

    Both sides carry a watermark and the join predicate bounds
    |left.time - right.time| <= tolerance, which is what lets Spark
    BOUND the join state: each side buffers only rows younger than
    watermark + tolerance, then drops them — without the time bound a
    stream-stream join's state grows forever (Spark rejects it in
    append mode for exactly that reason).

    ``left_time``/``right_time`` name each side's event-time column.
    EVERY right-side column except the join keys comes out suffixed
    ``_r`` (both clocks and both payloads survive without name
    collisions — two live feeds routinely share column names).
    """
    keys = [key] if isinstance(key, str) else list(key)
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"__r_{c}")
    lt, rt = F.col(left_time), F.col(f"__r_{right_time}")
    lw = left.withWatermark(left_time, watermark)
    rw = r.withWatermark(f"__r_{right_time}", watermark)
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__r_{k}")
        cond = c if cond is None else cond & c
    iv = F.expr(f"INTERVAL {tolerance}")
    cond = cond & (rt >= lt - iv) & (rt <= lt + iv)
    out = lw.join(rw, cond, "inner")
    for k in keys:
        out = out.drop(f"__r_{k}")
    for c in right.columns:
        if c not in keys:
            out = out.withColumnRenamed(f"__r_{c}", f"{c}_r")
    return out


def session_counts(
    stream: DataFrame,
    key_col: str = "user_id",
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked session-window aggregate — the same
    ``session_window`` expression as the session branch of
    registry.windows.q_time_windows (one code path, stream/batch
    parity testable). State per (key, open session); the watermark
    closes sessions whose gap has lapsed and frees their state.
    """
    stream = stream.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.session_window(event_time_col, gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,9)"))
            .cast("decimal(38,2)").cast("double").alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )
