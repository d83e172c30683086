"""Query registry: event-time window aggregations (SURVEY §2.10).

The reference has no event-time windows (T1-T6 are poll-loop
micro-batches); these cover the streaming checklist on the `events`
table using Spark's window()/session_window() built-ins — the same
expressions run unchanged under readStream with a watermark (see
streaming/pipelines.py).

All three window shapes share one tagged suite (round 4: the session
branch was folded in to free a registry slot for the promoted corpus
tier). ``grp`` is the branch's grouping key: event_type for tumbling,
NULL for sliding, user_id for session.

Oracles: tumbling = date_trunc; sliding = union of shifted tumbling
buckets; session = gaps-and-islands (lag + cumulative boundary sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jde_to_datalake_spark.session import load_table

DEC = "decimal(18,9)"


def q_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (1h, by event_type) + sliding (2h/1h) + session
    (30-min gap, by user) windows, tagged and unioned.

    One registry slot, all three window shapes value-checked. The
    session branch proves Spark's session_window() against an
    independent gaps-and-islands derivation — window end = last event
    + gap on both sides.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("decimal(38,2)").cast("double")
        .alias("sum_value"),
    ]
    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(*agg)
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("event_type").alias("grp"),
            "n_events", "sum_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(*agg)
        .select(
            F.lit("sliding").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.lit(None).cast("string").alias("grp"),
            "n_events", "sum_value",
        )
    )
    session = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(*agg)
        .select(
            F.lit("session").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("user_id").cast("string").alias("grp"),
            "n_events", "sum_value",
        )
    )
    return tumbling.unionAll(sliding).unionAll(session)


ORACLE_TIME_WINDOWS = """
SELECT 'tumbling' AS kind,
       date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type AS grp,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,9))), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY 2, 3, 4
UNION ALL
SELECT 'sliding' AS kind, window_start,
       window_start + INTERVAL 2 HOUR AS window_end,
       CAST(NULL AS VARCHAR) AS grp,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,9))), 2) AS DOUBLE) AS sum_value
FROM (
  SELECT date_trunc('hour', ts) - k * (INTERVAL 1 HOUR) AS window_start, value
  FROM events, UNNEST([0, 1]) AS t(k)
) GROUP BY 2
UNION ALL
SELECT 'session' AS kind, window_start, window_end, grp, n_events, sum_value
FROM (
  WITH ordered AS (
    SELECT user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
  ),
  flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS boundary
    FROM ordered
  ),
  sessions AS (
    SELECT *, SUM(boundary) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
  )
  SELECT MIN(ts) AS window_start,
         MAX(ts) + INTERVAL 30 MINUTE AS window_end,
         CAST(user_id AS VARCHAR) AS grp,
         COUNT(*) AS n_events,
         CAST(round(SUM(CAST(value AS DECIMAL(18,9))), 2) AS DOUBLE) AS sum_value
  FROM sessions GROUP BY user_id, session_id
)
"""


QUERIES = {
    "time_windows": q_time_windows,
}

ORACLES = {
    "time_windows": ORACLE_TIME_WINDOWS,
}
