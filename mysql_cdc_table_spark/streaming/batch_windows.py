"""Time-window aggregations (tumbling / sliding / session).

These are the same ``F.window`` / ``F.session_window`` expressions the
streaming pipelines use — Spark evaluates them identically in batch, so
they get full DuckDB oracles here (gaps-and-islands SQL for sessions);
the genuinely streaming-only behaviors (watermarks, late-data drop,
incremental state) are exercised in tests/test_streaming.py.

Scale: window aggs are plain grouped aggs on (bucket, keys) — map-side
combinable, one shuffle of #buckets x #keys. Session windows shuffle by
user and sort within partition (same cost envelope as a window
function); at 100 TB the stream would be pre-partitioned by user via
the source (e.g. Kafka key) so the shuffle is already satisfied.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_table_spark.operators._util import t


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


STREAM_TUMBLING_COUNTS_SQL = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 2h every 1h: each event lands in two windows."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "avg_value")
    )


STREAM_SLIDING_COUNTS_SQL = """
WITH assigned AS (
  SELECT unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start,
         value
  FROM events
)
SELECT win_start, count(*) AS n, round(avg(value), 6) AS avg_value
FROM assigned GROUP BY win_start
"""


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap. The
    DuckDB oracle is the classic gaps-and-islands rewrite; Spark's
    session end = last event + gap."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


STREAM_SESSION_WINDOW_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
           AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


def stream_hopping_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event-type share: window agg + a second agg over windows
    (the two-level cascade every streaming dashboard runs)."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "event_type", "n")
    )
    totals = daily.groupBy("day").agg(F.sum("n").alias("day_total"))
    return (
        daily.join(totals, "day")
        .select(
            "day",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("day_total"), 6).alias("share"),
        )
    )


STREAM_HOPPING_RATE_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
totals AS (SELECT day, sum(n) AS day_total FROM daily GROUP BY day)
SELECT daily.day, event_type, n,
       round(n / CAST(day_total AS DOUBLE), 6) AS share
FROM daily JOIN totals USING (day)
"""


QUERIES = {
    "stream_tumbling_counts": stream_tumbling_counts,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_session_window": stream_session_window,
    "stream_hopping_rate": stream_hopping_rate,
}

ORACLES = {
    "stream_tumbling_counts": STREAM_TUMBLING_COUNTS_SQL,
    "stream_sliding_counts": STREAM_SLIDING_COUNTS_SQL,
    "stream_session_window": STREAM_SESSION_WINDOW_SQL,
    "stream_hopping_rate": STREAM_HOPPING_RATE_SQL,
}
