"""Batch-equivalent oracle queries for the streaming operators.

Each query runs the *same* aggregation function the streaming jobs use
(duva_spark.streaming.windows) in batch mode — Catalyst produces the
identical aggregation plan modulo the watermark operator — and checks it
against a DuckDB oracle. True streaming execution (watermarks,
AvailableNow triggers, stateful dedup) is exercised in
tests/test_streaming.py where a memory sink can be observed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duva_spark.catalog import load_table
from duva_spark.queries import register
from duva_spark.streaming import windows

_EPOCH = "CAST(floor(epoch({x})) AS BIGINT)"


@register(
    "q_stream_tumbling",
    oracle=f"""
    SELECT {_EPOCH.format(x="time_bucket(INTERVAL '1 day', ts)")} AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    description="Tumbling 1-day windows per event_type (streaming window agg, batch-checked).",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_window_agg(load_table(spark, sf_dir, "events"), "1 day")


@register(
    "q_stream_sliding",
    oracle=f"""
    SELECT {_EPOCH.format(x="time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes'")} AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) offsets(o)
    GROUP BY 1, 2
    """,
    description="Sliding 1h/30min windows: every event counted in both overlapping windows.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sliding_window_agg(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@register(
    "q_stream_sessions",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           {_EPOCH.format(x="MIN(ts)")} AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    headline=True,
    description="Gap-based sessionization (30 min) via native session_window; oracle replays lag/cumsum semantics.",
)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.session_agg(load_table(spark, sf_dir, "events"), "30 minutes")


@register(
    "q_stream_true_tumbling",
    oracle=f"""
    SELECT {_EPOCH.format(x="time_bucket(INTERVAL '1 day', ts)")} AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description=(
        "TRUE streaming execution under the value-hash gate: a real "
        "readStream file source -> watermarked tumbling window agg -> "
        "memory sink with Trigger.AvailableNow, run to completion inside "
        "the query. A single in-order replay drops nothing at the "
        "watermark, so the streaming result equals the batch oracle "
        "exactly — the strongest streaming/batch unification evidence "
        "the driver can check."
    ),
)
def q_stream_true_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duva_spark.streaming.jobs import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    # stable sink name: re-runs replace the view instead of accumulating
    return run_available_now(windows.tumbling_window_agg(stream, "1 day"), "q_true_tumble")


@register(
    "q_stream_true_sessions",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           {_EPOCH.format(x="MIN(ts)")} AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    description=(
        "TRUE streaming session windows under the value-hash gate: real "
        "readStream -> session_window merging-state agg -> memory sink, "
        "Trigger.AvailableNow, run to completion inside the query. The "
        "single in-order replay makes the stateful session merge equal "
        "the batch gaps-and-islands oracle exactly."
    ),
)
def q_stream_true_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duva_spark.streaming.jobs import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(windows.session_agg(stream, "30 minutes"), "q_true_sess")


@register(
    "q_stream_true_sliding",
    oracle=f"""
    SELECT {_EPOCH.format(x="time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes'")} AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) offsets(o)
    GROUP BY 1, 2
    """,
    description=(
        "TRUE streaming sliding windows (1h every 30min) under the "
        "value-hash gate: every event lands in both overlapping windows "
        "through a real readStream -> memory-sink AvailableNow run."
    ),
)
def q_stream_true_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duva_spark.streaming.jobs import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(
        windows.sliding_window_agg(stream, "1 hour", "30 minutes"), "q_true_slide"
    )
