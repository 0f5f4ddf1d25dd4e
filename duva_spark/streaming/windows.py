"""Windowed aggregations, usable identically in batch and streaming.

Each function takes a DataFrame (batch or streaming) with a timestamp
column and returns the windowed aggregate. In streaming mode callers add
``withWatermark`` upstream (see jobs.py); the aggregation logic is
shared, which is what makes the batch DuckDB-oracle check meaningful for
the streaming path (same plan modulo the watermark operator).

Scale: windowed groupBy shuffles on (window, keys) — bounded state per
watermark; session windows use Spark's native session_window operator
(state merges adjacent events server-side, no per-user collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duva_spark.queries import money_cents


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 day",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Count + value sum per (tumbling window, key); window start emitted
    as epoch seconds for cross-engine comparability."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), key)
        .agg(F.count("*").alias("n_events"), F.round(F.sum(money_cents(F.col("value"))) / 100.0, 4).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            key,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in window/slide
    overlapping windows."""
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), key, "n_events")
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based): per-key sessions closed after `gap` of
    inactivity. Emits (key, session_start epoch, n_events, total_value)."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"), F.round(F.sum(money_cents(F.col("value"))) / 100.0, 4).alias("total_value"))
        .select(
            key,
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )
