"""Structured Streaming operators over the events stream.

The reference has no streaming — its "periodicity" is a cron re-import
of the full CSV every 15/30 min (app/jobs/scheduler.py:10,
docker-compose.yml:76). The Spark-native upgrade is a real streaming
surface: tumbling/sliding/session windows with watermarks, late-data
handling, and stateful dedup, all runnable in batch mode too (the same
functions power the oracle-checked batch queries and the
Trigger.AvailableNow streaming tests).
"""

from duva_spark.streaming.windows import (
    session_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from duva_spark.streaming.jobs import read_events_stream, run_available_now

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_agg",
    "read_events_stream",
    "run_available_now",
]
