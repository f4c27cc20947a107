"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B9 stream_stateful_custom).

Per-user running profile: event count and latest event time, maintained as
explicit group state across micro-batches. This is the operator class the
built-in window aggs can't express (arbitrary per-key state transitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("last_ts", T.TimestampType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("last_ts_us", T.LongType()),
])


def _update_user_profile(key, pdf_iter, state):
    """State transition: fold each micro-batch's rows into (count, max ts).

    Timestamps are held in state as int64 micros — simple, Arrow-exact.
    """
    import pandas as pd

    if state.exists:
        n, last_us = state.get
    else:
        n, last_us = 0, None
    for pdf in pdf_iter:
        n += len(pdf)
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            us = int(batch_max.value // 1000)
            last_us = us if last_us is None else max(last_us, us)
    state.update((n, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "last_ts": [pd.Timestamp(last_us, unit="us") if last_us is not None else pd.NaT],
    })


def running_user_profile(events: DataFrame) -> DataFrame:
    """Apply the stateful operator (streaming DataFrame in, update-mode
    stream out: one row per user per batch with the running totals)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
