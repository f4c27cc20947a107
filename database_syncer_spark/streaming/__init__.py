from database_syncer_spark.streaming.queries import (
    tumbling_agg,
    sliding_agg,
    session_window_agg,
    watermarked_tumbling,
    stream_distinct,
)
from database_syncer_spark.streaming.runner import (
    stage_as_stream_source,
    run_stream_to_memory,
    incremental_sync_foreachbatch,
)

__all__ = [
    "tumbling_agg", "sliding_agg", "session_window_agg",
    "watermarked_tumbling", "stream_distinct",
    "stage_as_stream_source", "run_stream_to_memory",
    "incremental_sync_foreachbatch",
]
