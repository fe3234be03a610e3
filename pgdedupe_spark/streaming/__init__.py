from pgdedupe_spark.streaming.ops import (
    dedup_stream,
    hourly_rollup_stream,
    read_events_stream,
    run_to_memory_table,
    sessionize_stream,
    stateful_user_counts,
)

__all__ = [
    "dedup_stream",
    "hourly_rollup_stream",
    "read_events_stream",
    "run_to_memory_table",
    "sessionize_stream",
    "stateful_user_counts",
]
