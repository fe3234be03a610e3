from pgdedupe_spark.streaming.kafka import (
    event_payload,
    parse_event_payload,
    read_events_kafka,
    write_events_kafka,
)
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
    "event_payload",
    "hourly_rollup_stream",
    "parse_event_payload",
    "read_events_kafka",
    "read_events_stream",
    "run_to_memory_table",
    "sessionize_stream",
    "stateful_user_counts",
    "write_events_kafka",
]
