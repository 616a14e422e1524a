"""Structured Streaming surface (SURVEY.md §2.11)."""

from big_data_analysis_spark.streaming.streams import (  # noqa: F401
    enrich_with_dim,
    read_events_stream,
    run_available_now,
    parse_kafka_events,
    read_events_kafka,
    session_event_counts,
    sliding_event_counts,
    streaming_dedup,
    tumbling_binned_counts,
    tumbling_distinct_users,
    tumbling_event_counts,
    write_stream_upsert,
)
