from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
    correlate_events,
    dedup_event_stream,
    document_quality_stats,
    read_documents_stream,
    read_events_stream,
    run_available_now_to_memory,
    running_user_totals,
    sessionize,
    stream_merge_into,
    windowed_event_stats,
    write_parquet_sink,
)

__all__ = [
    "correlate_events",
    "dedup_event_stream",
    "document_quality_stats",
    "read_documents_stream",
    "read_events_stream",
    "run_available_now_to_memory",
    "running_user_totals",
    "sessionize",
    "stream_merge_into",
    "windowed_event_stats",
    "write_parquet_sink",
]
