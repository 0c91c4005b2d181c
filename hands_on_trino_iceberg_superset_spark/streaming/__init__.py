from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
    correlate_events,
    read_events_stream,
    run_available_now_to_memory,
    running_user_totals,
    sessionize,
    windowed_event_stats,
)

__all__ = [
    "correlate_events",
    "read_events_stream",
    "run_available_now_to_memory",
    "running_user_totals",
    "sessionize",
    "windowed_event_stats",
]
