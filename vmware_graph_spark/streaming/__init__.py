from vmware_graph_spark.streaming.events import (
    dedup_within_watermark,
    interval_join_stream,
    read_event_stream,
    run_available_to_memory,
    sessionize_stream,
    stream_merge_into,
    windowed_event_counts,
)

__all__ = [
    "read_event_stream",
    "windowed_event_counts",
    "dedup_within_watermark",
    "interval_join_stream",
    "sessionize_stream",
    "stream_merge_into",
    "run_available_to_memory",
]
