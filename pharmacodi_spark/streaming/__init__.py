from pharmacodi_spark.streaming.ops import (
    read_event_stream,
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    dedup_within_watermark,
)

__all__ = [
    "read_event_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
]
