from .windows import (
    read_events_stream,
    run_streaming_query,
    streaming_interval_join,
    streaming_session_agg,
    streaming_sliding_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "streaming_tumbling_agg",
    "streaming_sliding_agg",
    "streaming_session_agg",
    "streaming_interval_join",
    "run_streaming_query",
]
