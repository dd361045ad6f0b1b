from .ops import (
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    windowed_agg,
)
from .stateful import streaming_dedup

__all__ = [
    "run_stream_to_memory",
    "session_window_agg",
    "sessionize_batch",
    "streaming_dedup",
    "windowed_agg",
]
