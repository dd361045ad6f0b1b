from .ops import (
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    windowed_agg,
)
from .stateful import stateful_sessions, streaming_dedup

__all__ = [
    "run_stream_to_memory",
    "session_window_agg",
    "sessionize_batch",
    "stateful_sessions",
    "streaming_dedup",
    "windowed_agg",
]
