from .ops import (
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    windowed_agg,
)

__all__ = [
    "run_stream_to_memory",
    "session_window_agg",
    "sessionize_batch",
    "windowed_agg",
]
