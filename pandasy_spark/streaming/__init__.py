from .ops import (
    foreach_batch,
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    staged_file_stream,
    stream_stream_tolerance_join,
    stream_table,
    streaming_bloom_decontaminate,
    streaming_dedup_against_index,
    windowed_agg,
)
from .state import rocksdb_state_conf, use_rocksdb_state
from .stateful import (
    stateful_pattern_match,
    stateful_rate_limit,
    stateful_sessions,
    streaming_dedup,
)

__all__ = [
    "rocksdb_state_conf",
    "use_rocksdb_state",
    "foreach_batch",
    "run_stream_to_memory",
    "stream_table",
    "stream_stream_tolerance_join",
    "streaming_bloom_decontaminate",
    "streaming_dedup_against_index",
    "session_window_agg",
    "sessionize_batch",
    "staged_file_stream",
    "stateful_pattern_match",
    "stateful_rate_limit",
    "stateful_sessions",
    "streaming_dedup",
    "windowed_agg",
]
