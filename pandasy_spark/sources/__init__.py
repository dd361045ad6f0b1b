from .formats import read_csv, read_jsonl, write_csv, write_jsonl
from .sinks import (
    compact_parquet,
    read_back,
    read_parquet_merged_schema,
    with_zorder,
    write_bucketed_table,
    write_parquet,
    write_range_sorted,
    write_zordered,
)
from .catalog import (
    BROADCAST_TABLES,
    TABLES,
    ensure_min_partitions,
    load_table,
    read_stream_table,
    register_views,
    table_path,
)

__all__ = [
    "BROADCAST_TABLES",
    "TABLES",
    "ensure_min_partitions",
    "load_table",
    "read_stream_table",
    "register_views",
    "table_path",
    "read_back",
    "read_csv",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
    "write_bucketed_table",
    "write_parquet",
    "write_range_sorted",
    "compact_parquet",
    "read_parquet_merged_schema",
    "with_zorder",
    "write_zordered",
]
