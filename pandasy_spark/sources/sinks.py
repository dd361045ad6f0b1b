"""Parquet sinks: plain, partitioned, and bucketed writes.

The reference has no sinks at all (/root/repo/SURVEY.md §2.7).  These
are the Spark-native output surface with the two layout tools that
matter at 100 TB:

- **partitionBy**: directory partitioning for partition pruning on
  read (low-cardinality columns only — every value is a directory).
- **bucketBy**: pre-shuffled, co-located layout; two tables bucketed
  on the same key join with NO exchange on either side (verified in
  tests/test_sinks.py via the physical plan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_parquet", "write_bucketed_table", "write_range_sorted", "read_back"]


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    compression: str = "snappy",
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (session catalog).  Joins
    between tables bucketed on the same keys/count skip the shuffle
    entirely; sort_by additionally enables merge-join without sorting."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def read_back(spark: SparkSession, path_or_table: str) -> DataFrame:
    if "/" in path_or_table:
        return spark.read.parquet(path_or_table)
    return spark.table(path_or_table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet layout.

    ``repartitionByRange`` assigns disjoint sort-key ranges to files
    and ``sortWithinPartitions`` orders rows inside each file, so the
    parquet min/max statistics become tight and NON-OVERLAPPING across
    files: a point or range predicate on the sort column then prunes
    whole files / row groups at scan time.  This is the standard layout
    for time-series data at 100 TB — a day's query touches a day's
    files, not the whole table (verified in tests/test_sinks.py by
    checking per-file footer min/max disjointness)."""
    part = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
