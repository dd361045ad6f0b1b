"""Parquet table catalog over the driver's testdata layout.

The reference has NO sources/sinks (absence documented at
/root/repo/SURVEY.md §2.7); ingestion there is in-memory frame
construction only.  This module is the Spark-native ingestion surface:
schema-carrying parquet scans with predicate pushdown and column
pruning handled by the DataSource V2 reader.

Scale posture: a scan is declared, never materialized here; filters
and projections applied by callers reach the parquet reader
(``PushedFilters`` / ``ReadSchema`` in ``.explain("formatted")``).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "register_views", "table_path", "ensure_min_partitions"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any scale factor the
# engine targets (region/nation are fixed-size in TPC-H-like schemas).
BROADCAST_TABLES = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet timestamp[ns] (Spark's reader has
    no nanos timestamp type; see load_table)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


# Session-scoped memo of the LAZY scan definition per (sf_dir, table).
# This caches METADATA only — the parquet footer/schema read and the
# file listing that `spark.read.parquet` performs at DataFrame
# construction (~0.1 s per call on this host, paid by every query's
# build) — never rows: the returned frame is an unexecuted scan plan,
# so every action still reads the parquet input in full.  Keyed weakly
# by session (a stopped session's entries are collectable) and by the
# resolved sf_dir, so different scale factors never alias.
_SCAN_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _SCAN_MEMO.get(spark)
    if per_session is None:
        per_session = {}
        _SCAN_MEMO[spark] = per_session
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        df = _load_table_uncached(spark, sf_dir, name)
        per_session[key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — what pyarrow
    # writes for naive timestamps — would read as TIMESTAMP_NTZ under
    # Spark's default inferTimestampNTZ.  The engine's timestamp type is
    # session-tz TIMESTAMP (pinned to UTC, matching the DuckDB oracle's
    # naive reading), so disable the inference; values are identical.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return _ntz_to_timestamp(spark.read.parquet(path))
    # Parquet TIMESTAMP(NANOS) is illegal for Spark's reader; read the
    # raw int64 nanos (legacy conf) and floor-convert to microseconds.
    # Integer DIV, not `/`: int64 nanos exceed double's 53-bit mantissa.
    # DuckDB floors ns->us identically, so oracles agree.
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return _ntz_to_timestamp(df)


def _ntz_to_timestamp(df: DataFrame) -> DataFrame:
    """Defensive normalization for sessions where inferTimestampNTZ was
    already baked into a cached reader: cast any TIMESTAMP_NTZ columns
    to session-tz TIMESTAMP (wall clock preserved; identical micros
    under the engine's pinned UTC session timezone)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast(T.TimestampType()) for c in ntz})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            # load_table, not a raw read: it normalizes ns-timestamp
            # columns (events.parquet) that Spark can't read natively
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Structured-Streaming reader over the same parquet (file-source
    stream).  Schema must be known up front for streaming reads.

    Spark's file stream source requires a *directory*; the testdata
    tables are single files, so a throwaway symlink directory stands in
    (read-only testdata stays untouched)."""
    import tempfile

    import pyspark.sql.functions as F

    path = table_path(sf_dir, name)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema  # pre-conversion schema
    stream_path = path
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix=f"pandasy_stream_{name}_")
        os.symlink(path, os.path.join(d, f"{name}.parquet"))
        stream_path = d
    df = spark.readStream.schema(raw_schema).format("parquet").load(stream_path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a catalog table from parquet FOOTER metadata
    — zero Spark jobs, no data read.  Used to size volume-adaptive
    knobs (e.g. streaming state partitions) without paying a count()
    action; falls back to 0 when the footer is unreadable so callers
    degrade to their defaults."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    try:
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 — sizing hint only, never fatal
        return 0


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Adaptive small-scan parallelizer: repartition ONLY when the
    scan produced fewer partitions than the cluster has cores.

    The pathology this fixes is local/small-file-specific: a table
    that fits one parquet row group yields ONE input split, so an
    expensive narrow pipeline (per-document n-gram stats, regex
    chains) runs on one core while the rest idle.  At real scale the
    same table has thousands of splits and this is a metadata-only
    no-op — `getNumPartitions` launches no job, and no shuffle is
    added unless the input is genuinely under-split.  (Blindly calling
    `repartition` instead would round-trip the full dataset through a
    shuffle — catastrophic at 100 TB; this helper never does that.)

    A bare ``repartition`` is NOT enough: Catalyst pushes
    deterministic filters — including filters over expensive computed
    columns — straight through ``Repartition``, landing the heavy
    expressions back in the single-task scan stage.  The lazy
    ``localCheckpoint`` turns the repartitioned scan into an
    optimization barrier (``LogicalRDD``), so downstream per-row work
    genuinely executes at ``target`` parallelism.  The checkpoint only
    ever caches an under-split (single-row-group-sized) input, and
    only when the helper fires at all.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The `.rdd` probe costs ~0.1 s of plan translation per call; for
    # the memoized catalog scans (load_table) the split count of the
    # unexecuted scan is fixed metadata, so remember it on the frame
    # object and pay the probe once per (session, table).
    parts = getattr(df, "_pandasy_scan_parts", None)
    if parts is None:
        parts = df.rdd.getNumPartitions()
        try:
            df._pandasy_scan_parts = parts
        except AttributeError:  # frames that reject new attributes
            pass
    if parts < target:
        return df.repartition(target).localCheckpoint(eager=False)
    return df
