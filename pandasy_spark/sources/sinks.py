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

__all__ = [
    "write_parquet",
    "write_bucketed_table",
    "write_range_sorted",
    "read_back",
    "with_zorder",
    "write_zordered",
    "with_hilbert",
    "write_hilbert",
    "schema_diff",
    "compact_parquet",
    "compaction_plan",
    "read_parquet_merged_schema",
]


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
    entirely; sort_by additionally enables merge-join without sorting.

    Stale-location handling: the default (in-memory) catalog forgets
    managed tables between sessions while their warehouse directories
    persist, so a fresh session's CREATE hits LOCATION_ALREADY_EXISTS.
    When overwriting and the table is absent from the catalog, the
    orphaned location is removed first — the write is the source of
    truth, the leftover directory never is."""
    if mode == "overwrite" and not df.sparkSession.catalog.tableExists(table):
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(
            df.sparkSession.conf.get("spark.sql.warehouse.dir")
        ).path
        if wh:
            import os

            shutil.rmtree(
                os.path.join(wh, table.lower()), ignore_errors=True
            )
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


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    z_col: str = "__z",
) -> DataFrame:
    """Add a Z-order (Morton) key column interleaving the bits of the
    given columns' min-max-normalized ranks.

    Multi-dimensional clustering for scan pruning: sorting by ``z``
    gives every file a tight bounding BOX over all ``cols`` at once,
    so parquet min/max stats prune files for predicates on ANY of the
    dimensions — a plain sort only ever prunes its leading column.
    Normalization bounds come from one tiny aggregate broadcast back
    onto the scan (no collect; the plan stays lazy end-to-end).

    Bit interleave is unrolled into ``2 * bits`` shift/or terms —
    straight-line whole-stage-codegen integer ops, no higher-order
    functions, identically computable in any SQL engine (the gate
    oracle mirrors it term-for-term).
    """
    from pyspark.sql import functions as F

    k = float((1 << bits) - 1)
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__max_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(bounds))
    norms = []
    for i, c in enumerate(cols):
        lo = F.col(f"__min_{i}")
        hi = F.col(f"__max_{i}")
        n = F.when(hi == lo, F.lit(0)).otherwise(
            F.floor((F.col(c).cast("double") - lo) * F.lit(k) / (hi - lo))
        )
        norms.append(n.cast("long"))
    z = F.lit(0).cast("long")
    ndims = len(cols)
    for b in range(bits):
        for i, n in enumerate(norms):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(n, b).bitwiseAND(F.lit(1)), b * ndims + i)
            )
    drop = [f"__min_{i}" for i in range(ndims)] + [f"__max_{i}" for i in range(ndims)]
    return out.withColumn(z_col, z).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: range-partition and sort by
    the Morton key of ``cols``, then drop the key.  Files end up with
    small bounding boxes in EVERY listed dimension, so stats-based
    pruning works for predicates on any of them (verified in
    tests/test_sinks.py against a linear-sort layout)."""
    zdf = with_zorder(df, cols, bits=bits)
    part = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files
        else zdf.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def with_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    h_col: str = "__h",
) -> DataFrame:
    """Add a 2-D Hilbert-curve key column over the two given columns'
    min-max-normalized ``bits``-bit ranks.

    Hilbert beats Z-order (``with_zorder``) on locality: consecutive
    curve positions are always grid neighbors (no Morton "seam" jumps
    across half the space), so equal-size file ranges get strictly
    tighter bounding boxes — better min/max pruning for box predicates
    at the same write cost.  The trade is a slightly costlier key.

    The classic MSB-first construction (Wikipedia ``xy2d``) rotates /
    reflects the quadrant frame as it descends; the accumulated
    transform is always one of FOUR (swap, complement-both — a Klein
    four-group, the two generators commute), so the whole computation
    unrolls into ``bits`` chained projections over a 2-bit state
    column: per level, the raw bit pair is complemented/swapped per
    the state, emits one base-4 digit, and XOR-updates the state.
    Pure integer CASE/XOR/shift ops — whole-stage codegen, no UDF, no
    shuffle (the bounds aggregate broadcasts back onto the scan), and
    identically computable in any SQL engine (the gate oracle mirrors
    it level-for-level).  Exhaustive equivalence to the textbook
    ``xy2d`` is pinned in tests/test_sinks.py.
    """
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("with_hilbert supports exactly 2 dimensions")
    k = float((1 << bits) - 1)
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__max_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(bounds))
    norm_names = []
    for i, c in enumerate(cols):
        lo = F.col(f"__min_{i}")
        hi = F.col(f"__max_{i}")
        n = F.when(hi == lo, F.lit(0)).otherwise(
            F.floor((F.col(c).cast("double") - lo) * F.lit(k) / (hi - lo))
        )
        out = out.withColumn(f"__hn_{i}", n.cast("long"))
        norm_names.append(f"__hn_{i}")
    out = out.withColumn("__hst", F.lit(0).cast("long")).withColumn(
        h_col, F.lit(0).cast("long")
    )
    # branch-free level step (r12): every CASE WHEN of the classic
    # construction is 0/1 integer algebra —
    #   swap-under-s:  rx = tx ^ ((tx^ty)·s),  ry = ty ^ ((tx^ty)·s)
    #   quad digit:    the (0,1,3,2) Gray order is 2·rx + (rx^ry)
    #   state update:  s' = s ^ 1 ^ ry,  c' = c ^ (rx·(1−ry))
    # — same values level-for-level (exhaustive xy2d equivalence pinned
    # in tests/test_sinks.py; the gate oracle unrolls the CASE form and
    # still hash-matches), but the 16-level codegen chain shrinks ~3x
    # and drops every branch (guide §1.2: per-task work, after shape).
    one = F.lit(1).cast("long")
    for b in range(bits - 1, -1, -1):
        xb = F.shiftright(F.col(norm_names[0]), b).bitwiseAND(one)
        yb = F.shiftright(F.col(norm_names[1]), b).bitwiseAND(one)
        c = F.shiftright(F.col("__hst"), 1).bitwiseAND(one)
        s = F.col("__hst").bitwiseAND(one)
        tx = xb.bitwiseXOR(c)
        ty = yb.bitwiseXOR(c)
        swap = tx.bitwiseXOR(ty) * s
        out = out.withColumn("__rx", tx.bitwiseXOR(swap)).withColumn(
            "__ry", ty.bitwiseXOR(swap)
        )
        rx, ry = F.col("__rx"), F.col("__ry")
        digit = rx * 2 + rx.bitwiseXOR(ry)
        s_new = s.bitwiseXOR(one).bitwiseXOR(ry)
        c_new = c.bitwiseXOR(rx * (one - ry))
        out = out.withColumn(
            h_col, F.col(h_col) + digit.cast("long") * F.lit(4**b).cast("long")
        ).withColumn("__hst", (c_new * 2 + s_new).cast("long"))
    drop = (
        [f"__min_{i}" for i in range(2)]
        + [f"__max_{i}" for i in range(2)]
        + norm_names
        + ["__hst", "__rx", "__ry"]
    )
    return out.drop(*drop)


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered parquet layout: range-partition and sort by
    the Hilbert key of ``cols``, then drop the key — ``write_zordered``
    with the better-locality curve (see ``with_hilbert``)."""
    hdf = with_hilbert(df, cols, bits=bits)
    part = (
        hdf.repartitionByRange(num_files, "__h")
        if num_files
        else hdf.repartitionByRange("__h")
    )
    part.sortWithinPartitions("__h").drop("__h").write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` each, optionally re-sorted.

    The 100 TB housekeeping operator: streaming sinks and incremental
    appends accumulate thousands of small files, and scan throughput
    dies on open/footer overhead long before bytes matter (a million
    4 MB files is metadata death; the same table in 128 MB files scans
    at disk speed).  File count comes from the directory's actual byte
    size — no driver-side data movement, one distributed rewrite.

    Swap discipline: write to a temp sibling, rename the source aside,
    rename the temp into place, then delete the old copy — at every
    crash point a complete copy of the table exists on disk (worst
    case, parked at ``<path>__compact_old``; a follow-up run or a
    manual rename recovers it).  Rename-based swapping assumes a
    local/POSIX filesystem, as does the ``os.walk`` sizing pass; on
    object stores (S3/GCS), compaction belongs to a table format
    (Delta/Iceberg rewrite actions) where the swap is a metadata
    commit.  Returns the new file count.
    """
    import math
    import os
    import shutil

    total_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if sort_cols:
        part = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        part = df.repartition(n_files)
    part.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def read_parquet_merged_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under EVOLVING schemas as one frame:
    ``mergeSchema`` unions the footers' schemas; columns absent in a
    file read as NULL.  The standard posture for long-lived 100 TB
    tables where new columns appear over time without rewriting
    history (schema merging is off by default in Spark because footer
    merging costs a pass over file metadata — turn it on per read, not
    globally)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def schema_diff(spark: SparkSession, path_a: str, path_b: str) -> list[dict]:
    """Schema-drift report between two parquet datasets — the check a
    long-lived pipeline runs before a mergeSchema read or a snapshot
    promotion: columns added, removed, or type-changed from A to B.

    Footer metadata only (two `spark.read` schema resolutions — no
    data scan, so the cost is file listing however large the data).
    Returns a list of dicts ``{"column", "change", "from", "to"}``
    with change ∈ {added, removed, type_changed}; empty means the
    schemas agree.  Nested struct fields are compared by their full
    dotted path."""

    def flat(schema, prefix=""):
        out = {}
        for f in schema.fields:
            name = f"{prefix}{f.name}"
            dt = f.dataType
            if dt.typeName() == "struct":
                out.update(flat(dt, prefix=f"{name}."))
            else:
                out[name] = dt.simpleString()
        return out

    a = flat(spark.read.parquet(path_a).schema)
    b = flat(spark.read.parquet(path_b).schema)
    diff: list[dict] = []
    for col in sorted(set(a) | set(b)):
        if col not in b:
            diff.append(
                {"column": col, "change": "removed", "from": a[col], "to": None}
            )
        elif col not in a:
            diff.append(
                {"column": col, "change": "added", "from": None, "to": b[col]}
            )
        elif a[col] != b[col]:
            diff.append(
                {
                    "column": col,
                    "change": "type_changed",
                    "from": a[col],
                    "to": b[col],
                }
            )
    return diff


def compaction_plan(
    df: DataFrame,
    partition_cols: Sequence[str],
    row_bytes: Column,
    target_file_bytes: int,
) -> DataFrame:
    """Distributed small-file compaction PLANNER — the survey
    :func:`compact_parquet` executes on one directory, computed
    instead from the table's own rows across every hive partition:
    how many files each partition SHOULD hold at
    ``target_file_bytes``, and which partitions are coalesce
    candidates (under half a target file).  A 100 TB lakehouse runs
    this plan nightly and feeds only the offending partitions to the
    rewriter — sizing from data stats, not from a filesystem walk,
    so it works the same over object stores.

    ONE map-combined aggregate per partition key (n_rows +
    estimated bytes via the caller's ``row_bytes`` expression —
    serialized-width estimate, deterministic integer per row); the
    close is pure int64 ceiling division
    (``(b + t - 1 - ((b + t - 1) % t)) / t``), engine-portable.

    Output: one row per partition —
    ``(partition_cols..., n_rows, est_bytes, n_files,
    rows_per_file, coalesce_candidate)``.
    """
    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be >= 1")
    from pyspark.sql import functions as F

    per = df.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(row_bytes.cast("long")).cast("long").alias("est_bytes"),
    )

    def _ceil_div(a, b):
        num = a + b - F.lit(1)
        return ((num - num % b) / b).cast("long")

    t = F.lit(int(target_file_bytes)).cast("long")
    # a non-empty partition always needs >= 1 file, even when the
    # byte estimate is 0 (or NULL): without the floor, rows_per_file
    # would divide by 0 — a runtime error under the driver-default
    # ANSI mode (round-11 session-2 review finding)
    n_files = F.greatest(
        _ceil_div(F.coalesce(F.col("est_bytes"), F.lit(0)), t),
        F.lit(1),
    )
    planned = per.select(
        *partition_cols,
        "n_rows",
        "est_bytes",
        n_files.alias("n_files"),
    )
    return planned.select(
        *partition_cols,
        "n_rows",
        "est_bytes",
        "n_files",
        _ceil_div(F.col("n_rows"), F.col("n_files"))
        .alias("rows_per_file"),
        (F.col("est_bytes") * 2 < t).alias("coalesce_candidate"),
    )
