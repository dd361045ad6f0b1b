"""Sort / limit / global top-k operators.

The reference has NO sort or limit operators (row order is explicitly
outside its model — /root/repo/SURVEY.md §2.9); these are the
Spark-native extension surface.

Scale note: ``top_k`` composes orderBy+limit so Catalyst plans
``TakeOrderedAndProject`` — per-partition heaps + a single driver-side
merge of k rows, never a full sort/shuffle of the input.  ``order_by``
alone is a range-partitioned total sort (sampling + shuffle) — only
ask for it when the full ordered output is genuinely needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "order_by",
    "limit",
    "top_k",
    "stable_row_ids",
    "ordered_prefix_scan",
    "skyline_2d",
]


def _sort_cols(
    cols: Sequence[str | Column], ascending: Sequence[bool] | bool = True
) -> list[Column]:
    if isinstance(ascending, bool):
        ascending = [ascending] * len(cols)
    out = []
    for c, asc in zip(cols, ascending):
        col = F.col(c) if isinstance(c, str) else c
        out.append(col.asc() if asc else col.desc())
    return out


def order_by(
    df: DataFrame,
    cols: Sequence[str | Column],
    ascending: Sequence[bool] | bool = True,
) -> DataFrame:
    return df.orderBy(*_sort_cols(cols, ascending))


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def top_k(
    df: DataFrame,
    cols: Sequence[str | Column],
    k: int,
    ascending: Sequence[bool] | bool = False,
) -> DataFrame:
    """Global top-k: planned as TakeOrderedAndProject (no total sort).
    Pass a deterministic tiebreaker column for stable results."""
    return df.orderBy(*_sort_cols(cols, ascending)).limit(k)


def stable_row_ids(
    df: DataFrame,
    order_by: Sequence[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense sequential ids ``0..n-1`` in the total order of
    ``order_by`` WITHOUT a global single-partition sort — the
    scale-safe replacement for ``row_number() OVER (ORDER BY ...)``
    (which moves the entire table through ONE task) and for
    ``monotonically_increasing_id`` (which is neither dense nor
    order-aligned).

    The distributed prefix-sum pattern (same as pack_chunks,
    extended/sampling.py): range-repartition on the order key so
    partition p holds a contiguous key range; sort WITHIN partitions;
    ``localCheckpoint`` pins the partitioning so the count pass and
    the id pass see the SAME layout (two separate range exchanges
    could sample different boundaries); decompose
    ``monotonically_increasing_id`` — by contract
    ``pid * 2^33 + position-in-partition`` — into (partition, local
    position); count rows per partition; turn counts into starting
    offsets with ONE window over the #partitions-row count table
    (bounded by cluster width, never by data); broadcast-join the
    offsets back.  ONE full-data shuffle (the range exchange), ONE
    partition-local sort, zero data-path windows.

    Ids are exact global ranks (0-based).  With a unique key the
    assignment is fully deterministic regardless of where the range
    sampler places partition boundaries; duplicate keys receive the
    duplicate block's ids in arbitrary order within the block (same
    contract as row_number over a non-unique order).
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    d = (
        df.repartitionByRange(int(n), *[F.col(c) for c in order_by])
        .sortWithinPartitions(*[F.col(c) for c in order_by])
        .localCheckpoint(eager=False)
    )
    mid = F.monotonically_increasing_id()
    d = d.select(
        "*",
        F.shiftrightunsigned(mid, 33).cast("int").alias("__pid"),
        (mid % F.lit(1 << 33)).cast("long").alias("__local"),
    )
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col, (F.col("__off") + F.col("__local")).cast("long")
        )
        .drop("__pid", "__off", "__local")
    )


def ordered_prefix_scan(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str | Sequence[str],
    agg: str = "sum",
    out_col: str | Sequence[str] = "scan",
    strict: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed prefix scan (running ``sum``/``min``/``max`` in the
    total order of ``order_by``) WITHOUT a global single-partition
    window — the generalization of :func:`stable_row_ids` to
    order-dependent accumulation (sweep-line interval counting,
    skyline prefix minima, cumulative distributions).

    Two-level decomposition: range-repartition on the order key (so
    partition p holds a contiguous key range), run the scan WITHIN
    each partition (a window partitioned by the physical partition id
    — every partition's rows stay together, nothing global), aggregate
    one summary row per partition, turn the ≤ #partitions summaries
    into strict-prefix carry-ins with one bounded window, and
    broadcast the carry-ins back.  No stage ever sees more than one
    partition's rows in one task.

    The shuffled layout is checkpointed because it MUST be: the
    scan's three consumers (within-window, per-partition totals,
    carry join) all key on the physical partition id, and
    ``RangePartitioner`` seeds its boundary sampler with the RDD id
    (``byteswap32(idx ^ (rdd.id << 16))``), so two executions of the
    same range exchange draw DIFFERENT samples and can place the same
    key in different partitions — without the pin, the totals branch
    and the window branch can disagree on boundaries and the carry-ins
    silently misalign (reproduced at ≥ ~10k distinct keys, where the
    per-partition reservoir no longer holds every row; plan-level
    exchange reuse sometimes dedupes the branches, but is an optimizer
    heuristic, not a guarantee).

    ``strict=True`` excludes the current row (the value BEFORE this
    row in the total order — NULL/identity for the first row:
    0 for sum, NULL for min/max).  Rows with equal ``order_by`` keys
    are ordered arbitrarily among themselves (same contract as a SQL
    running aggregate over a non-unique key); pass a unique tiebreaker
    in ``order_by`` for full determinism.

    ``value_col`` / ``out_col`` may be parallel LISTS — every listed
    column is scanned in the SAME pass (one range exchange, one
    within-partition window, one carry broadcast), which is how a
    multi-series CDF (e.g. the two-sample KS ECDF numerators) stays at
    single-scan cost.

    The INPUT is pinned (lazy ``localCheckpoint``) before the range
    exchange: ``repartitionByRange``'s boundary sampler executes its
    child plan a FIRST time just to sketch ranges, so without the pin
    the entire upstream (scans, joins, aggregates feeding the scan)
    runs twice (r8 bench: ~2x on the no-group quantile gates whose
    upstream re-scans the fact table).  Call sites feed this operator
    pre-aggregated frames (distinct-value grids, refine slivers,
    per-partition summaries), so materializing the input once is far
    cheaper than recomputing its lineage — pass the raw table through
    an aggregate first if you are about to scan 100 TB directly.
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    if agg not in ("sum", "min", "max"):
        raise ValueError("agg must be one of sum/min/max")
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("value_col and out_col lists must be equal length")
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    pinned = df.localCheckpoint(eager=False)
    d = (
        pinned.repartitionByRange(int(n), *[F.col(c) for c in order_by])
        .localCheckpoint(eager=False)
    )
    mid = F.monotonically_increasing_id()
    d = d.select(
        "*",
        F.shiftrightunsigned(mid, 33).cast("int").alias("__pid"),
        (mid % F.lit(1 << 33)).cast("long").alias("__local"),
    )
    fn = {"sum": F.sum, "min": F.min, "max": F.max}[agg]
    end = -1 if strict else 0
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_by], F.col("__local"))
        .rowsBetween(Window.unboundedPreceding, end)
    )
    d = d.select(
        "*",
        *[
            fn(F.col(v)).over(w_in).alias(f"__within_{i}")
            for i, v in enumerate(value_cols)
        ],
    )
    totals = d.groupBy("__pid").agg(
        *[fn(F.col(v)).alias(f"__tot_{i}") for i, v in enumerate(value_cols)]
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = totals.select(
        "__pid",
        *[
            fn(F.col(f"__tot_{i}")).over(w_off).alias(f"__carry_{i}")
            for i in range(len(value_cols))
        ],
    )
    d = d.join(F.broadcast(carry), "__pid")
    for i, out in enumerate(out_cols):
        wi, ca = F.col(f"__within_{i}"), F.col(f"__carry_{i}")
        if agg == "sum":
            combined = F.coalesce(ca, F.lit(0)) + F.coalesce(wi, F.lit(0))
            # strict first row of the whole frame: 0 (sum identity)
        else:
            cmb = F.least if agg == "min" else F.greatest
            combined = cmb(F.coalesce(ca, wi), F.coalesce(wi, ca))
        d = d.withColumn(out, combined)
    return d.drop(
        "__pid",
        "__local",
        *[f"__within_{i}" for i in range(len(value_cols))],
        *[f"__carry_{i}" for i in range(len(value_cols))],
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    count_col: str = "n_points",
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline), both dimensions MINIMIZED:
    the points no other point beats on both axes (strictly on at least
    one) — "cheapest for its size" style queries.

    Fully distributed: one groupBy collapses duplicates of ``x`` to
    the per-``x`` minimum ``y`` (a dominated row can never have
    y > its own x-group's min), then :func:`ordered_prefix_scan`
    computes the STRICT prefix minimum of y over x-ascending order —
    a point survives iff its y is strictly below every smaller-x
    point's y.  No global sort, no quadratic dominance join; the
    oracle states the NOT EXISTS definition directly.

    Output: ``(x_col, y_col, count_col)`` — frontier points with the
    number of input rows at that exact (x, y).
    """
    per_x = df.groupBy(x_col).agg(
        F.min(F.col(y_col)).alias(y_col),
        F.count(F.lit(1)).cast("long").alias("__nx"),
    )
    scanned = ordered_prefix_scan(
        per_x, [x_col], y_col, agg="min", out_col="__pm", strict=True
    )
    frontier = scanned.filter(
        F.col("__pm").isNull() | (F.col(y_col) < F.col("__pm"))
    ).select(x_col, y_col)
    # recover the multiplicity of rows AT the frontier point (the
    # x-group count includes dominated same-x rows, so re-count); the
    # frontier is usually tiny but CAN be O(distinct x) — leave the
    # join strategy to AQE rather than forcing a broadcast
    return (
        df.join(frontier, [x_col, y_col])
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
    )
