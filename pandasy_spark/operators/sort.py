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

__all__ = ["order_by", "limit", "top_k", "stable_row_ids"]


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
