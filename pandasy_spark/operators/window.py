"""Window functions (Spark-native extension surface).

Absent from the reference (/root/repo/SURVEY.md §2.9 — reachable there
only via user code in ``sql_groupby_apply``); first-class here via
``pyspark.sql.window.Window``: ranking, analytic (lag/lead), and framed
running aggregates.

Scale notes: a window spec with ``partitionBy`` shuffles once on the
partition keys and sorts within partitions; an UNBOUNDED frame over an
un-partitioned window is a single-task bottleneck and is rejected
unless explicitly allowed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from ..exceptions import InvalidOperationError

__all__ = ["window_spec", "with_ranking", "with_lag_lead", "with_running"]


def window_spec(
    partition_by: Sequence[str | Column] = (),
    order_by: Sequence[str | Column] = (),
    rows_between: tuple[int, int] | None = None,
    range_between: tuple[int, int] | None = None,
    allow_unpartitioned: bool = False,
) -> WindowSpec:
    if not partition_by and not allow_unpartitioned:
        raise InvalidOperationError(
            "un-partitioned window collapses to one task; pass "
            "allow_unpartitioned=True if that is intended"
        )
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    if order_by:
        w = w.orderBy(*order_by)
    if rows_between is not None:
        w = w.rowsBetween(*rows_between)
    if range_between is not None:
        w = w.rangeBetween(*range_between)
    return w


def with_ranking(
    df: DataFrame,
    spec: WindowSpec,
    row_number: str | None = None,
    rank: str | None = None,
    dense_rank: str | None = None,
    ntile: tuple[str, int] | None = None,
    percent_rank: str | None = None,
) -> DataFrame:
    cols = list(df.columns)
    out = df
    if row_number:
        out = out.withColumn(row_number, F.row_number().over(spec))
    if rank:
        out = out.withColumn(rank, F.rank().over(spec))
    if dense_rank:
        out = out.withColumn(dense_rank, F.dense_rank().over(spec))
    if ntile:
        name, n = ntile
        out = out.withColumn(name, F.ntile(n).over(spec))
    if percent_rank:
        out = out.withColumn(percent_rank, F.percent_rank().over(spec))
    assert out.columns[: len(cols)] == cols
    return out


def with_lag_lead(
    df: DataFrame,
    spec: WindowSpec,
    col: str | Column,
    lag: tuple[str, int] | None = None,
    lead: tuple[str, int] | None = None,
) -> DataFrame:
    out = df
    if lag:
        name, n = lag
        out = out.withColumn(name, F.lag(col, n).over(spec))
    if lead:
        name, n = lead
        out = out.withColumn(name, F.lead(col, n).over(spec))
    return out


def with_running(
    df: DataFrame, spec: WindowSpec, aggs: dict[str, Column]
) -> DataFrame:
    """Framed running aggregates, e.g.
    ``with_running(df, spec, {"run_sum": F.sum("x")})``."""
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(spec))
    return out
