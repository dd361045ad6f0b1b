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

__all__ = ["order_by", "limit", "top_k"]


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
