"""Single-pass numeric data profiling (corpus / table QA).

No counterpart in the reference (it has no aggregate library —
/root/repo/SURVEY.md §2.9); this is the standard "know your data"
operator a 100 TB pipeline runs before training: one scan producing
per-column row/null/distinct counts, min/max, and a grid-exact mean.

Scale posture: ONE ``df.agg`` with every statistic as a column
expression — partial aggregation map-side, one shuffle of a single
row.  The only super-linear piece is exact ``COUNT(DISTINCT)`` over
many columns (Spark plans one Expand over the distinct sets, i.e. a
row-multiplier of #cols); at scale pass ``exact_distinct=False`` to
use HyperLogLog (``approx_count_distinct``) which keeps the pass
fully map-combinable.  The long-format result is built by exploding a
literal array of per-column structs — no second scan, no driver loop
over data.

The mean is computed on the decimal grid (``sum(floor(x*p + 0.5)) /
p / count``) so it is summation-order-independent and reproducible in
any engine — the same ``exact_sum`` rationale as workload.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_numeric"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_numeric(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    grid_decimals: int = 2,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile numeric columns in one aggregation pass.

    Output (one row per column): ``col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val, mean_val`` (values as double; mean on
    the ``grid_decimals`` decimal grid for cross-engine determinism).
    """
    if cols is None:
        cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
        ]
    if not cols:
        raise ValueError("no numeric columns to profile")
    for c in cols:
        if not isinstance(df.schema[c].dataType, _NUMERIC):
            raise ValueError(f"column {c!r} is not numeric")

    p = float(10 ** grid_decimals)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            nd.alias(f"{c}__nd"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.sum(F.floor(col * p + F.lit(0.5)).cast("long")).alias(f"{c}__sg"),
        ]
    row = df.agg(*aggs)

    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
                (
                    (F.col(f"{c}__sg") / F.lit(p)) / F.col(f"{c}__nn")
                ).alias("mean_val"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(structs))
