"""Tolerance (band / interval) join — another operator Spark lacks.

``tolerance_join`` pairs rows of two keyed, timestamped frames whose
timestamps are within ±tolerance of each other.  A naive theta-join
(`abs(l.ts - r.ts) <= tol`) is a broadcast-nested-loop in Spark —
O(|L|·|R|) per key.  Instead, timestamps are bucketed to a
tolerance-sized grid and each left row probes its own bucket and both
neighbors (any in-tolerance pair differs by at most one bucket), so
the physical plan is an ordinary equi-join on (key, bucket) — hash
shuffle, AQE-optimizable — followed by an exact filter.

Bucket arithmetic is integer microseconds (``unix_micros`` + ``DIV``),
exact for any timestamp range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tolerance_join"]


def tolerance_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    tolerance_seconds: int,
) -> DataFrame:
    """Inner join on ``on`` with ``|left_time - right_time| <=
    tolerance_seconds``.  Right columns keep their names; callers
    should pre-rename collisions (checked)."""
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(f"rename right-side columns before joining: {clash}")
    tol_us = tolerance_seconds * 1_000_000

    lb = left.withColumn("__lus", F.unix_micros(F.col(left_time)))
    rb = right.withColumn("__rus", F.unix_micros(F.col(right_time))).withColumn(
        "__bucket", F.expr(f"__rus DIV {tol_us}")
    )
    # left probes bucket-1, bucket, bucket+1
    lb = lb.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.expr(f"__lus DIV {tol_us} - 1"),
                F.expr(f"__lus DIV {tol_us}"),
                F.expr(f"__lus DIV {tol_us} + 1"),
            )
        ),
    )
    joined = lb.join(rb, on=on + ["__bucket"]).filter(
        F.abs(F.col("__lus") - F.col("__rus")) <= tol_us
    )
    # a pair can match in at most one of the probed buckets (the
    # right row's own bucket), so no dedup is needed
    return joined.drop("__bucket", "__lus", "__rus")
