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

__all__ = ["tolerance_join", "interval_join", "allen_relation"]


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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval OVERLAP join (``l.start <= r.end AND r.start <=
    l.end``, inclusive) — the genomics/billing/sessions-vs-outages
    operator Spark would otherwise plan as a nested loop.

    Both sides explode onto a ``bucket_seconds`` grid over the buckets
    their interval SPANS, equi-join on (keys, bucket), and filter the
    exact overlap predicate.  Overlapping pairs share every bucket in
    ``[max(start buckets), min(end buckets)]``; keeping only the
    instance where ``bucket == greatest(start buckets)`` — the first
    shared bucket — emits each pair EXACTLY once with no distinct
    shuffle (the same trick as the tolerance join's single-bucket
    guarantee, generalized to spans).

    Pick ``bucket_seconds`` near the typical interval length: the
    explode fan-out is ``span/bucket + 1`` per row, the join fan-out
    is per-bucket population — both bounded when buckets track the
    data's scale.  Intervals must satisfy start <= end (checked
    in-plan: bad rows would silently vanish otherwise).
    """
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(f"rename right-side columns before joining: {clash}")
    b_us = bucket_seconds * 1_000_000

    def spanned(df, start, end, side):
        s = F.unix_micros(F.col(start))
        e = F.unix_micros(F.col(end))
        guard = F.when(
            s <= e, s
        ).otherwise(
            F.raise_error(
                F.lit(f"interval_join: {side} interval with start > end")
            ).cast("long")
        )
        return df.withColumn(f"__{side}s", guard).withColumn(
            f"__{side}e", e
        ).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"__{side}s DIV {b_us}"),
                    F.expr(f"__{side}e DIV {b_us}"),
                )
            ),
        )

    lb = spanned(left, left_start, left_end, "l")
    rb = spanned(right, right_start, right_end, "r")
    joined = lb.join(rb, on=on + ["__bucket"]).filter(
        (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        & (
            F.col("__bucket")
            == F.greatest(
                F.expr(f"__ls DIV {b_us}"), F.expr(f"__rs DIV {b_us}")
            )
        )
    )
    return joined.drop("__bucket", "__ls", "__le", "__rs", "__re")


def allen_relation(s1, e1, s2, e2):
    """Classify an OVERLAPPING interval pair into its Allen
    interval-algebra relation (Allen 1983) — the temporal-reasoning
    taxonomy (process mining, incident forensics: "did the deploy
    WINDOW contain the outage, or merely overlap it?").  Pure
    column CASE ladder over exact endpoint comparisons, identically
    restatable in any engine.

    Covers the 11 relations a pair surviving the inclusive overlap
    predicate of :func:`interval_join` can exhibit (``before`` /
    ``after`` never reach the classifier).  Assumes non-degenerate
    intervals (start < end); the equality cases are checked first so
    the strict-inequality cases partition the remainder.
    """
    from pyspark.sql import functions as F

    return (
        F.when((s1 == s2) & (e1 == e2), F.lit("equals"))
        .when((s1 == s2) & (e1 < e2), F.lit("starts"))
        .when((s1 == s2) & (e1 > e2), F.lit("started_by"))
        .when((e1 == e2) & (s1 > s2), F.lit("finishes"))
        .when((e1 == e2) & (s1 < s2), F.lit("finished_by"))
        .when(e1 == s2, F.lit("meets"))
        .when(e2 == s1, F.lit("met_by"))
        .when((s1 > s2) & (e1 < e2), F.lit("during"))
        .when((s1 < s2) & (e1 > e2), F.lit("contains"))
        .when((s1 < s2) & (e1 < e2), F.lit("overlaps"))
        .otherwise(F.lit("overlapped_by"))
    )
