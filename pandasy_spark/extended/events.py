"""Batch event-sequence analytics: funnels and retention cohorts.

No counterpart in the reference (its event surface is joins/windows —
SURVEY.md §2.9); these are the product-analytics operators an events
warehouse runs constantly, built as pure declarative join/agg chains
so Catalyst plans them like any other relational query.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "retention_cohorts"]


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time of
    step 0, then the earliest step-1 event STRICTLY AFTER it, and so
    on — the standard "signup → activate → purchase" conversion
    funnel where step k only counts if it happens after step k-1.

    Output: one row per user who completed step 0, with columns
    ``t_0 .. t_{k-1}`` (NULL from the first uncompleted step on) and
    ``steps_completed``.

    Scale shape: one filtered aggregate per step over ONLY that
    step's events (each a small fraction of the corpus, filter pushed
    to the scan) joined on the user key, plus left joins to assemble
    the result — every shuffle is on ``user_col``, so AQE coalesces
    them into one exchange reuse chain; no windows, no state, no
    per-user event lists materialized.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    stages = [cur]
    for i, step in enumerate(steps[1:], start=1):
        prev = stages[-1]
        nxt = (
            df.filter(F.col(type_col) == step)
            .join(prev.select(user_col, f"t_{i-1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t_{i-1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        stages.append(nxt)
    out = stages[0]
    for i in range(1, len(stages)):
        out = out.join(stages[i], user_col, "left")
    completed = F.lit(1)
    for i in range(1, len(steps)):
        completed = completed + F.when(
            F.col(f"t_{i}").isNotNull(), 1
        ).otherwise(0)
    return out.select(
        user_col,
        *[F.col(f"t_{i}") for i in range(len(steps))],
        completed.cast("int").alias("steps_completed"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by their FIRST-active
    period; for each (cohort, period-offset) the number of cohort
    members active in that period.

    Output: (cohort, period_offset, n_users) with period_offset in
    periods since the cohort's start (offset 0 row = cohort size).

    Scale shape: one aggregate for first-activity per user, one
    distinct over (user, period) — both shuffles on the user key — and
    a final count keyed by the (small) cohort grid.  The first-seen
    table joins back broadcast-or-shuffled on ``user_col``; no windows.
    """
    bucket = F.date_trunc(period, F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(bucket).alias("cohort"))
    active = df.select(F.col(user_col), bucket.alias("p")).distinct()
    joined = active.join(first, user_col)
    # integer period offset: weeks are fixed 7-day spans, so the
    # timestamp difference is exact integer weeks
    seconds = F.unix_timestamp("p") - F.unix_timestamp("cohort")
    per_seconds = {"week": 604800, "day": 86400, "hour": 3600}
    if period not in per_seconds:
        raise ValueError(f"unsupported period {period!r}")
    offset = (seconds / per_seconds[period]).cast("long")
    return (
        joined.select(F.col("cohort"), offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "cohort",
            F.col("period_offset").cast("int").alias("period_offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )
