"""Skew-resistant join via key salting.

AQE's skew-join splitting (on by default in pandasy_spark sessions)
handles most skew at runtime; explicit salting remains the tool when
one key dominates so heavily that even split partitions bottleneck, or
when AQE is unavailable (streaming joins, non-AQE engines).

Technique: add a uniform salt 0..S-1 to each big-side row's key; the
small side is replicated S times (one copy per salt value) so every
(key, salt) pair still matches.  The shuffle then spreads the hot key
over S partitions.  Cost: small side inflated by S — choose S ~ the
hot key's partition-size overshoot, keep the small side small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "adaptive_salted_join"]

_SALT = "__pandasy_salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``salt`` times.  Supports inner/left (big side preserved)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    big_s = big.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, on=on + [_SALT], how=how).drop(_SALT)


def adaptive_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    rows_per_task: int = 1_000_000,
    sample_fraction: float = 0.05,
    max_salt: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Salted join with PER-KEY salt factors sized from a sampled key
    histogram, so only genuinely hot keys pay the replication cost.

    1. Sample the big side and estimate per-key row counts.
    2. Keys whose estimated count exceeds ``rows_per_task`` get a salt
       factor ``ceil(est / rows_per_task)`` (capped at ``max_salt``);
       every other key keeps factor 1 — the small side is NOT inflated
       for the cold 99% of keys, unlike uniform salting.
    3. The hot-key table broadcasts to both sides; the big side draws a
       uniform salt in [0, S_key), the small side explodes one copy per
       salt value, and the join runs on (keys + salt).

    At 100 TB this is the fallback for skew AQE can't fix (e.g. a
    single key larger than every other partition combined, or
    streaming joins where AQE doesn't apply)."""
    if how not in ("inner", "left"):
        raise ValueError("adaptive_salted_join supports inner|left")
    est = (
        big.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    scale = 1.0 / sample_fraction
    hot = est.filter(F.col("__n") * scale > rows_per_task).select(
        *on,
        F.least(
            F.lit(max_salt),
            F.ceil(F.col("__n") * F.lit(scale) / F.lit(rows_per_task)),
        )
        .cast("int")
        .alias("__s"),
    )
    big_s = (
        big.join(F.broadcast(hot), on=on, how="left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(1)))
        .withColumn(_SALT, (F.rand(seed=seed) * F.col("__s")).cast("int"))
        .drop("__s")
    )
    small_s = (
        small.join(F.broadcast(hot), on=on, how="left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(1)))
        .withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.col("__s") - 1)))
        .drop("__s")
    )
    return big_s.join(small_s, on=on + [_SALT], how=how).drop(_SALT)
