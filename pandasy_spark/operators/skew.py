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

__all__ = ["salted_join"]

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
