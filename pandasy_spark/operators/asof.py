"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (the preferred
path for custom operators): union the two sides tagged by origin, sort
within each key by (time, origin), and carry the most recent right-side
payload forward with ``last(..., ignorenulls=True)`` over a running
window.  One shuffle on the key — the same cost as a regular join —
instead of a per-key nested loop; no range explosion, no UDF.

Semantics: for each left row, attach the right row with the greatest
``right_time <= left_time`` for the same key (backward as-of, inclusive
— the shape of DuckDB's ``ASOF JOIN`` used as the test oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    how: str = "inner",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join.

    Output: all ``left`` columns, plus ``{right_prefix}{right_time}``
    and every other right payload column prefixed the same way.
    ``how``: 'inner' drops left rows with no prior right row; 'left'
    keeps them with NULL payload.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be inner|left, got {how!r}")
    lcols = left.columns
    rpayload = [c for c in right.columns if c not in on and c != right_time]

    # SQL equi-join semantics: NULL keys never match.  Right rows with a
    # NULL key can match nothing; left rows with a NULL key get no match
    # (dropped for 'inner', NULL payload for 'left').
    null_key = F.lit(False)
    for k in on:
        null_key = null_key | F.col(k).isNull()

    # The matched right row travels as ONE struct so a genuine NULL in a
    # payload field stays with its row instead of being back-filled from
    # an older right row by an independent last(..., ignorenulls) per
    # column (ADVICE r1).
    r_struct = F.struct(
        F.col(right_time).alias(right_time),
        *[F.col(c).alias(c) for c in rpayload],
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    tagged_r = right.filter(~null_key).select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.filter(~null_key).select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        *[F.col(c) for c in lcols if c not in on],
    )
    unioned = tagged_r.unionByName(tagged_l)

    # right rows sort before left rows at equal time -> inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__is_left",
        *[F.col(c) for c in lcols if c not in on],
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *on,
        *[F.col(c) for c in lcols if c not in on],
        *[
            F.col("__r")[c].alias(f"{right_prefix}{c}")
            for c in [right_time] + rpayload
        ],
    )
    if how == "left":
        null_left = left.filter(null_key).select(
            *on,
            *[F.col(c) for c in lcols if c not in on],
            *[
                F.lit(None)
                .cast(right.schema[c].dataType)
                .alias(f"{right_prefix}{c}")
                for c in [right_time] + rpayload
            ],
        )
        out = out.unionByName(null_left)
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{right_time}").isNotNull())
    return out
