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
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with the pandas ``merge_asof`` surface.

    ``direction``: 'backward' (greatest right_time <= left_time, the
    default and DuckDB's ASOF JOIN shape), 'forward' (smallest
    right_time >= left_time), or 'nearest' (whichever is closer; ties
    go backward, as in pandas).  ``tolerance`` invalidates matches
    farther than the given distance — SECONDS for timestamp time
    columns, same-unit for numerics.

    Output: all ``left`` columns, plus ``{right_prefix}{right_time}``
    and every other right payload column prefixed the same way.
    ``how``: 'inner' drops left rows with no match; 'left' keeps them
    with NULL payload.

    Scale shape is unchanged: one shuffle on the key; 'nearest' adds a
    second sort (opposite tie order) inside the same exchange, never a
    second shuffle.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join direction must be backward|forward|nearest, got {direction!r}"
        )
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

    # backward: right rows sort BEFORE left rows at equal time so the
    # running last() includes them -> inclusive <=.  forward mirrors:
    # right rows sort AFTER left rows and a following-first() includes
    # the equal-time right -> inclusive >=.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carry_cols = []
    if direction in ("backward", "nearest"):
        carry_cols.append(
            F.last(F.col("__r"), ignorenulls=True).over(w_back).alias("__rb")
        )
    if direction in ("forward", "nearest"):
        carry_cols.append(
            F.first(F.col("__r"), ignorenulls=True).over(w_fwd).alias("__rf")
        )
    carried = unioned.select(
        *on,
        "__is_left",
        F.col("__t"),
        *[F.col(c) for c in lcols if c not in on],
        *carry_cols,
    )

    # distance between the left row and a candidate struct, in seconds
    # for timestamps / native units for numerics
    is_ts = str(left.schema[left_time].dataType).startswith("Timestamp")

    def dist(r):
        rt = r[right_time]
        if is_ts:
            return F.abs(
                F.unix_micros(F.col("__t")) - F.unix_micros(rt)
            ) / F.lit(1_000_000.0)
        return F.abs(F.col("__t").cast("double") - rt.cast("double"))

    def within(r):
        if tolerance is None:
            return r.isNotNull()
        return r.isNotNull() & (dist(r) <= F.lit(float(tolerance)))

    if direction == "backward":
        chosen = F.when(within(F.col("__rb")), F.col("__rb"))
    elif direction == "forward":
        chosen = F.when(within(F.col("__rf")), F.col("__rf"))
    else:  # nearest: closer wins, ties go backward (pandas semantics)
        b, f = F.col("__rb"), F.col("__rf")
        ok_b, ok_f = within(b), within(f)
        chosen = (
            F.when(ok_b & ok_f, F.when(dist(f) < dist(b), f).otherwise(b))
            .when(ok_b, b)
            .when(ok_f, f)
        )
    carried = carried.withColumn("__r", chosen)
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
