"""Relational operators: filter, joins, set ops, distinct.

Parity targets in /root/reference/slide/utils.py: ``filter_df``
(:318-335), ``parse_join_type`` (:33-61), ``join`` (:882-958),
``union`` (:828-840), ``intersect`` (:842-854), ``except_df``
(:856-880), ``drop_duplicates`` (:818-826).

The reference hand-rolls SQL NULL-key join semantics on top of pandas
merge (dropna keys, indicator columns).  Spark equi-joins already never
match NULL keys and USING-style list joins coalesce key columns, so the
join bodies collapse to one-liners; the residual custom logic is only
(a) truthy filter conditions, (b) positional set-op alignment, and
(c) null-safe-equality semi/anti joins for the ``unique=False``
intersect/except forms (/root/repo/SURVEY.md §4.3-6/7).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import InvalidOperationError
from ..functions.kernels import safe_bool

__all__ = [
    "parse_join_type",
    "filter_df",
    "join",
    "union",
    "intersect",
    "except_df",
    "drop_duplicates",
]

_JOIN_ALIASES = {
    # canonical names + aliases, parity with parse_join_type
    # (/root/reference/slide/utils.py:33-61, tested at
    # /root/reference/tests/slide/test_utils.py:6-24)
    "inner": "inner",
    "join": "inner",
    "cross": "cross",
    "semi": "left_semi",
    "leftsemi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "leftanti": "left_anti",
    "left_anti": "left_anti",
    "left": "left_outer",
    "leftouter": "left_outer",
    "left_outer": "left_outer",
    "right": "right_outer",
    "rightouter": "right_outer",
    "right_outer": "right_outer",
    "outer": "full_outer",
    "full": "full_outer",
    "fullouter": "full_outer",
    "full_outer": "full_outer",
}

# our canonical -> Spark how=
_SPARK_HOW = {
    "inner": "inner",
    "left_semi": "semi",
    "left_anti": "anti",
    "left_outer": "left",
    "right_outer": "right",
    "full_outer": "full",
    "cross": "cross",
}


def parse_join_type(join_type: str) -> str:
    jt = join_type.replace(" ", "").replace("_", "").lower()
    jt = _JOIN_ALIASES.get(jt)
    if jt is None:
        raise NotImplementedError(f"join type {join_type!r} not supported")
    return jt


def filter_df(df: DataFrame, cond: Any) -> DataFrame:
    """``WHERE cond`` where cond may be a boolean/numeric Column or a
    Python constant; NULL/NaN conditions drop the row.

    Reference: /root/reference/slide/utils.py:318-335 (constant paths),
    oracle /root/reference/slide_test/suite.py:355-389 (float cond
    columns with NaN).
    """
    if not isinstance(cond, Column):
        return df if cond else df.limit(0)
    # A boolean condition must stay bare so Catalyst recognizes it for
    # parquet predicate pushdown — the truthiness/NaN wrapper is a CASE
    # WHEN expression that would otherwise block PushedFilters.  When
    # the condition is a SIMPLE column reference, the already-analyzed
    # `df.schema` answers the boolean-vs-truthy question with zero
    # driver round-trips and no exception control flow.
    ref = str(cond)
    if ref.startswith("Column<'") and ref.endswith("'>"):
        name = ref[8:-2]
        if df.columns.count(name) == 1:
            from pyspark.sql.types import BooleanType

            if isinstance(df.schema[name].dataType, BooleanType):
                return df.filter(cond)
            return df.filter(safe_bool(cond))
    return _filter_with_analysis_fallback(df, cond)


def _filter_with_analysis_fallback(df: DataFrame, cond: Column) -> DataFrame:
    """Complex-expression path of ``filter_df``: rather than a per-call
    ``df.select(cond).schema`` analysis round-trip (driver overhead on
    thousand-operator pipelines — VERDICT r1), try the bare filter:
    ``.filter`` analyzes eagerly anyway, so the boolean hot path costs
    nothing extra, and a non-boolean condition fails analysis
    deterministically (FILTER_NOT_BOOLEAN) and takes the truthiness
    wrapper."""
    from pyspark.errors import AnalysisException

    try:
        return df.filter(cond)
    except AnalysisException:
        return df.filter(safe_bool(cond))


def join(
    df1: DataFrame,
    df2: DataFrame,
    join_type: str,
    on: list[str] | None = None,
) -> DataFrame:
    """Equi-join by column-name list (USING semantics: key columns are
    merged/coalesced).  All seven reference join types.

    NULL keys never match (SQL semantics) — Spark equi-join natively;
    the full-outer USING join coalesces key columns exactly like the
    reference's indicator construction
    (/root/reference/slide/utils.py:931-946).

    At scale: Catalyst picks broadcast vs sort-merge via AQE; callers
    can wrap a small side in ``pyspark.sql.functions.broadcast``.
    """
    jt = parse_join_type(join_type)
    on = list(on or [])
    if jt == "cross":
        if len(on) > 0:
            raise InvalidOperationError("cross join must not have join keys")
        return df1.crossJoin(df2)
    if len(on) == 0:
        raise InvalidOperationError(f"{jt} join requires join keys")
    return df1.join(df2, on=on, how=_SPARK_HOW[jt])


def _align_positionally(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Set ops align by POSITION: df2's columns are renamed to df1's
    (reference ``_preprocess_set_op``,
    /root/reference/slide/utils.py:976-988)."""
    if len(df1.columns) != len(df2.columns):
        raise InvalidOperationError(
            "set operations require the same number of columns"
        )
    return df2.toDF(*df1.columns)


def union(df1: DataFrame, df2: DataFrame, unique: bool = False) -> DataFrame:
    """``UNION ALL`` (unique=False) / ``UNION`` (unique=True), positional.

    Oracle: /root/reference/slide_test/suite.py:2196-2268."""
    res = df1.union(_align_positionally(df1, df2))
    return res.distinct() if unique else res


def _null_safe_cond(df1: DataFrame, df2: DataFrame, cols: list[str]) -> Column:
    """``<=>`` conjunction over all columns: NULLs compare equal, the
    matching behavior of pandas merge on NULL keys that the
    unique=False set-op tests rely on
    (/root/reference/slide_test/suite.py:2279-2283,2335-2341)."""
    return reduce(
        lambda a, b: a & b, [df1[c].eqNullSafe(df2[c]) for c in cols]
    )


def intersect(df1: DataFrame, df2: DataFrame, unique: bool = True) -> DataFrame:
    """``INTERSECT`` (unique=True).  unique=False keeps df1's duplicate
    rows that match distinct df2 — i.e. LEFT SEMI semantics, NOT
    INTERSECT ALL (reference docstring and tests,
    /root/reference/slide/utils.py:842-854)."""
    df2 = _align_positionally(df1, df2)
    if unique:
        return df1.intersect(df2)  # Spark INTERSECT: NULLs equal, dedups
    return df1.join(df2, on=_null_safe_cond(df1, df2, df1.columns), how="semi")


def except_df(df1: DataFrame, df2: DataFrame, unique: bool = True) -> DataFrame:
    """``EXCEPT`` with ANTI-JOIN semantics: remove *all* df1 rows that
    match any df2 row (not bag-subtraction), then dedup if unique.
    NULL rows match NULL rows.  This deliberately differs from Spark's
    ``exceptAll`` — reference /root/reference/slide/utils.py:856-880,
    oracle /root/reference/slide_test/suite.py:2343-2386."""
    df2 = _align_positionally(df1, df2)
    res = df1.join(df2, on=_null_safe_cond(df1, df2, df1.columns), how="anti")
    return res.distinct() if unique else res


def drop_duplicates(df: DataFrame) -> DataFrame:
    """``SELECT DISTINCT *`` — NULLs compare equal for dedup, matching
    both the reference (/root/reference/slide/utils.py:818-826) and
    Spark.  Oracle: /root/reference/slide_test/suite.py:2155-2194."""
    return df.distinct()
