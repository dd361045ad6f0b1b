"""Predicate kernels: IS NULL/TRUE/FALSE, IN, BETWEEN, LIKE.

Parity targets: ``is_value`` (/root/reference/slide/utils.py:337-367),
``is_in`` (:369-414), ``is_between`` (:416-468), ``like`` (:531-600).

The reference's LIKE fast-path classifier
(/root/reference/slide/_string_utils.py:6-98) is intentionally NOT
reimplemented: Catalyst's ``LikeSimplification`` rule performs exactly
those startswith/endswith/contains/equality rewrites on the JVM side
(/root/repo/SURVEY.md §4.1).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .kernels import safe_bool, to_col

__all__ = ["is_value", "is_in", "is_between", "like"]


def is_value(col: Any, value: Any, positive: bool = True) -> Column:
    """``IS (NOT) NULL`` / ``IS (NOT) TRUE`` / ``IS (NOT) FALSE``.

    Numeric truthiness applies (``1 IS TRUE``), and NaN counts as NULL,
    both via ``safe_bool`` — reference
    /root/reference/slide/utils.py:337-367 and truth table
    /root/reference/slide_test/suite.py:391-462.  Result is never NULL.
    """
    c = to_col(col)
    if value is None:
        res = c.isNull()
    elif value is True:
        res = safe_bool(c).eqNullSafe(F.lit(True))
    elif value is False:
        res = safe_bool(c).eqNullSafe(F.lit(False))
    else:
        raise NotImplementedError(f"is_value target {value!r}")
    return res if positive else ~res


def is_in(col: Any, values: list[Any], positive: bool = True) -> Column:
    """SQL ``IN`` / ``NOT IN`` with full three-valued logic, including
    NULLs inside the list and *column-valued* list members.

    Constants go through Spark's native ``In`` (already 3VL); column
    members become an OR-chain of equalities exactly like the reference
    (/root/reference/slide/utils.py:389-399).  A NULL constant in the
    list keeps the "no match -> NULL" semantics via an explicit
    ``OR NULL`` term.
    """
    c = to_col(col)
    consts = [v for v in values if not isinstance(v, Column)]
    cols = [v for v in values if isinstance(v, Column)]
    has_null_const = any(v is None for v in consts)
    consts = [v for v in consts if v is not None]

    terms: list[Column] = []
    if consts:
        terms.append(c.isin(consts))
    for other in cols:
        terms.append(c == other)
    if has_null_const:
        # `x IN (..., NULL)` is TRUE on match else NULL.
        terms.append(F.lit(None).cast("boolean"))
    if not terms:
        res = F.lit(None).cast("boolean") if has_null_const else F.lit(False)
    else:
        res = reduce(lambda a, b: a | b, terms)
    # NULL probe value -> NULL result regardless of the list.
    res = F.when(c.isNull(), F.lit(None)).otherwise(res)
    return res if positive else ~res


def is_between(col: Any, lower: Any, upper: Any, positive: bool = True) -> Column:
    """SQL ``(NOT) BETWEEN`` with 3VL on all three operands.

    ``l <= x AND x <= u`` under Kleene logic reproduces the reference's
    determinism (e.g. ``3 BETWEEN NULL AND 2`` = FALSE, not NULL) —
    /root/reference/slide/utils.py:416-468, oracle
    /root/reference/slide_test/suite.py:652-691.
    """
    c, lo, up = to_col(col), to_col(lower), to_col(upper)
    res = (lo <= c) & (c <= up)
    return res if positive else ~res


def like(
    col: Any,
    expr: str | None,
    ignore_case: bool = False,
    positive: bool = True,
) -> Column:
    """SQL ``(NOT) (I)LIKE`` with ``%``/``_`` wildcards and NULL
    pattern -> NULL (/root/reference/slide/utils.py:531-600, oracle
    /root/reference/slide_test/suite.py:1016-1117)."""
    c = to_col(col)
    if expr is None:
        res = F.lit(None).cast("boolean")
    elif ignore_case:
        res = c.ilike(expr)
    else:
        res = c.like(expr)
    return res if positive else ~res
