"""Expression kernels: arithmetic / comparison / logic.

Parity targets (behavioral, not code): the reference's vectorized
pandas kernels in /root/reference/slide/utils.py —
``unary_arithmetic_op`` (:135-151), ``binary_arithmetic_op`` (:153-174),
``comparison_op`` (:176-206), ``binary_logical_op`` (:208-231),
``logical_not`` (:233-243), ``_safe_bool`` (:969-974).

On Spark all of these are lazy ``Column`` expression builders; Catalyst
constant-folds the pure-constant paths the reference special-cases by
hand (/root/repo/SURVEY.md §4.1), so there is no eager/scalar split
here.  SQL three-valued logic and NULL propagation come from Spark's
Kleene semantics for free.
"""

from __future__ import annotations

import operator as _op
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "lit",
    "to_col",
    "safe_bool",
    "nan_to_null",
    "unary_arithmetic_op",
    "binary_arithmetic_op",
    "comparison_op",
    "binary_logical_op",
    "logical_not",
    "qround",
]


def lit(value: Any) -> Column:
    """Constant -> Column (the reference promotes constants to 1-row
    series instead — /root/reference/slide/utils.py:105-120).

    A float NaN constant becomes NULL: NaN ≡ NULL is the engine's
    boundary rule (SURVEY §4.3-1), and constants enter here
    (/root/reference/slide_test/suite.py:399-400 asserts the same for
    the reference's scalar paths)."""
    import math

    if isinstance(value, float) and math.isnan(value):
        return F.lit(None).cast("double")
    return F.lit(value)


def to_col(x: Any) -> Column:
    """Scalar polymorphism: every kernel accepts Column or constant."""
    return x if isinstance(x, Column) else lit(x)


def safe_bool(col: Any) -> Column:
    """Truthiness coercion: nonzero==TRUE, zero==FALSE, NULL/NaN==NULL.

    Reference: ``_safe_bool`` (/root/reference/slide/utils.py:969-974)
    casts to nullable "boolean".  Spark's numeric->boolean cast is also
    ``x != 0`` but maps float NaN to TRUE, while the reference treats
    NaN as NULL (/root/repo/SURVEY.md §4.3-1) — so NaN is nulled first
    via a double-typed intermediate.
    """
    c = to_col(col)
    d = c.cast("double")
    return F.when(F.isnan(d), F.lit(None)).otherwise(d.cast("boolean"))


def qround(col: Any, digits: int = 2) -> Column:
    """Engine-portable quantized round: ``floor(x*10^d + 0.5)/10^d``.

    Spark's ROUND (BigDecimal HALF_UP over the shortest decimal repr)
    and other engines' ROUND (float multiply + llround) disagree on
    boundary doubles even when inputs are bit-identical; this formula
    is pure IEEE multiply/add/floor, so any engine evaluating the same
    expression yields the same bits.  Use it whenever results must be
    comparable across engines (e.g. DuckDB oracle checks:
    ``FLOOR(x * p + 0.5) / p``).
    """
    p = float(10**digits)
    return F.floor(to_col(col) * p + F.lit(0.5)).cast("double") / F.lit(p)


def nan_to_null(col: Any) -> Column:
    """NaN ≡ NULL bridge for float-typed expressions
    (/root/repo/SURVEY.md §4.3-1; reference evidence
    /root/reference/slide_test/suite.py:399-400)."""
    c = to_col(col)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


_UNARY = {"+": lambda c: c, "-": lambda c: -c}

_BINARY = {
    "+": _op.add,
    "-": _op.sub,
    "*": _op.mul,
    "/": _op.truediv,
}

_COMPARE = {
    "<": _op.lt,
    "<=": _op.le,
    "==": _op.eq,
    "=": _op.eq,
    "!=": _op.ne,
    "<>": _op.ne,
    ">": _op.gt,
    ">=": _op.ge,
}


def unary_arithmetic_op(col: Any, op: str) -> Column:
    """SQL unary ``+``/``-``."""
    if op not in _UNARY:
        raise NotImplementedError(f"unary op {op!r}")
    return _UNARY[op](to_col(col))


def binary_arithmetic_op(col1: Any, col2: Any, op: str) -> Column:
    """SQL ``+ - * /``.  ``/`` is true division; int-div and div-by-zero
    are deliberately unspecified, as in the reference
    (/root/reference/slide_test/suite.py:172-174)."""
    if op not in _BINARY:
        raise NotImplementedError(f"binary op {op!r}")
    return _BINARY[op](to_col(col1), to_col(col2))


def comparison_op(col1: Any, col2: Any, op: str) -> Column:
    """SQL comparisons with NULL propagation — Spark already returns
    NULL when either side is NULL, matching the reference's masking
    (/root/reference/slide/utils.py:960-967)."""
    if op not in _COMPARE:
        raise NotImplementedError(f"comparison op {op!r}")
    return _COMPARE[op](to_col(col1), to_col(col2))


def binary_logical_op(col1: Any, col2: Any, op: str) -> Column:
    """Kleene AND/OR (``FALSE AND NULL = FALSE``, ``TRUE OR NULL =
    TRUE``); operands go through truthiness coercion first."""
    a, b = safe_bool(col1), safe_bool(col2)
    if op == "and":
        return a & b
    if op == "or":
        return a | b
    raise NotImplementedError(f"logical op {op!r}")


def logical_not(col: Any) -> Column:
    """Kleene NOT (``NOT NULL = NULL``)."""
    return ~safe_bool(col)
