"""Conditional / null-handling kernels: COALESCE and CASE WHEN.

Parity targets: ``coalesce`` (/root/reference/slide/utils.py:470-486,
implemented there as a row-wise bfill across a temp frame — on Spark it
is the native JVM ``coalesce``) and ``case_when``
(/root/reference/slide/utils.py:488-529).  The reference's
constant-short-circuit special cases are Catalyst's
``SimplifyConditionals``/``ConstantFolding`` rules
(/root/repo/SURVEY.md §4.1).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .kernels import safe_bool, to_col

__all__ = ["coalesce", "case_when"]


def coalesce(cols: list[Any]) -> Column:
    """SQL ``COALESCE`` over a mix of columns and constants.

    Oracle coverage: /root/reference/slide_test/suite.py:693-843
    (float/bool/int/str/timestamp variants).
    """
    if len(cols) == 0:
        raise ValueError("coalesce requires at least one argument")
    return F.coalesce(*[to_col(c) for c in cols])


def case_when(*pairs: tuple[Any, Any], default: Any = None) -> Column:
    """SQL ``CASE WHEN`` with truthy conditions and NULL-able branches.

    Conditions go through truthiness coercion (numeric conditions are
    ``!= 0``, NaN/NULL conditions fall through) — reference
    /root/reference/slide/utils.py:502-505; oracle
    /root/reference/slide_test/suite.py:845-965.
    """
    if len(pairs) == 0:
        # CASE with no WHEN arms is just the ELSE value
        # (/root/reference/slide_test/suite.py:846).
        return to_col(default)
    expr: Column | None = None
    for cond, value in pairs:
        c = safe_bool(cond)
        v = to_col(value)
        expr = F.when(c, v) if expr is None else expr.when(c, v)
    assert expr is not None
    return expr.otherwise(to_col(default))
