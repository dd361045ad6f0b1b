"""Expression kernel surface (Column -> Column, lazy)."""

from .casts import cast, cast_df
from .conditional import case_when, coalesce
from .kernels import (
    binary_arithmetic_op,
    binary_logical_op,
    comparison_op,
    lit,
    logical_not,
    nan_to_null,
    qround,
    safe_bool,
    to_col,
    unary_arithmetic_op,
)
from .predicates import is_between, is_in, is_value, like

__all__ = [
    "binary_arithmetic_op",
    "binary_logical_op",
    "case_when",
    "cast",
    "cast_df",
    "coalesce",
    "comparison_op",
    "is_between",
    "is_in",
    "is_value",
    "like",
    "lit",
    "logical_not",
    "nan_to_null",
    "qround",
    "safe_bool",
    "to_col",
    "unary_arithmetic_op",
]
