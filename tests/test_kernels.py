"""Arithmetic / comparison / logic kernels, oracle-checked.

Behavioral model: /root/reference/slide_test/suite.py:148-330
(NULL propagation, Kleene AND/OR/NOT, NaN ≡ NULL)."""

import pandas as pd
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.functions import (
    binary_arithmetic_op,
    binary_logical_op,
    comparison_op,
    logical_not,
    safe_bool,
    unary_arithmetic_op,
)
from tests.helpers import assert_duck_eq, assert_pdf_eq


def _num_df(spark):
    # like fixture num_nan: NULL/NaN mixed into doubles
    return to_df(
        spark,
        [
            [1.0, 2.0, 1.0],
            [2.0, 2.0, None],
            [3.0, 0.1, 1.0],
            [4.0, 2.0, float("nan")],
        ],
        "a:double,b:double,c:double",
    )


def test_arithmetic(spark):
    df = _num_df(spark)
    res = df.select(
        binary_arithmetic_op(F.col("a"), F.col("b"), "+").alias("add"),
        binary_arithmetic_op(F.col("a"), F.col("c"), "-").alias("sub"),
        binary_arithmetic_op(F.col("a"), F.col("b"), "*").alias("mul"),
        binary_arithmetic_op(F.col("a"), F.col("b"), "/").alias("div"),
        binary_arithmetic_op(F.col("a"), 2.0, "+").alias("addc"),
        unary_arithmetic_op(F.col("a"), "-").alias("neg"),
    )
    assert_duck_eq(
        res,
        """SELECT a+b AS add, a-c AS sub, a*b AS mul, a/b AS div,
                  a+2.0 AS addc, -a AS neg FROM t""",
        t=df,
    )


def test_comparison_null_propagation(spark):
    df = _num_df(spark)
    res = df.select(
        comparison_op(F.col("a"), F.col("c"), "<").alias("lt"),
        comparison_op(F.col("a"), F.col("c"), "<=").alias("le"),
        comparison_op(F.col("a"), F.col("c"), "==").alias("eq"),
        comparison_op(F.col("a"), F.col("c"), "!=").alias("ne"),
        comparison_op(F.col("a"), F.col("c"), ">").alias("gt"),
        comparison_op(F.col("a"), F.col("c"), ">=").alias("ge"),
    )
    assert_duck_eq(
        res,
        """SELECT a<c AS lt, a<=c AS le, a=c AS eq, a<>c AS ne,
                  a>c AS gt, a>=c AS ge FROM t""",
        t=df,
    )


def test_string_and_ts_comparison(spark):
    df = to_df(
        spark,
        [["xx", None, "zz"], [None, "t", None], ["x", "tt", "z"]],
        "a:str,b:str,c:str",
    )
    res = df.select(
        comparison_op(F.col("a"), F.col("c"), "<").alias("lt"),
        comparison_op(F.col("a"), "x", "==").alias("eqc"),
    )
    assert_duck_eq(res, "SELECT a<c AS lt, a='x' AS eqc FROM t", t=df)


def test_logic_three_valued(spark):
    # full Kleene truth table incl. NULLs (fixture bool_tvl)
    df = to_df(
        spark,
        [
            [True, False],
            [False, True],
            [True, True],
            [False, False],
            [True, None],
            [False, None],
            [None, None],
        ],
        "a:bool,b:bool",
    )
    res = df.select(
        binary_logical_op(F.col("a"), F.col("b"), "and").alias("and_"),
        binary_logical_op(F.col("a"), F.col("b"), "or").alias("or_"),
        logical_not(F.col("a")).alias("not_"),
    )
    assert_duck_eq(
        res,
        "SELECT a AND b AS and_, a OR b AS or_, NOT a AS not_ FROM t",
        t=df,
    )


def test_safe_bool_numeric_truthiness(spark):
    df = to_df(
        spark,
        [[2.0], [0.0], [-2.0], [None], [float("nan")]],
        "a:double",
    )
    out = df.select(safe_bool(F.col("a")).alias("b")).toPandas()
    assert list(out["b"].where(pd.notna(out["b"]), None)) == [
        True,
        False,
        True,
        None,
        None,  # NaN is NULL, not TRUE
    ]


def test_constant_only_expressions(spark):
    one = spark.range(1)
    res = one.select(
        binary_logical_op(True, None, "and").alias("x"),
        binary_logical_op(True, None, "or").alias("y"),
        binary_arithmetic_op(1, 2.0, "*").alias("z"),
    )
    assert_pdf_eq(
        res.toPandas(),
        pd.DataFrame({"x": [None], "y": [True], "z": [2.0]}),
    )
