"""1:1 port of the reference golden suite.

Every test function below mirrors, BY NAME, one method of
/root/reference/slide_test/suite.py:22-2591 (SlideTestSuite.Tests) so
coverage can be diffed mechanically.  Bodies are re-expressed against
the PySpark engine:

- pandas Series surfaces (is_series/to_series/to_constant_series,
  ensure_compatible) are declared absences (COVERAGE.md §2.7); their
  tests assert the documented Spark equivalents (Columns + cols_to_df,
  no index) so the semantic intent is still exercised.
- scalar paths run through ``eval_scalar`` (convert.py:195) — the
  engine's constant surface, mirroring the reference's scalar returns.
- DuckDB oracle SQL strings are kept verbatim where the reference used
  assert_duck_eq (duck-only dialect, so decimal literals are fine).
"""

import datetime as _dt
import json
import pickle
from datetime import date, datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pytest import raises

from pandasy_spark.convert import (
    as_array,
    as_array_iterable,
    cols_to_df,
    decode_json_columns,
    eval_scalar,
    to_df,
    to_schema,
)
from pandasy_spark.exceptions import CastError, InvalidOperationError
from pandasy_spark.functions import (
    binary_arithmetic_op,
    binary_logical_op,
    case_when,
    cast,
    cast_df,
    coalesce,
    comparison_op,
    is_between,
    is_in,
    is_value,
    like,
    logical_not,
    unary_arithmetic_op,
)
from pandasy_spark.operators import (
    drop_duplicates,
    except_df,
    filter_df,
    intersect,
    join,
    sql_groupby_apply,
    union,
)
from pandasy_spark.types import (
    infer_spark_type,
    parse_schema,
    parse_type,
    spark_to_pa_type,
)
from tests.helpers import assert_duck_eq, assert_pdf_eq, make_rand_df, spark_to_pd

TS = _dt.datetime
DT = _dt.date


def _rand(spark, size, seed, schema_expr, **cols):
    pdf = make_rand_df(size, seed=seed, **cols)
    return to_df(spark, pdf.values.tolist(), schema_expr)


def _sc(spark, expr):
    """Scalar path: evaluate a constant expression to a Python value."""
    return eval_scalar(spark, expr)


def _cast_s(spark, v, target, input_hint=None):
    """Reference-style scalar cast: the reference's cast() sees the
    input dtype from the series; for a Python constant we pass the
    inferred type as the hint (suite.py:1119-1203 scalar matrix)."""
    if v is pd.NaT or v is pd.NA:
        v = None
    if input_hint is None and v is not None:
        try:
            tp = infer_spark_type(v)
            input_hint = None if isinstance(tp, T.NullType) else tp
        except ValueError:
            input_hint = None
    if isinstance(v, float) and np.isnan(v):
        input_hint = T.DoubleType()
    return _sc(spark, cast(v, target, input_type=input_hint))


# ----------------------------------------------------------- §utils/types


def test_to_safe_pa_type(spark):
    """Reference suite.py:57-71 — dtype -> pyarrow mapping.  The engine
    maps via schema expressions / Spark types (types.py _PRIMITIVES)."""
    assert pa.string() == spark_to_pa_type(parse_type("str"))
    assert pa.string() == spark_to_pa_type(parse_type("string"))
    # TRIAD_DEFAULT_TIMESTAMP is timestamp[us]
    assert pa.timestamp("us") == spark_to_pa_type(parse_type("datetime"))
    assert pa.float64() == spark_to_pa_type(parse_type("float64"))
    assert pa.float32() == spark_to_pa_type(parse_type("float32"))
    assert pa.date32() == spark_to_pa_type(parse_type("date"))
    assert pa.timestamp("us") == spark_to_pa_type(infer_spark_type(datetime.now()))
    assert pa.string() == spark_to_pa_type(infer_spark_type("x"))
    assert pa.date32() == spark_to_pa_type(infer_spark_type(date(2020, 1, 1)))


def test_is_series(spark):
    """suite.py:73-78.  Declared absence (COVERAGE.md §2.7): the Spark
    'series' is the Column; the membership test is isinstance."""
    df = to_df(spark, [["a", 1]], "a:str,b:long")
    assert isinstance(df["a"], Column)
    assert not isinstance(None, Column)
    assert not isinstance(1, Column)
    assert not isinstance("abc", Column)


def test_to_series(spark):
    """suite.py:80-94.  Equivalent surface: Columns (renamed via alias)
    assembled by cols_to_df."""
    base = to_df(spark, [[0, 2, 4], [1, 3, 5]], "x:long,y2:long,z2:long")
    s1 = base["x"]
    s2 = base["y2"].alias("y")
    s3 = base["z2"].alias("z")
    s4 = base["y2"].alias("w")
    for s in (s1, s2, s3, s4):
        assert isinstance(s, Column)
    df = cols_to_df(base, [s1, s2, s3, s4])
    assert_pdf_eq(
        spark_to_pd(df),
        pd.DataFrame(dict(x=[0, 1], y=[2, 3], z=[4, 5], w=[2, 3])),
    )


def test_to_constant_series(spark):
    """suite.py:96-104.  Constants are F.lit (typed NULL via cast)."""
    base = to_df(spark, [[0], [1]], "x:long")
    df = cols_to_df(
        base,
        [base["x"], F.lit("a"), F.lit(None).cast("double")],
        names=["x", "y", "z"],
    )
    assert_pdf_eq(
        spark_to_pd(df),
        pd.DataFrame(dict(x=[0, 1], y=["a", "a"], z=[None, None])),
    )


def test_get_col_pa_type(spark):
    """suite.py:106-120 — column/constant -> pyarrow type."""
    df = to_df(
        spark,
        [["a", 1, 1.1, True, datetime.now()]],
        "a:str,b:long,c:double,d:bool,e:datetime",
    )

    def col_pa(col_name):
        return spark_to_pa_type(df.schema[col_name].dataType)

    assert pa.types.is_string(col_pa("a"))
    assert pa.types.is_string(spark_to_pa_type(infer_spark_type("a")))
    assert pa.types.is_int64(col_pa("b"))
    assert pa.types.is_integer(spark_to_pa_type(infer_spark_type(123)))
    assert pa.types.is_float64(col_pa("c"))
    assert pa.types.is_floating(spark_to_pa_type(infer_spark_type(1.1)))
    assert pa.types.is_boolean(col_pa("d"))
    assert pa.types.is_boolean(spark_to_pa_type(infer_spark_type(False)))
    assert pa.types.is_timestamp(col_pa("e"))
    assert pa.types.is_timestamp(spark_to_pa_type(infer_spark_type(datetime.now())))


# ----------------------------------------------------------- §arithmetic


def test_unary_arithmetic_op(spark):
    """suite.py:122-136."""
    pdf = pd.DataFrame([[2.0], [0.0], [None], [-3.0]], columns=["a"])
    df = to_df(spark, pdf.values.tolist(), "a:double")
    out = df.select(unary_arithmetic_op(df["a"], "+").alias("a"))
    assert_pdf_eq(spark_to_pd(out), pdf)
    out2 = out.select(unary_arithmetic_op(F.col("a"), "-").alias("a"))
    assert_pdf_eq(
        spark_to_pd(out2),
        pd.DataFrame([[-2.0], [0.0], [None], [3.0]], columns=["a"]),
    )
    out3 = out2.select(unary_arithmetic_op(-10.1, "-").alias("a"))
    assert_pdf_eq(
        spark_to_pd(out3),
        pd.DataFrame([[10.1]] * 4, columns=["a"]),
    )
    raises(NotImplementedError, lambda: unary_arithmetic_op(df["a"], "]"))


@pytest.mark.parametrize("op", ["+", "-", "*", "/"])
def test_binary_arithmetic_op(spark, op):
    """suite.py:138-174 (int-div and div-by-zero deliberately
    unspecified, as in the reference)."""
    pdf = pd.DataFrame(
        dict(
            a=[1.0, 2.0, 3.0, 4.0],
            b=[2.0, 2.0, 0.1, 2.0],
            c=[1.0, None, 1.0, float("nan")],
        )
    )
    df = to_df(spark, pdf.values.tolist(), "a:double,b:double,c:double")
    res = df.select(
        binary_arithmetic_op(df.a, df.b, op).alias("d"),
        binary_arithmetic_op(df.a, 1.0, op).alias("e"),
        binary_arithmetic_op(1.0, df.b, op).alias("f"),
        binary_arithmetic_op(1.0, 2.0, op).alias("g"),
        binary_arithmetic_op(1.0, df.c, op).alias("h"),
        binary_arithmetic_op(df.a, df.c, op).alias("i"),
    )
    assert_duck_eq(
        res,
        f"""
        SELECT
            a{op}b AS d, a{op}1.0 AS e, 1.0{op}b AS f,
            1.0{op}2.0 AS g, 1.0{op}c AS h, a{op}c AS i
        FROM pdf
        """,
        pdf=df,
    )


@pytest.mark.parametrize("op", ["<", "<=", "==", "!=", ">", ">="])
def test_comparison_op_num(spark, op):
    """suite.py:176-214."""
    pdf = pd.DataFrame(
        dict(
            a=[1.0, 2.0, 3.0, 4.0],
            b=[2.0, 2.0, 0.1, 2.0],
            c=[2.0, None, 2.0, float("nan")],
        )
    )
    df = to_df(spark, pdf.values.tolist(), "a:double,b:double,c:double")
    res = df.select(
        comparison_op(df.a, df.b, op).alias("d"),
        comparison_op(df.a, 2.0, op).alias("e"),
        comparison_op(2.0, df.b, op).alias("f"),
        comparison_op(2.0, 3.0, op).alias("g"),
        comparison_op(2.0, df.c, op).alias("h"),
        comparison_op(df.a, df.c, op).alias("i"),
        comparison_op(df.c, df.c, op).alias("j"),
    )
    assert_duck_eq(
        res,
        f"""
        SELECT
            a{op}b AS d, a{op}2.0 AS e, 2.0{op}b AS f,
            2.0{op}3.0 AS g, 2.0{op}c AS h, a{op}c AS i,
            c{op}c AS j
        FROM pdf
        """,
        pdf=df,
    )
    assert _sc(spark, comparison_op(None, None, op)) is None


@pytest.mark.parametrize("op", ["<", "<=", "==", "!=", ">", ">="])
def test_comparison_op_str(spark, op):
    """suite.py:216-252."""
    pdf = pd.DataFrame(
        dict(a=["xx", None, "x"], b=[None, "t", "tt"], c=["zz", None, "z"])
    )
    df = to_df(spark, pdf.values.tolist(), "a:str,b:str,c:str")
    res = df.select(
        comparison_op(df.a, df.b, op).alias("d"),
        comparison_op(df.a, "y", op).alias("e"),
        comparison_op("y", df.b, op).alias("f"),
        comparison_op("y", "z", op).alias("g"),
        comparison_op("y", df.c, op).alias("h"),
        comparison_op(df.a, df.c, op).alias("i"),
        comparison_op(df.c, df.c, op).alias("j"),
    )
    assert_duck_eq(
        res,
        f"""
        SELECT
            a{op}b AS d, a{op}'y' AS e, 'y'{op}b AS f,
            'y'{op}'z' AS g, 'y'{op}c AS h, a{op}c AS i,
            c{op}c AS j
        FROM pdf
        """,
        pdf=df,
    )


@pytest.mark.parametrize("op", ["<", "<=", "==", "!=", ">", ">="])
def test_comparison_op_time(spark, op):
    """suite.py:254-295."""
    t = datetime(2019, 1, 1)
    x = datetime(2020, 1, 1)
    y = datetime(2020, 1, 2)
    z = datetime(2020, 1, 3)
    pdf = pd.DataFrame(dict(a=[x, None, x], b=[None, t, t], c=[z, z, None]))
    df = to_df(spark, pdf.values.tolist(), "a:datetime,b:datetime,c:datetime")
    res = df.select(
        comparison_op(df.a, df.b, op).alias("d"),
        comparison_op(df.a, y, op).alias("e"),
        comparison_op(y, df.b, op).alias("f"),
        comparison_op(y, z, op).alias("g"),
        comparison_op(y, df.c, op).alias("h"),
        comparison_op(df.a, df.c, op).alias("i"),
        comparison_op(df.c, df.c, op).alias("j"),
    )
    assert_duck_eq(
        res,
        f"""
        SELECT
            a{op}b AS d, a{op}'{y}' AS e, '{y}'{op}b AS f,
            '{y}'{op}'{z}' AS g, '{y}'{op}c AS h, a{op}c AS i,
            c{op}c AS j
        FROM pdf
        """,
        pdf=df,
    )


@pytest.mark.parametrize("op", ["and", "or"])
def test_binary_logical_op(spark, op):
    """suite.py:297-330 — Kleene logic incl. constant operands."""
    pdf = pd.DataFrame(
        dict(
            a=[True, False, True, False, True, False, None],
            b=[False, True, True, False, None, None, None],
        )
    )
    df = to_df(spark, pdf.values.tolist(), "a:bool,b:bool")
    res = df.select(
        binary_logical_op(df.a, df.b, op).alias("d"),
        binary_logical_op(df.a, True, op).alias("e"),
        binary_logical_op(True, df.b, op).alias("f"),
        binary_logical_op(df.a, False, op).alias("g"),
        binary_logical_op(False, df.b, op).alias("h"),
        binary_logical_op(True, False, op).alias("i"),
        binary_logical_op(True, None, op).alias("j"),
        binary_logical_op(False, None, op).alias("k"),
        binary_logical_op(None, None, op).alias("l"),
    )
    assert_duck_eq(
        res,
        f"""
        SELECT
            a {op} b AS d, a {op} TRUE AS e, TRUE {op} b AS f,
            a {op} FALSE AS g, FALSE {op} b AS h, TRUE {op} FALSE AS i,
            TRUE {op} NULL AS j, FALSE {op} NULL AS k, NULL {op} NULL AS l
        FROM pdf
        """,
        pdf=df,
    )


def test_logical_not(spark):
    """suite.py:332-353."""
    pdf = pd.DataFrame(dict(a=[True, False, None]))
    df = to_df(spark, pdf.values.tolist(), "a:bool")
    res = df.select(
        logical_not(df.a).alias("c"),
        logical_not(True).alias("e"),
        logical_not(False).alias("f"),
        logical_not(None).alias("g"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            NOT a AS c, NOT TRUE AS e,
            NOT FALSE AS f, NOT NULL AS g
        FROM pdf
        """,
        pdf=df,
    )


def test_filter_df(spark):
    """suite.py:355-389 — truthy/NaN/constant conditions."""

    def check(rows, schema):
        df = to_df(spark, rows, schema)
        assert_duck_eq(
            filter_df(df, df["a"]),
            "SELECT * FROM pdf WHERE a",
            pdf=df,
        )

    check([[True, 1.0], [False, 2.0]], "a:bool,b:double")
    check([[False, 1.0], [False, 2.0]], "a:bool,b:double")
    check([[1.0, 1.0], [0.0, 2.0], [None, 3.0]], "a:double,b:double")
    # NaN ≡ NULL at ingest (SURVEY §4.3-1): the NaN row drops like NULL
    check([[float("nan"), 1.0], [0.0, 2.0], [None, 3.0]], "a:double,b:double")

    df = to_df(spark, [[1], [2]], "a:long")
    assert_duck_eq(filter_df(df, True), "SELECT * FROM pdf WHERE TRUE", pdf=df)
    assert_duck_eq(filter_df(df, False), "SELECT * FROM pdf WHERE FALSE", pdf=df)


# ----------------------------------------------------------- §predicates


def test_is_value(spark):
    """suite.py:391-462 — full IS NULL/TRUE/FALSE truth table."""
    sc = lambda e: _sc(spark, e)  # noqa: E731
    assert sc(is_value(None, None, True))
    assert not sc(is_value(None, None, False))
    assert not sc(is_value(None, True, True))
    assert sc(is_value(None, True, False))
    assert not sc(is_value(None, False, True))
    assert sc(is_value(None, False, False))

    # NaN ≡ NULL for constants (kernels.lit normalizes)
    assert sc(is_value(float("nan"), None, True))
    assert not sc(is_value(float("nan"), None, False))

    assert sc(is_value(None, None, True))  # pd.NaT ≡ None at the boundary
    assert not sc(is_value(None, None, False))

    assert not sc(is_value("abc", None, True))
    assert sc(is_value("abc", None, False))

    assert sc(is_value(True, None, True)) is False
    assert sc(is_value(True, None, False))
    assert sc(is_value(True, True, True))
    assert not sc(is_value(True, True, False))
    assert not sc(is_value(True, False, True))
    assert sc(is_value(True, False, False))

    assert not sc(is_value(-1.1, None, True))
    assert sc(is_value(-1.1, None, False))
    assert sc(is_value(-1.1, True, True))
    assert not sc(is_value(-1.1, True, False))
    assert not sc(is_value(-1.1, False, True))
    assert sc(is_value(-1.1, False, False))

    assert not sc(is_value(False, None, True))
    assert sc(is_value(False, None, False))
    assert not sc(is_value(False, True, True))
    assert sc(is_value(False, True, False))
    assert sc(is_value(False, False, True))
    assert not sc(is_value(False, False, False))

    assert not sc(is_value(0, None, True))
    assert sc(is_value(0, None, False))
    assert not sc(is_value(0, True, True))
    assert sc(is_value(0, True, False))
    assert sc(is_value(0, False, True))
    assert not sc(is_value(0, False, False))

    with raises(NotImplementedError):
        is_value(0, "x", False)

    df = to_df(spark, [[True], [False], [None]], "a:bool")
    res = df.select(
        is_value(df["a"], None, True).alias("h"),
        is_value(df["a"], None, False).alias("i"),
        is_value(df["a"], True, True).alias("j"),
        is_value(df["a"], True, False).alias("k"),
        is_value(df["a"], False, True).alias("l"),
        is_value(df["a"], False, False).alias("m"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[False, False, True],
                i=[True, True, False],
                j=[True, False, False],
                k=[False, True, True],
                l=[False, True, False],
                m=[True, False, True],
            )
        ),
    )


def test_is_in(spark):
    """suite.py:464-520 — 3VL IN/NOT IN on constants of every type."""
    sc = lambda e: _sc(spark, e)  # noqa: E731
    assert sc(is_in(None, [None, 1], True)) is None
    assert sc(is_in(None, [None, 1], False)) is None
    assert sc(is_in(None, ["a", "b"], True)) is None
    assert sc(is_in(None, ["a", "b"], False)) is None

    assert sc(is_in(True, [False, True], True))
    assert not sc(is_in(True, [False, True], False))
    assert sc(is_in(False, [None, False], True))
    assert not sc(is_in(False, [None, False], False))

    assert sc(is_in(True, [None, False], True)) is None
    assert sc(is_in(True, [None, False], False)) is None

    assert sc(is_in(1, [2, 1], True))
    assert not sc(is_in(1, [2, 1], False))
    assert sc(is_in(1, [None, 1], True))
    assert not sc(is_in(1, [None, 1], False))

    assert sc(is_in(1, [None, 2], True)) is None
    assert sc(is_in(1, [None, 2], False)) is None

    assert sc(is_in(1.1, [2.2, 1.1], True))
    assert not sc(is_in(1.1, [2.2, 1.1], False))
    assert sc(is_in(1.1, [None, 1.1], True))
    assert not sc(is_in(1.1, [None, 1.1], False))

    assert sc(is_in(1.1, [None, 2.2], True)) is None
    assert sc(is_in(1.1, [None, 2.2], False)) is None

    assert sc(is_in("aa", ["bb", "aa"], True))
    assert not sc(is_in("aa", ["bb", "aa"], False))
    assert sc(is_in("aa", [None, "aa"], True))
    assert not sc(is_in("aa", [None, "aa"], False))

    assert sc(is_in("aa", [None, "bb"], True)) is None
    assert sc(is_in("aa", [None, "b"], False)) is None

    assert sc(is_in(date(2020, 1, 1), [date(2020, 1, 2), date(2020, 1, 1)], True))
    assert not sc(
        is_in(date(2020, 1, 1), [date(2020, 1, 2), date(2020, 1, 1)], False)
    )
    assert sc(is_in(date(2020, 1, 1), [None, date(2020, 1, 1)], True))
    assert not sc(is_in(date(2020, 1, 1), [None, date(2020, 1, 1)], False))

    assert sc(is_in(date(2020, 1, 1), [None, date(2020, 1, 2)], True)) is None
    assert sc(is_in(date(2020, 1, 1), [None, date(2020, 1, 2)], False)) is None


def test_is_in_sql(spark):
    """suite.py:522-601 — IN over columns, incl. column-valued lists."""
    pdf = pd.DataFrame(
        dict(
            b=[1, 2, None],
            c=[1.1, 2.2, None],
            d=["aa", "bb", None],
            e=[date(2020, 1, 1), date(2020, 1, 2), None],
        )
    )
    df = to_df(spark, pdf.values.tolist(), "b:long,c:double,d:str,e:date")
    res = df.select(
        is_in(df["b"], [1, 3, None], True).alias("j"),
        is_in(df["b"], [1, 3, None], False).alias("k"),
        is_in(df["c"], [1.1, 3.3, None], True).alias("l"),
        is_in(df["c"], [1.1, 3.3, None], False).alias("m"),
        is_in(df["d"], ["aa", "cc", None], True).alias("n"),
        is_in(df["d"], ["aa", "cc", None], False).alias("o"),
        is_in(df["e"], [date(2020, 1, 1), date(2020, 1, 3), None], True).alias("p"),
        is_in(df["e"], [date(2020, 1, 1), date(2020, 1, 3), None], False).alias("q"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            b IN (3, 1, NULL) AS j,
            b NOT IN (3, 1, NULL) AS k,
            c IN (3.3, 1.1, NULL) AS l,
            c NOT IN (3.3, 1.1, NULL) AS m,
            d IN ('cc', 'aa', NULL) AS n,
            d NOT IN ('cc', 'aa', NULL) AS o,
            e IN ('2020-01-03', '2020-01-01', NULL) AS p,
            e NOT IN ('2020-01-03', '2020-01-01', NULL) AS q
        FROM a
        """,
        a=df,
    )

    pdf2 = pd.DataFrame(
        dict(
            a=[1.1, 2.2, None],
            b=[1.1, None, None],
            c=[None, 2.2, None],
            d=[3.3, None, None],
            e=[None, 4.4, None],
        )
    )
    df2 = to_df(
        spark, pdf2.values.tolist(), "a:double,b:double,c:double,d:double,e:double"
    )
    res2 = df2.select(
        is_in(df2["a"], [df2["b"], df2["c"]], True).alias("h"),
        is_in(df2["a"], [df2["b"], df2["c"]], False).alias("i"),
        is_in(df2["a"], [df2["d"], df2["e"]], True).alias("j"),
        is_in(df2["a"], [df2["d"], df2["e"]], False).alias("k"),
        is_in(df2["a"], [df2["b"], df2["d"], None], True).alias("l"),
        is_in(df2["a"], [df2["b"], df2["d"], None], False).alias("m"),
    )
    assert_duck_eq(
        res2,
        """
        SELECT
            a IN (b, c) AS h,
            a NOT IN (b, c) AS i,
            a IN (d, e) AS j,
            a NOT IN (d, e) AS k,
            a IN (b, d, NULL) AS l,
            a NOT IN (b, d, NULL) AS m
        FROM a
        """,
        a=df2,
    )


def test_is_between(spark):
    """suite.py:603-650 — 3VL BETWEEN truth table on constants."""
    sc = lambda e: _sc(spark, e)  # noqa: E731
    for a in [1, 2, None]:
        for b in [1, 2, None]:
            for p in [True, False]:
                assert sc(is_between(None, a, b, p)) is None

    assert sc(is_between(2, None, 2, True)) is None
    assert sc(is_between(2, None, 2, False)) is None
    assert sc(is_between(3, 2, None, True)) is None
    assert sc(is_between(3, 2, None, False)) is None

    assert not sc(is_between(3, None, 2, True))
    assert sc(is_between(3, None, 2, False))
    assert not sc(is_between(1, 2, None, True))
    assert sc(is_between(1, 2, None, False))

    assert sc(is_between(3, None, None, True)) is None
    assert sc(is_between(3, None, None, False)) is None

    assert sc(is_between(1, 1, 2, True))
    assert not sc(is_between(2, 1, 2, False))
    assert not sc(is_between(0, 1, 2, True))
    assert sc(is_between(0, 1, 2, False))
    assert not sc(is_between(3, 1, 2, True))
    assert sc(is_between(3, 1, 2, False))

    assert sc(is_between("bb", "bb", "cc", True))
    assert not sc(is_between("cc", "bb", "cc", False))
    assert not sc(is_between("aa", "bb", "cc", True))
    assert sc(is_between("aa", "bb", "cc", False))

    assert sc(is_between(date(2020, 1, 2), date(2020, 1, 2), date(2020, 1, 3), True))
    assert not sc(
        is_between(date(2020, 1, 3), date(2020, 1, 2), date(2020, 1, 3), False)
    )
    assert not sc(
        is_between(date(2020, 1, 1), date(2020, 1, 2), date(2020, 1, 3), True)
    )
    assert sc(
        is_between(date(2020, 1, 1), date(2020, 1, 2), date(2020, 1, 3), False)
    )


def test_is_between_sql(spark):
    """suite.py:652-691 — randomized BETWEEN vs DuckDB."""
    df = _rand(
        spark, 100, 0, "a:double,b:double,c:double",
        a=(float, 20), b=(float, 20), c=(float, 20),
    )
    res = df.select(
        is_between(df["a"], df["b"], df["c"], True).alias("h"),
        is_between(df["a"], df["b"], df["c"], False).alias("i"),
        is_between(None, df["b"], df["c"], True).alias("j"),
        is_between(None, df["b"], df["c"], False).alias("k"),
        is_between(df["a"], df["b"], None, True).alias("l"),
        is_between(df["a"], df["b"], None, False).alias("m"),
        is_between(df["a"], None, df["c"], True).alias("n"),
        is_between(df["a"], None, df["c"], False).alias("o"),
        is_between(df["a"], 0.5, df["c"], True).alias("p"),
        is_between(df["a"], 0.5, df["c"], False).alias("q"),
        is_between(df["a"], df["b"], 0.5, True).alias("r"),
        is_between(df["a"], df["b"], 0.5, False).alias("s"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            a BETWEEN b AND c AS h,
            a NOT BETWEEN b AND c AS i,
            NULL BETWEEN b AND c AS j,
            NULL NOT BETWEEN b AND c AS k,
            a BETWEEN b AND NULL AS l,
            a NOT BETWEEN b AND NULL AS m,
            a BETWEEN NULL AND c AS n,
            a NOT BETWEEN NULL AND c AS o,
            a BETWEEN 0.5 AND c AS p,
            a NOT BETWEEN 0.5 AND c AS q,
            a BETWEEN b AND 0.5 AS r,
            a NOT BETWEEN b AND 0.5 AS s
        FROM a
        """,
        a=df,
    )


# ----------------------------------------------------------- §conditional


def test_cast_coalesce_sql(spark):
    """suite.py:693-843 — per-type COALESCE families (float, bool, int,
    str, timestamp), mixed constants and NULLs."""
    # float
    df = _rand(
        spark, 100, 0, "a:double,b:double,c:double",
        a=(float, 50), b=(float, 50), c=(float, 50),
    )
    res = df.select(
        coalesce([None]).cast("double").alias("g"),
        coalesce([None, 10.1, None]).alias("h"),
        coalesce([df["a"], 10.1]).alias("i"),
        coalesce([10.1, df["a"]]).alias("j"),
        coalesce([df["a"], None]).alias("k"),
        coalesce([None, df["a"]]).alias("l"),
        coalesce([df["a"], df["b"], df["c"]]).alias("m"),
        coalesce([df["a"], df["b"], df["c"], 10.1]).alias("n"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            CAST(COALESCE(NULL) AS DOUBLE) AS g,
            COALESCE(NULL, 10.1, NULL) AS h,
            COALESCE(a, 10.1) AS i,
            COALESCE(10.1, a) AS j,
            COALESCE(a, NULL) AS k,
            COALESCE(NULL, a) AS l,
            COALESCE(a,b,c) AS m,
            COALESCE(a,b,c,10.1) AS n
        FROM a
        """,
        a=df,
    )

    # bool
    df = _rand(
        spark, 100, 1, "a:bool,b:bool,c:bool",
        a=(bool, 50), b=(bool, 50), c=(bool, 50),
    )
    res = df.select(
        coalesce([None, False, None]).alias("h"),
        coalesce([df["a"], False]).alias("i"),
        coalesce([False, df["a"]]).alias("j"),
        coalesce([df["a"], None]).alias("k"),
        coalesce([None, df["a"]]).alias("l"),
        coalesce([df["a"], df["b"], df["c"]]).alias("m"),
        coalesce([df["a"], df["b"], df["c"], False]).alias("n"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            COALESCE(NULL, FALSE) AS h,
            COALESCE(a, FALSE) AS i,
            COALESCE(FALSE, a) AS j,
            COALESCE(a, NULL) AS k,
            COALESCE(NULL, a) AS l,
            COALESCE(a,b,c) AS m,
            COALESCE(a,b,c,FALSE) AS n
        FROM a
        """,
        a=df,
    )

    # int
    df = _rand(
        spark, 100, 2, "a:long,b:long,c:long",
        a=(int, 50), b=(int, 50), c=(int, 50),
    )
    res = df.select(
        coalesce([None, 10, None]).alias("h"),
        coalesce([df["a"], 10]).alias("i"),
        coalesce([10, df["a"]]).alias("j"),
        coalesce([df["a"], None]).alias("k"),
        coalesce([None, df["a"]]).alias("l"),
        coalesce([df["a"], df["b"], df["c"]]).alias("m"),
        coalesce([df["a"], df["b"], df["c"], 10]).alias("n"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            COALESCE(NULL, 10) AS h,
            COALESCE(a, 10) AS i,
            COALESCE(10, a) AS j,
            COALESCE(a, NULL) AS k,
            COALESCE(NULL, a) AS l,
            COALESCE(a,b,c) AS m,
            COALESCE(a,b,c,10) AS n
        FROM a
        """,
        a=df,
    )

    # str
    df = _rand(
        spark, 100, 3, "a:str,b:str,c:str",
        a=(str, 50), b=(str, 50), c=(str, 50),
    )
    res = df.select(
        coalesce([None, "xx", None]).alias("h"),
        coalesce([df["a"], "xx"]).alias("i"),
        coalesce(["xx", df["a"]]).alias("j"),
        coalesce([df["a"], None]).alias("k"),
        coalesce([None, df["a"]]).alias("l"),
        coalesce([df["a"], df["b"], df["c"]]).alias("m"),
        coalesce([df["a"], df["b"], df["c"], "xx"]).alias("n"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            COALESCE(NULL, 'xx') AS h,
            COALESCE(a, 'xx') AS i,
            COALESCE('xx', a) AS j,
            COALESCE(a, NULL) AS k,
            COALESCE(NULL, a) AS l,
            COALESCE(a,b,c) AS m,
            COALESCE(a,b,c,'xx') AS n
        FROM a
        """,
        a=df,
    )

    # timestamp
    df = _rand(
        spark, 100, 4, "a:datetime,b:datetime,c:datetime",
        a=(datetime, 50), b=(datetime, 50), c=(datetime, 50),
    )
    ct = datetime(2020, 1, 1, 15)
    res = df.select(
        coalesce([None, ct, None]).alias("h"),
        coalesce([df["a"], ct]).alias("i"),
        coalesce([ct, df["a"]]).alias("j"),
        coalesce([df["a"], None]).alias("k"),
        coalesce([None, df["a"]]).alias("l"),
        coalesce([df["a"], df["b"], df["c"]]).alias("m"),
        coalesce([df["a"], df["b"], df["c"], ct]).alias("n"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            COALESCE(NULL, TIMESTAMP '2020-01-01 15:00:00') AS h,
            COALESCE(a, TIMESTAMP '2020-01-01 15:00:00') AS i,
            COALESCE(TIMESTAMP '2020-01-01 15:00:00', a) AS j,
            COALESCE(a, NULL) AS k,
            COALESCE(NULL, a) AS l,
            COALESCE(a,b,c) AS m,
            COALESCE(a,b,c,TIMESTAMP '2020-01-01 15:00:00') AS n
        FROM a
        """,
        a=df,
    )


def test_case_when(spark):
    """suite.py:845-850 — scalar CASE WHEN with truthy conditions."""
    sc = lambda e: _sc(spark, e)  # noqa: E731
    assert 4 == sc(case_when(default=4))
    assert 3 == sc(case_when((False, 1), (2, 3), default=4))
    assert 3 == sc(case_when((None, 1), (2, 3), default=4))
    assert 1 == sc(case_when((True, 1), (2, 3), default=4))
    assert 4 == sc(case_when((False, 1), (False, 3), default=4))


def test_case_when_sql(spark):
    """suite.py:852-965 — CASE WHEN over frames: bool conditions (with
    and without NULLs), derived float conditions, constant arms."""
    for seed, nulls in [(0, 0), (1, 10)]:
        df = _rand(
            spark, 20, seed, "a:bool,b:str,c:bool,d:str,e:str",
            a=(bool, nulls), b=(str, nulls or 0), c=(bool, nulls),
            d=(str, 10), e=(str, 10),
        )
        res = df.select(
            case_when((df["a"], df["b"]), (df["c"], df["d"])).alias("h"),
            case_when(
                (df["a"], df["b"]), (df["c"], df["d"]), default=df["e"]
            ).alias("i"),
        )
        assert_duck_eq(
            res,
            """
            SELECT
                CASE WHEN a THEN b WHEN c THEN d END AS h,
                CASE WHEN a THEN b WHEN c THEN d ELSE e END AS i
            FROM a
            """,
            a=df,
        )

    df = _rand(
        spark, 20, 2, "a:double,b:double,c:double,d:double,e:double",
        a=(float, 10), b=(float, 10), c=(float, 10),
        d=(float, 10), e=(float, 10),
    )
    res = df.select(
        case_when(
            (df["a"] > 0.5, df["b"]),
            ((df["c"] > 0.5) | (df["a"] > 0.3), df["d"]),
        ).alias("h"),
        case_when(
            (df["a"] > 0.5, df["b"]),
            ((df["c"] > 0.5) | (df["a"] > 0.3), df["d"]),
            default=df["e"],
        ).alias("i"),
        case_when(
            (df["a"] > 0.5, df["b"]),
            (df["a"] > 0.5, df["d"]),
            default=df["e"],
        ).alias("j"),
        case_when(
            (None, df["b"]),
            (df["a"] > 0.5, df["d"]),
            default=df["e"],
        ).alias("k"),
        case_when(
            (True, 2.0),
            (df["a"] > 0.5, df["d"]),
            default=df["e"],
        ).alias("l"),
        case_when(
            (True, None),
            (df["a"] > 0.5, df["d"]),
            default=df["e"],
        ).alias("m"),
    )
    assert_duck_eq(
        res,
        """
        SELECT
            CASE
                WHEN a>0.5 THEN b
                WHEN c>0.5 OR a>0.3 THEN d END AS h,
            CASE
                WHEN a>0.5 THEN b
                WHEN c>0.5 OR a>0.3 THEN d
                ELSE e END AS i,
            CASE
                WHEN a>0.5 THEN b
                WHEN a>0.5 THEN d
                ELSE e END AS j,
            CASE
                WHEN NULL THEN b
                WHEN a>0.5 THEN d
                ELSE e END AS k,
            CASE
                WHEN TRUE THEN 2.0
                WHEN a>0.5 THEN d
                ELSE e END AS l,
            CASE
                WHEN TRUE THEN NULL
                WHEN a>0.5 THEN d
                ELSE e END AS m
        FROM a
        """,
        a=df,
    )


# ----------------------------------------------------------- §like


def test_like(spark):
    """suite.py:967-1014 — scalar LIKE battery."""
    sc = lambda e: _sc(spark, e)  # noqa: E731
    for p in [True, False]:
        for i in [True, False]:
            assert sc(like(None, None, ignore_case=i, positive=p)) is None
            assert sc(like("x", None, ignore_case=i, positive=p)) is None

    assert sc(like("", ""))
    assert not sc(like("abc", ""))

    assert not sc(like("abc", "aBc"))
    assert sc(like("abc", "aBc", ignore_case=True))

    assert not sc(like("abc", "aB%"))
    assert not sc(like("abc", "aB_"))
    assert sc(like("abc", "aB%", ignore_case=True))
    assert sc(like("abc", "aB_", ignore_case=True))

    assert not sc(like("abc", "%Bc"))
    assert not sc(like("abc", "_Bc"))
    assert sc(like("abc", "%Bc", ignore_case=True))
    assert sc(like("abc", "_Bc", ignore_case=True))

    assert not sc(like("abc", "A_c"))
    assert not sc(like("abc", "A%c"))
    assert sc(like("abc", "A_c", ignore_case=True))
    assert sc(like("abc", "A%c", ignore_case=True))

    assert not sc(like("abc", "%B%"))
    assert not sc(like("abc", "_B_"))
    assert sc(like("abc", "%B%", ignore_case=True))
    assert sc(like("abc", "_B_", ignore_case=True))

    assert sc(like("abc", "_%"))
    assert sc(like("abc", "%_"))
    assert sc(like("abc", "%_%"))

    assert sc(like("abc", "%"))


def test_like_sql(spark):
    """suite.py:1016-1117 — the complete column LIKE battery, positive
    and negative, vs DuckDB."""
    pdf = pd.DataFrame(dict(a=["abc", "ABC", "abd", "aBd", "", "ab\\%\\_c", None]))
    df = to_df(spark, pdf.values.tolist(), "a:str")

    def battery(positive):
        return df.select(
            like(df["a"], None, positive=positive).alias("h"),
            like(df["a"], "", positive=positive).alias("i"),
            like(df["a"], "abc", ignore_case=True, positive=positive).alias("j"),
            like(df["a"], "aBc", ignore_case=False, positive=positive).alias("k"),
            like(df["a"], "ab%", ignore_case=True, positive=positive).alias("l"),
            like(df["a"], "aB%", ignore_case=False, positive=positive).alias("m"),
            like(df["a"], "%bc", ignore_case=True, positive=positive).alias("n"),
            like(df["a"], "%bc", ignore_case=False, positive=positive).alias("o"),
            like(df["a"], "a%c", ignore_case=True, positive=positive).alias("p"),
            like(df["a"], "a%c", ignore_case=False, positive=positive).alias("q"),
            like(df["a"], "%bc%", ignore_case=True, positive=positive).alias("r"),
            like(df["a"], "%bc%", ignore_case=False, positive=positive).alias("s"),
            like(df["a"], "%_", positive=positive).alias("t"),
            like(df["a"], "_%", positive=positive).alias("u"),
            like(df["a"], "%_%", positive=positive).alias("v"),
            like(df["a"], "_a%", ignore_case=True, positive=positive).alias("w"),
            like(df["a"], "_a%", ignore_case=False, positive=positive).alias("x"),
            like(df["a"], "%", positive=positive).alias("y"),
        )

    assert_duck_eq(
        battery(True),
        """
        SELECT
            a LIKE NULL AS h,
            a LIKE '' AS i,
            a ILIKE 'abc' AS j,
            a LIKE 'aBc' AS k,
            a ILIKE 'ab%' AS l,
            a LIKE 'aB%' AS m,
            a ILIKE '%bc' AS n,
            a LIKE '%bc' AS o,
            a ILIKE 'a%c' AS p,
            a LIKE 'a%c' AS q,
            a ILIKE '%bc%' AS r,
            a LIKE '%bc%' AS s,
            a LIKE '%_' AS t,
            a LIKE '_%' AS u,
            a LIKE '%_%' AS v,
            a ILIKE '_a%' AS w,
            a LIKE '_a%' AS x,
            a LIKE '%' AS y
        FROM a
        """,
        a=df,
    )
    assert_duck_eq(
        battery(False),
        """
        SELECT
            a NOT LIKE NULL AS h,
            a NOT LIKE '' AS i,
            a NOT ILIKE 'abc' AS j,
            a NOT LIKE 'aBc' AS k,
            a NOT ILIKE 'ab%' AS l,
            a NOT LIKE 'aB%' AS m,
            a NOT ILIKE '%bc' AS n,
            a NOT LIKE '%bc' AS o,
            a NOT ILIKE 'a%c' AS p,
            a NOT LIKE 'a%c' AS q,
            a NOT ILIKE '%bc%' AS r,
            a NOT LIKE '%bc%' AS s,
            a NOT LIKE '%_' AS t,
            a NOT LIKE '_%' AS u,
            a NOT LIKE '%_%' AS v,
            a NOT ILIKE '_a%' AS w,
            a NOT LIKE '_a%' AS x,
            a NOT LIKE '%' AS y
        FROM a
        """,
        a=df,
    )


# ----------------------------------------------------------- §casts


def test_cast_constant(spark):
    """suite.py:1119-1203 — the full ~90-assert scalar cast matrix."""
    cs = lambda v, t, h=None: _cast_s(spark, v, t, h)  # noqa: E731

    # -> bool
    assert cs(None, "bool") is None
    assert cs(True, "bool")
    assert not cs(False, "bool")
    assert cs(float("nan"), "bool") is None
    assert not cs(0, "bool")
    assert 1 == cs(1, "bool")
    assert 1 == cs(-2, "bool")
    assert 0 == cs(0.0, "bool")
    assert 1 == cs(0.1, "bool")
    assert 1 == cs(-0.2, "bool")
    assert 1 == cs(float("inf"), "bool")
    assert 1 == cs(float("-inf"), "bool")
    assert cs("nan", "bool") is None
    assert 1 == cs("tRue", "bool")
    assert 0 == cs("fAlse", "bool")

    # -> int
    assert cs(None, "long") is None
    assert 1 == cs(True, "long")
    assert 0 == cs(False, "long")
    assert cs(float("nan"), "long") is None
    assert 0 == cs(0, "long")
    assert 10 == cs(10, "long")
    assert 0 == cs(0.0, "long")
    assert 1 == cs(1.1, "long")
    assert -2 == cs(-2.2, "long")
    assert 0 == cs("0", "long")
    assert 10 == cs("10", "long")
    assert 0 == cs("0.0", "long")
    assert 1 == cs("1.1", "long")
    assert -2 == cs("-2.2", "long")
    assert cs("nan", "long") is None
    with raises(Exception):  # strict: raises like the reference
        _sc(spark, cast(float("inf"), "long", input_type="double", strict=True))
    with raises(Exception):
        _sc(spark, cast(float("-inf"), "long", input_type="double", strict=True))

    # -> float
    assert cs(None, "double") is None
    assert 1.0 == cs(True, "double")
    assert 0.0 == cs(False, "double")
    assert cs(float("nan"), "double") is None
    assert 0.0 == cs(0, "double")
    assert 10.0 == cs(10, "double")
    assert 0.0 == cs(0.0, "double")
    assert 1.1 == cs(1.1, "double")
    assert -2.2 == cs(-2.2, "double")
    assert 0.0 == cs("0", "double")
    assert 10.0 == cs("10", "double")
    assert 0.0 == cs("0.0", "double")
    assert 1.1 == cs("1.1", "double")
    assert -2.2 == cs("-2.2", "double")
    assert cs("nan", "double") is None
    assert np.isinf(cs("inf", "double"))
    assert np.isinf(cs("-inf", "double"))

    # -> str
    assert cs(None, "str") is None
    assert "true" == cs(True, "str")
    assert "false" == cs(False, "str")
    assert "true" == cs(-10, "str", T.BooleanType())
    assert "false" == cs(0, "str", T.BooleanType())
    assert "10" == cs(10, "str")
    assert "0" == cs(0, "str")
    assert "10.0" == cs(10.0, "str")
    assert "-10.0" == cs(-10.0, "str")
    assert cs(float("nan"), "str") is None
    assert "inf" == cs(float("inf"), "str", T.DoubleType())
    assert "-inf" == cs(float("-inf"), "str", T.DoubleType())
    assert "xy" == cs("xy", "str")
    assert isinstance(cs(date(2020, 1, 1), "str"), str)
    assert "2020-01-01" == cs(date(2020, 1, 1), "str")
    assert "2020-01-01 15:00:00" == cs(datetime(2020, 1, 1, 15), "str")
    assert cs(pd.NaT, "str") is None

    # -> date/datetime
    assert cs(None, "date") is None
    assert cs(None, "datetime") is None
    assert cs("nat", "date") is None
    assert cs("nat", "datetime") is None
    assert date(2020, 1, 1) == cs("2020-01-01", "date")
    assert date(2020, 1, 1) == cs("2020-01-01 15:00:00", "date")
    assert datetime(2020, 1, 1) == cs("2020-01-01", "datetime")
    assert datetime(2020, 1, 1, 15) == cs("2020-01-01 15:00:00", "datetime")


def _cast_cols(df, target, hints):
    """cast() each column of df to target using the frame's own types
    (the reference cast() sees the series dtype)."""
    return df.select(
        *[
            cast(F.col(c), target, input_type=df.schema[c].dataType).alias(n)
            for c, n in hints
        ]
    )


def test_cast_bool(spark):
    """suite.py:1205-1362."""
    df = to_df(spark, [[True], [False], [True]], "a:bool")
    res = df.select(
        cast(df.a, "long", input_type="bool").alias("h"),
        cast(df.a, "double", input_type="bool").alias("i"),
        cast(df.a, "bool", input_type="bool").alias("j"),
        cast(df.a, "str", input_type="bool").alias("k"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[1, 0, 1],
                i=[1.0, 0.0, 1.0],
                j=[True, False, True],
                k=["true", "false", "true"],
            )
        ),
    )

    df = to_df(spark, [[True], [False], [None]], "a:bool")
    res = df.select(
        cast(df.a, "long", input_type="bool").alias("h"),
        cast(df.a, "double", input_type="bool").alias("i"),
        cast(df.a, "bool", input_type="bool").alias("j"),
        cast(df.a, "str", input_type="bool").alias("k"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[1, 0, None],
                i=[1.0, 0.0, None],
                j=[True, False, None],
                k=["true", "false", None],
            )
        ),
    )

    # from float with None (NaN ≡ NULL at ingest)
    df = to_df(
        spark, [[2.0], [0.0], [-2.0], [None], [float("nan")]], "a:double"
    )
    res = df.select(cast(df.a, "bool", input_type="double").alias("h"))
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(dict(h=[True, False, True, None, None])),
    )

    # from int
    df = to_df(spark, [[2], [0], [-2]], "a:long")
    res = df.select(cast(df.a, "bool", input_type="long").alias("h"))
    assert_pdf_eq(spark_to_pd(res), pd.DataFrame(dict(h=[True, False, True])))

    # 1.0/0.0 doubles under a bool hint
    df = to_df(spark, [[1.0], [0.0], [None]], "a:double")
    res = df.select(
        cast(df.a, "long", input_type="bool").alias("h"),
        cast(df.a, "double", input_type="bool").alias("i"),
        cast(df.a, "bool", input_type="bool").alias("j"),
        cast(df.a, "str", input_type="bool").alias("k"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[1, 0, None],
                i=[1.0, 0.0, None],
                j=[True, False, None],
                k=["true", "false", None],
            )
        ),
    )

    # from strings: 'tRue'/'fAlse'/'1'/'0'/'1.0'/'0.0', junk -> NULL
    df = to_df(
        spark,
        [
            ["tRue", "tRue", "1", "1.0"],
            ["fAlse", "fAlse", "0", "0.0"],
            ["true", None, "abc", "abc"],
        ],
        "a:str,b:str,c:str,d:str",
    )
    res = df.select(
        cast(df.a, "bool", input_type="str").alias("h"),
        cast(df.b, "bool", input_type="str").alias("i"),
        cast(df.c, "bool", input_type="str").alias("j"),
        cast(df.d, "bool", input_type="str").alias("k"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[True, False, True],
                i=[True, False, None],
                j=[True, False, None],
                k=[True, False, None],
            )
        ),
    )

    # invalid: datetime -> bool raises
    df = to_df(spark, [[datetime(2020, 1, 1)]], "a:datetime")
    with raises(CastError):
        cast(df.a, "bool", input_type="datetime")


def test_cast_int(spark):
    """suite.py:1364-1477."""
    df = to_df(
        spark,
        [
            [True, 2, 1.1, "1", "5.5"],
            [False, 3, 2.2, "2", "6.6"],
            [True, 4, 3.3, "3", "7.7"],
        ],
        "a:bool,b:long,c:double,d:str,e:str",
    )
    res = df.select(
        cast(df.a, "long", input_type="bool").alias("h"),
        cast(df.b, "long", input_type="long").alias("i"),
        cast(df.c, "long", input_type="double").alias("j"),
        cast(df.d, "long", input_type="str").alias("k"),
        cast(df.e, "long", input_type="str").alias("l"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[1, 0, 1],
                i=[2, 3, 4],
                j=[1, 2, 3],
                k=[1, 2, 3],
                l=[5, 6, 7],
            )
        ),
    )

    df = to_df(spark, [[2], [3], [None]], "a:long")
    res = df.select(cast(df.a, "long", input_type="long").alias("h"))
    assert_pdf_eq(spark_to_pd(res), pd.DataFrame(dict(h=[2, 3, None])))

    df = to_df(spark, [[2.1], [float("nan")], [None]], "a:double")
    res = df.select(cast(df.a, "long", input_type="double").alias("h"))
    assert_pdf_eq(spark_to_pd(res), pd.DataFrame(dict(h=[2, None, None])))

    df = to_df(spark, [["2.1"], ["naN"], [None]], "a:str")
    res = df.select(cast(df.a, "long", input_type="str").alias("h"))
    assert_pdf_eq(spark_to_pd(res), pd.DataFrame(dict(h=[2, None, None])))

    # invalid: datetime -> int raises (eagerly, like the reference's
    # SlideCastError at suite.py:1475-1477)
    df = to_df(spark, [[datetime(2020, 1, 1)]], "a:datetime")
    with raises(CastError):
        cast(df.a, "long", input_type="datetime")


def test_cast_int_overflow(spark):
    """suite.py:1479-1488 — strict inf -> int raises on execution."""
    df = to_df(spark, [[2.1], [None]], "a:double")
    inf_df = df.select(
        F.when(F.col("a").isNull(), float("inf")).otherwise(F.col("a")).alias("a")
    )
    with raises(Exception):
        as_array(
            inf_df.select(
                cast(F.col("a"), "long", input_type="double", strict=True).alias("h")
            )
        )


def test_cast_float(spark):
    """suite.py:1490-1559."""
    df = to_df(
        spark,
        [
            [True, 2, 1.1, "5.5"],
            [False, 3, 2.2, "6.6"],
            [True, 4, 3.3, "7.7"],
        ],
        "a:bool,b:long,c:double,e:str",
    )
    res = df.select(
        cast(df.a, "double", input_type="bool").alias("h"),
        cast(df.b, "double", input_type="long").alias("i"),
        cast(df.c, "double", input_type="double").alias("j"),
        cast(df.e, "double", input_type="str").alias("l"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=[1.0, 0.0, 1.0],
                i=[2.0, 3.0, 4.0],
                j=[1.1, 2.2, 3.3],
                l=[5.5, 6.6, 7.7],
            )
        ),
    )

    # float32 target keeps values, nulls stay null
    res = to_df(spark, [[2.1], [None]], "a:double").select(
        cast(F.col("a"), "float32", input_type="double").alias("h")
    )
    got = [r["h"] for r in res.collect()]
    assert got[0] == pytest.approx(2.1, abs=1e-6)
    assert got[1] is None
    # inf survives the float cast (only NaN is nulled)
    inf_res = spark.range(1).select(
        cast(F.lit(float("inf")), "float32", input_type="double").alias("h")
    )
    assert np.isinf(inf_res.collect()[0]["h"])

    # from string with None: 'naN' -> NULL, 'inf'/'-inf' parse
    df = to_df(spark, [["2.1"], ["naN"], ["inf"], ["-inf"], [None]], "a:str")
    res = df.select(cast(df.a, "double", input_type="str").alias("h"))
    got = [r["h"] for r in res.collect()]
    assert got[0] == 2.1
    assert got[1] is None
    assert got[2] == float("inf")
    assert got[3] == float("-inf")
    assert got[4] is None


def test_cast_str(spark):
    """suite.py:1561-1706."""
    df = to_df(
        spark,
        [
            [False, 2, 1.1, datetime(2020, 1, 2), "aa"],
            [True, 3, 2.2, datetime(2020, 1, 3), "ab"],
            [True, 4, 3.3, datetime(2020, 1, 4), "ac"],
        ],
        "a:bool,b:long,c:double,d:datetime,e:str",
    )
    res = df.select(
        cast(df.a, "str", input_type="bool").alias("h"),
        cast(df.b, "str", input_type="long").alias("i"),
        cast(df.c, "str", input_type="double").alias("j"),
        cast(
            cast(df.d, "date", input_type="datetime"), "str", input_type="date"
        ).alias("k"),
        cast(df.e, "str", input_type="str").alias("l"),
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(
                h=["false", "true", "true"],
                i=["2", "3", "4"],
                j=["1.1", "2.2", "3.3"],
                k=["2020-01-02", "2020-01-03", "2020-01-04"],
                l=["aa", "ab", "ac"],
            )
        ),
    )

    df = to_df(spark, [[True], [False], [None]], "a:bool")
    res = df.select(cast(df.a, "str", input_type="bool").alias("h"))
    assert_pdf_eq(
        spark_to_pd(res), pd.DataFrame(dict(h=["true", "false", None]))
    )

    # float: NaN -> NULL, inf -> 'inf' (reference rendering)
    base = to_df(spark, [[2.1], [0.0], [1.0], [None]], "a:double")
    f_df = base.select(
        F.when(F.col("a") == 0.0, F.lit(float("nan")))
        .when(F.col("a") == 1.0, F.lit(float("inf")))
        .otherwise(F.col("a"))
        .alias("a")
    )
    res = f_df.select(cast(F.col("a"), "str", input_type="double").alias("h"))
    got = [r["h"] for r in res.collect()]
    assert got == ["2.1", None, "inf", None]

    df = to_df(spark, [[1], [None]], "a:long")
    res = df.select(cast(df.a, "str", input_type="long").alias("h"))
    assert_pdf_eq(spark_to_pd(res), pd.DataFrame(dict(h=["1", None])))

    df = to_df(
        spark,
        [[datetime(2020, 1, 1)], [datetime(2020, 1, 1, 15, 2, 3)], [None], [None]],
        "a:datetime",
    )
    res = df.select(cast(df.a, "str", input_type="datetime").alias("h"))
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            dict(h=["2020-01-01 00:00:00", "2020-01-01 15:02:03", None, None])
        ),
    )

    df = to_df(
        spark,
        [[date(2020, 1, 1)], [date(2020, 1, 2)], [None], [None]],
        "a:date",
    )
    res = df.select(cast(df.a, "str", input_type="date").alias("h"))
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(dict(h=["2020-01-01", "2020-01-02", None, None])),
    )


def test_cast_time(spark):
    """suite.py:1708-1794 — string -> date/datetime.  The engine is
    typed (DateType stays a date, not a midnight datetime as in
    pandas), so expectations use real dates."""
    df = to_df(
        spark,
        [
            ["2020-01-01", "2020-01-01 01:00:00"],
            ["2020-01-02", "2020-01-02 14:00:00"],
            ["2020-01-03", "2020-01-03 15:00:00"],
        ],
        "a:str,b:str",
    )
    res = df.select(
        cast(df.a, "date", input_type="str").alias("h"),
        cast(df.a, "datetime", input_type="str").alias("i"),
        cast(df.b, "date", input_type="str").alias("j"),
        cast(df.b, "datetime", input_type="str").alias("k"),
    )
    rows = sorted(as_array(res))
    assert rows == [
        [date(2020, 1, 1), datetime(2020, 1, 1), date(2020, 1, 1), datetime(2020, 1, 1, 1)],
        [date(2020, 1, 2), datetime(2020, 1, 2), date(2020, 1, 2), datetime(2020, 1, 2, 14)],
        [date(2020, 1, 3), datetime(2020, 1, 3), date(2020, 1, 3), datetime(2020, 1, 3, 15)],
    ]

    # str -> date with None
    df = to_df(spark, [["2020-01-01 01:00:00"], ["2020-01-02 00:00:00"], [None]], "a:str")
    res = df.select(cast(df.a, "date", input_type="str").alias("h"))
    assert sorted(as_array(res), key=lambda r: (r[0] is None, r)) == [
        [date(2020, 1, 1)],
        [date(2020, 1, 2)],
        [None],
    ]

    # str -> datetime with None
    df = to_df(spark, [["2020-01-01 11:00:00"], ["2020-01-02 12:00:00"], [None]], "a:str")
    res = df.select(cast(df.a, "datetime", input_type="str").alias("h"))
    assert sorted(as_array(res), key=lambda r: (r[0] is None, str(r[0]))) == [
        [datetime(2020, 1, 1, 11)],
        [datetime(2020, 1, 2, 12)],
        [None],
    ]


def test_cast_df(spark):
    """suite.py:1796-1832 — schema-driven frame cast with hints."""
    df = to_df(spark, [[1, True], [2, None], [None, False]], "a:long,b:bool")
    out = cast_df(df, "a:int,b:bool")
    assert out.schema["a"].dataType == T.IntegerType()
    assert out.schema["b"].dataType == T.BooleanType()

    out = cast_df(df, "a:str,b:str")
    assert out.schema["a"].dataType == T.StringType()
    assert out.schema["b"].dataType == T.StringType()

    # with input hint
    df = to_df(spark, [[1.0, None], [2.0, None], [None, None]], "a:double,b:double")
    out = cast_df(df, "a:double,b:int", input_schema="a:int,b:double")
    assert out.schema["a"].dataType == T.DoubleType()
    assert out.schema["b"].dataType == T.IntegerType()

    # empty
    df = to_df(spark, [], "a:double,b:long")
    out = cast_df(df, "a:double,b:int")
    assert out.schema["a"].dataType == T.DoubleType()
    assert out.schema["b"].dataType == T.IntegerType()
    assert out.count() == 0

    # empty + input hint
    out = cast_df(df, "a:double,b:int", input_schema="a:int,b:double")
    assert out.schema["a"].dataType == T.DoubleType()
    assert out.schema["b"].dataType == T.IntegerType()
    assert out.count() == 0


# ----------------------------------------------------------- §conversion


def test_cols_to_df(spark):
    """suite.py:1834-1851."""
    df = to_df(spark, [["a", 1]], "a:str,b:long")
    res = cols_to_df(df, [df["b"], df["a"]])
    assert_pdf_eq(
        spark_to_pd(res), spark_to_pd(to_df(spark, [[1, "a"]], "b:long,a:str"))
    )
    res = cols_to_df(df, [df["b"], df["a"]], ["x", "y"])
    assert_pdf_eq(
        spark_to_pd(res), spark_to_pd(to_df(spark, [[1, "a"]], "x:long,y:str"))
    )
    res = cols_to_df(df, [123, df["a"]], names=["x", "y"])
    assert_pdf_eq(
        spark_to_pd(res), spark_to_pd(to_df(spark, [[123, "a"]], "x:long,y:str"))
    )
    with raises(InvalidOperationError):
        cols_to_df(df, [123, 456], names=["x", "y"])


def test_to_schema(spark):
    """suite.py:1853-1880 — frame -> pyarrow schema."""
    df = to_df(spark, [[1.0, 2], [2.1, 3]], "x:double,y:long")
    assert to_schema(df) == pa.schema(
        [pa.field("x", pa.float64()), pa.field("y", pa.int64())]
    )
    df = to_df(spark, [["a", 2], ["b", 3]], "x:str,y:long")
    assert to_schema(df) == pa.schema(
        [pa.field("x", pa.string()), pa.field("y", pa.int64())]
    )
    df = to_df(spark, [], "x:int32,y:str")
    assert list(to_schema(df)) == [
        pa.field("x", pa.int32()),
        pa.field("y", pa.string()),
    ]
    df = to_df(spark, [[1, "x"], [2, "y"]], "x:int32,y:str")
    assert to_schema(df) == pa.schema(
        [pa.field("x", pa.int32()), pa.field("y", pa.string())]
    )
    # timestamps are microsecond (TRIAD_DEFAULT_TIMESTAMP)
    df = to_df(
        spark,
        [[datetime(2020, 1, 1, 2, 3, 4, 5), datetime(2020, 2, 2)]],
        "a:datetime,b:datetime",
    )
    assert to_schema(df) == pa.schema(
        [pa.field("a", pa.timestamp("us")), pa.field("b", pa.timestamp("us"))]
    )


def test_index_compatible(spark):
    """suite.py:1882-1893.  Declared absence (COVERAGE.md §2.7): Spark
    frames have no index, so there is nothing to become incompatible —
    egress always yields a clean RangeIndex."""
    df = to_df(spark, [[3.0, 2], [2.1, 3]], "x:double,y:long")
    out = spark_to_pd(df.orderBy(F.desc("x")))
    assert isinstance(out.index, pd.RangeIndex)
    assert list(out.index) == [0, 1]


def test_as_array_iterable(spark):
    """suite.py:1895-1944 — exact Python types on egress."""
    df = to_df(spark, [], "a:str,b:int")
    assert [] == as_array(df, "a:str,b:int")
    assert [] == as_array(df, "a:str,b:int", type_safe=True)

    df = to_df(spark, [["a", 1]], "a:str,b:int")
    assert [["a", 1]] == as_array(df, "a:str,b:int")
    assert [["a", 1]] == as_array(df, "a:str,b:int", columns=["a", "b"])
    assert [[1, "a"]] == as_array(df, "b:int,a:str", columns=["b", "a"])

    df = to_df(spark, [[1.0, 1.0]], "a:double,b:int")
    data = as_array(df, "a:double,b:int")
    assert [[1.0, 1]] == data
    assert isinstance(data[0][0], float)
    assert isinstance(data[0][1], int)
    assert [[1.0, 1]] == as_array(df, "a:double,b:int", columns=["a", "b"])
    assert [[1, 1.0]] == as_array(df, "b:int,a:double", columns=["b", "a"])

    df = to_df(spark, [[np.float64(1.0), 1.0]], "a:double,b:int")
    assert [[1.0, 1]] == as_array(df, "a:double,b:int")
    assert isinstance(as_array(df, "a:double,b:int")[0][0], float)
    assert isinstance(as_array(df, "a:double,b:int")[0][1], int)

    df = to_df(spark, [[pd.Timestamp("2020-01-01"), 1.0]], "a:datetime,b:int")
    assert [[datetime(2020, 1, 1), 1]] == as_array(df, "a:datetime,b:int")
    safe = as_array(df, "a:datetime,b:int", type_safe=True)
    assert isinstance(safe[0][0], datetime)
    assert isinstance(safe[0][1], int)

    df = to_df(spark, [[pd.NaT, 1.0]], "a:datetime,b:int")
    safe = as_array(df, "a:datetime,b:int", type_safe=True)
    assert safe[0][0] is None
    assert isinstance(safe[0][1], int)

    df = to_df(spark, [[1.0, 1.0]], "a:double,b:int")
    assert [[1.0, 1]] == as_array(df, "a:double,b:int", type_safe=True)


def test_as_array_iterable_datetime(spark):
    """suite.py:1946-1958 — datetime/date come out as stdlib types."""
    df = to_df(
        spark,
        [[datetime(2020, 1, 1, 2, 3, 4, 5), date(2020, 2, 2)]],
        "a:datetime,b:date",
    )
    v1 = list(as_array_iterable(df, schema="a:datetime,b:date", type_safe=True))[0]
    assert not isinstance(v1[0], pd.Timestamp)
    assert isinstance(v1[0], datetime)
    assert isinstance(v1[1], date)


def test_nested(spark):
    """suite.py:1960-1979 — JSON strings decode into nested types."""
    data = [[json.dumps([dict(b=[30, "40"])])]]
    raw = to_df(spark, data, "a:str")
    df = decode_json_columns(raw, "a:[{a:str,b:[long]}]")
    a = as_array(df, "a:[{a:str,b:[long]}]", type_safe=True)
    assert [[[dict(a=None, b=[30, 40])]]] == a

    data = [[json.dumps(["1", 2])]]
    raw = to_df(spark, data, "a:str")
    df = decode_json_columns(raw, "a:[long]")
    a = as_array(df, "a:[long]", type_safe=True)
    assert [[[1, 2]]] == a


def test_binary(spark):
    """suite.py:1981-1988."""
    b = pickle.dumps("xyz")
    data = [[b, b"xy"]]
    df = to_df(spark, data, "a:bytes,b:bytes")
    a = as_array(df, "a:bytes,b:bytes", type_safe=True)
    assert [[b, b"xy"]] == a


def test_nan_none(spark):
    """suite.py:1990-2004 — NULLs come out as None, never NaN/NaT."""
    df = to_df(spark, [[None, None]], "b:str,c:double")
    arr = as_array(df, "b:str,c:double", type_safe=True)[0]
    assert arr[0] is None
    assert arr[1] is None

    df = to_df(spark, [], "b:str,c:double")
    assert len(as_array(df, "b:str,c:double")) == 0

    df = to_df(spark, [[None, None]], "b:int,c:bool")
    arr = as_array(df, "b:int,c:bool", type_safe=True)[0]
    assert arr[0] is None
    assert arr[1] is None


def test_boolean_enforce(spark):
    """suite.py:2006-2018 — 1/0/1.0/0.0 coerce into bool columns."""
    df = to_df(spark, [[1, True], [2, False], [3, None]], "b:int,c:bool")
    arr = as_array(df, "b:int,c:bool", type_safe=True)
    assert [[1, True], [2, False], [3, None]] == sorted(arr)

    df = to_df(spark, [[1, 1], [2, 0]], "b:int,c:bool")
    arr = as_array(df, "b:int,c:bool", type_safe=True)
    assert [[1, True], [2, False]] == sorted(arr)

    df = to_df(spark, [[1, 1.0], [2, 0.0]], "b:int,c:bool")
    arr = as_array(df, "b:int,c:bool", type_safe=True)
    assert [[1, True], [2, False]] == sorted(arr)


# ----------------------------------------------------------- §group-by


def test_sql_group_by_apply(spark):
    """suite.py:2020-2064 — NULL keys are real groups; cols=[] is the
    whole frame."""
    import warnings

    df = to_df(spark, [["a", 1], ["a", 2], [None, 3]], "b:str,c:long")

    def _m1(pdf):
        pdf = pdf.copy()
        pdf["ct"] = pdf.shape[0]
        return pdf

    res = sql_groupby_apply(df, ["b"], _m1, output_schema="b:str,c:long,ct:long")
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            [["a", 1, 2], ["a", 2, 2], [None, 3, 1]], columns=["b", "c", "ct"]
        ),
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        res = sql_groupby_apply(df, [], _m1, output_schema="b:str,c:long,ct:long")
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            [["a", 1, 3], ["a", 2, 3], [None, 3, 3]], columns=["b", "c", "ct"]
        ),
    )

    df = to_df(
        spark,
        [[1.0, "a"], [1.0, "b"], [None, "c"], [None, "d"]],
        "b:double,c:str",
    )
    res = sql_groupby_apply(df, ["b"], _m1, output_schema="b:double,c:str,ct:long")
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            [[1.0, "a", 2], [1.0, "b", 2], [None, "c", 2], [None, "d", 2]],
            columns=["b", "c", "ct"],
        ),
    )


def test_sql_group_by_apply_special_types(spark):
    """suite.py:2066-2153 — composite NULL keys across value types."""

    def _m1(pdf):
        return pdf.assign(ct=pdf.shape[0])

    df = to_df(
        spark,
        [["a", 1.0], [None, 3.0], [None, 3.0], [None, None]],
        "a:str,b:double",
    )
    res = sql_groupby_apply(df, ["a", "b"], _m1, output_schema="a:str,b:double,ct:long")
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            [["a", 1.0, 1], [None, 3.0, 2], [None, 3.0, 2], [None, None, 1]],
            columns=["a", "b", "ct"],
        ),
    )

    ts = datetime(2023, 5, 6, 7, 8, 9)
    df = to_df(
        spark,
        [["a", ts], [None, ts], [None, ts], [None, None]],
        "a:str,b:datetime",
    )
    res = sql_groupby_apply(
        df, ["a", "b"], _m1, output_schema="a:str,b:datetime,ct:long"
    )
    assert_pdf_eq(
        spark_to_pd(res),
        pd.DataFrame(
            [["a", ts, 1], [None, ts, 2], [None, ts, 2], [None, None, 1]],
            columns=["a", "b", "ct"],
        ),
    )

    d = date(2020, 1, 1)
    df = to_df(
        spark,
        [["a", d], [None, d], [None, d], [None, None]],
        "a:str,b:date",
    )
    res = sql_groupby_apply(df, ["a", "b"], _m1, output_schema="a:str,b:date,ct:long")
    got = sorted(
        as_array(res), key=lambda r: (r[0] is None, str(r[0]), r[1] is None, str(r[1]))
    )
    assert got == [
        ["a", d, 1],
        [None, d, 2],
        [None, d, 2],
        [None, None, 1],
    ]

    df = to_df(
        spark,
        [["a", d], ["b", d], ["b", d], ["b", None]],
        "a:str,b:date",
    )
    res = sql_groupby_apply(df, ["a", "b"], _m1, output_schema="a:str,b:date,ct:long")
    got = sorted(as_array(res), key=lambda r: (r[0], r[1] is None, str(r[1])))
    assert got == [
        ["a", d, 1],
        ["b", d, 2],
        ["b", d, 2],
        ["b", None, 1],
    ]


# ----------------------------------------------------------- §set ops


def test_drop_duplicates(spark):
    """suite.py:2155-2161 — NULL rows dedupe like values."""
    a = to_df(spark, [["x", "a"], ["x", "a"], [None, None]], "a:str,b:str")
    assert_pdf_eq(
        spark_to_pd(drop_duplicates(a)),
        pd.DataFrame([["x", "a"], [None, None]], columns=["a", "b"]),
    )


def test_drop_duplicates_sql(spark):
    """suite.py:2163-2194."""
    df = _rand(spark, 100, 0, "a:long,b:long", a=int, b=int)
    assert_duck_eq(drop_duplicates(df), "SELECT DISTINCT * FROM a", a=df)

    df = _rand(spark, 100, 1, "a:long,b:long", a=(int, 50), b=(int, 50))
    assert_duck_eq(drop_duplicates(df), "SELECT DISTINCT * FROM a", a=df)

    df = _rand(
        spark, 100, 2, "a:long,b:str,c:double", a=(int, 50), b=(str, 50), c=float
    )
    assert_duck_eq(drop_duplicates(df), "SELECT DISTINCT * FROM a", a=df)

    df = _rand(
        spark, 100, 3, "a:long,b:datetime,c:double",
        a=(int, 50), b=(datetime, 50), c=float,
    )
    assert_duck_eq(drop_duplicates(df), "SELECT DISTINCT * FROM a", a=df)


def test_union(spark):
    """suite.py:2196-2227 — positional rename, ALL vs DISTINCT."""
    a = to_df(spark, [["x", "a"], ["x", "a"], [None, None]], "a:str,b:str")
    b = to_df(spark, [["xx", "aa"], [None, None], ["a", "x"]], "b:str,a:str")
    assert_pdf_eq(
        spark_to_pd(union(a, b, unique=False)),
        pd.DataFrame(
            [
                ["x", "a"],
                ["x", "a"],
                [None, None],
                ["xx", "aa"],
                [None, None],
                ["a", "x"],
            ],
            columns=["a", "b"],
        ),
    )
    assert_pdf_eq(
        spark_to_pd(union(a, b, unique=True)),
        pd.DataFrame(
            [["x", "a"], ["xx", "aa"], [None, None], ["a", "x"]],
            columns=["a", "b"],
        ),
    )


def test_union_sql(spark):
    """suite.py:2229-2268."""
    a = _rand(
        spark, 30, 0, "b:long,c:str,d:datetime",
        b=(int, 10), c=(str, 10), d=(datetime, 10),
    )
    b = _rand(
        spark, 80, 1, "b:long,c:str,d:datetime",
        b=(int, 50), c=(str, 50), d=(datetime, 50),
    )
    c = _rand(
        spark, 100, 2, "b:long,c:str,d:datetime",
        b=(int, 50), c=(str, 50), d=(datetime, 50),
    )
    assert_duck_eq(
        union(union(a, b, unique=True), c, unique=True),
        """
        SELECT * FROM a
            UNION SELECT * FROM b
            UNION SELECT * FROM c
        """,
        a=a, b=b, c=c,
    )
    assert_duck_eq(
        union(union(a, b, unique=False), c, unique=False),
        """
        SELECT * FROM a
            UNION ALL SELECT * FROM b
            UNION ALL SELECT * FROM c
        """,
        a=a, b=b, c=c,
    )


def test_intersect(spark):
    """suite.py:2270-2283 — null-safe intersection, dup semantics."""
    a = to_df(spark, [["x", "a"], ["x", "a"], [None, None]], "a:str,b:str")
    b = to_df(
        spark, [["xx", "aa"], [None, None], [None, None], ["a", "x"]], "b:str,a:str"
    )
    assert_pdf_eq(
        spark_to_pd(intersect(a, b, unique=False)),
        pd.DataFrame([[None, None]], columns=["a", "b"]),
    )
    assert_pdf_eq(
        spark_to_pd(intersect(a, b, unique=True)),
        pd.DataFrame([[None, None]], columns=["a", "b"]),
    )
    b = to_df(spark, [["xx", "aa"], [None, None], ["x", "a"]], "b:str,a:str")
    assert_pdf_eq(
        spark_to_pd(intersect(a, b, unique=False)),
        pd.DataFrame([["x", "a"], ["x", "a"], [None, None]], columns=["a", "b"]),
    )
    assert_pdf_eq(
        spark_to_pd(intersect(a, b, unique=True)),
        pd.DataFrame([["x", "a"], [None, None]], columns=["a", "b"]),
    )


def test_intersect_sql(spark):
    """suite.py:2285-2328."""
    for seed, ctype, schema in [(0, str, "b:long,c:str"), (1, datetime, "b:long,c:datetime")]:
        a = _rand(spark, 30, seed, schema, b=(int, 10), c=(ctype, 10))
        b = _rand(spark, 80, seed + 10, schema, b=(int, 50), c=(ctype, 50))
        c = _rand(spark, 100, seed + 20, schema, b=(int, 50), c=(ctype, 50))
        assert_duck_eq(
            intersect(intersect(c, b, unique=True), a, unique=True),
            """
            SELECT * FROM c
                INTERSECT SELECT * FROM b
                INTERSECT SELECT * FROM a
            """,
            a=a, b=b, c=c,
        )


def test_except(spark):
    """suite.py:2330-2341 — anti semantics (dups kept on the left for
    unique=False), null-safe."""
    a = to_df(spark, [["x", "a"], ["x", "a"], [None, None]], "a:str,b:str")
    b = to_df(spark, [["xx", "aa"], [None, None], ["a", "x"]], "b:str,a:str")
    assert_pdf_eq(
        spark_to_pd(except_df(a, b, unique=False)),
        pd.DataFrame([["x", "a"], ["x", "a"]], columns=["a", "b"]),
    )
    assert_pdf_eq(
        spark_to_pd(except_df(a, b, unique=True)),
        pd.DataFrame([["x", "a"]], columns=["a", "b"]),
    )
    b = to_df(spark, [["xx", "aa"], [None, None], ["x", "a"]], "b:str,a:str")
    assert except_df(a, b, unique=False).count() == 0
    assert except_df(a, b, unique=True).count() == 0


def test_except_sql(spark):
    """suite.py:2343-2386."""
    for seed, ctype, schema in [(0, str, "b:long,c:str"), (1, datetime, "b:long,c:datetime")]:
        a = _rand(spark, 30, seed, schema, b=(int, 10), c=(ctype, 10))
        b = _rand(spark, 80, seed + 10, schema, b=(int, 50), c=(ctype, 50))
        c = _rand(spark, 100, seed + 20, schema, b=(int, 50), c=(ctype, 50))
        assert_duck_eq(
            except_df(except_df(c, b, unique=True), a, unique=True),
            """
            SELECT * FROM c
                EXCEPT SELECT * FROM b
                EXCEPT SELECT * FROM a
            """,
            a=a, b=b, c=c,
        )


# ----------------------------------------------------------- §joins


def test_joins(spark):
    """suite.py:2388-2466 — all 7 join types on tiny frames with NULL
    keys (NULL never matches; anti keeps NULL-key rows)."""

    def check(df1, df2, join_type, on, expected, schema):
        res = join(df1, df2, join_type, on=on)
        assert_pdf_eq(
            spark_to_pd(res), spark_to_pd(to_df(spark, expected, schema))
        )

    df1 = to_df(spark, [[0, 1], [2, 3]], "a:long,b:long")
    df2 = to_df(spark, [[0, 10], [20, 30]], "a:long,c:long")
    df3 = to_df(spark, [[0, 1], [None, 3]], "a:long,b:long")
    df4 = to_df(spark, [[0, 10], [None, 30]], "a:long,c:long")
    abc = "a:long,b:long,c:long"
    ab = "a:long,b:long"
    check(df1, df2, "inner", ["a"], [[0, 1, 10]], abc)
    check(df3, df4, "inner", ["a"], [[0, 1, 10]], abc)
    check(df1, df2, "left_semi", ["a"], [[0, 1]], ab)
    check(df3, df4, "left_semi", ["a"], [[0, 1]], ab)
    check(df1, df2, "left_anti", ["a"], [[2, 3]], ab)
    check(df3, df4, "left_anti", ["a"], [[None, 3]], ab)
    check(df1, df2, "left_outer", ["a"], [[0, 1, 10], [2, 3, None]], abc)
    check(df3, df4, "left_outer", ["a"], [[0, 1, 10], [None, 3, None]], abc)
    check(df1, df2, "right_outer", ["a"], [[0, 1, 10], [20, None, 30]], abc)
    check(df3, df4, "right_outer", ["a"], [[0, 1, 10], [None, None, 30]], abc)
    check(
        df1, df2, "full_outer", ["a"],
        [[0, 1, 10], [2, 3, None], [20, None, 30]], abc,
    )
    check(
        df3, df4, "full_outer", ["a"],
        [[0, 1, 10], [None, 3, None], [None, None, 30]], abc,
    )

    df1 = to_df(spark, [[0, 1], [None, 3]], "a:long,b:long")
    df2 = to_df(spark, [[0, 10], [None, 30]], "c:long,d:long")
    check(
        df1, df2, "cross", [],
        [
            [0, 1, 0, 10],
            [None, 3, 0, 10],
            [0, 1, None, 30],
            [None, 3, None, 30],
        ],
        "a:long,b:long,c:long,d:long",
    )


def _join_fixtures(spark, seed=0):
    a = _rand(
        spark, 100, seed, "a:long,b:datetime,c:double",
        a=(int, 40), b=(datetime, 40), c=(float, 40),
    )
    b = _rand(
        spark, 80, seed + 100, "d:double,a:long,b:datetime",
        d=(float, 10), a=(int, 10), b=(datetime, 10),
    )
    return a, b


def test_join_inner_sql(spark):
    """suite.py:2468-2481."""
    a, b = _join_fixtures(spark)
    assert_duck_eq(
        join(a, b, "inner", on=["a", "b"]).select("a", "b", "c", "d"),
        "SELECT a.*, d FROM a INNER JOIN b ON a.a=b.a AND a.b=b.b",
        a=a, b=b,
    )


def test_join_left_sql(spark):
    """suite.py:2483-2494."""
    a, b = _join_fixtures(spark, 1)
    assert_duck_eq(
        join(a, b, "left", on=["a", "b"]).select("a", "b", "c", "d"),
        "SELECT a.*, d FROM a LEFT JOIN b ON a.a=b.a AND a.b=b.b",
        a=a, b=b,
    )


def test_join_right_sql(spark):
    """suite.py:2496-2509."""
    a, b = _join_fixtures(spark, 2)
    assert_duck_eq(
        join(a, b, "right", on=["a", "b"]).select("c", "d", "a", "b"),
        "SELECT c, b.* FROM a RIGHT JOIN b ON a.a=b.a AND a.b=b.b",
        a=a, b=b,
    )


def test_join_full_sql(spark):
    """suite.py:2511-2523."""
    a, b = _join_fixtures(spark, 3)
    assert_duck_eq(
        join(a, b, "full", on=["a", "b"]).select("a", "b", "c", "d"),
        """SELECT COALESCE(a.a, b.a) AS a, COALESCE(a.b, b.b) AS b, c, d
        FROM a FULL JOIN b ON a.a=b.a AND a.b=b.b""",
        a=a, b=b,
    )


def test_join_cross_sql(spark):
    """suite.py:2525-2536."""
    a = _rand(
        spark, 10, 4, "a:long,b:datetime,c:double",
        a=(int, 4), b=(datetime, 4), c=(float, 4),
    )
    b = _rand(
        spark, 20, 5, "dd:double,aa:long,bb:datetime",
        dd=(float, 1), aa=(int, 1), bb=(datetime, 1),
    )
    assert_duck_eq(
        join(a, b, "cross", on=[]),
        "SELECT * FROM a CROSS JOIN b",
        a=a, b=b,
    )


def test_join_semi(spark):
    """suite.py:2538-2551."""
    a, b = _join_fixtures(spark, 6)
    assert_duck_eq(
        join(a, b, "semi", on=["a", "b"]),
        """SELECT a.* FROM a INNER JOIN (SELECT DISTINCT a,b FROM b) x
        ON a.a=x.a AND a.b=x.b
        """,
        a=a, b=b,
    )


def test_join_anti(spark):
    """suite.py:2553-2566."""
    a, b = _join_fixtures(spark, 7)
    assert_duck_eq(
        join(a, b, "anti", on=["a", "b"]),
        """SELECT a.* FROM a LEFT JOIN (SELECT a,b, 1 AS z FROM b) x
        ON a.a=x.a AND a.b=x.b WHERE z IS NULL
        """,
        a=a, b=b,
    )


def test_join_multi_sql(spark):
    """suite.py:2568-2591 — three-way composed equi-join."""
    a, b = _join_fixtures(spark, 8)
    c = _rand(
        spark, 80, 9, "dd:double,a:long,b:datetime",
        dd=(float, 10), a=(int, 10), b=(datetime, 10),
    )
    assert_duck_eq(
        join(join(a, b, "inner", on=["a", "b"]), c, "inner", on=["a", "b"]).select(
            "a", "b", "c", "d", "dd"
        ),
        """
        SELECT a.*,d,dd FROM a
            INNER JOIN b ON a.a=b.a AND a.b=b.b
            INNER JOIN c ON a.a=c.a AND c.b=b.b
        """,
        a=a, b=b, c=c,
    )
