"""IS NULL/TRUE/FALSE, IN, BETWEEN, LIKE — oracle-checked.

Behavioral model: /root/reference/slide_test/suite.py:391-601 (is_value,
is_in), :603-691 (between), :967-1117 (like)."""

import pandas as pd
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.functions import is_between, is_in, is_value, like
from tests.helpers import assert_duck_eq


def test_is_value_null(spark):
    df = to_df(
        spark,
        [[True], [False], [None]],
        "a:bool",
    )
    res = df.select(
        is_value(F.col("a"), None, True).alias("isnull"),
        is_value(F.col("a"), None, False).alias("notnull"),
        is_value(F.col("a"), True, True).alias("istrue"),
        is_value(F.col("a"), True, False).alias("nottrue"),
        is_value(F.col("a"), False, True).alias("isfalse"),
        is_value(F.col("a"), False, False).alias("notfalse"),
    )
    assert_duck_eq(
        res,
        """SELECT a IS NULL AS isnull, a IS NOT NULL AS notnull,
                  a IS TRUE AS istrue, a IS NOT TRUE AS nottrue,
                  a IS FALSE AS isfalse, a IS NOT FALSE AS notfalse
           FROM t""",
        t=df,
    )


def test_is_value_numeric_truthiness(spark):
    # nonzero IS TRUE; NaN behaves as NULL
    df = to_df(spark, [[2.0], [0.0], [None], [float("nan")]], "a:double")
    out = df.select(
        is_value(F.col("a"), True, True).alias("t"),
        is_value(F.col("a"), False, True).alias("f"),
        is_value(F.col("a"), None, True).alias("n"),
    ).toPandas()
    assert list(out["t"]) == [True, False, False, False]
    assert list(out["f"]) == [False, True, False, False]
    assert list(out["n"]) == [False, False, True, True]


def test_is_in_constants(spark):
    df = to_df(
        spark,
        [[1, "a"], [2, "b"], [None, None]],
        "a:long,b:str",
    )
    res = df.select(
        is_in(F.col("a"), [1, 3], True).alias("in1"),
        is_in(F.col("a"), [1, 3], False).alias("nin1"),
        is_in(F.col("a"), [1, None], True).alias("in_null"),
        is_in(F.col("a"), [5, None], True).alias("in_null_miss"),
        is_in(F.col("b"), ["a", "c"], True).alias("in_str"),
    )
    assert_duck_eq(
        res,
        """SELECT a IN (1,3) AS in1, a NOT IN (1,3) AS nin1,
                  a IN (1,NULL) AS in_null, a IN (5,NULL) AS in_null_miss,
                  b IN ('a','c') AS in_str
           FROM t""",
        t=df,
    )


def test_is_in_columns(spark):
    # column-valued list members (reference slide/utils.py:389-399)
    df = to_df(
        spark,
        [[1.0, 1.0, 2.0], [2.0, 3.0, None], [None, 1.0, 1.0]],
        "a:double,b:double,c:double",
    )
    res = df.select(
        is_in(F.col("a"), [F.col("b"), F.col("c"), 5.0], True).alias("x"),
        is_in(F.col("a"), [F.col("b"), F.col("c")], False).alias("y"),
    )
    assert_duck_eq(
        res,
        "SELECT a IN (b,c,5.0) AS x, a NOT IN (b,c) AS y FROM t",
        t=df,
    )


def test_is_between(spark):
    df = to_df(
        spark,
        [
            [1.0, 1.0, 2.0],
            [2.0, 3.0, None],
            [None, 1.0, 1.0],
            [3.0, None, 2.0],
            [3.0, None, 4.0],
        ],
        "a:double,b:double,c:double",
    )
    res = df.select(
        is_between(F.col("a"), F.col("b"), F.col("c"), True).alias("x"),
        is_between(F.col("a"), F.col("b"), F.col("c"), False).alias("y"),
        is_between(F.col("a"), 1.0, 2.0, True).alias("z"),
    )
    assert_duck_eq(
        res,
        """SELECT a BETWEEN b AND c AS x, a NOT BETWEEN b AND c AS y,
                  a BETWEEN 1.0 AND 2.0 AS z FROM t""",
        t=df,
    )


def test_like_shapes(spark):
    df = to_df(
        spark,
        [["abc"], ["ABC"], ["abd"], ["aBd"], [""], [None]],
        "a:str",
    )
    res = df.select(
        like(F.col("a"), "abc").alias("eq"),
        like(F.col("a"), "ab%").alias("start"),
        like(F.col("a"), "%bc").alias("end"),
        like(F.col("a"), "%b%").alias("contain"),
        like(F.col("a"), "a_c").alias("single"),
        like(F.col("a"), "%").alias("any"),
        like(F.col("a"), "").alias("empty"),
        like(F.col("a"), "ab%", ignore_case=True).alias("istart"),
        like(F.col("a"), "ab%", positive=False).alias("nstart"),
    )
    assert_duck_eq(
        res,
        """SELECT a LIKE 'abc' AS eq, a LIKE 'ab%' AS start,
                  a LIKE '%bc' AS "end", a LIKE '%b%' AS contain,
                  a LIKE 'a_c' AS single, a LIKE '%' AS any,
                  a LIKE '' AS empty, a ILIKE 'ab%' AS istart,
                  a NOT LIKE 'ab%' AS nstart
           FROM t""",
        t=df,
    )


def test_like_null_pattern(spark):
    df = to_df(spark, [["abc"]], "a:str")
    out = df.select(like(F.col("a"), None).alias("x")).toPandas()
    assert out["x"][0] is None or pd.isna(out["x"][0])


def test_like_escapes(spark):
    # backslash escapes wildcard chars (reference LikeExpr tokenizer
    # semantics; Spark's default LIKE escape char is also backslash)
    df = to_df(spark, [["ab%_c"], ["abX_c"], ["abXYc"], ["ab"]], "a:str")
    res = df.select(
        "a",
        like(F.col("a"), r"ab\%\_c").alias("lit_both"),
        like(F.col("a"), r"ab\%%").alias("lit_pct_then_any"),
        like(F.col("a"), r"ab%\_c").alias("any_then_lit_us"),
    )
    got = {r["a"]: (r["lit_both"], r["lit_pct_then_any"], r["any_then_lit_us"]) for r in res.collect()}
    assert got["ab%_c"] == (True, True, True)
    assert got["abX_c"] == (False, False, True)
    assert got["abXYc"] == (False, False, False)
    assert got["ab"] == (False, False, False)
    assert_duck_eq(
        res.select("lit_both", "any_then_lit_us"),
        r"SELECT a LIKE 'ab\%\_c' ESCAPE '\' AS lit_both,"
        r" a LIKE 'ab%\_c' ESCAPE '\' AS any_then_lit_us FROM t",
        t=df,
    )
