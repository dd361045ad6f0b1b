"""Cast matrix — the §4.3 bridge semantics.

Behavioral model: /root/reference/slide_test/suite.py:1119-1832
(scalar matrix + bool/int/float/str/datetime/date column families +
cast_df)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.exceptions import CastError
from pandasy_spark.functions import cast, cast_df


def _col(df, expr, **kw):
    out = df.select(cast(F.col("a"), expr, **kw).alias("x")).toPandas()["x"]
    return [None if pd.isna(v) else v for v in out]


def test_cast_str_to_bool(spark):
    df = to_df(
        spark,
        [["tRue"], ["fAlse"], ["1"], ["0"], ["1.0"], ["0.0"], ["abc"], [None]],
        "a:str",
    )
    assert _col(df, "bool", input_type="str") == [
        True,
        False,
        True,
        False,
        True,   # "1.0" accepted (Spark alone would NULL this)
        False,  # "0.0"
        None,
        None,
    ]


def test_cast_numeric_to_bool(spark):
    df = to_df(spark, [[2.0], [0.0], [-2.0], [None], [float("nan")]], "a:double")
    assert _col(df, "bool", input_type="double") == [True, False, True, None, None]


def test_cast_datetime_to_bool_raises(spark):
    df = to_df(spark, [[dt.datetime(2020, 1, 1)]], "a:datetime")
    with pytest.raises(CastError):
        df.select(cast(F.col("a"), "bool", input_type="datetime"))


def test_cast_str_to_int_via_float(spark):
    # "1.1" -> 1, "nan" -> NULL (reference slide/utils.py:1047-1056)
    df = to_df(spark, [["1"], ["1.1"], ["-2.7"], ["nan"], [None]], "a:str")
    assert _col(df, "long", input_type="str") == [1, 1, -2, None, None]


def test_cast_float_to_int_truncates(spark):
    df = to_df(spark, [[2.1], [-2.7], [None], [float("nan")]], "a:double")
    assert _col(df, "long", input_type="double") == [2, -2, None, None]


def test_cast_inf_to_int_strict_raises(spark):
    from py4j.protocol import Py4JJavaError

    df = to_df(spark, [[2.1], [float("inf")]], "a:double")
    with pytest.raises(Exception) as ei:
        df.select(
            cast(F.col("a"), "long", input_type="double", strict=True)
        ).collect()
    assert isinstance(ei.value, Py4JJavaError) or "inf" in str(ei.value)


def test_cast_inf_to_int_lenient_nulls(spark):
    df = to_df(spark, [[2.1], [float("inf")], [float("-inf")]], "a:double")
    assert _col(df, "long", input_type="double") == [2, None, None]


def test_cast_str_to_float_nan_is_null(spark):
    df = to_df(spark, [["1.5"], ["nan"], ["inf"], [None]], "a:str")
    assert _col(df, "double", input_type="str") == [1.5, None, float("inf"), None]


def test_cast_to_str_formats(spark):
    df = to_df(
        spark,
        [[True, 2, 1.1, dt.datetime(2020, 1, 1, 15, 2, 3), dt.date(2020, 1, 1)]],
        "a:bool,b:long,c:double,d:datetime,e:date",
    )
    out = df.select(
        cast(F.col("a"), "str").alias("a"),
        cast(F.col("b"), "str").alias("b"),
        cast(F.col("c"), "str").alias("c"),
        cast(F.col("d"), "str").alias("d"),
        cast(F.col("e"), "str").alias("e"),
        cast(F.lit(10.0), "str").alias("f"),
    ).toPandas()
    assert list(out.iloc[0]) == [
        "true",
        "2",
        "1.1",
        "2020-01-01 15:02:03",
        "2020-01-01",
        "10.0",
    ]


def test_cast_str_to_datetime_and_date(spark):
    df = to_df(spark, [["2020-01-01 15:02:03"], [None]], "a:str")
    assert _col(df, "datetime", input_type="str") == [
        dt.datetime(2020, 1, 1, 15, 2, 3),
        None,
    ]
    assert _col(df, "date", input_type="str") == [dt.date(2020, 1, 1), None]


def test_cast_df_whole_frame(spark):
    df = to_df(
        spark,
        [["1", "2.1", "true"], ["3", "nan", "0"], [None, None, None]],
        "a:str,b:str,c:str",
    )
    out = cast_df(df, "x:long,y:double,z:bool")
    assert [f.name for f in out.schema.fields] == ["x", "y", "z"]
    pdf = out.toPandas()
    assert [None if pd.isna(v) else v for v in pdf["x"]] == [1, 3, None]
    assert [None if pd.isna(v) else v for v in pdf["y"]] == [2.1, None, None]
    assert [None if pd.isna(v) else v for v in pdf["z"]] == [True, False, None]


def test_cast_noop_elision(spark):
    df = to_df(spark, [["x"]], "a:str")
    out = df.select(cast(F.col("a"), "str", input_type="str").alias("a"))
    assert out.toPandas()["a"][0] == "x"
