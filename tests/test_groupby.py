"""SQL-semantics group-by-apply: NULL keys are real groups.

Behavioral model: /root/reference/slide_test/suite.py:2020-2153."""

import datetime as dt

import pandas as pd

from pandasy_spark.convert import to_df
from pandasy_spark.operators import sql_groupby_apply
from tests.helpers import assert_duck_eq


def _count(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.head(1).copy()
    out["ct"] = len(pdf)
    return out


def test_groupby_apply_null_keys(spark):
    df = to_df(spark, [["a", 1], ["a", 2], [None, 3]], "b:str,c:long")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": [pdf["b"].iloc[0]], "ct": [len(pdf)]})

    res = sql_groupby_apply(df, ["b"], per_group, output_schema="b:str,ct:long")
    assert_duck_eq(
        res,
        "SELECT b, COUNT(*) AS ct FROM t GROUP BY b",
        t=df,
    )


def test_groupby_apply_composite_null_keys(spark):
    df = to_df(
        spark,
        [
            ["a", 1.0, 1],
            ["a", 1.0, 2],
            ["a", None, 3],
            [None, 1.0, 4],
            [None, None, 5],
            [None, None, 6],
        ],
        "a:str,b:double,c:long",
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": [pdf["a"].iloc[0]],
                "b": [pdf["b"].iloc[0]],
                "ct": [len(pdf)],
            }
        )

    res = sql_groupby_apply(
        df, ["a", "b"], per_group, output_schema="a:str,b:double,ct:long"
    )
    assert_duck_eq(
        res,
        "SELECT a, b, COUNT(*) AS ct FROM t GROUP BY a, b",
        t=df,
    )


def test_groupby_apply_datetime_keys(spark):
    d1, d2 = dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2)
    df = to_df(
        spark,
        [[d1, 1], [d1, 2], [d2, 3], [None, 4]],
        "b:datetime,c:long",
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": [pdf["b"].iloc[0]], "ct": [len(pdf)]})

    res = sql_groupby_apply(df, ["b"], per_group, output_schema="b:datetime,ct:long")
    assert_duck_eq(res, "SELECT b, COUNT(*) AS ct FROM t GROUP BY b", t=df)


def test_groupby_apply_whole_frame(spark):
    df = to_df(spark, [["a", 1], ["b", 2], [None, 3]], "b:str,c:long")

    def whole(pdf: pd.DataFrame) -> pd.DataFrame:
        assert len(pdf) == 3
        return pd.DataFrame({"total": [int(pdf["c"].sum())]})

    res = sql_groupby_apply(df, [], whole, output_schema="total:long")
    assert [r["total"] for r in res.collect()] == [6]


def test_groupby_apply_kwargs(spark):
    df = to_df(spark, [["a", 1], ["a", 2]], "b:str,c:long")

    def scaled(pdf: pd.DataFrame, factor: int = 1) -> pd.DataFrame:
        return pd.DataFrame({"b": [pdf["b"].iloc[0]], "v": [int(pdf["c"].sum()) * factor]})

    res = sql_groupby_apply(df, ["b"], scaled, output_schema="b:str,v:long", factor=10)
    assert [r["v"] for r in res.collect()] == [30]


def test_groupby_apply_multi_row_output(spark):
    """func may return any number of rows per group (reference allows
    arbitrary df->df shapes)."""
    df = to_df(spark, [["a", 1], ["a", 2], ["b", 3]], "b:str,c:long")

    def expand(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"b": list(pdf["b"]) * 2, "c": list(pdf["c"]) + [v * 10 for v in pdf["c"]]}
        )

    res = sql_groupby_apply(df, ["b"], expand, output_schema="b:str,c:long")
    got = sorted((r["b"], r["c"]) for r in res.collect())
    assert got == [("a", 1), ("a", 2), ("a", 10), ("a", 20), ("b", 3), ("b", 30)]


def test_groupby_apply_pa_schema_output(spark):
    import pyarrow as pa

    df = to_df(spark, [["a", 1], ["a", 2]], "b:str,c:long")

    def count(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": [pdf["b"].iloc[0]], "n": [len(pdf)]})

    schema = pa.schema([pa.field("b", pa.string()), pa.field("n", pa.int64())])
    res = sql_groupby_apply(df, ["b"], count, output_schema=schema)
    assert [(r["b"], r["n"]) for r in res.collect()] == [("a", 2)]


def test_whole_frame_warns_and_limit_raises(spark):
    import pytest

    df = to_df(spark, [[1], [2], [3]], "a:long")

    def whole(pdf):
        return pd.DataFrame({"total": [int(pdf["a"].sum())]})

    with pytest.warns(RuntimeWarning, match="one executor task"):
        out = sql_groupby_apply(df, [], whole, output_schema="total:long")
    assert out.collect()[0]["total"] == 6

    with pytest.warns(RuntimeWarning):
        with pytest.raises(ValueError, match="whole_frame_limit"):
            sql_groupby_apply(
                df, [], whole, output_schema="total:long", whole_frame_limit=2
            )


def test_whole_frame_distributed_matches_single_group(spark, sf_dir):
    """The mapInPandas+merge twin must equal the single-group result
    for an algebraic aggregate (VERDICT r1 item 5)."""
    import warnings

    from pandasy_spark.operators import whole_frame_apply_distributed
    from pandasy_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_orderkey")

    def agg_frame(pdf):
        return pd.DataFrame(
            {
                "n": [len(pdf)],
                "qty": [float(pdf["l_quantity"].sum())],
                "mx": [int(pdf["l_orderkey"].max())],
            }
        )

    def merge(pdf):
        return pd.DataFrame(
            {
                "n": [int(pdf["n"].sum())],
                "qty": [float(pdf["qty"].sum())],
                "mx": [int(pdf["mx"].max())],
            }
        )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        single = sql_groupby_apply(
            li, [], agg_frame, output_schema="n:long,qty:double,mx:long"
        ).collect()[0]
    dist = whole_frame_apply_distributed(
        li, agg_frame, merge, partial_schema="n:long,qty:double,mx:long"
    ).collect()[0]
    assert dist["n"] == single["n"]
    assert dist["mx"] == single["mx"]
    assert abs(dist["qty"] - single["qty"]) < 1e-6
