"""Filter / joins / set ops / distinct — oracle-checked incl. NULL keys.

Behavioral model: /root/reference/slide_test/suite.py:355-389 (filter),
:2155-2386 (distinct/set ops), :2388-2591 (joins)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.exceptions import InvalidOperationError
from pandasy_spark.operators import (
    drop_duplicates,
    except_df,
    filter_df,
    intersect,
    join,
    parse_join_type,
    union,
)
from tests.helpers import assert_duck_eq, make_rand_df


def test_parse_join_type():
    assert parse_join_type("join") == "inner"
    assert parse_join_type("Inner") == "inner"
    assert parse_join_type("SEMI") == "left_semi"
    assert parse_join_type("left semi") == "left_semi"
    assert parse_join_type("anti") == "left_anti"
    assert parse_join_type("left") == "left_outer"
    assert parse_join_type("right outer") == "right_outer"
    assert parse_join_type("outer") == "full_outer"
    assert parse_join_type("full_outer") == "full_outer"
    assert parse_join_type("cross") == "cross"
    with pytest.raises(NotImplementedError):
        parse_join_type("sideways")


def test_filter_truthy(spark):
    df = to_df(
        spark,
        [[1.0, 10.0], [0.0, 20.0], [None, 30.0], [float("nan"), 40.0], [-3.0, 50.0]],
        "a:double,b:double",
    )
    res = filter_df(df, F.col("a"))
    # nonzero kept; 0 / NULL / NaN dropped
    assert sorted(r["b"] for r in res.collect()) == [10.0, 50.0]
    assert filter_df(df, True).count() == 5
    assert filter_df(df, False).count() == 0
    assert filter_df(df, None).count() == 0


def test_filter_simple_column_skips_exception_fallback(spark, monkeypatch):
    """A bare column reference — boolean OR truthy-numeric — resolves
    via the schema probe with no AnalysisException control flow; only
    complex expressions reach the try/except fallback."""
    from pandasy_spark.operators import relational as rel

    def _boom(df, cond):
        raise AssertionError("fallback reached for a simple column ref")

    monkeypatch.setattr(rel, "_filter_with_analysis_fallback", _boom)
    df = to_df(
        spark,
        [[1.0, True], [0.0, False], [None, None], [-3.0, True]],
        "a:double,flag:bool",
    )
    assert sorted(
        r["a"] for r in filter_df(df, F.col("a")).collect()
    ) == [-3.0, 1.0]
    assert [r["a"] for r in filter_df(df, F.col("flag")).collect()] == [
        1.0,
        -3.0,
    ]
    # complex expressions still work through the (restored) fallback
    monkeypatch.undo()
    assert filter_df(df, F.col("a") * 2).count() == 2
    assert filter_df(df, F.col("a") > 0).count() == 1


def _join_frames(spark):
    a = make_rand_df(100, seed=0, a=(int, 40), b=(dt.datetime, 40), c=(float, 40))
    b = make_rand_df(80, seed=1, d=(float, 10), a=(int, 10), b=(dt.datetime, 10))
    return to_df(spark, a.values.tolist(), "a:long,b:datetime,c:double"), to_df(
        spark, b.values.tolist(), "d:double,a:long,b:datetime"
    )


@pytest.mark.parametrize(
    "how,sql",
    [
        ("inner", "SELECT a.a, a.b, a.c, b.d FROM a INNER JOIN b USING (a,b)"),
        ("left", "SELECT a.a, a.b, a.c, b.d FROM a LEFT JOIN b USING (a,b)"),
        ("right", "SELECT b.a, b.b, a.c, b.d FROM a RIGHT JOIN b USING (a,b)"),
    ],
)
def test_joins_oracle(spark, how, sql):
    df1, df2 = _join_frames(spark)
    res = join(df1, df2, how, on=["a", "b"]).select("a", "b", "c", "d")
    assert_duck_eq(res, sql, a=df1, b=df2)


def test_full_outer_join_coalesces_keys(spark):
    df1, df2 = _join_frames(spark)
    res = join(df1, df2, "full", on=["a", "b"]).select("a", "b", "c", "d")
    assert_duck_eq(
        res,
        """SELECT COALESCE(a.a, b.a) AS a, COALESCE(a.b, b.b) AS b, a.c, b.d
           FROM a FULL OUTER JOIN b USING (a,b)""",
        a=df1,
        b=df2,
    )


def test_semi_anti_joins(spark):
    df1 = to_df(spark, [[0, 1], [2, 3], [None, 5]], "a:long,b:long")
    df2 = to_df(spark, [[0, 10], [0, 11], [20, 30], [None, 40]], "a:long,c:long")
    semi = join(df1, df2, "semi", on=["a"])
    assert_duck_eq(
        semi,
        "SELECT a, b FROM df1 WHERE a IN (SELECT a FROM df2 WHERE a IS NOT NULL)",
        df1=df1,
        df2=df2,
    )
    anti = join(df1, df2, "anti", on=["a"])
    # NULL-key rows of df1 are KEPT by anti join
    # (/root/reference/slide_test/suite.py:2402)
    rows = sorted(
        [(r["a"], r["b"]) for r in anti.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )
    assert rows == [(2, 3), (None, 5)]


def test_cross_join(spark):
    df1 = to_df(spark, [[0, 1], [2, 3]], "a:long,b:long")
    df2 = to_df(spark, [[10], [20]], "c:long")
    res = join(df1, df2, "cross")
    assert_duck_eq(res, "SELECT * FROM df1 CROSS JOIN df2", df1=df1, df2=df2)
    with pytest.raises(InvalidOperationError):
        join(df1, df2, "cross", on=["a"])


def test_multi_join_composition(spark):
    df1, df2 = _join_frames(spark)
    c = make_rand_df(80, seed=2, dd=(float, 10), a=(int, 10), b=(dt.datetime, 10))
    df3 = to_df(spark, c.values.tolist(), "dd:double,a:long,b:datetime")
    res = join(join(df1, df2, "inner", on=["a", "b"]), df3, "inner", on=["a", "b"])
    assert_duck_eq(
        res.select("a", "b", "c", "d", "dd"),
        """SELECT a.a, a.b, a.c, b.d, c.dd FROM a
           INNER JOIN b USING (a,b) INNER JOIN c USING (a,b)""",
        a=df1,
        b=df2,
        c=df3,
    )


def test_union(spark):
    df1 = to_df(spark, [["x", "a"], ["x", "a"], [None, None]], "a:str,b:str")
    # positional alignment: df2's columns get RENAMED to df1's
    df2 = to_df(spark, [["xx", "aa"], [None, None], ["a", "x"]], "b:str,a:str")
    res_all = union(df1, df2, unique=False)
    assert_duck_eq(
        res_all,
        """SELECT a, b FROM df1 UNION ALL SELECT b AS a, a AS b FROM df2""",
        df1=df1,
        df2=df2,
    )
    res_u = union(df1, df2, unique=True)
    assert_duck_eq(
        res_u,
        "SELECT a, b FROM df1 UNION SELECT b AS a, a AS b FROM df2",
        df1=df1,
        df2=df2,
    )


def test_intersect(spark):
    df1 = to_df(
        spark, [["x", "a"], ["x", "a"], ["y", "b"], [None, None]], "a:str,b:str"
    )
    df2 = to_df(spark, [["x", "a"], [None, None], ["z", "c"]], "a:str,b:str")
    res_u = intersect(df1, df2, unique=True)
    assert_duck_eq(
        res_u,
        "SELECT a,b FROM df1 INTERSECT SELECT a,b FROM df2",
        df1=df1,
        df2=df2,
    )
    # unique=False: left-semi semantics, df1 duplicates kept, NULLs match
    res = intersect(df1, df2, unique=False)
    rows = sorted(
        [(r["a"], r["b"]) for r in res.collect()],
        key=lambda t: (t[0] is None, t[0] or ""),
    )
    assert rows == [("x", "a"), ("x", "a"), (None, None)]


def test_except(spark):
    df1 = to_df(
        spark, [["x", "a"], ["x", "a"], ["y", "b"], [None, None]], "a:str,b:str"
    )
    df2 = to_df(spark, [["x", "a"], [None, None]], "a:str,b:str")
    res_u = except_df(df1, df2, unique=True)
    assert_duck_eq(
        res_u,
        "SELECT a,b FROM df1 EXCEPT SELECT a,b FROM df2",
        df1=df1,
        df2=df2,
    )
    # unique=False: anti-join semantics (NULL row matches NULL row)
    res = except_df(df1, df2, unique=False)
    assert [(r["a"], r["b"]) for r in res.collect()] == [("y", "b")]


def test_drop_duplicates(spark):
    df = to_df(
        spark,
        [[1, "a"], [1, "a"], [None, None], [None, None], [2, "b"]],
        "a:long,b:str",
    )
    assert_duck_eq(
        drop_duplicates(df), "SELECT DISTINCT a, b FROM t", t=df
    )


def test_union_mismatched_columns_raises(spark):
    a = to_df(spark, [[1, "x"]], "a:long,b:str")
    b = to_df(spark, [[1]], "a:long")
    with pytest.raises(InvalidOperationError):
        union(a, b)
    with pytest.raises(InvalidOperationError):
        intersect(a, b, unique=True)
    with pytest.raises(InvalidOperationError):
        except_df(a, b, unique=True)


def test_join_requires_keys(spark):
    a = to_df(spark, [[1]], "a:long")
    b = to_df(spark, [[1]], "a:long")
    with pytest.raises(InvalidOperationError):
        join(a, b, "inner", on=[])
