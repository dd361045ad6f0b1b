"""Property-based parity: hypothesis-generated frames + predicates,
engine vs DuckDB.  The reference uses fixed-seed randomization
(/root/repo/SURVEY.md §5.3); hypothesis widens that to adversarial
inputs (empty strings, extreme ints, all-NULL columns) while keeping
the same oracle."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df

pytestmark = pytest.mark.slow
from pandasy_spark.functions import (
    case_when,
    cast,
    coalesce,
    is_between,
    is_in,
    like,
)
from tests.helpers import assert_duck_eq

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

num = st.one_of(st.none(), st.integers(-1000, 1000).map(float))
small_str = st.one_of(st.none(), st.text(alphabet="abAB%_ ", max_size=6))


@given(rows=st.lists(st.tuples(num, num, num), min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_between_property(spark, rows):
    df = to_df(spark, [list(r) for r in rows], "a:double,b:double,c:double")
    res = df.select(
        is_between(F.col("a"), F.col("b"), F.col("c"), True).alias("x"),
        is_between(F.col("a"), F.col("b"), F.col("c"), False).alias("y"),
    )
    assert_duck_eq(
        res,
        "SELECT a BETWEEN b AND c AS x, a NOT BETWEEN b AND c AS y FROM t",
        t=df,
    )


@given(
    rows=st.lists(st.tuples(num), min_size=1, max_size=10),
    consts=st.lists(st.one_of(st.none(), st.integers(-5, 5).map(float)), min_size=1, max_size=4),
)
@settings(**_SETTINGS)
def test_is_in_property(spark, rows, consts):
    df = to_df(spark, [list(r) for r in rows], "a:double")
    sql_list = ",".join("NULL" if c is None else repr(c) for c in consts)
    res = df.select(
        is_in(F.col("a"), list(consts), True).alias("x"),
        is_in(F.col("a"), list(consts), False).alias("y"),
    )
    assert_duck_eq(
        res,
        f"SELECT a IN ({sql_list}) AS x, a NOT IN ({sql_list}) AS y FROM t",
        t=df,
    )


@given(rows=st.lists(st.tuples(small_str), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_like_property(spark, rows):
    df = to_df(spark, [list(r) for r in rows], "a:str")
    res = df.select(
        like(F.col("a"), "a%").alias("p1"),
        like(F.col("a"), "%b").alias("p2"),
        like(F.col("a"), "_").alias("p3"),
        like(F.col("a"), "", positive=False).alias("p4"),
    )
    assert_duck_eq(
        res,
        """SELECT a LIKE 'a%' AS p1, a LIKE '%b' AS p2,
                  a LIKE '_' AS p3, a NOT LIKE '' AS p4 FROM t""",
        t=df,
    )


@given(rows=st.lists(st.tuples(num, num, num), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_coalesce_case_property(spark, rows):
    df = to_df(spark, [list(r) for r in rows], "a:double,b:double,c:double")
    res = df.select(
        coalesce([F.col("a"), F.col("b"), F.col("c"), 0.0]).alias("x"),
        case_when(
            (F.col("a") > 0, F.col("b")),
            (F.col("a") < 0, F.col("c")),
            default=None,
        ).alias("y"),
    )
    assert_duck_eq(
        res,
        """SELECT COALESCE(a,b,c,0.0) AS x,
                  CASE WHEN a > 0 THEN b WHEN a < 0 THEN c ELSE NULL END AS y
           FROM t""",
        t=df,
    )


@given(
    rows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(-99999, 99999))),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_cast_long_roundtrip_property(spark, rows):
    df = to_df(spark, [list(r) for r in rows], "a:long")
    # long -> str -> long must round-trip exactly (via the float hop)
    res = df.select(
        cast(
            cast(F.col("a"), "str", input_type="long"), "long", input_type="str"
        ).alias("x")
    )
    vals = [r["a"] for r in df.collect()]
    back = [r["x"] for r in res.collect()]
    assert vals == back
