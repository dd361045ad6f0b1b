"""Randomized-frame oracle tests mirroring the reference suite's F1
fixture families (/root/repo/FIXTURES.md): per-type coalesce,
case_when, joins over null-heavy keys, set ops, distinct — each checked
against DuckDB on the same inputs, multiple seeds."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.functions import case_when, coalesce
from pandasy_spark.operators import drop_duplicates, except_df, intersect, union
from tests.helpers import assert_duck_eq, make_rand_df


def _rand(spark, size, seed, schema_expr, **cols):
    pdf = make_rand_df(size, seed=seed, **cols)
    return to_df(spark, pdf.values.tolist(), schema_expr)


TYPES = {
    "double": (float, "a:double,b:double,c:double"),
    "long": (int, "a:long,b:long,c:long"),
    "str": (str, "a:str,b:str,c:str"),
    "bool": (bool, "a:bool,b:bool,c:bool"),
    "datetime": (dt.datetime, "a:datetime,b:datetime,c:datetime"),
}


@pytest.mark.parametrize("tname", sorted(TYPES))
@pytest.mark.parametrize("seed", [0, 7])
def test_coalesce_all_types(spark, tname, seed):
    tp, schema = TYPES[tname]
    df = _rand(
        spark, 60, seed, schema, a=(tp, 30), b=(tp, 30), c=(tp, 30)
    )
    res = df.select(
        coalesce([F.col("a"), F.col("b"), F.col("c")]).alias("x"),
        coalesce([F.col("a"), F.col("b")]).alias("y"),
    )
    assert_duck_eq(
        res,
        "SELECT COALESCE(a,b,c) AS x, COALESCE(a,b) AS y FROM t",
        t=df,
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_case_when_rand(spark, seed):
    df = _rand(
        spark,
        40,
        seed,
        "a:bool,b:str,c:bool,d:str,e:str",
        a=(bool, 10),
        b=(str, 10),
        c=(bool, 10),
        d=(str, 10),
        e=(str, 10),
    )
    res = df.select(
        case_when(
            (F.col("a"), F.col("b")),
            (F.col("c"), F.col("d")),
            default=F.col("e"),
        ).alias("x")
    )
    assert_duck_eq(
        res,
        "SELECT CASE WHEN a THEN b WHEN c THEN d ELSE e END AS x FROM t",
        t=df,
    )


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT a.a, a.b, a.c, b.d FROM a JOIN b USING (a,b)"),
    ("left", "SELECT a.a, a.b, a.c, b.d FROM a LEFT JOIN b USING (a,b)"),
    (
        "full",
        """SELECT COALESCE(a.a,b.a) AS a, COALESCE(a.b,b.b) AS b, a.c, b.d
           FROM a FULL JOIN b ON a.a=b.a AND a.b=b.b""",
    ),
])
@pytest.mark.parametrize("seed", [1, 9])
def test_joins_datetime_keys(spark, how, sql, seed):
    from pandasy_spark.operators import join

    a = _rand(
        spark, 100, seed, "a:long,b:datetime,c:double",
        a=(int, 40), b=(dt.datetime, 40), c=(float, 40),
    )
    b = _rand(
        spark, 80, seed + 100, "d:double,a:long,b:datetime",
        d=(float, 10), a=(int, 10), b=(dt.datetime, 10),
    )
    res = join(a, b, how, on=["a", "b"]).select("a", "b", "c", "d")
    assert_duck_eq(res, sql, a=a, b=b)


@pytest.mark.parametrize("ctype,schema", [(str, "b:long,c:str"), (dt.datetime, "b:long,c:datetime")])
@pytest.mark.slow
def test_setops_rand(spark, ctype, schema):
    a = _rand(spark, 30, 2, schema, b=(int, 10), c=(ctype, 10))
    b = _rand(spark, 80, 3, schema, b=(int, 50), c=(ctype, 50))
    assert_duck_eq(
        union(a, b, unique=False),
        "SELECT b,c FROM a UNION ALL SELECT b,c FROM b",
        a=a, b=b,
    )
    assert_duck_eq(
        union(a, b, unique=True),
        "SELECT b,c FROM a UNION SELECT b,c FROM b",
        a=a, b=b,
    )
    assert_duck_eq(
        intersect(a, b, unique=True),
        "SELECT b,c FROM a INTERSECT SELECT b,c FROM b",
        a=a, b=b,
    )
    assert_duck_eq(
        except_df(a, b, unique=True),
        "SELECT b,c FROM a EXCEPT SELECT b,c FROM b",
        a=a, b=b,
    )


@pytest.mark.parametrize("schema,cols", [
    ("a:long,b:long", dict(a=(int, 0), b=(int, 20))),
    ("a:long,b:str,c:double", dict(a=(int, 10), b=(str, 30), c=(float, 50))),
    ("a:long,b:datetime", dict(a=(int, 10), b=(dt.datetime, 30))),
])
def test_distinct_rand(spark, schema, cols):
    df = _rand(spark, 100, 5, schema, **cols)
    assert_duck_eq(
        drop_duplicates(df),
        f"SELECT DISTINCT {', '.join(schema.split(':')[0] for _ in [0])}"
        if False
        else f"SELECT DISTINCT * FROM t",
        t=df,
    )
