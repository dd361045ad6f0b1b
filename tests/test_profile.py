"""profile_numeric (extended/profile.py): DuckDB oracle + contract."""

import pytest
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.extended.profile import profile_numeric
from tests.helpers import assert_duck_eq, make_rand_df


def _profile_sql(cols, table="t", p="1e2"):
    return "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_val,
               CAST(MAX({c}) AS DOUBLE) AS max_val,
               (SUM(CAST(FLOOR({c} * {p} + 0.5) AS BIGINT)) / {p})
                 / COUNT({c}) AS mean_val
        FROM {table}
        """
        for c in cols
    )


def test_profile_matches_duckdb_with_nulls(spark):
    pdf = make_rand_df(200, seed=7, a=(int, 40), b=(float, 25), c=int)
    # object+None form so BOTH engines see SQL NULLs (a registered
    # Float64 masked array reaches DuckDB as NaN, which is not NULL)
    obj = pdf.astype(object).where(pdf.notna(), None)
    df = spark.createDataFrame(obj)
    out = profile_numeric(df, ["a", "b", "c"])
    assert_duck_eq(out, _profile_sql(["a", "b", "c"]), t=obj)


def test_profile_empty_frame(spark):
    df = to_df(spark, [], "a:double,b:long")
    rows = {r["col_name"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    assert rows["a"]["n_rows"] == 0
    assert rows["a"]["n_distinct"] == 0
    assert rows["a"]["mean_val"] is None and rows["a"]["min_val"] is None


def test_profile_rejects_non_numeric(spark):
    df = to_df(spark, [[1, "x"]], "a:long,b:str")
    with pytest.raises(ValueError):
        profile_numeric(df, ["b"])
    # default col selection picks only numerics
    out = profile_numeric(df)
    assert [r["col_name"] for r in out.collect()] == ["a"]


def test_profile_approx_variant_single_pass(spark, sf_dir):
    from pandasy_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = profile_numeric(
        li, ["l_quantity", "l_tax"], exact_distinct=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # HLL path: no Expand multiplier, map-side partial aggregation
    assert "Expand" not in plan
    assert "partial" in plan.lower()
    rows = {r["col_name"]: r for r in out.collect()}
    # approx distinct lands near the exact counts (50 / 9 at this SF)
    assert abs(rows["l_quantity"]["n_distinct"] - 50) <= 5
    assert abs(rows["l_tax"]["n_distinct"] - 9) <= 2
