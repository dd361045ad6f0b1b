"""Round-6 eleventh batch: OLS trend, degree distribution, naive
forecast backtest."""

import pytest
from pyspark.sql import functions as F


def test_linreg_recovers_known_line(spark):
    # y = 500*x + 2000 exactly -> slope_milli 500000, intercept 2000000
    rows = [(x, 500 * x + 2000) for x in range(1, 40)]
    df = spark.createDataFrame(rows, "l_quantity long, y long")
    v = df.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    r = s.select(
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"
            " AS BIGINT)"
        ).alias("slope_milli"),
        F.expr(
            "CAST(FLOOR((sy - ((n * sxy - sx * sy) * 1000"
            " div (n * sxx - sx * sx)) * sx / 1e3) * 1000 / n)"
            " AS BIGINT)"
        ).alias("intercept_milli"),
    ).first()
    assert r["slope_milli"] == 500_000
    assert r["intercept_milli"] == 2_000_000


def test_degree_buckets_cover_all_nodes(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["graph_degrees"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bucket_lo"] == 2 ** r["bucket"]
        assert r["bucket_lo"] <= r["max_degree"] < 2 * r["bucket_lo"]
        assert r["n_nodes"] > 0


def test_forecast_mae_definition(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["events_forecast"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_backtests"] > 0
        assert r["mae_permille"] >= 0
