"""Round-6 fifth batch: activity streaks, exact interpolated
quantiles, Gini concentration, deterministic bootstrap, phrase
search, correlated-subquery decorrelation, audio resampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.audio import (
    decode_wav,
    encode_wav,
    resample_linear,
    wav_resample_features,
)
from pandasy_spark.extended.events import activity_streaks
from pandasy_spark.extended.profile import (
    gini_concentration,
    quantile_cont_twopass,
)
from pandasy_spark.extended.sampling import bootstrap_resample
from pandasy_spark.extended.text import phrase_search


# ----------------------------------------------------------- streaks


def test_streaks_islands(spark):
    rows = [
        # user 1: 3-day run, gap, 2-day run (two events on one day)
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
        (1, "2024-01-07"), (1, "2024-01-08"), (1, "2024-01-08"),
        # user 2: singleton days only
        (2, "2024-02-01"), (2, "2024-02-05"),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.col("d").cast("timestamp").alias("ts")
    )
    out = {
        r["user_id"]: r
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert out[1]["n_active_days"] == 5
    assert out[1]["longest_streak"] == 3
    assert out[1]["n_streaks"] == 2
    assert out[2]["longest_streak"] == 1
    assert out[2]["n_streaks"] == 2


def test_streaks_windows_are_user_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01")], "user_id long, d string"
    ).select("user_id", F.col("d").cast("timestamp").alias("ts"))
    plan = (
        activity_streaks(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    # every Window in the plan must carry a partition spec
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            assert "user_id" in line


# ------------------------------------------------- cont quantiles


@pytest.mark.slow
def test_quantile_cont_matches_numpy(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for pm in (0, 250, 500, 900, 1000):
        row = quantile_cont_twopass(df, "v", p_milli=pm).first()
        expect = np.percentile(np.array(vals, dtype=np.float64), pm / 10.0)
        assert row["n"] == len(vals)
        assert row["q_scaled"] == pytest.approx(expect * 1000, abs=1e-6)


def test_quantile_cont_single_row_and_validation(spark):
    df = spark.createDataFrame([(7,)], "v long")
    row = quantile_cont_twopass(df, "v", p_milli=500).first()
    assert row["q_scaled"] == 7000
    with pytest.raises(ValueError):
        quantile_cont_twopass(df, "v", p_milli=1001)


def test_quantile_cont_no_data_window(spark):
    # windows may only run over the bounded histogram/sliver domains,
    # never over the raw value stream: assert no Window whose child is
    # the base scan ordering by the value column itself at full width
    df = spark.createDataFrame([(v,) for v in range(1000)], "v long")
    plan = (
        quantile_cont_twopass(df, "v", p_milli=900)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two bounded windows appear; the raw data path stays agg-only
    assert plan.count("Window") <= 4


# ----------------------------------------------------------- gini


def test_gini_uniform_and_concentrated(spark):
    # perfectly equal values -> gini ~ 0 (exactly (n-1)... -> 0 on the
    # milli grid for equal x: 2*S = 2*x*n(n+1)/2 = x*n(n+1); minus
    # (n+1)*T = (n+1)*n*x -> numerator 0)
    eq = spark.createDataFrame([(i, 10) for i in range(8)], "k long, v long")
    row = gini_concentration(eq, ["k"], "v").first()
    assert row["gini_milli"] == 0
    assert row["total"] == 80
    # one key holds everything -> gini -> (n-1)/n = 0.875
    conc = spark.createDataFrame(
        [(0, 8000)] + [(i, 0) for i in range(1, 8)], "k long, v long"
    )
    row = gini_concentration(conc, ["k"], "v").first()
    assert row["gini_milli"] == 875


# ------------------------------------------------------- bootstrap


def test_bootstrap_deterministic_and_unit_mean(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
    a = bootstrap_resample(df, "id", salt=3)
    b = bootstrap_resample(df, "id", salt=3)
    na, nb = a.count(), b.count()
    assert na == nb  # same salt -> identical resample
    # Poisson(1) mean: resample size within 5% of n at n=5000
    assert abs(na - 5000) < 250
    c = bootstrap_resample(df, "id", salt=4).count()
    assert c != na or c == na  # different salt runs (smoke)
    # no shuffle in the plan: narrow explode only
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bootstrap_count_distribution(spark):
    df = spark.createDataFrame([(i,) for i in range(20000)], "id long")
    from pandasy_spark.extended.sampling import bootstrap_counts

    dist = (
        df.select(bootstrap_counts(F.col("id"), 1).alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    d = {r["c"]: r["count"] for r in dist}
    # ~Poisson(1): P(0) ~ 0.368, P(1) ~ 0.368, P(2) ~ 0.184
    assert abs(d.get(0, 0) / 20000 - 0.368) < 0.03
    assert abs(d.get(1, 0) / 20000 - 0.368) < 0.03
    assert abs(d.get(2, 0) / 20000 - 0.184) < 0.03
    assert max(d) <= 5


# ---------------------------------------------------- phrase search


def test_phrase_search_adjacency(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data spark big data"),
            (2, "data big spark"),
            (3, "big data big data big data"),
            (4, "bigdata"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, ["big", "data"]).collect()
    }
    assert out == {1: 2, 3: 3}


def test_phrase_search_three_tokens_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b x c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, ["a", "b", "c"]).collect()
    }
    assert out == {1: 2}
    with pytest.raises(ValueError):
        phrase_search(docs, ["solo"])


# ------------------------------------------- correlated subqueries


def test_sql_correlated_plan_decorrelates(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    df = QUERIES["sql_correlated"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # all three subqueries became joins
    assert plan.count("Join") >= 3 or plan.count("join") >= 3


# ------------------------------------------------------- resample


def test_resample_linear_identity_and_halving():
    x = np.array([10, 20, 30, 40], dtype=np.int16)
    assert list(resample_linear(x, 1, 1)) == [10, 20, 30, 40]
    # downsample 1:2 keeps every other sample exactly
    assert list(resample_linear(x, 1, 2)) == [10, 30]
    # upsample 2:1 inserts exact midpoints
    assert list(resample_linear(x, 2, 1)) == [10, 15, 20, 25, 30, 35, 40]


def test_resample_linear_rational_and_validation():
    x = np.arange(0, 50, 5, dtype=np.int16)  # ramp a=5
    y = resample_linear(x, 3, 2)
    assert list(y) == [(5 * j * 2) // 3 for j in range(len(y))]
    assert len(y) == (len(x) - 1) * 3 // 2 + 1
    with pytest.raises(ValueError):
        resample_linear(x, 0, 1)
    assert len(resample_linear(np.array([], dtype=np.int16), 3, 2)) == 0


def test_wav_resample_features_end_to_end(spark):
    import pandas as pd

    x = (3 * np.arange(20)).astype(np.int16)
    payload = encode_wav(x, 8000)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = wav_resample_features(df, up=3, down=2).first()
    y = resample_linear(x, 3, 2).astype(np.int64)
    assert row["n_in"] == 20
    assert row["n_out"] == len(y)
    assert row["sum_out"] == int(y.sum())
    assert row["peak_out"] == int(np.abs(y).max())
    assert row["last_out"] == int(y[-1])
    # corrupt payload drops, never fails the job
    bad = spark.createDataFrame(
        [(2, bytearray(b"not a wav"))], "doc_id long, payload binary"
    )
    assert wav_resample_features(bad, 3, 2).count() == 0
