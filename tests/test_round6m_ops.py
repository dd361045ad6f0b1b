"""Round-6 thirteenth batch: target encoding, winsorization,
retractable aggregates."""

from pyspark.sql import functions as F


def test_target_encode_loo_excludes_self(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["ml_target_encode"](spark, sf_dir).collect()
    assert rows
    # LOO encodings differ within a category unless all targets equal:
    # min < max for every real category here
    for r in rows:
        assert r["min_enc"] <= r["max_enc"]
        assert r["n"] > 1


def test_winsorize_bounds(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    r = QUERIES["profile_winsorize"](spark, sf_dir).first()
    assert r["p05"] < r["p95"]
    # percentile_disc(0.05): at most 5% strictly below the threshold,
    # at most 95%... -> clipped-lo < 5%+slack, clipped-hi <= 5%
    assert r["n_clipped_lo"] <= r["n"] * 5 // 100 + 1
    assert r["n_clipped_hi"] <= r["n"] * 5 // 100 + 1
    assert r["winsorized_sum"] > 0


def test_retractable_ok_everywhere(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["agg_retractable"](spark, sf_dir).collect()
    assert rows and all(r["ok"] for r in rows)


def test_retractable_handles_full_deletion(spark):
    log = spark.createDataFrame(
        [("a", "I", 10), ("a", "D", 10), ("b", "I", 5)],
        "k string, op string, v long",
    )
    sign = F.when(F.col("op") == "I", F.lit(1)).otherwise(F.lit(-1))
    m = {
        r["k"]: (r["n"], r["s"])
        for r in log.groupBy("k")
        .agg(
            F.sum(sign).cast("long").alias("n"),
            F.sum(sign * F.col("v")).cast("long").alias("s"),
        )
        .collect()
    }
    assert m == {"a": (0, 0), "b": (1, 5)}


def test_sql_recursive_depth_census(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = {r["depth"]: r["n"] for r in QUERIES["sql_recursive"](spark, sf_dir).collect()}
    # every supplier appears at depth 0; counts never grow with depth
    assert rows[0] == max(rows.values())
    depths = sorted(rows)
    assert all(rows[a] >= rows[b] for a, b in zip(depths, depths[1:]))


def test_sql_lateral_topk_per_customer(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["sql_lateral"](spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["c_custkey"], []).append(r["cents"])
    assert all(len(v) <= 2 for v in per.values())
    plan = (
        QUERIES["sql_lateral"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_null_safe_join_matches_nulls(spark):
    a = spark.createDataFrame([(None, 1), (5, 2)], "k int, v int")
    b = spark.createDataFrame([(None, 10), (5, 20), (7, 30)], "k int, w int")
    j = a.join(b, a["k"].eqNullSafe(b["k"]))
    got = sorted((r["v"], r["w"]) for r in j.collect())
    assert got == [(1, 10), (2, 20)]
    # stays a hash join, not nested loop
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_try_arith_null_on_failure(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(10, 0), (10, 3)], "a long, b long")
    rows = df.select(
        F.try_divide("a", "b").alias("q"),
        F.try_multiply(F.lit(2**62).cast("long"), F.lit(4).cast("long")).alias("m"),
    ).collect()
    assert rows[0]["q"] is None and rows[1]["q"] is not None
    assert all(r["m"] is None for r in rows)


def test_cusum_closed_form_matches_recurrence(spark):
    from pandasy_spark.extended.events import cusum_per_key

    ys = [5, -3, 10, -20, 7, 7, -1, 30]
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)], "k string, i long, y long"
    )
    r = cusum_per_key(df, "k", ["i"], "y", threshold=12).first()
    s, mx, alarms = 0, 0, 0
    for y in ys:
        s = max(0, s + y)
        mx = max(mx, s)
        alarms += s > 12
    assert r["max_cusum"] == mx
    assert r["n_alarms"] == alarms
    assert r["final_cusum"] == s
    assert r["n"] == len(ys)


def test_bootstrap_ci_envelope(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    r = QUERIES["sample_bootstrap_ci"](spark, sf_dir).first()
    assert r["n_resamples"] == 8
    assert r["mean_lo"] <= r["mean_hi"]
    # resample means cluster near the true mean: spread < 5%
    assert r["spread"] * 20 < r["mean_hi"]


def test_kfold_covers_all_and_balanced(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["sample_kfold"](spark, sf_dir).collect()
    folds = {}
    for r in rows:
        assert 0 <= r["fold"] < 5
        folds[r["fold"]] = folds.get(r["fold"], 0) + r["n"]
    assert set(folds) == set(range(5))
    total = sum(folds.values())
    for n in folds.values():
        assert abs(n - total / 5) < total * 0.05


def test_churn_labels_cover_weeks(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["events_churn_labels"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_churned"] <= r["n_active"]
        assert r["churn_permille"] == r["n_churned"] * 1000 // r["n_active"]


def test_video_motion_exact(spark):
    import numpy as np

    from pandasy_spark.extended.video import (
        decode_mjpeg_frames,
        encode_mjpeg_avi,
        video_motion_stats,
    )

    frames = [
        np.full((4, 6, 3), v, np.uint8) for v in (10, 200, 10)
    ]
    payload = encode_mjpeg_avi(frames, quality=90)
    # expected from the REAL decoded frames (codec is lossy)
    dec = decode_mjpeg_frames(payload)
    diffs = [
        int(np.abs(a[:, :, 0].astype(np.int64) - b[:, :, 0].astype(np.int64)).sum())
        for a, b in zip(dec, dec[1:])
    ]
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = video_motion_stats(df).first()
    assert r["n_frames"] == 3
    assert r["motion_total"] == sum(diffs)
    assert r["max_pair_diff"] == max(diffs)
    # corrupt payloads drop
    bad = spark.createDataFrame(
        [(2, bytearray(b"nope"))], "doc_id long, payload binary"
    )
    assert video_motion_stats(bad).count() == 0
