"""Round-6 batch W: streaming CDC, YoY growth, forget flow, neighbor
aggregation."""

from pyspark.sql import functions as F


def test_streaming_cdc_equals_batch_apply(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    inc = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in QUERIES["streaming_cdc"](spark, sf_dir).collect()
    }
    assert inc
    # one-shot apply over the same bounded changelog must agree
    from pandasy_spark.operators.scd import cdc_apply
    from pandasy_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    base = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
    )
    chg = (
        ev.filter(F.col("ts") >= cutoff)
        .select(
            "user_id",
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            (F.col("user_id") % 100).cast("long").alias("n_events"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("seq")
        .limit(40_000)
    )
    once = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in cdc_apply(
            base, chg, ["user_id"], ["n_events", "total_cents"]
        ).collect()
    }
    assert inc == once


def test_forget_flow_removes_every_target(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = {r["table_name"]: r for r in QUERIES["warehouse_forget"](spark, sf_dir).collect()}
    assert rows["events"]["rows_removed"] > 0
    for r in rows.values():
        assert r["rows_after"] == r["rows_before"] - r["rows_removed"]


def test_neighbor_agg_mean_definition(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["graph_neighbor_agg"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["feat_mean_milli"] == r["feat_sum"] * 1000 // r["n_neighbors"]


def test_yoy_growth_pairs_bounded(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["q_yoy_growth"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_grew_20pct"] + r["n_shrank_20pct"] <= r["n_pairs"]


def test_ml_library_functions_direct(spark):
    from pandasy_spark.extended.ml import kfold_assign, ols_simple, target_encode_loo
    import pytest as _pt

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5)], "cat string, y long"
    )
    enc = {
        (r["cat"], r["y"]): r["loo_milli"]
        for r in target_encode_loo(df, "cat", "y").collect()
    }
    # LOO for ("a",10) = mean(20,30)*1000 = 25000; singleton "b" drops
    assert enc[("a", 10)] == 25000
    assert enc[("a", 30)] == 15000
    assert not any(k[0] == "b" for k in enc)

    line = spark.createDataFrame(
        [(x, 7 * x + 3) for x in range(1, 20)], "x long, y long"
    )
    r = ols_simple(line, "x", "y").first()
    assert r["slope_milli"] == 7000 and r["intercept_milli"] == 3000

    ids = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    folds = kfold_assign(ids, "id", k=4).groupBy("fold").count().collect()
    assert {r["fold"] for r in folds} == {0, 1, 2, 3}
    with _pt.raises(ValueError):
        kfold_assign(ids, "id", k=1)


def test_streaming_outer_join_matches_batch(spark, sf_dir):
    from pandasy_spark.workload import QUERIES
    from pandasy_spark.sources import load_table

    out = QUERIES["streaming_outer_join"](spark, sf_dir)
    rows = out.collect()
    errs = {r["err_id"] for r in rows}
    ev = load_table(spark, sf_dir, "events")
    n_err = ev.filter(F.col("event_type") == "error").count()
    # EVERY error appears exactly once-or-more (matched multiplicity),
    # and unmatched ones appear exactly once with NULL
    assert len(errs) == n_err
    nulls = [r for r in rows if r["buy_id"] is None]
    assert len(nulls) == len({r["err_id"] for r in nulls})
    assert all(r["err_id"] >= 0 for r in rows)


def test_embedding_drift_zero_for_identical_halves(spark):
    from pandasy_spark.workload import QUERIES  # noqa: F401  (style parity)
    from pyspark.sql import functions as F2

    # identical vectors in both halves -> zero drift
    rows = [(i, [0.5, -0.25, 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.select(
        (F2.col("vec_id") % 2).alias("half"),
        F2.posexplode("embedding").alias("dim", "x"),
    ).select(
        "half", "dim",
        F2.floor(F2.col("x") * 1_000_000 + F2.lit(0.5)).cast("long").alias("xi"),
    )
    m = q.groupBy("half", "dim").agg(
        F2.sum("xi").alias("s"), F2.count(F2.lit(1)).alias("n")
    )
    a = m.filter(F2.col("half") == 0).select("dim", F2.col("s").alias("sa"), F2.col("n").alias("na"))
    b = m.filter(F2.col("half") == 1).select("dim", F2.col("s").alias("sb"), F2.col("n").alias("nb"))
    d = a.join(b, "dim").select(
        (F2.col("sa") * F2.col("nb") - F2.col("sb") * F2.col("na")).alias("num")
    )
    assert all(r["num"] == 0 for r in d.collect())


def test_markov_removal_effect_semantics(spark):
    from pandasy_spark.extended.events import markov_removal_effects

    # user 1: A -> B -> P; user 2: A -> END; user 3: B -> P
    rows = [
        (1, 0, "A"), (1, 1, "B"), (1, 2, "P"),
        (2, 0, "A"),
        (3, 0, "B"), (3, 1, "P"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string"
    )
    out = {
        r["variant"]: (r["conv_nano"], r["removal_permille"])
        for r in markov_removal_effects(df, ["A", "B"], "P").collect()
    }
    # base conversion = P(START->A)*P(A->B)*1 + P(START->B)*1 = 2/3*1/2 + 1/3
    assert abs(out["base"][0] - 666_666_666) < 5
    # removing B severs every path to P
    assert out["no_B"] == (0, 1000)
    # removing A leaves only START->B->P = 1/3
    assert abs(out["no_A"][0] - 333_333_333) < 5
    assert out["no_A"][1] in (499, 500)


def test_markov_attribution_gate_rows(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = {
        r["variant"]: r
        for r in QUERIES["events_attribution_markov"](spark, sf_dir).collect()
    }
    assert rows["base"]["removal_permille"] == 0
    for v, r in rows.items():
        if v != "base":
            assert 0 <= r["removal_permille"] <= 1000
            assert r["conv_nano"] <= rows["base"]["conv_nano"]


def test_grouped_cont_quantile_matches_numpy(spark):
    import numpy as np

    from pandasy_spark.extended.profile import quantile_cont_twopass

    rows = [("a", v) for v in [1, 3, 5, 7, 11]] + [
        ("b", v) for v in [10, 20, 30, 40]
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r["q_scaled"]
        for r in quantile_cont_twopass(
            df, "v", p_milli=750, group_cols=["g"]
        ).collect()
    }
    for grp, vals in (("a", [1, 3, 5, 7, 11]), ("b", [10, 20, 30, 40])):
        expect = np.percentile(np.array(vals, float), 75.0) * 1000
        assert out[grp] == int(round(expect)), grp


def test_streaming_bitmap_exact(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["streaming_bitmap"](spark, sf_dir).collect()
    assert rows and all(r["exact_ok"] for r in rows)


def test_ppr_seeds_dominate(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["graph_ppr"](spark, sf_dir).collect()
    seeds = [
        r["rank_nano"]
        for r in rows
        if r["node"] >= 1_000_000 and (r["node"] - 1_000_000) % 100 == 1
    ]
    others = [
        r["rank_nano"]
        for r in rows
        if not (r["node"] >= 1_000_000 and (r["node"] - 1_000_000) % 100 == 1)
    ]
    assert seeds and others
    # restart mass keeps seeds above the typical non-seed
    import statistics

    assert min(seeds) > statistics.median(others)
    # nodes with zero proximity to seeds score exactly 0
    assert min(others) >= 0


def test_ltv_curve_monotone(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["events_ltv"](spark, sf_dir).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(
            (r["age_weeks"], r["cum_cents"])
        )
    for cohort, pts in by_cohort.items():
        pts.sort()
        vals = [v for _, v in pts]
        assert vals == sorted(vals), cohort  # cumulative is monotone
