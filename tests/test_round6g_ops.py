"""Round-6 seventh batch: point-in-polygon geofencing, interval
coalesce, weighted quantiles, Cramér's V."""

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.events import coalesce_intervals
from pandasy_spark.extended.profile import cramers_v, weighted_quantile_twopass
from pandasy_spark.extended.spatial import point_in_polygon


# ------------------------------------------------- point in polygon


def test_pip_square_boundary_rule(spark):
    poly = [(0, 0), (10, 0), (10, 10), (0, 10)]
    pts = [
        (5, 5, True), (15, 5, False), (-1, -1, False),
        # half-open crossing rule: left/bottom edges in, right/top out
        (0, 5, True), (10, 5, False), (5, 0, True), (5, 10, False),
        (0, 0, True), (10, 10, False),
    ]
    df = spark.createDataFrame([(x, y) for x, y, _ in pts], "x long, y long")
    got = {
        (r["x"], r["y"]): r["inside"]
        for r in point_in_polygon(df, poly).collect()
    }
    for x, y, expect in pts:
        assert got[(x, y)] == expect, (x, y)


def test_pip_concave_and_validation(spark):
    # concave "C" shape: the notch is outside
    poly = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 7), (7, 7), (7, 3), (0, 3)]
    df = spark.createDataFrame(
        [(3, 5), (8, 5), (3, 1), (3, 9)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["inside"]
        for r in point_in_polygon(df, poly).collect()
    }
    assert got == {(3, 5): False, (8, 5): True, (3, 1): True, (3, 9): True}
    with pytest.raises(ValueError):
        point_in_polygon(df, [(0, 0), (1, 1)])


def test_pip_is_narrow_map(spark):
    poly = [(0, 0), (10, 0), (5, 10)]
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    plan = (
        point_in_polygon(df, poly)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


# ------------------------------------------------ interval coalesce


def test_coalesce_intervals_merging(spark):
    rows = [
        # key 1: [0,5) [3,8) [8,10) merge to [0,10); [20,25) separate
        (1, 0, 5), (1, 3, 8), (1, 8, 10), (1, 20, 25),
        # key 2: nested [0,100) [10,20)
        (2, 0, 100), (2, 10, 20),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    out = coalesce_intervals(df, ["k"], "s", "e").collect()
    spans = {(r["k"], r["span_start"], r["span_end"]): r["n_merged"] for r in out}
    assert spans == {(1, 0, 10): 3, (1, 20, 25): 1, (2, 0, 100): 2}
    with pytest.raises(ValueError):
        coalesce_intervals(df, [], "s", "e")


def test_coalesce_intervals_touch_merges(spark):
    df = spark.createDataFrame([(1, 0, 5), (1, 5, 9)], "k long, s long, e long")
    out = coalesce_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1 and out[0]["span_end"] == 9


# ------------------------------------------------ weighted quantile


def test_weighted_quantile_matches_definition(spark):
    # values 1..4 with weights 1,1,6,2 -> W=10, median rank 5 -> value 3
    rows = [(1, 1), (2, 1), (3, 6), (4, 2)]
    df = spark.createDataFrame(rows, "v long, w long")
    row = weighted_quantile_twopass(df, "v", "w", q_milli=500).first()
    assert row["w_total"] == 10
    assert row["q_value"] == 3
    # q=0.9 -> rank 9 -> cumulative 1,2,8,10 -> value 4
    row = weighted_quantile_twopass(df, "v", "w", q_milli=900).first()
    assert row["q_value"] == 4
    # non-positive weights ignored
    df2 = spark.createDataFrame(rows + [(100, 0), (200, -5)], "v long, w long")
    assert weighted_quantile_twopass(df2, "v", "w").first()["w_total"] == 10
    with pytest.raises(ValueError):
        weighted_quantile_twopass(df, "v", "w", q_milli=0)


def test_weighted_quantile_unit_weights_match_disc(spark):
    from pandasy_spark.extended.profile import quantile_disc_twopass

    vals = [5, 1, 9, 3, 7, 7, 2]
    df = spark.createDataFrame([(v, 1) for v in vals], "v long, w long")
    wq = weighted_quantile_twopass(df, "v", "w", q_milli=500).first()
    dq = quantile_disc_twopass(df, [], "v", q_milli=500).first()
    assert wq["q_value"] == dq["q_value"]


# --------------------------------------------------------- cramers


def test_cramers_v_bounds(spark):
    # perfectly dependent: a == b -> V^2 = 1
    dep = spark.createDataFrame(
        [(str(i % 3), str(i % 3)) for i in range(300)], "a string, b string"
    )
    row = cramers_v(dep, "a", "b").first()
    assert row["v2_micro"] == 1_000_000
    # independent uniform grid -> chi2 = 0 -> V^2 = 0
    ind = spark.createDataFrame(
        [(str(i % 3), str(i // 3 % 4)) for i in range(120)],
        "a string, b string",
    )
    row = cramers_v(ind, "a", "b").first()
    assert row["v2_micro"] == 0
