"""Round-6 sixth batch: distributed prefix scan, 2-D skyline,
sweep-line concurrency, k-anonymity, fixed-width source, Arrow UDF."""

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.events import interval_concurrency
from pandasy_spark.extended.profile import k_anonymity
from pandasy_spark.operators.sort import ordered_prefix_scan, skyline_2d


# ------------------------------------------------------ prefix scan


def test_prefix_scan_sum_matches_window(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(-5, 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["rt"]
        for r in ordered_prefix_scan(
            df, ["k"], "v", agg="sum", out_col="rt"
        ).collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc


def test_prefix_scan_min_strict(spark):
    rows = [(1, 5), (2, 3), (3, 9), (4, 1), (5, 2)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(4)
    got = {
        r["k"]: r["pm"]
        for r in ordered_prefix_scan(
            df, ["k"], "v", agg="min", out_col="pm", strict=True
        ).collect()
    }
    assert got == {1: None, 2: 5, 3: 3, 4: 3, 5: 1}


def test_prefix_scan_validation(spark):
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        ordered_prefix_scan(df, [], "v")
    with pytest.raises(ValueError):
        ordered_prefix_scan(df, ["k"], "v", agg="avg")


def test_prefix_scan_no_global_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    plan = (
        ordered_prefix_scan(df, ["k"], "v")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the data-path window must be partitioned by __pid; the only
    # unpartitioned window runs over the bounded per-partition summary
    data_windows = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln.lower() and "__local" in ln
    ]
    assert data_windows and all("__pid" in ln for ln in data_windows)


# ---------------------------------------------------------- skyline


def test_skyline_matches_bruteforce(spark):
    import random

    rng = random.Random(11)
    pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["n_points"] for r in skyline_2d(df, "x", "y").collect()
    }
    brute = {}
    for p in pts:
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])
            for q in pts
        ):
            brute[p] = brute.get(p, 0) + 1
    assert got == brute


def test_skyline_duplicates_kept(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (0, 2), (2, 2)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["n_points"] for r in skyline_2d(df, "x", "y").collect()
    }
    assert got == {(1, 1): 2, (2, 0): 1, (0, 2): 1}


# ------------------------------------------------------ concurrency


def test_interval_concurrency_peak(spark):
    # [0,10) [5,15) [8,12) -> peak 3 at t=8; [20,30) alone
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (8, 12), (20, 30)], "s long, e long"
    )
    row = interval_concurrency(iv, "s", "e").first()
    assert row["max_concurrent"] == 3
    assert row["at_t"] == 8


def test_interval_concurrency_halfopen(spark):
    # end at t, start at t do NOT overlap ([0,5) then [5,10))
    iv = spark.createDataFrame([(0, 5), (5, 10)], "s long, e long")
    row = interval_concurrency(iv, "s", "e").first()
    assert row["max_concurrent"] == 1


# ------------------------------------------------------ k-anonymity


def test_k_anonymity_flags(spark):
    rows = (
        [("a", "x", i) for i in range(5)]
        + [("b", "y", 1), ("b", "y", 1)]  # small group, 1 sensitive
        + [("c", "z", i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, s long")
    out = {
        (r["q1"], r["q2"]): (r["n"], r["n_sensitive"], r["violation"])
        for r in k_anonymity(
            df, ["q1", "q2"], k=4, sensitive_col="s", l_diversity=3
        ).collect()
    }
    assert ("c", "z") not in out
    assert out[("b", "y")] == (2, 1, "k+l")
    assert ("a", "x") not in out  # n=5 >= 4, 5 distinct >= 3
    # k-only form
    out2 = {
        (r["q1"], r["q2"]): r["violation"]
        for r in k_anonymity(df, ["q1", "q2"], k=6).collect()
    }
    assert out2 == {("a", "x"): "k", ("b", "y"): "k"}
    with pytest.raises(ValueError):
        k_anonymity(df, ["q1"], k=2, sensitive_col="s")


# ---------------------------------------------------- UDF surface


def test_udf_scalar_is_arrow_not_batch(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    df = QUERIES["udf_scalar_arrow"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_fixed_width_roundtrip_counts(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    out = QUERIES["source_fixed_width"](spark, sf_dir)
    rows = out.collect()
    from pandasy_spark.sources import load_table

    od = load_table(spark, sf_dir, "orders")
    assert sum(r["n"] for r in rows) == od.count()


def test_prefix_scan_deterministic_beyond_reservoir(spark):
    """Regression for the r9 near-miss: RangePartitioner seeds its
    boundary sampler with the RDD id, so two executions of the range
    exchange draw different samples once the input exceeds the
    per-partition reservoir (~60 rows/partition at default hints) —
    the scan's branches MUST therefore share ONE pinned shuffle
    layout.  25k distinct keys (well past the reservoir) with unique
    keys make the correct result a pure function of the input:
    repeated executions of the same plan and freshly built plans must
    agree with the Python oracle exactly.  The removed-checkpoint
    variant failed this nondeterministically (±~500 on the cums)."""
    df = spark.createDataFrame(
        [((i * 2654435761) % (1 << 30), (i % 13) + 1)
         for i in range(25000)],
        "k long, v long",
    ).groupBy("k").agg(F.sum("v").alias("v"))  # unique keys
    rows = {r.k: r.v for r in df.collect()}
    expect, run = [], 0
    for k in sorted(rows):
        run += rows[k]
        expect.append((k, run))
    plan = ordered_prefix_scan(df, ["k"], "v", out_col="cum")
    a = sorted((r.k, r.cum) for r in plan.collect())
    b = sorted((r.k, r.cum) for r in plan.collect())
    c = sorted(
        (r.k, r.cum)
        for r in ordered_prefix_scan(df, ["k"], "v", out_col="cum").collect()
    )
    assert a == expect
    assert b == expect
    assert c == expect
