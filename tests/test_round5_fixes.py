"""Round-5 hardening: advisor-flagged edge cases — utm_* prefix
canonicalization, bidirectional-edge triangle dedup, gini overflow
typing, exact kmeans centroid floor-division, staged-stream row cap
and staging-dir cleanup registration."""

import pytest
from pyspark.sql import functions as F


def test_canonicalize_url_utm_prefix_family(spark):
    """ANY utm_-prefixed param is dropped (utm_id, utm_reader, ...),
    not just the five enumerated classics — the rule the dedup_url
    oracle states with LIKE 'utm\\_%'."""
    from pandasy_spark.extended.text import canonicalize_url

    cases = {
        "http://e.com/p?utm_id=1&a=1": "http://e.com/p?a=1",
        "http://e.com/p?utm_reader=tw&utm_source=x&b=2": "http://e.com/p?b=2",
        # bare utm_-prefixed token (no '=') is dropped too
        "http://e.com/p?utm_&z=1": "http://e.com/p?z=1",
        # 'utm' without the underscore is NOT tracking
        "http://e.com/p?utm=keep": "http://e.com/p?utm=keep",
        "http://e.com/p?utmost=1": "http://e.com/p?utmost=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    assert got == cases


def test_triangle_count_bidirectional_edges(spark):
    """An undirected edge stated in BOTH directions must not
    double-count incident triangles: the oriented edge list is
    deduplicated after the degree re-orientation."""
    from pandasy_spark.extended.graph import triangle_count

    tri_once = [(1, 2), (2, 3), (1, 3)]
    tri_both = tri_once + [(b, a) for a, b in tri_once]
    for orient in ("degree", "id"):
        df = spark.createDataFrame(tri_both, "x long, y long")
        assert (
            triangle_count(df, orient=orient).collect()[0]["n_triangles"] == 1
        ), orient
    # partial double-statement: only one edge repeated reversed
    df = spark.createDataFrame(tri_once + [(2, 1)], "x long, y long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 1


def test_column_entropy_gini_is_double_typed(spark):
    """The sum-of-squared-counts accumulates in DOUBLE so counts past
    ~3e9 cannot overflow int64 (100 TB posture); values still exact at
    test scale."""
    from pandasy_spark.extended.profile import column_entropy

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "c string")
    row = column_entropy(df, ["c"]).collect()[0]
    # gini = 1 - (9 + 1)/16 = 0.375
    assert row["gini"] == pytest.approx(0.375, abs=1e-9)
    # plan carries no bigint*bigint product of counts: the aggregate
    # input to sum() is double-typed
    from pandasy_spark.extended.profile import column_entropy as ce

    plan = ce(df, ["c"])._jdf.queryExecution().optimizedPlan().toString()
    assert "cast(cnt" in plan.lower() or "double" in plan.lower()


def test_kmeans_exact_integer_floor_division(spark):
    """Centroid means use exact integer floor division (pmod + div),
    exact for negative sums and beyond 2^53; hand-check a negative-sum
    cluster: sum=-7 over n=2 -> floor(-3.5) = -4."""
    from pandasy_spark.extended.similarity import kmeans_exact

    # one cluster (k=1) holding vectors [-3] and [-4] on a 1x grid:
    # centroid floor((-3000-4000)/2) with scale 1000 = -3500
    df = spark.createDataFrame(
        [(1, [-3.0]), (2, [-4.0])], "vec_id long, embedding array<double>"
    )
    row = kmeans_exact(df, k=1, iters=1, scale=1000).collect()[0]
    assert row["n_members"] == 2
    assert row["c_sum"] == -3500
    # odd split: [-3, -4, -4] -> floor(-11000/3) = -3667 (not trunc -3666)
    df = spark.createDataFrame(
        [(1, [-3.0]), (2, [-4.0]), (3, [-4.0])],
        "vec_id long, embedding array<double>",
    )
    row = kmeans_exact(df, k=1, iters=1, scale=1000).collect()[0]
    assert row["c_sum"] == -3667


def test_staged_file_stream_row_cap(spark):
    """The staged replay is driver-side scaffolding: a frame list past
    STAGED_STREAM_MAX_ROWS total rows raises instead of silently
    materializing on the driver."""
    import pandas as pd

    from pandasy_spark.streaming.ops import (
        STAGED_STREAM_MAX_ROWS,
        staged_file_stream,
    )

    big = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01"] * (STAGED_STREAM_MAX_ROWS + 1)),
            "v": range(STAGED_STREAM_MAX_ROWS + 1),
        }
    )
    with pytest.raises(ValueError, match="cap"):
        staged_file_stream(spark, [big])


def test_staged_file_stream_registers_cleanup(spark, monkeypatch):
    """Every staging dir is registered for interpreter-exit removal
    (no /tmp accumulation across gate runs)."""
    import atexit
    import shutil

    import pandas as pd

    from pandasy_spark.streaming import ops

    registered = []
    real_register = atexit.register

    def spy(fn, *a, **k):
        registered.append((fn, a))
        return real_register(fn, *a, **k)

    monkeypatch.setattr("atexit.register", spy)
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]), "v": [1]})
    ops.staged_file_stream(spark, [pdf])
    dirs = [a[0] for fn, a in registered if fn is shutil.rmtree]
    assert len(dirs) == 1 and "pandasy_staged_stream_" in dirs[0]


def test_quantile_thresholds_exact_and_approx(spark):
    from pandasy_spark.extended.profile import quantile_thresholds

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    row = quantile_thresholds(df, ["v"], buckets=4).collect()[0]
    assert (row["v_t1"], row["v_t2"], row["v_t3"]) == (25, 50, 75)
    # type preserved (percentile_disc surfaces double; we cast back)
    assert isinstance(row["v_t1"], int)
    arow = quantile_thresholds(df, ["v"], buckets=4, exact=False).collect()[0]
    assert abs(arow["v_t2"] - 50) <= 2
    with pytest.raises(ValueError):
        quantile_thresholds(df, ["v"], buckets=1)


def test_band_by_thresholds_mirror_rules(spark):
    from pandasy_spark.extended.profile import (
        band_by_thresholds,
        quantile_thresholds,
    )

    df = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    th = quantile_thresholds(df, ["v"], buckets=4)
    ts = [F.col(f"v_t{i}") for i in (1, 2, 3)]
    out = (
        df.crossJoin(F.broadcast(th))
        .select(
            "v",
            band_by_thresholds(F.col("v"), ts).alias("asc"),
            band_by_thresholds(F.col("v"), ts, descending=True).alias("desc"),
        )
        .collect()
    )
    got = {r["v"]: (r["asc"], r["desc"]) for r in out}
    # distinct values, full bands: matches ntile in both directions
    assert got == {1: (1, 4), 2: (2, 3), 3: (3, 2), 4: (4, 1)}
    # ties all land in the same band
    df2 = spark.createDataFrame([(v,) for v in (5, 5, 5, 1)], "v long")
    th2 = quantile_thresholds(df2, ["v"], buckets=4)
    out2 = (
        df2.crossJoin(F.broadcast(th2))
        .select(
            "v",
            band_by_thresholds(F.col("v"), ts, descending=True).alias("d"),
        )
        .collect()
    )
    d = {r["v"]: r["d"] for r in out2}
    assert d[5] == d[5] and d[1] == 4 and d[5] < d[1]
