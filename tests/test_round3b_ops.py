"""Tests for the late round-3 operator batch: event-sequence n-grams,
incremental algebraic aggregate states, single-pass exact correlation,
and integer-exact PageRank.

Each has a DuckDB-oracle gate query in workload.py; these pin the
properties and hand-checkable cases the row-level gates can't state.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.events import sequence_ngrams
from pandasy_spark.extended.graph import SCALE, pagerank
from pandasy_spark.extended.profile import corr_pairs
from pandasy_spark.operators.aggregates import (
    agg_state,
    finalize_agg_state,
    merge_agg_states,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


# ---------------------------------------------------------------------------
# sequence_ngrams
# ---------------------------------------------------------------------------


def test_sequence_ngrams_hand_computed(spark):
    rows = [
        (1, _ts(1), 1, "a"),
        (2, _ts(2), 1, "b"),
        (3, _ts(3), 1, "c"),
        (4, _ts(4), 1, "a"),
        (5, _ts(1), 2, "a"),
        (6, _ts(2), 2, "b"),
        (7, _ts(3), 2, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["ngram"]: (r["n_occurrences"], r["n_users"])
        for r in sequence_ngrams(df, n=3, tiebreak_col="event_id").collect()
    }
    # user 1: a>b>c, b>c>a; user 2: a>b>c
    assert out == {"a>b>c": (2, 2), "b>c>a": (1, 1)}


def test_sequence_ngrams_tiebreak_determinism(spark):
    # two events at the SAME timestamp: order must come from event_id
    rows = [
        (10, _ts(1), 1, "x"),
        (11, _ts(1), 1, "y"),
        (12, _ts(2), 1, "z"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["ngram"] for r in sequence_ngrams(df, n=2, tiebreak_col="event_id").collect()}
    assert out == {"x>y", "y>z"}


def test_sequence_ngrams_unigram_and_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1, "a"), (2, _ts(2), 1, "a")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = sequence_ngrams(df, n=1).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in got] == [("a", 2)]
    with pytest.raises(ValueError):
        sequence_ngrams(df, n=0)


# ---------------------------------------------------------------------------
# agg_state / merge_agg_states / finalize_agg_state
# ---------------------------------------------------------------------------

_SPECS = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def test_merged_state_equals_full_recompute(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i * 7) for i in range(5)],
        "k string, v long",
    )
    old = df.filter(F.col("v") < 10)
    new = df.filter(F.col("v") >= 10)
    merged = merge_agg_states(
        [agg_state(old, ["k"], _SPECS), agg_state(new, ["k"], _SPECS)],
        ["k"],
        _SPECS,
    )
    full = agg_state(df, ["k"], _SPECS)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_state_key_only_in_one_side(spark):
    a = spark.createDataFrame([("only_a", 1)], "k string, v long")
    b = spark.createDataFrame([("only_b", 2)], "k string, v long")
    merged = merge_agg_states(
        [agg_state(a, ["k"], _SPECS), agg_state(b, ["k"], _SPECS)],
        ["k"],
        _SPECS,
    )
    got = {r["k"]: (r["n"], r["s"]) for r in merged.collect()}
    assert got == {"only_a": (1, 1), "only_b": (1, 2)}


def test_finalize_and_validation(spark):
    df = spark.createDataFrame([("a", 2), ("a", 4)], "k string, v long")
    st = agg_state(df, ["k"], _SPECS)
    fin = finalize_agg_state(st, {"avg": F.col("s") / F.col("n")})
    assert fin.collect()[0]["avg"] == 3.0
    with pytest.raises(ValueError):
        agg_state(df, ["k"], {"bad": ("median", "v")})
    with pytest.raises(ValueError):
        merge_agg_states([], ["k"], _SPECS)


# ---------------------------------------------------------------------------
# corr_pairs
# ---------------------------------------------------------------------------


def test_corr_pairs_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(0, 100, 200), 2)
    y = np.round(x * 3 + rng.uniform(0, 50, 200), 2)
    z = np.round(rng.uniform(0, 9, 200), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r["x_col"], r["y_col"]): r["corr"]
        for r in corr_pairs(df, ["x", "y", "z"], decimals=2).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    series = {"x": x, "y": y, "z": z}
    for (a, b), v in got.items():
        expect = np.corrcoef(series[a], series[b])[0, 1]
        assert abs(v - expect) < 1e-9


def test_corr_pairs_pairwise_null_deletion_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, None, 5.0)],
        "x double, y double, c double",
    )
    got = {
        (r["x_col"], r["y_col"]): r["corr"]
        for r in corr_pairs(df, ["x", "y", "c"], decimals=2).collect()
    }
    assert got[("x", "y")] == pytest.approx(1.0)  # null row excluded
    assert got[("x", "c")] is None  # zero variance -> NULL
    with pytest.raises(ValueError):
        corr_pairs(df, ["x"])


def test_corr_pairs_grouped(spark):
    df = spark.createDataFrame(
        [("g1", 1.0, 1.0), ("g1", 2.0, 2.0), ("g2", 1.0, 2.0), ("g2", 2.0, 1.0)],
        "g string, x double, y double",
    )
    got = {
        r["g"]: r["corr"]
        for r in corr_pairs(df, ["x", "y"], keys=["g"]).collect()
    }
    assert got["g1"] == pytest.approx(1.0)
    assert got["g2"] == pytest.approx(-1.0)


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def _pagerank_numpy(edges, iterations, damping_pct=85):
    """Independent integer-arithmetic reference."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iterations):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += rank[s] // out[s]
        rank = {n: base + (damping_pct * inc[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_reference_loop(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_nano"] for r in pagerank(df, iterations=4).collect()}
    assert got == _pagerank_numpy(edges, 4)


def test_pagerank_dangling_node_keeps_base_rank(spark):
    # node 2 has no out-edges: it receives but never sends; node 1
    # receives nothing so after iteration 1 it sits at the base rank.
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank_nano"] for r in pagerank(df, iterations=2).collect()}
    assert got == _pagerank_numpy([(1, 2)], 2)
    assert got[1] == (100 - 85) * SCALE // 100


def test_pagerank_zero_iterations_and_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank_nano"] for r in pagerank(df, iterations=0).collect()}
    assert got == {1: SCALE, 2: SCALE}
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=101)


def test_pagerank_symmetric_graph_uniform(spark):
    # a symmetric cycle is regular: every node must end at the same rank
    edges = [(i, (i + 1) % 5) for i in range(5)] + [
        ((i + 1) % 5, i) for i in range(5)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["rank_nano"] for r in pagerank(df, iterations=3).collect()}
    assert len(ranks) == 1


# ---------------------------------------------------------------------------
# robust_anomalies
# ---------------------------------------------------------------------------


def test_robust_anomalies_hand_computed(spark):
    from pandasy_spark.extended.events import robust_anomalies

    # group a: values 1..9 plus an outlier 1000. median=5.5 (of 10
    # values), MAD over |v-5.5|: {4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,
    # 994.5} -> median 2.5; threshold 5*2.5=12.5 -> only 1000 flags.
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    r = robust_anomalies(df, "value", "event_type", k=5).collect()[0]
    assert r["n"] == 10
    assert r["n_anomalies"] == 1
    assert r["med"] == pytest.approx(5.5)
    assert r["mad"] == pytest.approx(2.5)


def test_robust_anomalies_constant_group_flags_nothing(spark):
    from pandasy_spark.extended.events import robust_anomalies

    df = spark.createDataFrame(
        [("c", 7.0)] * 5, "event_type string, value double"
    )
    r = robust_anomalies(df).collect()[0]
    # MAD = 0: nothing exceeds 5*0 strictly except nonzero deviations;
    # all values identical -> zero anomalies
    assert (r["n_anomalies"], r["mad"]) == (0, 0.0)


def test_robust_anomalies_nulls_excluded(spark):
    from pandasy_spark.extended.events import robust_anomalies

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)],
        "event_type string, value double",
    )
    r = robust_anomalies(df).collect()[0]
    assert r["n"] == 2
    assert r["med"] == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# distribution_drift
# ---------------------------------------------------------------------------


def test_drift_identical_halves_zero(spark):
    from pandasy_spark.extended.profile import distribution_drift

    rows = [("x", i % 5, s) for i in range(50) for s in (True, False)]
    df = spark.createDataFrame(rows, "k string, v long, base boolean")
    r = distribution_drift(df, "v", F.col("base"), keys=["k"]).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_buckets"]) == (50, 50, 5)
    assert r["tvd"] == 0.0


def test_drift_disjoint_is_one(spark):
    from pandasy_spark.extended.profile import distribution_drift

    rows = [(1, True)] * 10 + [(2, False)] * 7
    df = spark.createDataFrame(rows, "v long, base boolean")
    r = distribution_drift(df, "v", F.col("base")).collect()[0]
    assert r["tvd"] == pytest.approx(1.0)


def test_drift_hand_computed(spark):
    from pandasy_spark.extended.profile import distribution_drift

    # A: bucket1 x3, bucket2 x1 ; B: bucket1 x1, bucket2 x1
    # p = (.75,.25), q = (.5,.5) -> TVD = .5*(|.25|+|.25|) = 0.25
    rows = [(1, True)] * 3 + [(2, True)] + [(1, False), (2, False)]
    df = spark.createDataFrame(rows, "v long, base boolean")
    r = distribution_drift(df, "v", F.col("base")).collect()[0]
    assert r["tvd"] == pytest.approx(0.25)


def test_drift_empty_side_null(spark):
    from pandasy_spark.extended.profile import distribution_drift

    df = spark.createDataFrame([(1, True), (2, True)], "v long, base boolean")
    r = distribution_drift(df, "v", F.col("base")).collect()[0]
    assert r["tvd"] is None and r["n_b"] == 0


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_all_three_branches(spark):
    from pandasy_spark.operators import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    # update only v: matched row keeps its target name
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(target, source, ["k"], ["v"]).collect()
    }
    assert got == {
        1: ("a", 10.0), 2: ("b", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)
    }
    # delete_unmatched drops target-only rows
    got2 = {
        r["k"]
        for r in merge_upsert(
            target, source, ["k"], delete_unmatched=True
        ).collect()
    }
    assert got2 == {2, 4}


def test_merge_upsert_null_keys_match_nullsafely(spark):
    from pandasy_spark.operators import merge_upsert

    target = spark.createDataFrame([(None, 1.0)], "k long, v double")
    source = spark.createDataFrame([(None, 2.0)], "k long, v double")
    rows = merge_upsert(target, source, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0  # matched, not doubled


def test_merge_upsert_duplicate_source_keys_fail_loudly(spark):
    """ANSI MERGE raises on multiple source matches; the default guard
    must fail the job instead of silently fanning out the join."""
    from pandasy_spark.operators import merge_upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup = spark.createDataFrame([(2, "B"), (2, "C")], "k long, v string")
    with pytest.raises(Exception, match="duplicate source merge keys"):
        merge_upsert(target, dup, ["k"]).collect()
    # explicit opt-out restores the raw outer-join fan-out
    assert merge_upsert(
        target, dup, ["k"], check_unique_source=False
    ).count() == 3
    # unique source passes through the guard untouched
    ok = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    got = {r["k"]: r["v"] for r in merge_upsert(target, ok, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scd2_null_eff_from_open_row_survives(spark):
    """An open dim row with NULL eff_from is still IN the dim — presence
    comes from the explicit __in_dim marker, not from guessing off a
    NULLable column; and duplicate snapshot keys fail the job."""
    import datetime

    from pandasy_spark.operators import scd2_apply

    dim = spark.createDataFrame(
        [(1, "x", None, None, True),
         (2, "y", datetime.date(2020, 1, 1), None, True)],
        "k long, v string, eff_from date, eff_to date, is_current boolean",
    )
    snap = spark.createDataFrame([(1, "x"), (2, "y2")], "k long, v string")
    rows = sorted(
        (r["k"], r["v"], r["eff_from"], r["eff_to"], r["is_current"])
        for r in scd2_apply(dim, snap, ["k"], ["v"],
                            datetime.date(2024, 6, 1)).collect()
    )
    assert rows == [
        # unchanged key 1 kept verbatim, NULL eff_from and all
        (1, "x", None, None, True),
        (2, "y", datetime.date(2020, 1, 1), datetime.date(2024, 6, 1), False),
        (2, "y2", datetime.date(2024, 6, 1), None, True),
    ]
    snap_dup = spark.createDataFrame([(1, "x"), (1, "z")], "k long, v string")
    with pytest.raises(Exception, match="duplicate snapshot merge keys"):
        scd2_apply(dim, snap_dup, ["k"], ["v"],
                   datetime.date(2024, 6, 1)).collect()


def test_merge_upsert_validation(spark):
    from pandasy_spark.operators import merge_upsert

    a = spark.createDataFrame([(1, 1.0)], "k long, v double")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        merge_upsert(a, b, ["k"])
    with pytest.raises(ValueError):
        merge_upsert(a, a, ["k"], ["k"])  # key can't be updated
    with pytest.raises(ValueError):
        merge_upsert(a, a, ["missing"])


# ---------------------------------------------------------------------------
# cooccurrence_edges / triangle_count
# ---------------------------------------------------------------------------


def test_cooccurrence_hand_computed(spark):
    from pandasy_spark.extended.graph import cooccurrence_edges

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"),
            (3, "b"), (2, "a")]  # duplicate (2, a) must not inflate sup
    df = spark.createDataFrame(rows, "g long, item string")
    got = {
        (r["x"], r["y"]): r["sup"]
        for r in cooccurrence_edges(df, "g", "item").collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    sup2 = cooccurrence_edges(df, "g", "item", min_support=2).collect()
    assert [(r["x"], r["y"]) for r in sup2] == [("a", "b")]
    with pytest.raises(ValueError):
        cooccurrence_edges(df, "g", "item", min_support=0)


def test_triangle_count_hand_graphs(spark):
    from pandasy_spark.extended.graph import triangle_count

    # K4 has 4 triangles; a path has none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "x long, y long")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "x long, y long")
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from pandasy_spark.extended.graph import triangle_count

    for seed in range(4):
        rng = random.Random(seed)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(10), 2)))
                for _ in range(20)
            }
        )
        expect = sum(
            1
            for a, b, c in itertools.combinations(range(10), 3)
            if ((a, b) in edges and (b, c) in edges and (a, c) in edges)
        )
        df = spark.createDataFrame(edges, "x long, y long")
        assert triangle_count(df).collect()[0]["n_triangles"] == expect, seed


def test_triangle_count_degree_orientation_bounds_skew(spark):
    """On a hub graph (one celebrity node), degree orientation keeps
    the wedge fan-out O(|E|^1.5) where id orientation is quadratic:
    the hub's edges all point INWARD, so it contributes zero wedges.
    Both orientations must still agree on the count."""
    from collections import Counter

    from pandasy_spark.extended.graph import triangle_count

    # hub node 50 (a MIDDLE id) connects to every other node 0..100:
    # under id orientation the hub has in-degree 50 AND out-degree 50,
    # so the two-hop join fans out 50*50 = 2500 wedge pairs through it;
    # under degree orientation all hub edges point INWARD (everyone
    # else has lower degree) and the hub contributes zero wedges.
    hub = 50
    edges = sorted(
        {tuple(sorted((hub, i))) for i in range(101) if i != hub}
        | {(0, 1), (99, 100)}
    )
    df = spark.createDataFrame(edges, "x long, y long")
    got_deg = triangle_count(df, orient="degree").collect()[0]["n_triangles"]
    got_id = triangle_count(df, orient="id").collect()[0]["n_triangles"]
    assert got_deg == got_id == 2  # (0,1,50) and (50,99,100)

    # wedge count = sum over middle nodes b of out(b) * in(b) for the
    # two-hop join e1.y == e2.x == b; compute for both orientations
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1

    def wedges(oriented):
        out = Counter()
        inc = Counter()
        for a, b in oriented:
            out[a] += 1
            inc[b] += 1
        return sum(out[v] * inc[v] for v in set(out) | set(inc))

    w_id = wedges(edges)  # already x < y
    w_deg = wedges(
        [(a, b) if (deg[a], a) < (deg[b], b) else (b, a) for a, b in edges]
    )
    m = len(edges)
    assert w_id >= (m // 2) ** 2 // 2  # id orientation: quadratic in hub deg
    assert w_deg <= int(2 * m**1.5)  # degree orientation: O(|E|^1.5)
    assert w_deg < w_id // 100  # and 100x+ smaller on this graph

    with pytest.raises(ValueError):
        triangle_count(df, orient="nope")


# ---------------------------------------------------------------------------
# text_textrank (workload composition: lead-window pairs + pagerank)
# ---------------------------------------------------------------------------


def test_textrank_hub_word_ranks_highest(spark, sf_dir):
    """A word co-occurring with everything must out-rank the
    periphery: build a tiny corpus where 'hub' neighbors every other
    word and check the composed query's graph ranks it first."""
    from pandasy_spark.extended.graph import pagerank

    docs = ["hub aaa", "hub bbb", "hub ccc", "hub ddd", "aaa bbb"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    # replicate the query's pair construction
    from pyspark.sql.window import Window

    toks = df.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) > 2)
        ).alias("pos", "t"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    p = toks.select("t", F.lead("t", 1).over(w).alias("t1"))
    pr = (
        p.filter(F.col("t1").isNotNull() & (F.col("t") != F.col("t1")))
        .select(F.least("t", "t1").alias("a"), F.greatest("t", "t1").alias("b"))
        .distinct()
    )
    edges = pr.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pr.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ranks = {
        r["node"]: r["rank_nano"]
        for r in pagerank(edges, iterations=3).collect()
    }
    assert max(ranks, key=ranks.get) == "hub"
    assert ranks["hub"] > ranks["ccc"]
