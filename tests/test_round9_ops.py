"""Round-9 late operators: NDCG@k, cumulative gains, regression
metrics, graph modularity — each pinned against an independent Python
re-implementation (the gate oracles cover the SQL restatements; these
pin the math itself on crafted shapes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.graph import modularity
from pandasy_spark.extended.ml import (
    cumulative_gains,
    ndcg_exact,
    ndcg_weights,
    regression_metrics,
)


def _py_ndcg(rows, k=10):
    """rows: (query, item, rel, score). Returns per-query nano NDCG."""
    ws = ndcg_weights(k)
    byq = {}
    for q, i, r, s in rows:
        byq.setdefault(q, []).append((i, r, s))
    out = {}
    for q, items in byq.items():
        by_score = sorted(items, key=lambda t: (-t[2], t[0]))
        by_rel = sorted(items, key=lambda t: (-t[1], t[0]))
        dcg = sum(r * ws[p] for p, (_, r, _) in enumerate(by_score[:k]))
        idcg = sum(r * ws[p] for p, (_, r, _) in enumerate(by_rel[:k]))
        if idcg > 0:
            out[q] = dcg * 10**9 // idcg
    return out


class TestNdcgExact:
    def test_weights_monotone_and_anchored(self):
        ws = ndcg_weights(10)
        assert ws[0] == 10**9
        assert ws == sorted(ws, reverse=True)
        assert ws[2] == 500_000_000  # 1/log2(4)

    def test_matches_python(self, spark):
        rows = [
            # q1: model ranks ideally
            (1, 10, 3, 0.9), (1, 11, 2, 0.8), (1, 12, 0, 0.1),
            # q2: model inverts the ranking
            (2, 20, 0, 0.9), (2, 21, 1, 0.5), (2, 22, 3, 0.1),
            # q3: all-zero relevance -> excluded
            (3, 30, 0, 0.7), (3, 31, 0, 0.2),
            # q4: score ties broken by item id
            (4, 40, 2, 0.5), (4, 41, 3, 0.5), (4, 42, 1, 0.4),
        ]
        df = spark.createDataFrame(rows, "q long, i long, rel long, s double")
        got = ndcg_exact(df, "q", "i", "rel", "s", k=10).collect()[0]
        per_q = _py_ndcg(rows)
        assert got.n_queries == len(per_q) == 3
        assert got.mean_ndcg_nano == sum(per_q.values()) // len(per_q)
        assert got.min_ndcg_nano == min(per_q.values())
        assert got.n_perfect == sum(
            1 for v in per_q.values() if v == 10**9
        )
        # q1 is ideally ranked; q4's tie puts item 40 (rel 2) before 41
        assert per_q[1] == 10**9 and per_q[4] < 10**9

    def test_k_truncation_and_null_handling(self, spark):
        # 3 items beyond k=2 never contribute; NULL score row dropped;
        # NULL rel counts as grade 0
        rows = [
            (1, 1, 3, 0.9), (1, 2, 2, 0.8), (1, 3, 3, 0.7),
            (1, 4, None, 0.6), (1, 5, 3, None),
        ]
        df = spark.createDataFrame(rows, "q long, i long, rel long, s double")
        got = ndcg_exact(df, "q", "i", "rel", "s", k=2).collect()[0]
        ws = ndcg_weights(2)
        dcg = 3 * ws[0] + 2 * ws[1]
        idcg = 3 * ws[0] + 3 * ws[1]
        assert got.n_queries == 1
        assert got.mean_ndcg_nano == dcg * 10**9 // idcg

    def test_nan_scores_excluded(self, spark):
        rows = [(1, 1, 3, float("nan")), (1, 2, 1, 0.5)]
        df = spark.createDataFrame(rows, "q long, i long, rel long, s double")
        got = ndcg_exact(df, "q", "i", "rel", "s", k=5).collect()[0]
        assert got.n_queries == 1 and got.mean_ndcg_nano == 10**9


class TestCumulativeGains:
    def test_matches_python(self, spark):
        rows = [(i, float(i % 7) / 7.0, i % 3 == 0) for i in range(60)]
        df = spark.createDataFrame(rows, "id long, s double, pos boolean")
        got = {
            r.bucket: r
            for r in cumulative_gains(
                df, "s", F.col("pos"), buckets=10, decimals=4
            ).collect()
        }
        # python reference: group rows by grid score desc
        from collections import Counter

        per_v = Counter()
        pos_v = Counter()
        for _, s, pos in rows:
            v = math.floor(s * 10**4 + 0.5)
            per_v[v] += 1
            pos_v[v] += int(pos)
        n = sum(per_v.values())
        np_ = sum(pos_v.values())
        cum_t = cum_p = 0
        expect = {}
        for v in sorted(per_v, reverse=True):
            cum_t += per_v[v]
            cum_p += pos_v[v]
            b = -(-cum_t * 10 // n)  # ceil
            expect[b] = (cum_t, cum_p)  # last block ending in b wins
        assert set(got) == set(expect)
        for b, (ct, cp) in expect.items():
            assert got[b].cum_rows == ct and got[b].cum_pos == cp
            assert got[b].capture_nano == cp * 10**9 // np_
            assert got[b].lift_nano == cp * n * 10**9 // (np_ * ct)

    def test_monotone_capture_and_final_bucket(self, spark):
        rows = [(i, float(i), i < 5) for i in range(50)]
        df = spark.createDataFrame(rows, "id long, s double, pos boolean")
        out = sorted(
            cumulative_gains(df, "s", F.col("pos"), buckets=10).collect(),
            key=lambda r: r.bucket,
        )
        caps = [r.capture_nano for r in out]
        assert caps == sorted(caps)
        last = out[-1]
        assert last.bucket == 10 and last.cum_rows == 50
        assert last.capture_nano == 10**9  # all positives captured
        assert last.lift_nano == 10**9  # lift -> 1 at full depth
        # positives are the LOWEST scores: first decile captures none
        assert out[0].capture_nano == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 0.5, True)], "id long, s double, p boolean")
        with pytest.raises(ValueError):
            cumulative_gains(df, "s", F.col("p"), buckets=1)


class TestRegressionMetrics:
    def test_matches_python(self, spark):
        rows = [(i, 2 * i + 3 + (i % 5) - 2, 2 * i + 3) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, y long, p long")
        got = regression_metrics(df, "y", "p").collect()[0]
        ys = [y for _, y, _ in rows]
        ps = [p for _, _, p in rows]
        n = len(ys)
        sae = sum(abs(y - p) for y, p in zip(ys, ps))
        sse = sum((y - p) ** 2 for y, p in zip(ys, ps))
        sy, syy = sum(ys), sum(y * y for y in ys)
        sst_n = n * syy - sy * sy
        diff = sst_n - n * sse
        assert got.n == n
        assert got.mae_milli == sae * 1000 // n
        assert got.mse == sse // n
        assert got.r2_micro == (
            diff * 10**6 // sst_n if diff >= 0
            else -((-diff) * 10**6 // sst_n)
        )
        assert got.r2_micro > 990_000  # near-perfect fit

    def test_negative_r2_sign_split(self, spark):
        # prediction anti-correlated with y: R2 well below 0; the
        # sign-split must truncate the magnitude (toward zero), which
        # both engines agree on
        rows = [(i, i, 100 - i) for i in range(101)]
        df = spark.createDataFrame(rows, "id long, y long, p long")
        got = regression_metrics(df, "y", "p").collect()[0]
        n = 101
        ys = list(range(101))
        sse = sum((y - (100 - y)) ** 2 for y in ys)
        sy, syy = sum(ys), sum(y * y for y in ys)
        sst_n = n * syy - sy * sy
        diff = sst_n - n * sse
        assert diff < 0
        assert got.r2_micro == -((-diff) * 10**6 // sst_n)
        assert got.r2_micro < -2_900_000

    def test_constant_target_null_r2(self, spark):
        df = spark.createDataFrame(
            [(1, 5, 4), (2, 5, 6)], "id long, y long, p long"
        )
        got = regression_metrics(df, "y", "p").collect()[0]
        assert got.r2_micro is None and got.mse == 1

    def test_rejects_float_columns(self, spark):
        df = spark.createDataFrame([(1.0, 2)], "y double, p long")
        with pytest.raises(TypeError):
            regression_metrics(df, "y", "p")


def _py_modularity(edges, comm):
    e = [(u, v) for u, v in edges if u in comm and v in comm]
    m = len(e)
    intra = sum(1 for u, v in e if comm[u] == comm[v])
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dc = {}
    for node, d in deg.items():
        dc[comm[node]] = dc.get(comm[node], 0) + d
    dsq = sum(d * d for d in dc.values())
    num = 4 * m * intra - dsq
    den = 4 * m * m
    q = (num * 10**9 // den) if num >= 0 else -((-num) * 10**9 // den)
    return m, len(deg), len(dc), intra, q


class TestModularity:
    def _run(self, spark, edges, comm):
        e = spark.createDataFrame(edges, "x long, y long")
        c = spark.createDataFrame(list(comm.items()), "node long, comm long")
        return modularity(e, c, "x", "y", "node", "comm").collect()[0]

    def test_two_cliques_matches_python(self, spark):
        # two 4-cliques joined by one bridge edge: strongly modular
        edges = []
        for base in (0, 10):
            nodes = [base + i for i in range(4)]
            edges += [
                (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]
            ]
        edges.append((0, 10))
        comm = {i: 1 for i in range(4)} | {10 + i: 2 for i in range(4)}
        got = self._run(spark, edges, comm)
        m, nn, nc, intra, q = _py_modularity(edges, comm)
        assert (got.m, got.n_nodes, got.n_communities, got.intra_edges) == (
            m, nn, nc, intra,
        )
        assert got.q_nano == q and q > 300_000_000

    def test_anti_assortative_negative_q(self, spark):
        # complete bipartite K_3,3 with sides AS the communities:
        # zero intra edges -> Q < 0, exercising the sign split
        edges = [(a, 10 + b) for a in range(3) for b in range(3)]
        comm = {i: 1 for i in range(3)} | {10 + i: 2 for i in range(3)}
        got = self._run(spark, edges, comm)
        m, nn, nc, intra, q = _py_modularity(edges, comm)
        assert got.intra_edges == 0 and q < 0
        assert got.q_nano == q

    def test_uncovered_endpoints_dropped(self, spark):
        edges = [(1, 2), (2, 3), (3, 99)]  # 99 unassigned
        comm = {1: 1, 2: 1, 3: 2}
        got = self._run(spark, edges, comm)
        m, nn, nc, intra, q = _py_modularity(edges, comm)
        assert got.m == m == 2
        assert got.q_nano == q


class TestAnovaOneway:
    def test_matches_python(self, spark):
        from pandasy_spark.extended.profile import anova_oneway

        rows = [(g, 10 * g + (i % 7)) for g in (1, 2, 3) for i in range(20)]
        df = spark.createDataFrame(rows, "g long, y long")
        got = anova_oneway(df, "g", "y").collect()[0]
        by_g = {}
        for g, y in rows:
            by_g.setdefault(g, []).append(y)
        n = len(rows)
        k = len(by_g)
        s = sum(y for _, y in rows)
        syy = sum(y * y for _, y in rows)
        bpart = sum(
            sum(v) ** 2 * 1000 // len(v) for v in by_g.values()
        )
        ssb = bpart - s * s * 1000 // n
        ssw = syy * 1000 - bpart
        f = ssb * (n - k) * 10**6 // (ssw * (k - 1))
        assert (got.n, got.k) == (n, k)
        assert got.ssb_milli == ssb and got.ssw_milli == ssw
        assert got.f_micro == f
        assert got.f_micro > 100 * 10**6  # groups are far apart

    def test_no_group_effect_small_f(self, spark):
        from pandasy_spark.extended.profile import anova_oneway

        rows = [(g, i % 7) for g in (1, 2) for i in range(50)]
        df = spark.createDataFrame(rows, "g long, y long")
        got = anova_oneway(df, "g", "y").collect()[0]
        # identical distributions: SSB is 0 (or a few milli from
        # flooring), F ~ 0
        assert abs(got.f_micro) < 10**4

    def test_null_group_kept_degenerate_guards(self, spark):
        from pandasy_spark.extended.profile import anova_oneway

        df = spark.createDataFrame(
            [(None, 1), (None, 5), (1, 3), (1, 7)], "g string, y long"
        )
        got = anova_oneway(df, "g", "y").collect()[0]
        assert got.k == 2  # NULL segment counted
        one = spark.createDataFrame([(1, 2), (1, 4)], "g long, y long")
        assert anova_oneway(one, "g", "y").collect()[0].f_micro is None

    def test_rejects_float(self, spark):
        from pandasy_spark.extended.profile import anova_oneway

        df = spark.createDataFrame([(1, 1.0)], "g long, y double")
        with pytest.raises(TypeError):
            anova_oneway(df, "g", "y")

    def test_decimal_survives_large_grid_values(self, spark):
        # the div-demotes-to-BIGINT regression: with grid values ~1e7
        # and 1e3 rows the old int64 fnum (ssb*(n-k)*1e6) wrapped
        from pandasy_spark.extended.profile import anova_oneway

        rows = [
            (g, 10_000_000 * g + (i % 997) * 1000)
            for g in (1, 2, 3)
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g long, y long")
        got = anova_oneway(df, "g", "y").collect()[0]
        by_g = {}
        for g, y in rows:
            by_g.setdefault(g, []).append(y)
        n, k = len(rows), 3
        s = sum(y for _, y in rows)
        syy = sum(y * y for _, y in rows)
        bpart = sum(sum(v) ** 2 * 1000 // len(v) for v in by_g.values())
        ssb = bpart - s * s * 1000 // n
        ssw = syy * 1000 - bpart
        f = ssb * (n - k) * 10**6 // (ssw * (k - 1))
        assert got.f_micro == f and got.f_micro > 0


class TestCohenKappa:
    def test_matches_python(self, spark):
        from pandasy_spark.extended.ml import cohen_kappa

        rows = (
            [(True, True)] * 40 + [(False, False)] * 35
            + [(True, False)] * 15 + [(False, True)] * 10
        )
        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        got = cohen_kappa(df, "label", "pred").collect()[0]
        tp, tn, fn, fp = 40, 35, 15, 10
        n = tp + fp + fn + tn
        e = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
        num = n * (tp + tn) - e
        den = n * n - e
        expect = num * 10**6 // den if num >= 0 else -((-num) * 10**6 // den)
        assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
        assert got.kappa_micro == expect and 0 < expect < 10**6

    def test_constant_pred_chance_level_zero(self, spark):
        from pandasy_spark.extended.ml import cohen_kappa

        # pred always True on balanced labels: accuracy 0.5 == chance
        # agreement 0.5 -> kappa exactly 0 (the imbalance-honesty point)
        rows = [(i % 2 == 0, True) for i in range(20)]
        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        assert cohen_kappa(df, "label", "pred").collect()[0].kappa_micro == 0

    def test_both_constant_null(self, spark):
        from pandasy_spark.extended.ml import cohen_kappa

        # both raters constant same class: pe = 1, denominator 0 -> NULL
        rows = [(True, True)] * 10
        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        assert cohen_kappa(df, "label", "pred").collect()[0].kappa_micro is None

    def test_worse_than_chance_negative(self, spark):
        from pandasy_spark.extended.ml import cohen_kappa

        # perfect disagreement on a balanced labeling: kappa = -1
        rows = [(True, False)] * 10 + [(False, True)] * 10
        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        got = cohen_kappa(df, "label", "pred").collect()[0]
        assert got.kappa_micro == -(10**6)


# --- hypothesis fuzz: the eval operators vs exact Python references
# (the r8 quantile-fuzz standard applied to the round-9 family) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),          # query
            st.integers(0, 3),          # relevance grade
            st.integers(-50, 50),       # score on a coarse grid (ties!)
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(1, 6),
)
@settings(**_H)
@pytest.mark.slow
def test_ndcg_fuzz_vs_python(spark, rows, k):
    data = [
        (q, i, rel, float(s) / 4.0) for i, (q, rel, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "q long, i long, rel long, s double")
    got = ndcg_exact(df, "q", "i", "rel", "s", k=k).collect()[0]
    per_q = _py_ndcg(data, k=k)
    if not per_q:
        assert got.n_queries == 0 and got.mean_ndcg_nano is None
    else:
        assert got.n_queries == len(per_q)
        assert got.mean_ndcg_nano == sum(per_q.values()) // len(per_q)
        assert got.min_ndcg_nano == min(per_q.values())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.booleans()),  # grid score, pos
        min_size=1,
        max_size=60,
    ),
    buckets=st.integers(2, 7),
)
@settings(**_H)
@pytest.mark.slow
def test_gains_fuzz_vs_python(spark, rows, buckets):
    data = [(i, float(s), p) for i, (s, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, s double, pos boolean")
    got = {
        r.bucket: r
        for r in cumulative_gains(
            df, "s", F.col("pos"), buckets=buckets, decimals=2
        ).collect()
    }
    from collections import Counter

    per_v, pos_v = Counter(), Counter()
    for _, s, p in data:
        v = math.floor(s * 100 + 0.5)
        per_v[v] += 1
        pos_v[v] += int(p)
    n = sum(per_v.values())
    np_ = sum(pos_v.values())
    cum_t = cum_p = 0
    expect = {}
    for v in sorted(per_v, reverse=True):
        cum_t += per_v[v]
        cum_p += pos_v[v]
        expect[-(-cum_t * buckets // n)] = (cum_t, cum_p)
    assert set(got) == set(expect)
    for b, (ct, cp) in expect.items():
        assert (got[b].cum_rows, got[b].cum_pos) == (ct, cp)
        if np_ > 0:
            assert got[b].capture_nano == cp * 10**9 // np_
            assert got[b].lift_nano == cp * n * 10**9 // (np_ * ct)
        else:
            assert got[b].capture_nano is None and got[b].lift_nano is None


@given(
    rows=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_H)
@pytest.mark.slow
def test_regression_fuzz_vs_python(spark, rows):
    data = [(i, y, p) for i, (y, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, y long, p long")
    got = regression_metrics(df, "y", "p").collect()[0]
    n = len(data)
    ys = [y for _, y, _ in data]
    ps = [p for _, _, p in data]
    sae = sum(abs(y - p) for y, p in zip(ys, ps))
    sse = sum((y - p) ** 2 for y, p in zip(ys, ps))
    sy, syy = sum(ys), sum(y * y for y in ys)
    sst_n = n * syy - sy * sy
    assert got.n == n
    assert got.mae_milli == sae * 1000 // n
    assert got.mse == sse // n
    if sst_n <= 0:
        assert got.r2_micro is None
    else:
        diff = sst_n - n * sse
        expect = (
            diff * 10**6 // sst_n
            if diff >= 0
            else -((-diff) * 10**6 // sst_n)
        )
        assert got.r2_micro == expect


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(-10_000_000, 10_000_000)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_H)
@pytest.mark.slow
def test_anova_fuzz_vs_python(spark, rows):
    from pandasy_spark.extended.profile import anova_oneway

    df = spark.createDataFrame(rows, "g long, y long")
    got = anova_oneway(df, "g", "y").collect()[0]
    by_g = {}
    for g, y in rows:
        by_g.setdefault(g, []).append(y)
    n, k = len(rows), len(by_g)
    s = sum(y for _, y in rows)
    syy = sum(y * y for _, y in rows)
    bpart = sum(sum(v) ** 2 * 1000 // len(v) for v in by_g.values())
    ssb = bpart - s * s * 1000 // n
    ssw = syy * 1000 - bpart
    assert (got.n, got.k) == (n, k)
    assert got.ssb_milli == ssb and got.ssw_milli == ssw
    if k >= 2 and n > k and ssw > 0:
        fnum = ssb * (n - k) * 10**6
        fden = ssw * (k - 1)
        expect = fnum // fden if ssb >= 0 else -((-fnum) // fden)
        assert got.f_micro == expect
    else:
        assert got.f_micro is None


class TestRound9Advisories:
    """Self-audit guards added in round-9 session 3 (the r8 advisory
    classes applied to the round-9 eval operators)."""

    def test_ndcg_rejects_float_relevance(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 0.9, 0.5)], "q long, i long, rel double, s double"
        )
        with pytest.raises(TypeError, match="integral grades"):
            ndcg_exact(df, "q", "i", "rel", "s")

    def test_gains_rejects_bad_decimals(self, spark):
        df = spark.createDataFrame([(0.5, 1)], "s double, pos int")
        for bad in (-1, 10):
            with pytest.raises(ValueError, match="decimals"):
                cumulative_gains(
                    df, "s", F.col("pos") == 1, decimals=bad
                )

    def test_auc_family_rejects_bad_decimals(self, spark):
        from pandasy_spark.extended.ml import auc_exact, pr_auc_exact

        df = spark.createDataFrame([(0.5, 1)], "s double, pos int")
        for fn in (auc_exact, pr_auc_exact):
            with pytest.raises(ValueError, match="decimals"):
                fn(df, "s", F.col("pos") == 1, decimals=42)

    def test_auc_decimals_zero_is_a_coarse_grid(self, spark):
        # decimals=0 stays allowed: integer-grid snap (every score
        # rounds to its nearest integer) — with all scores rounding to
        # the same grid point, AUC degenerates to the all-ties 1/2.
        from pandasy_spark.extended.ml import auc_exact

        df = spark.createDataFrame(
            [(0.9, 1), (1.2, 0), (1.4, 1), (0.6, 0)], "s double, pos int"
        )
        got = auc_exact(df, "s", F.col("pos") == 1, decimals=0).collect()[0]
        assert (got.n_pos, got.n_neg) == (2, 2)
        assert got.auc_micro == 500_000
