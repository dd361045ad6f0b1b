"""Round-8 fixes: ADVICE r7 items + the prefix-scan quantile sliver
(the plan shape itself is pinned in tests/test_plans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestAdviceR7Fixes:
    def test_lsh_operators_exported(self):
        """lsh_verified_pairs / lsh_anchor_dedup are public API and
        must appear in dedup.__all__ like every other operator."""
        import pandasy_spark.extended.dedup as D

        assert "lsh_verified_pairs" in D.__all__
        assert "lsh_anchor_dedup" in D.__all__
        for name in D.__all__:
            assert hasattr(D, name), name

    def test_binary_metrics_rejects_float_scores(self, spark):
        """A probability column must be rejected, not silently
        thresholded at != 0 (the old cast('boolean') behavior)."""
        from pandasy_spark.extended.ml import binary_metrics

        df = spark.createDataFrame(
            [(True, 0.9), (False, 0.2)], "label boolean, score double"
        )
        with pytest.raises(TypeError, match="threshold float scores"):
            binary_metrics(df, "label", "score")

    def test_binary_metrics_rejects_string_labels(self, spark):
        """String labels previously deferred to a mid-job ANSI cast
        failure; now they fail fast at plan build."""
        from pandasy_spark.extended.ml import binary_metrics

        df = spark.createDataFrame(
            [("yes", True), ("no", False)], "label string, pred boolean"
        )
        with pytest.raises(TypeError, match="binary_metrics"):
            binary_metrics(df, "label", "pred")

    def test_binary_metrics_integer_null_preserved(self, spark):
        """The explicit != 0 comparison must stay NULL-preserving —
        NULL int labels drop out exactly like NULL booleans."""
        from pandasy_spark.extended.ml import binary_metrics

        ints = spark.createDataFrame(
            [(1, 1), (None, 1), (0, None), (0, 0)],
            "label int, pred int",
        )
        r = binary_metrics(ints, "label", "pred").collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (1, 0, 0, 1)

    def test_bench_errored_names_excluded_from_headline(self):
        """bench.py sums only clean timings into the headline value;
        an errored query's partial timing rides in partial_times."""
        import inspect

        import bench

        src = inspect.getsource(bench.main)
        assert "partial_times" in src
        # the headline sum reads times, which errored names never join
        assert "total = round(sum(times.values()), 3)" in src

    def test_streaming_eviction_guards_empty_slice(self):
        """The sentinel staging must fail loudly on an empty event
        slice instead of staging NaT sentinels that never flush."""
        import inspect

        from pandasy_spark.workload import QUERIES

        # the registry stores a session-configuring wrapper; read the
        # underlying gate function's source via __wrapped__
        src = inspect.getsource(QUERIES["streaming_eviction"].__wrapped__)
        assert "real.empty" in src
        assert "raise ValueError" in src


class TestQuantileSliverPrefixScan:
    """Value-level checks that the prefix-scan rewrite of the no-group
    two-pass quantiles is semantics-preserving, including on the
    concentrated distribution that motivated it (one dominant value =
    one dense coarse cell = a huge refine sliver)."""

    def test_cont_concentrated_distribution(self, spark):
        from pandasy_spark.extended.profile import quantile_cont_twopass

        # 9000 copies of 5_000_000 + a 1000-value spread tail over a
        # wide domain: the dominant value concentrates one coarse cell
        rows = [(5_000_000,)] * 9000 + [
            (i * 10_000,) for i in range(1000)
        ]
        df = spark.createDataFrame(rows, "v long")
        got = quantile_cont_twopass(df, "v", p_milli=500).collect()[0]
        import statistics

        vals = sorted(v for (v,) in rows)
        expect = statistics.quantiles(vals, n=2, method="inclusive")[0]
        assert got.n == len(rows)
        assert got.q_scaled == int(round(expect * 1000))

    def test_weighted_matches_brute_force(self, spark):
        from pandasy_spark.extended.profile import (
            weighted_quantile_twopass,
        )

        rows = [(v, (v * 7) % 5 + 1) for v in range(1, 401)]
        df = spark.createDataFrame(rows, "v long, w long")
        got = weighted_quantile_twopass(df, "v", "w", q_milli=250)
        r = got.collect()[0]
        total = sum(w for _, w in rows)
        rank = -(-250 * total // 1000)  # ceil
        cum = 0
        expect = None
        for v, w in sorted(rows):
            cum += w
            if cum >= rank:
                expect = v
                break
        assert (r.w_total, r.q_value) == (total, expect)

    def test_disc_nogroup_matches_sorted_rank(self, spark):
        from pandasy_spark.extended.profile import quantile_disc_twopass

        rows = [((i * 37) % 1000,) for i in range(5000)]
        df = spark.createDataFrame(rows, "v long")
        r = quantile_disc_twopass(df, [], "v", q_milli=900).collect()[0]
        vals = sorted(v for (v,) in rows)
        rank = -(-900 * len(vals) // 1000)  # ceil, 1-indexed
        assert (r.n, r.q_value) == (len(vals), vals[rank - 1])


@pytest.mark.slow
class TestQuantileTwopassFuzz:
    """Hypothesis fuzz of the two-pass quantiles vs exact Python
    order statistics — small coarse_cells force real multi-cell
    histograms + sliver refinement on tiny inputs, and the value
    strategy mixes heavy duplication with extreme spread (the
    concentrated-distribution shape the r8 rewrite targets)."""

    @staticmethod
    def _vals():
        from hypothesis import strategies as st

        base = st.one_of(
            st.integers(-50, 50),
            st.sampled_from([0, 0, 0, 7, 10**12, -(10**12)]),
        )
        return st.lists(base, min_size=1, max_size=40)

    def test_cont_fuzz(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from pandasy_spark.extended.profile import quantile_cont_twopass

        @given(vals=self._vals(), p=st.integers(0, 1000))
        @settings(max_examples=10, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        def run(vals, p):
            df = spark.createDataFrame([(v,) for v in vals], "v long")
            r = quantile_cont_twopass(
                df, "v", p_milli=p, coarse_cells=4
            ).collect()[0]
            s = sorted(vals)
            pos = (len(s) - 1) * p  # position*1000
            lo, rem = s[pos // 1000], pos % 1000
            hi = s[min(pos // 1000 + 1, len(s) - 1)]
            assert r.n == len(s)
            assert r.q_scaled == lo * (1000 - rem) + hi * rem, (vals, p)

        run()

    def test_disc_fuzz(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from pandasy_spark.extended.profile import quantile_disc_twopass

        @given(vals=self._vals(), q=st.integers(1, 1000))
        @settings(max_examples=10, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        def run(vals, q):
            df = spark.createDataFrame([(v,) for v in vals], "v long")
            r = quantile_disc_twopass(
                df, [], "v", q_milli=q, coarse_cells=4
            ).collect()[0]
            s = sorted(vals)
            rank = -(-q * len(s) // 1000)  # ceil, 1-indexed
            assert (r.n, r.q_value) == (len(s), s[rank - 1]), (vals, q)

        run()

    def test_weighted_fuzz(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from pandasy_spark.extended.profile import (
            weighted_quantile_twopass,
        )

        @given(
            rows=st.lists(
                st.tuples(
                    st.integers(-(10**9), 10**9), st.integers(1, 9)
                ),
                min_size=1,
                max_size=30,
            ),
            q=st.integers(1, 1000),
        )
        @settings(max_examples=10, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        def run(rows, q):
            df = spark.createDataFrame(rows, "v long, w long")
            r = weighted_quantile_twopass(
                df, "v", "w", q_milli=q, coarse_cells=4
            ).collect()[0]
            total = sum(w for _, w in rows)
            rank = -(-q * total // 1000)
            cum = 0
            expect = None
            for v, w in sorted(rows):
                cum += w
                if cum >= rank:
                    expect = v
                    break
            assert (r.w_total, r.q_value) == (total, expect), (rows, q)

        run()


class TestTokenBudgetSample:
    def test_budget_semantics_exact(self, spark, sf_dir):
        """Selected docs per domain: hash-priority order, cumulative
        tokens BEFORE each < budget (overshoot <= 1 doc), verified
        against a Python re-computation."""
        from pandasy_spark.extended.dedup import _P31
        from pandasy_spark.extended.sampling import token_budget_sample

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 400)
        )
        got = {
            (r.source, r.doc_id): (r.n_tok, r.tokens_before)
            for r in token_budget_sample(
                docs, 300, domain_col="source"
            ).collect()
        }

        def fold(s):
            acc = 0
            for ch in s:
                acc = (acc * 257 + ord(ch)) % 9007199254740992
            return acc % _P31

        rows = docs.select("source", "doc_id", "text").collect()
        by_dom: dict = {}
        for r in rows:
            pri = (fold(str(r.doc_id)) * 48271) % _P31
            by_dom.setdefault(r.source, []).append(
                (pri, r.doc_id, len(r.text.split()))
            )
        expect = {}
        for dom, lst in by_dom.items():
            cum = 0
            for pri, did, nt in sorted(lst):
                if cum < 300:
                    expect[(dom, did)] = (nt, cum)
                cum += nt
        assert got == expect

    def test_no_per_domain_data_window(self, spark, sf_dir):
        """The per-domain running total must NOT be a per-domain
        window over the data (one domain = one task); the scan's
        partition-local window and the bounded #domains offset window
        are the only specs allowed."""
        from pandasy_spark.extended.sampling import token_budget_sample

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            token_budget_sample(docs, 800, domain_col="source")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "windowspecdefinition(__pid" in plan
        # a data-path window PARTITIONED BY the domain would read
        # windowspecdefinition(__dom#N, __pri...; the only allowed
        # __dom spec is the bounded offsets table's ORDER BY __dom
        import re

        bad = re.findall(r"windowspecdefinition\(__dom#\d+, __pri", plan)
        assert not bad, bad


class TestDsirWeights:
    def test_weights_match_python(self, spark, sf_dir):
        """Per-doc summed 1e9-lattice log ratios vs an exact Python
        recomputation of the same hashed distributions."""
        import math

        from pandasy_spark.extended.dedup import _P31
        from pandasy_spark.extended.sampling import dsir_weights

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 200)
        )
        got = {
            r.doc_id: (r.n_feat, r.log_w_nano)
            for r in dsir_weights(docs, F.col("lang") == "en").collect()
        }

        def fold(s):
            acc = 0
            for ch in s:
                acc = (acc * 257 + ord(ch)) % 9007199254740992
            return acc % _P31

        import re

        rows = docs.select("doc_id", "lang", "text").collect()
        c_t: dict = {}
        c_r: dict = {}
        feats = {}
        for r in rows:
            ws = re.findall(r"[a-z]+", r.text.lower())
            bs = [fold(w) % 64 for w in ws]
            feats[r.doc_id] = bs
            for b in bs:
                c_r[b] = c_r.get(b, 0) + 1
                if r.lang == "en":
                    c_t[b] = c_t.get(b, 0) + 1
        n_t, n_r = sum(c_t.values()), sum(c_r.values())
        lwq = {
            b: math.floor(
                math.log(
                    ((c_t.get(b, 0) + 1) / (n_t + 64))
                    / ((c_r[b] + 1) / (n_r + 64))
                )
                * 1e9
            )
            for b in c_r
        }
        expect = {
            did: (len(bs), sum(lwq[b] for b in bs))
            for did, bs in feats.items()
            if bs
        }
        assert got == expect

    def test_target_docs_score_higher_on_average(self, spark, sf_dir):
        """Directional sanity: English docs should average a higher
        importance weight than non-English under an English target."""
        from pandasy_spark.extended.sampling import dsir_weights

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        w = dsir_weights(docs, F.col("lang") == "en").join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        rows = w.groupBy(F.col("lang") == "en").agg(
            F.avg(F.col("log_w_nano") / F.col("n_feat")).alias("m")
        ).collect()
        m = {r[0]: r.m for r in rows}
        assert m[True] > m[False]


class TestTableFingerprint:
    def test_order_and_partition_invariant(self, spark, sf_dir):
        from pandasy_spark.extended.profile import table_fingerprint

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_returnflag"
        )
        a = table_fingerprint(li).collect()[0]
        b = table_fingerprint(li.repartition(7)).collect()[0]
        c = table_fingerprint(li.orderBy(F.desc("l_orderkey"))).collect()[0]
        assert (a.n_rows, a.fingerprint) == (b.n_rows, b.fingerprint)
        assert (a.n_rows, a.fingerprint) == (c.n_rows, c.fingerprint)

    def test_detects_single_row_change_and_null_vs_empty(self, spark):
        from pandasy_spark.extended.profile import table_fingerprint

        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "id int, s string"
        )
        changed = spark.createDataFrame(
            [(1, "a"), (2, "B"), (3, None)], "id int, s string"
        )
        empty_not_null = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "")], "id int, s string"
        )
        fp = lambda d: table_fingerprint(d).collect()[0].fingerprint
        assert fp(base) != fp(changed)
        assert fp(base) != fp(empty_not_null)

    def test_one_aggregate_no_shuffle_of_rows(self, spark, sf_dir):
        """One partial-aggregated scan: the only exchange is the 1-row
        final aggregation (SinglePartition), never a row shuffle."""
        from pandasy_spark.extended.profile import table_fingerprint

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_returnflag"
        )
        plan = (
            table_fingerprint(li)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "partial" in plan.lower()
        assert plan.count("Exchange") == 1
        assert "SinglePartition" in plan


class TestAucExact:
    def test_matches_pair_counting(self, spark):
        """AUC == (#(pos>neg) + 0.5*#ties) / (n_pos*n_neg), brute
        force over a small score table with heavy ties."""
        from pandasy_spark.extended.ml import auc_exact

        rows = [
            (0.9, True), (0.8, True), (0.8, False), (0.7, True),
            (0.5, False), (0.5, True), (0.5, False), (0.3, False),
            (0.1, False), (0.9, False),
        ]
        df = spark.createDataFrame(rows, "score double, y boolean")
        r = auc_exact(df, "score", F.col("y"), decimals=3).collect()[0]
        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        num = sum(
            1.0 if p > n else 0.5 if p == n else 0.0
            for p in pos for n in neg
        )
        expect = num / (len(pos) * len(neg))
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        assert r.auc_micro == int(expect * 1_000_000)

    def test_perfect_and_inverted(self, spark):
        from pandasy_spark.extended.ml import auc_exact

        perfect = spark.createDataFrame(
            [(float(i), i >= 5) for i in range(10)], "score double, y boolean"
        )
        inverted = spark.createDataFrame(
            [(float(i), i < 5) for i in range(10)], "score double, y boolean"
        )
        assert auc_exact(perfect, "score", F.col("y")).collect()[0].auc_micro == 1_000_000
        assert auc_exact(inverted, "score", F.col("y")).collect()[0].auc_micro == 0

    def test_degenerate_class_is_null(self, spark):
        from pandasy_spark.extended.ml import auc_exact

        allpos = spark.createDataFrame(
            [(0.5, True), (0.7, True)], "score double, y boolean"
        )
        r = auc_exact(allpos, "score", F.col("y")).collect()[0]
        assert r.auc_micro is None and r.n_neg == 0

    def test_rank_scan_not_single_partition(self, spark, sf_dir):
        from pandasy_spark.workload import QUERIES

        plan = (
            QUERIES["ml_auc"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "windowspecdefinition(__v" not in plan
        assert "windowspecdefinition(__pid" in plan


class TestCalibrationBins:
    def test_bins_match_python(self, spark):
        from pandasy_spark.extended.ml import calibration_bins

        rows = [
            (0.05, False), (0.15, False), (0.18, True), (0.52, True),
            (0.55, False), (0.58, True), (0.95, True), (0.99, True),
            (1.0, True), (0.0, False),
        ]
        df = spark.createDataFrame(rows, "p double, y boolean")
        got = {
            r.bin: (r.n, r.n_pos, r.mean_pred_micro, r.obs_rate_micro)
            for r in calibration_bins(
                df, "p", F.col("y"), bins=10, decimals=4
            ).collect()
        }
        expect: dict = {}
        agg: dict = {}
        for p, y in rows:
            q = int(p * 10**4 + 0.5)
            b = min(9, q * 10 // 10**4)
            n, np_, sq = agg.get(b, (0, 0, 0))
            agg[b] = (n + 1, np_ + int(y), sq + q)
        for b, (n, np_, sq) in agg.items():
            expect[b] = (n, np_, sq * 100 // n, np_ * 10**6 // n)
        assert got == expect

    def test_right_edge_closed(self, spark):
        """p == 1.0 lands in the last bin, not bin `bins`."""
        from pandasy_spark.extended.ml import calibration_bins

        df = spark.createDataFrame([(1.0, True)], "p double, y boolean")
        r = calibration_bins(df, "p", F.col("y")).collect()
        assert len(r) == 1 and r[0].bin == 9


class TestTableFingerprintTyping:
    def test_rejects_float_columns(self, spark):
        from pandasy_spark.extended.profile import table_fingerprint

        df = spark.createDataFrame([(1, 0.5)], "id int, x double")
        with pytest.raises(TypeError, match="integer grid"):
            table_fingerprint(df)

    def test_timestamp_and_date_hash(self, spark):
        """Typed cells: shifting a timestamp by 1us or a date by 1 day
        changes the fingerprint."""
        import datetime as dt

        from pandasy_spark.extended.profile import table_fingerprint

        a = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 12, 0, 0, 0))], "id int, ts timestamp"
        )
        b = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 12, 0, 0, 1))], "id int, ts timestamp"
        )
        fp = lambda d: table_fingerprint(d).collect()[0].fingerprint
        assert fp(a) != fp(b)

    def test_column_order_matters(self, spark):
        """Positional fold: swapping two equal-typed columns changes
        the fingerprint (no column-shift aliasing)."""
        from pandasy_spark.extended.profile import table_fingerprint

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        fp1 = table_fingerprint(df, ["a", "b"]).collect()[0].fingerprint
        fp2 = table_fingerprint(df, ["b", "a"]).collect()[0].fingerprint
        assert fp1 != fp2


class TestRound9Advisories:
    """Regression tests for the r8 advisory items (fixed in r9)."""

    def test_fingerprint_pre_1970_date_no_int32_overflow(self, spark):
        """DateType cells cast datediff to long BEFORE the modulus:
        pre-1970 dates (pmod lands near 2^31) must not wrap negative
        in the h*2 cell map, and the fingerprint stays in [0, 2^62)."""
        import datetime as dt

        from pandasy_spark.extended.profile import table_fingerprint

        old = spark.createDataFrame(
            [(1, dt.date(1903, 5, 14)), (2, dt.date(1969, 12, 31))],
            "id int, d date",
        )
        r = table_fingerprint(old).collect()[0]
        assert 0 <= r.fingerprint < 2**62
        shifted = spark.createDataFrame(
            [(1, dt.date(1903, 5, 15)), (2, dt.date(1969, 12, 31))],
            "id int, d date",
        )
        assert r.fingerprint != table_fingerprint(shifted).collect()[0].fingerprint

    def test_fingerprint_pre_1970_date_under_ansi(self, spark):
        """The int32 wrap threw under ANSI mode before the fix."""
        import datetime as dt

        from pandasy_spark.extended.profile import table_fingerprint

        old = spark.createDataFrame(
            [(1, dt.date(1903, 5, 14))], "id int, d date"
        )
        prior = spark.conf.get("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            r = table_fingerprint(old).collect()[0]
            assert 0 <= r.fingerprint < 2**62
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prior)

    def test_fingerprint_two_lane_matches_python(self, spark):
        """Pin the two-lane arithmetic against a pure-Python rebuild
        (the engine-portability contract, lane by lane)."""
        from pandasy_spark.extended.profile import table_fingerprint

        P = 2147483647
        rows = [(7, "ab"), (0, ""), (None, None), (-3, "xyz")]

        def char_fold(s):
            acc = 0
            for ch in s:
                acc = (acc * 257 + ord(ch)) % 9007199254740992
            return acc % P

        total = 0
        for i, s in rows:
            cells = [
                1 if i is None else (i % P) * 2,
                1 if s is None else char_fold(s) * 2,
            ]
            a = b = 0
            for cell in cells:
                a = (a * 48271 + cell) % P
                b = (b * 16807 + cell) % P
            total += ((a * 48271 + 12345) % P) * 2147483648 + (
                (b * 16807 + 54321) % P
            )
        expect = total % 2**62
        df = spark.createDataFrame(rows, "i int, s string")
        assert table_fingerprint(df).collect()[0].fingerprint == expect

    def test_auc_excludes_nan_and_null_scores(self, spark):
        """NaN/NULL scores carry no ranking signal and must not snap
        to grid point 0 (non-ANSI floor) or enter the lattice."""
        from pandasy_spark.extended.ml import auc_exact

        clean = [(0.9, True), (0.6, True), (0.4, False), (0.1, False)]
        noisy = clean + [(float("nan"), True), (None, False),
                         (float("nan"), False)]
        a = auc_exact(
            spark.createDataFrame(clean, "score double, y boolean"),
            "score", F.col("y"),
        ).collect()[0]
        b = auc_exact(
            spark.createDataFrame(noisy, "score double, y boolean"),
            "score", F.col("y"),
        ).collect()[0]
        assert (a.n_pos, a.n_neg, a.u_x2, a.auc_micro) == (
            b.n_pos, b.n_neg, b.u_x2, b.auc_micro
        )

    def test_calibration_rejects_bad_decimals(self, spark):
        from pandasy_spark.extended.ml import calibration_bins

        df = spark.createDataFrame([(0.5, True)], "p double, y boolean")
        for bad in (0, 7, -1):
            with pytest.raises(ValueError, match="decimals"):
                calibration_bins(df, "p", F.col("y"), decimals=bad)

    def test_calibration_mean_pred_exact_at_decimals_5(self, spark):
        """decimals=5 keeps full micro precision (the old floored
        10**6//p multiplier truncated to a 10-micro grid)."""
        from pandasy_spark.extended.ml import calibration_bins

        df = spark.createDataFrame(
            [(0.00001, False), (0.00002, False), (0.00002, False)],
            "p double, y boolean",
        )
        r = calibration_bins(df, "p", F.col("y"), decimals=5).collect()[0]
        # mean pred = (1 + 2 + 2) / 3 * 10 micro = 16 micro (floored)
        assert r.mean_pred_micro == 16

    def test_calibration_excludes_nan_null(self, spark):
        from pandasy_spark.extended.ml import calibration_bins

        df = spark.createDataFrame(
            [(0.25, True), (float("nan"), True), (None, False)],
            "p double, y boolean",
        )
        r = calibration_bins(df, "p", F.col("y")).collect()
        assert len(r) == 1 and r[0].n == 1 and r[0].bin == 2


class TestGiniScaleOverflow:
    def test_gini_milli_no_int64_overflow_at_large_mass(self, spark):
        """r9 regression: the x1000 numerator overflowed int64 once
        n*total passed ~9.2e15 (sf0.1 orders) and gini went negative;
        the denominator is pre-scaled instead, matching the oracle."""
        from pandasy_spark.extended.profile import gini_concentration

        # n=4000, total=8e12: n*total ~ 3.2e16 fits int64 (the design
        # range) but the old x1000 numerator (~1.1e19) did not
        rows = [(i, (i + 1) * 10**6) for i in range(4000)]
        df = spark.createDataFrame(rows, "k long, cents long")
        r = gini_concentration(df, ["k"], "cents").collect()[0]
        # linear ramp 1..n has exact Gini (n-1)/(3n) ~ 0.333
        assert r.n == 4000 and 325 <= r.gini_milli <= 334


class TestQuantileDiscMulti:
    def test_matches_python_order_stats(self, spark):
        import random

        from pandasy_spark.extended.profile import quantile_disc_multi

        random.seed(11)
        data = [random.randint(-1000, 10**6) for _ in range(5000)] + [7] * 800
        df = spark.createDataFrame([(v,) for v in data], "v long")
        qs = [1, 250, 500, 750, 999, 1000]
        got = {
            r.q_milli: (r.n, r.q_value)
            for r in quantile_disc_multi(df, "v", qs).collect()
        }
        s = sorted(data)
        for q in qs:
            rank = (q * len(s) + 999) // 1000
            assert got[q] == (len(s), s[rank - 1]), q

    def test_dense_shared_cells(self, spark):
        """coarse_cells=2 forces every quantile into one of two huge
        cells — the union-sliver offset arithmetic must still recover
        exact within-cell ranks."""
        import random

        from pandasy_spark.extended.profile import quantile_disc_multi

        random.seed(5)
        data = [random.randint(0, 10**7) for _ in range(20000)]
        df = spark.createDataFrame([(v,) for v in data], "v long")
        got = {
            r.q_milli: r.q_value
            for r in quantile_disc_multi(
                df, "v", [500, 501, 990], coarse_cells=2
            ).collect()
        }
        s = sorted(data)
        for q in (500, 501, 990):
            assert got[q] == s[(q * len(s) + 999) // 1000 - 1], q

    def test_matches_single_quantile_twin(self, spark):
        from pandasy_spark.extended.profile import (
            quantile_disc_multi,
            quantile_disc_twopass,
        )

        df = spark.createDataFrame(
            [((i * 37) % 1009,) for i in range(3000)], "v long"
        )
        multi = {
            r.q_milli: r.q_value
            for r in quantile_disc_multi(df, "v", [500, 990]).collect()
        }
        for q in (500, 990):
            single = quantile_disc_twopass(df, [], "v", q_milli=q).collect()[0]
            assert multi[q] == single.q_value

    def test_validation_and_nulls(self, spark):
        from pandasy_spark.extended.profile import quantile_disc_multi

        df = spark.createDataFrame([(1,), (None,), (3,)], "v long")
        got = {r.q_milli: r.q_value
               for r in quantile_disc_multi(df, "v", [1000]).collect()}
        assert got == {1000: 3}
        with pytest.raises(ValueError, match="q_milli"):
            quantile_disc_multi(df, "v", [0])
        with pytest.raises(ValueError, match="at least one"):
            quantile_disc_multi(df, "v", [])


class TestPrAucExact:
    def test_matches_threshold_walk(self, spark):
        """AP == sum over distinct thresholds (descending) of
        dTP/n_pos * precision, per-term floored on the 1e9 lattice."""
        import random

        from pandasy_spark.extended.ml import pr_auc_exact

        random.seed(3)
        rows = [(round(random.random(), 3), random.random() < 0.3)
                for _ in range(2000)]
        df = spark.createDataFrame(rows, "score double, y boolean")
        r = pr_auc_exact(df, "score", F.col("y"), decimals=3).collect()[0]
        from collections import defaultdict

        agg: dict = defaultdict(lambda: [0, 0])
        for s, y in rows:
            v = int(s * 1000 + 0.5)
            agg[v][0] += int(y)
            agg[v][1] += 1
        n_pos = sum(a[0] for a in agg.values())
        cum_p = cum_t = ap = 0
        for v in sorted(agg, reverse=True):
            c_p, t = agg[v]
            cum_p += c_p
            cum_t += t
            ap += (c_p * cum_p * 10**9) // (cum_t * n_pos)
        assert (r.n_pos, r.ap_nano) == (n_pos, ap)

    def test_perfect_and_no_positives(self, spark):
        from pandasy_spark.extended.ml import pr_auc_exact

        perfect = spark.createDataFrame(
            [(float(i), i >= 5) for i in range(10)],
            "score double, y boolean",
        )
        assert pr_auc_exact(
            perfect, "score", F.col("y")
        ).collect()[0].ap_nano == 10**9
        nopos = spark.createDataFrame(
            [(0.5, False), (0.7, False)], "score double, y boolean"
        )
        r = pr_auc_exact(nopos, "score", F.col("y")).collect()[0]
        assert r.ap_nano is None and r.n_pos == 0

    def test_excludes_nan_null_scores(self, spark):
        from pandasy_spark.extended.ml import pr_auc_exact

        clean = [(0.9, True), (0.6, True), (0.4, False), (0.1, False)]
        noisy = clean + [(float("nan"), True), (None, False)]
        a = pr_auc_exact(
            spark.createDataFrame(clean, "score double, y boolean"),
            "score", F.col("y"),
        ).collect()[0]
        b = pr_auc_exact(
            spark.createDataFrame(noisy, "score double, y boolean"),
            "score", F.col("y"),
        ).collect()[0]
        assert (a.n_pos, a.n_neg, a.ap_nano) == (b.n_pos, b.n_neg, b.ap_nano)

    def test_rank_scan_not_single_partition(self, spark, sf_dir):
        from pandasy_spark.workload import QUERIES

        plan = (
            QUERIES["ml_pr_auc"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "windowspecdefinition(__nv" not in plan
        assert "windowspecdefinition(__pid" in plan


class TestMutualInformation:
    def test_matches_python(self, spark):
        import math
        from collections import Counter

        from pandasy_spark.extended.profile import mutual_information

        rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"),
                ("b", "y"), ("b", "z"), ("c", "z"), (None, "x")]
        df = spark.createDataFrame(rows, "u string, v string")
        r = mutual_information(df, "u", "v").collect()[0]
        n = len(rows)
        o = Counter(rows)
        ra = Counter(u for u, _ in rows)
        cb = Counter(v for _, v in rows)
        # NULL is its own level and its cells MUST contribute (the
        # null-safe-join fix; a plain equi-join silently dropped them)
        mi = sum(
            math.floor((c / n) * math.log(c * n / (ra[u] * cb[v])) * 1e9
                       + 0.5)
            for (u, v), c in o.items()
        )
        ha = sum(
            math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5)
            for c in ra.values()
        )
        assert (r.n, r.n_a, r.n_b) == (n, len(ra), len(cb))
        assert r.mi_nano == mi
        assert r.h_a_nano == ha

    def test_null_level_kept_in_chi_square_too(self, spark):
        """chi_square had the same equi-join NULL drop: a NULL-keyed
        cell must contribute its (o-e)^2/e term, and the observed
        cross mass S must cover it (else chi2 is inflated by the
        n - S/n unobserved-cell correction)."""
        from pandasy_spark.extended.profile import chi_square

        with_null = spark.createDataFrame(
            [("a", "x"), ("a", "y"), (None, "x"), (None, "y")] * 25,
            "u string, v string",
        )
        sentinel = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("Z", "x"), ("Z", "y")] * 25,
            "u string, v string",
        )
        rn = chi_square(with_null, "u", "v").collect()[0]
        rs = chi_square(sentinel, "u", "v").collect()[0]
        assert (rn.n, rn.n_a, rn.n_b, rn.dof, rn.chi2) == (
            rs.n, rs.n_a, rs.n_b, rs.dof, rs.chi2
        )

    def test_independent_and_identical(self, spark):
        """Independent uniform columns give MI ~ 0; a column with
        itself gives MI == H (up to the per-cell lattice rounding)."""
        from pandasy_spark.extended.profile import mutual_information

        rows = [(str(i % 4), str((i // 4) % 4)) for i in range(160)]
        ind = mutual_information(
            spark.createDataFrame(rows, "u string, v string"), "u", "v"
        ).collect()[0]
        assert abs(ind.mi_nano) <= 32  # only lattice rounding
        same = mutual_information(
            spark.createDataFrame(
                [(str(i % 5), str(i % 5)) for i in range(100)],
                "u string, v string",
            ),
            "u", "v",
        ).collect()[0]
        assert abs(same.mi_nano - same.h_a_nano) <= 50


class TestPrAucEmptyInput:
    def test_empty_input_one_null_row(self, spark):
        """Shape contract matches auc_exact: empty input -> ONE row of
        NULLs, never zero rows (callers crossJoin the result)."""
        from pandasy_spark.extended.ml import pr_auc_exact

        df = spark.createDataFrame([], "score double, y boolean")
        rows = pr_auc_exact(df, "score", F.col("y")).collect()
        assert len(rows) == 1
        assert rows[0].ap_nano is None
