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
