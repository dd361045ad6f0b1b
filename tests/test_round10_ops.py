"""Round-10 operator batch: stream-stream FULL OUTER tolerance join,
Spark-4 dynamic SQL (EXECUTE IMMEDIATE / session variables, GROUP BY
ALL), exact MCC + Brier eval metrics, OHLC bars, Tukey fences, and
deterministic mixture upsampling.  The gate oracles cover the SQL
restatements; these pin the operator math, null conventions, guards,
and determinism on crafted frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandasy_spark.workload import QUERIES


class TestStreamFullOuterJoin:
    def test_rejects_unknown_how(self, spark):
        from pandasy_spark.streaming.ops import stream_stream_tolerance_join

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
        )
        with pytest.raises(ValueError, match="full_outer"):
            stream_stream_tolerance_join(
                df, df, ["user_id"], "ts", "ts", 60, how="right_semi"
            )

    def test_full_outer_batch_twin(self, spark):
        # the same join definition on BATCH frames (legal: the builder
        # only adds watermarks on streaming frames) must produce the
        # matched + both-null-padded union
        from pandasy_spark.streaming.ops import stream_stream_tolerance_join

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        left = spark.createDataFrame(
            [(1, t0, 10), (2, t0, 11)],
            "user_id long, l_ts timestamp, l_id long",
        )
        right = spark.createDataFrame(
            [
                (1, t0 + dt.timedelta(seconds=30), 20),
                (3, t0, 21),
            ],
            "user_id long, r_ts timestamp, r_id long",
        )
        got = {
            (r.l_id, r.r_id)
            for r in stream_stream_tolerance_join(
                left, right, ["user_id"], "l_ts", "r_ts", 60,
                how="full_outer",
            )
            .select("l_id", "r_id")
            .collect()
        }
        assert got == {(10, 20), (11, None), (None, 21)}

    def test_right_outer_batch_twin(self, spark):
        from pandasy_spark.streaming.ops import stream_stream_tolerance_join

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        left = spark.createDataFrame(
            [(1, t0, 10)], "user_id long, l_ts timestamp, l_id long"
        )
        right = spark.createDataFrame(
            [(1, t0, 20), (3, t0, 21)],
            "user_id long, r_ts timestamp, r_id long",
        )
        got = {
            (r.l_id, r.r_id)
            for r in stream_stream_tolerance_join(
                left, right, ["user_id"], "l_ts", "r_ts", 60,
                how="right_outer",
            )
            .select("l_id", "r_id")
            .collect()
        }
        assert got == {(10, 20), (None, 21)}

    def test_gate_null_pads_both_sides(self, spark, sf_dir):
        rows = QUERIES["streaming_full_outer_join"](spark, sf_dir).collect()
        assert any(r.err_id is None for r in rows)
        assert any(r.buy_id is None for r in rows)
        # matched pairs exist and no row is NULL on both sides
        assert any(
            r.err_id is not None and r.buy_id is not None for r in rows
        )
        assert not any(r.err_id is None and r.buy_id is None for r in rows)


class TestMccBinary:
    def test_crafted_confusion(self, spark):
        from pandasy_spark.extended.ml import mcc_binary

        rows = (
            [(True, True)] * 4
            + [(False, True)] * 1
            + [(True, False)] * 2
            + [(False, False)] * 3
        )
        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        r = mcc_binary(df, "label", "pred").collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (4, 1, 2, 3)
        assert r.mcc_num == 4 * 3 - 1 * 2
        import math

        den = math.sqrt(5.0 * 6.0 * 4.0 * 5.0)
        assert r.mcc_micro == math.floor(1e6 * 10 / den + 0.5)

    def test_degenerate_marginal_is_null(self, spark):
        from pandasy_spark.extended.ml import mcc_binary

        df = spark.createDataFrame(
            [(True, True), (True, False)], "label boolean, pred boolean"
        )
        r = mcc_binary(df, "label", "pred").collect()[0]
        assert r.mcc_micro is None  # no negative labels: undefined

    def test_null_rows_excluded_and_float_rejected(self, spark):
        from pandasy_spark.extended.ml import mcc_binary

        df = spark.createDataFrame(
            [(True, True), (None, True), (True, None)],
            "label boolean, pred boolean",
        )
        r = mcc_binary(df, "label", "pred").collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (1, 0, 0, 0)
        fdf = spark.createDataFrame(
            [(True, 0.9)], "label boolean, pred double"
        )
        with pytest.raises(TypeError, match="boolean or integral"):
            mcc_binary(fdf, "label", "pred")

    def test_perfect_and_inverse(self, spark):
        from pandasy_spark.extended.ml import mcc_binary

        perfect = spark.createDataFrame(
            [(True, True)] * 3 + [(False, False)] * 3,
            "label boolean, pred boolean",
        )
        assert mcc_binary(perfect, "label", "pred").collect()[0].mcc_micro == 1_000_000
        inverse = spark.createDataFrame(
            [(True, False)] * 3 + [(False, True)] * 3,
            "label boolean, pred boolean",
        )
        assert mcc_binary(inverse, "label", "pred").collect()[0].mcc_micro == -1_000_000


class TestBrierScore:
    def test_crafted_scores(self, spark):
        from pandasy_spark.extended.ml import brier_score

        df = spark.createDataFrame(
            [(0.9, True), (0.1, False), (0.5, True), (0.5, False)],
            "score double, pos boolean",
        )
        r = brier_score(df, "score", F.col("pos"), decimals=4).collect()[0]
        # grid: 9000/1000/5000/5000 vs 10000/0/10000/0
        sse = 1000**2 + 1000**2 + 5000**2 + 5000**2
        assert (r.n, r.n_pos, r.sse_grid) == (4, 2, sse)
        assert r.brier_micro == (sse * 1_000_000) // (4 * 100_000_000)

    def test_null_nan_scores_excluded(self, spark):
        from pandasy_spark.extended.ml import brier_score

        df = spark.createDataFrame(
            [(1.0, True), (None, True), (float("nan"), False)],
            "score double, pos boolean",
        )
        r = brier_score(df, "score", F.col("pos")).collect()[0]
        assert (r.n, r.sse_grid, r.brier_micro) == (1, 0, 0)

    def test_decimals_guard(self, spark):
        from pandasy_spark.extended.ml import brier_score

        df = spark.createDataFrame([(0.5, True)], "score double, pos boolean")
        with pytest.raises(ValueError, match="decimals"):
            brier_score(df, "score", F.col("pos"), decimals=10)

    def test_perfect_predictions_score_zero(self, spark):
        from pandasy_spark.extended.ml import brier_score

        df = spark.createDataFrame(
            [(1.0, True), (0.0, False)], "score double, pos boolean"
        )
        r = brier_score(df, "score", F.col("pos")).collect()[0]
        assert r.brier_micro == 0


class TestEventsOhlc:
    def test_crafted_bars_tie_determinism(self, spark):
        t = dt.datetime(2024, 3, 1, 9, 0, 0)
        # two events share the open timestamp: event_id breaks the tie
        rows = [
            (2, t, "a", 5.0),
            (1, t, "a", 3.0),
            (3, t + dt.timedelta(hours=1), "a", 9.0),
            (4, t + dt.timedelta(hours=2), "a", 1.0),
            (5, t + dt.timedelta(days=1), "a", 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        df.createOrReplaceTempView("__ohlc_crafted")
        e = df.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
            F.struct("ts", "event_id").alias("__ord"),
        )
        got = {
            (r.day.day, r.open_cents, r.high_cents, r.low_cents, r.close_cents)
            for r in e.groupBy("event_type", "day")
            .agg(
                F.min_by("cents", "__ord").alias("open_cents"),
                F.max("cents").alias("high_cents"),
                F.min("cents").alias("low_cents"),
                F.max_by("cents", "__ord").alias("close_cents"),
            )
            .collect()
        }
        assert got == {(1, 300, 900, 100, 100), (2, 700, 700, 700, 700)}

    def test_gate_invariants(self, spark, sf_dir):
        rows = QUERIES["events_ohlc"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.low_cents <= r.open_cents <= r.high_cents
            assert r.low_cents <= r.close_cents <= r.high_cents
            assert r.n >= 1


class TestProfileTukey:
    def test_crafted_outliers(self, spark):
        from pandasy_spark.extended.profile import quantile_cont_twopass

        # group of 5: vals 10,20,30,40,1000 — q1=20(q1s=20000),
        # q3=40(q3s=40000); iqr_s=20000; hi fence 2*40000+3*20000 =
        # 140000 -> v > 70 outlier: 1000 only
        vals = spark.createDataFrame(
            [("g", v) for v in [10, 20, 30, 40, 1000]], "grp string, val long"
        )
        q1 = quantile_cont_twopass(vals, "val", 250, group_cols=["grp"])
        q3 = quantile_cont_twopass(vals, "val", 750, group_cols=["grp"])
        assert q1.collect()[0].q_scaled == 20000
        assert q3.collect()[0].q_scaled == 40000

    def test_gate_counts_bounded(self, spark, sf_dir):
        rows = QUERIES["profile_tukey"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.q1_scaled <= r.q3_scaled
            assert 0 <= r.n_out_lo + r.n_out_hi < r.n


class TestPoissonUpsample:
    def test_expected_copies_formula(self, spark, sf_dir):
        # per-source arithmetic re-derived in python over the gate frame
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "source", "doc_id", "n_chars"
        )
        pdf = docs.toPandas()
        want = {}
        for _, row in pdf.iterrows():
            sfx = int(row.source[3:])
            w = 500 + (sfx * 48271 % 97) * 30
            h = (row.doc_id * 1103515245 + 12345) % 2147483647 % 1000
            k = w // 1000 + (1 if h < w % 1000 else 0)
            a = want.setdefault(row.source, [0, 0, 0, 0])
            a[0] += k
            a[1] += 1 if k > 0 else 0
            a[2] += k * row.n_chars
            a[3] = max(a[3], k)
        got = {
            r.source: [r.n_emitted, r.n_docs_emitted, r.chars_emitted, r.max_copies]
            for r in QUERIES["sample_poisson_upsample"](spark, sf_dir).collect()
        }
        assert got == want

    def test_zero_copy_guard_no_nulls(self, spark, sf_dir):
        # the explode guard must never emit NULL multiplicities
        rows = QUERIES["sample_poisson_upsample"](spark, sf_dir).collect()
        for r in rows:
            assert r.n_emitted is not None and r.n_emitted >= 0
            assert r.max_copies >= 0


class TestSqlSurfaces:
    def test_exec_immediate_binds_parameters(self, spark, sf_dir):
        df = QUERIES["sql_exec_immediate"](spark, sf_dir)
        rows = df.collect()
        assert df.columns == ["l_returnflag", "n", "rev_cents"]
        assert rows and all(r.n > 0 for r in rows)

    def test_group_by_all_matches_explicit(self, spark, sf_dir):
        got = QUERIES["sql_group_by_all"](spark, sf_dir)
        explicit = spark.sql(
            """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
            GROUP BY o_orderstatus, o_orderpriority
            """
        )
        assert got.exceptAll(explicit).count() == 0
        assert explicit.exceptAll(got).count() == 0


class TestClosenessFromLandmarks:
    def test_path_graph(self, spark):
        from pandasy_spark.extended.graph import closeness_from_landmarks

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "x long, y long"
        )
        lm = spark.createDataFrame([(1,)], "node long")
        r = closeness_from_landmarks(edges, lm, max_hops=3).collect()
        assert len(r) == 1
        row = r[0]
        # dists from 1: {2:1, 3:2, 4:3}; 5 is beyond the horizon
        assert (row.node, row.n_reached, row.dist_sum) == (1, 3, 6)
        assert row.closeness_micro == (3 * 1_000_000) // 6
        assert row.harmonic_micro == 1_000_000 + 500_000 + 333_333

    def test_multiple_landmarks_share_rounds(self, spark):
        from pandasy_spark.extended.graph import closeness_from_landmarks

        # triangle + pendant: 1-2, 2-3, 1-3, 3-4
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "x long, y long"
        )
        lm = spark.createDataFrame([(1,), (4,)], "node long")
        got = {
            r.node: (r.n_reached, r.dist_sum)
            for r in closeness_from_landmarks(edges, lm, max_hops=2).collect()
        }
        # from 1: 2@1, 3@1, 4@2 -> (3, 4); from 4: 3@1, 1@2, 2@2 -> (3, 5)
        assert got == {1: (3, 4), 4: (3, 5)}

    def test_max_hops_guard(self, spark):
        from pandasy_spark.extended.graph import closeness_from_landmarks

        edges = spark.createDataFrame([(1, 2)], "x long, y long")
        lm = spark.createDataFrame([(1,)], "node long")
        import pytest as _pt

        with _pt.raises(ValueError, match="max_hops"):
            closeness_from_landmarks(edges, lm, max_hops=0)

    def test_gate_landmarks_only(self, spark, sf_dir):
        rows = QUERIES["graph_closeness"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.node % 199 == 0
            assert r.n_reached >= 1 and r.dist_sum >= r.n_reached


class TestProfileMoments:
    def test_uniform_shape(self, spark, sf_dir):
        # python re-derivation over the same integral column
        import math

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        pdf = li.select("l_returnflag", "l_quantity").toPandas()
        want = {}
        for grp, g in pdf.groupby("l_returnflag"):
            xs = [int(math.floor(q + 0.5)) for q in g.l_quantity.dropna()]
            n = len(xs)
            s1, s2 = sum(xs), sum(x * x for x in xs)
            s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
            m1, r2, r3, r4 = s1 / n, s2 / n, s3 / n, s4 / n
            m2 = r2 - m1 * m1
            m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
            m4 = (
                r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                - 3.0 * m1 * m1 * m1 * m1
            )
            want[grp] = (
                n, s1, s2, s3, s4,
                math.floor(1e6 * (m3 / m2**1.5) + 0.5),
                math.floor(1e6 * (m4 / (m2 * m2) - 3.0) + 0.5),
            )
        got = {
            r.l_returnflag: (
                r.n, r.s1, r.s2, r.s3, r.s4, r.skew_micro, r.kurt_micro
            )
            for r in QUERIES["profile_moments"](spark, sf_dir).collect()
        }
        assert got == want

    def test_symmetric_distribution_zero_skew(self, spark, sf_dir):
        # l_quantity is ~uniform on 1..50: skew ~0, excess kurtosis
        # ~ -1.2 (discrete uniform) — sanity band, exactness is pinned
        # above and by the oracle
        for r in QUERIES["profile_moments"](spark, sf_dir).collect():
            assert abs(r.skew_micro) < 100_000
            assert -1_400_000 < r.kurt_micro < -1_000_000


class TestEventsHolt:
    @staticmethod
    def _ref(series):
        def fdiv(a, d=1000):
            return (a - (a % d + d) % d) // d

        l, b = series[0], 0
        for y in series[1:]:
            nl = fdiv(500 * y + 500 * (l + b))
            b = fdiv(500 * (nl - l) + 500 * b)
            l = nl
        return l, b

    def test_crafted_recurrence_including_negative_trend(self, spark):
        import datetime as _dt

        from pandasy_spark.workload import QUERIES as _Q  # noqa: F401

        # declining series -> negative trend exercises the signed
        # floor-division path (Spark div truncates; pmod build floors)
        series = [10_000, 8_000, 5_000, 1_000, 900]
        rows = [
            (
                i,
                _dt.datetime(2024, 1, 1 + i, 3, 0, 0),
                1,
                "purchase",
                c / 100.0,
                "{}",
            )
            for i, c in enumerate(series)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        import tempfile, os

        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        # reuse the other tables from sf0.001 via symlinks
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ]:
            src = f"/root/testdata/sf0.001/{t}.parquet"
            if os.path.exists(src):
                os.symlink(src, os.path.join(d, f"{t}.parquet"))
        got = QUERIES["events_holt"](spark, d).collect()[0]
        l, b = self._ref(series)
        assert (got.n_days, got.level_cents, got.trend_cents) == (5, l, b)
        assert got.forecast_2 == l + 2 * b
        assert b < 0  # the signed-floor path actually engaged

    def test_gate_forecast_identity(self, spark, sf_dir):
        r = QUERIES["events_holt"](spark, sf_dir).collect()[0]
        assert r.forecast_1 == r.level_cents + r.trend_cents
        assert r.forecast_3 == r.level_cents + 3 * r.trend_cents
        assert r.n_days >= 1


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_H = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.mark.slow
class TestFuzzVsPython:
    @given(
        rows=st.lists(
            st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=25
        )
    )
    @settings(**_H)
    def test_mcc_fuzz(self, spark, rows):
        import math

        from pandasy_spark.extended.ml import mcc_binary

        df = spark.createDataFrame(rows, "label boolean, pred boolean")
        r = mcc_binary(df, "label", "pred").collect()[0]
        tp = sum(1 for l, p in rows if l and p)
        fp = sum(1 for l, p in rows if not l and p)
        fn = sum(1 for l, p in rows if l and not p)
        tn = sum(1 for l, p in rows if not l and not p)
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        marg = [(tp + fp), (tp + fn), (tn + fp), (tn + fn)]
        if all(m > 0 for m in marg):
            den = math.sqrt(
                float(marg[0]) * marg[1] * marg[2] * marg[3]
            )
            assert r.mcc_micro == math.floor(
                1e6 * (tp * tn - fp * fn) / den + 0.5
            )
        else:
            assert r.mcc_micro is None

    @given(
        rows=st.lists(
            st.tuples(
                st.floats(0.0, 1.0, allow_nan=False).map(
                    lambda v: round(v, 3)
                ),
                st.booleans(),
            ),
            min_size=1,
            max_size=25,
        )
    )
    @settings(**_H)
    def test_brier_fuzz(self, spark, rows):
        import math

        from pandasy_spark.extended.ml import brier_score

        df = spark.createDataFrame(rows, "score double, pos boolean")
        r = brier_score(df, "score", F.col("pos"), decimals=4).collect()[0]
        grid = [
            (math.floor(s * 10000 + 0.5), 1 if p else 0) for s, p in rows
        ]
        sse = sum((v - 10000 * o) ** 2 for v, o in grid)
        n = len(rows)
        assert (r.n, r.sse_grid) == (n, sse)
        assert r.brier_micro == (sse * 1_000_000) // (n * 100_000_000)

    @given(
        series=st.lists(
            st.integers(-100_000, 100_000), min_size=1, max_size=20
        )
    )
    @settings(**_H)
    def test_holt_fold_fuzz(self, spark, series):
        # the HOF fold on a crafted 1-row array vs the python recurrence
        from pyspark.sql import functions as FF

        def fdiv(a, d=1000):
            return (a - (a % d + d) % d) // d

        l, b = series[0], 0
        for y in series[1:]:
            nl = fdiv(500 * y + 500 * (l + b))
            b = fdiv(500 * (nl - l) + 500 * b)
            l = nl

        df = spark.createDataFrame(
            [(list(enumerate(series)),)],
            "s array<struct<day:int,cents:long>>",
        )

        def _fd(a):
            return (a - FF.pmod(a, FF.lit(1000))).cast("long") / FF.lit(1000)

        def _step(acc, e):
            y = e["cents"]
            lvl = _fd(
                FF.lit(500) * y + FF.lit(500) * (acc["l"] + acc["b"])
            ).cast("long")
            tr = _fd(
                FF.lit(500) * (lvl - acc["l"]) + FF.lit(500) * acc["b"]
            ).cast("long")
            return FF.struct(
                FF.when(acc["i"] == 0, y).otherwise(lvl).alias("l"),
                FF.when(acc["i"] == 0, FF.lit(0).cast("long"))
                .otherwise(tr)
                .alias("b"),
                (acc["i"] + FF.lit(1)).cast("long").alias("i"),
            )

        got = df.select(
            FF.aggregate(
                FF.col("s"),
                FF.struct(
                    FF.lit(0).cast("long").alias("l"),
                    FF.lit(0).cast("long").alias("b"),
                    FF.lit(0).cast("long").alias("i"),
                ),
                _step,
            ).alias("h")
        ).collect()[0].h
        assert (got.l, got.b, got.i) == (l, b, len(series))


class TestSpatialKnnJoin:
    def test_crafted_neighbors_and_tie_break(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        q = spark.createDataFrame([(1, 0, 0)], "query_id long, x long, y long")
        # two corpus points tie at dist_sq 25: ids 11 and 12 — the
        # smaller id must rank first; 13 is nearer, 14 outside radius
        c = spark.createDataFrame(
            [(12, 3, 4), (11, -3, 4), (13, 1, 0), (14, 100, 100)],
            "id long, x long, y long",
        )
        got = [
            (r.id, r.dist_sq, r.rk)
            for r in knn_join(q, c, k=3, radius=50)
            .orderBy("rk")
            .collect()
        ]
        assert got == [(13, 1, 1), (11, 25, 2), (12, 25, 3)]

    def test_fewer_than_k_inside_horizon(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        q = spark.createDataFrame(
            [(1, 0, 0), (2, 10_000, 10_000)], "query_id long, x long, y long"
        )
        c = spark.createDataFrame([(10, 1, 1)], "id long, x long, y long")
        rows = knn_join(q, c, k=5, radius=10).collect()
        # query 1 gets its single neighbor; query 2 is absent
        assert [(r.query_id, r.id) for r in rows] == [(1, 10)]

    def test_k_guard(self, spark):
        from pandasy_spark.extended.spatial import knn_join

        df = spark.createDataFrame([(1, 0, 0)], "query_id long, x long, y long")
        with pytest.raises(ValueError, match="k must"):
            knn_join(df, df.selectExpr("query_id as id", "x", "y"), k=0, radius=5)

    def test_gate_rk_contract(self, spark, sf_dir):
        rows = QUERIES["spatial_knn_join"](spark, sf_dir).collect()
        assert rows
        from collections import defaultdict

        per_q = defaultdict(list)
        for r in rows:
            per_q[r.query_id].append((r.rk, r.dist_sq))
        for q, rs in per_q.items():
            rs.sort()
            assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
            assert all(
                rs[i][1] <= rs[i + 1][1] for i in range(len(rs) - 1)
            )


class TestEventsPeaks:
    def test_crafted_series(self, spark):
        import datetime as _dt
        import os
        import tempfile

        # type 'a' daily cents: 100, 300, 200, 500, 400 -> peaks at
        # days 2 (300) and 4 (500); endpoints never peak
        series = [100, 300, 200, 500, 400]
        rows = [
            (
                i,
                _dt.datetime(2024, 1, 1 + i, 12, 0, 0),
                1,
                "a",
                c / 100.0,
                "{}",
            )
            for i, c in enumerate(series)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ]:
            src = f"/root/testdata/sf0.001/{t}.parquet"
            if os.path.exists(src):
                os.symlink(src, os.path.join(d, f"{t}.parquet"))
        got = sorted(
            (r.day.day, r.cents)
            for r in QUERIES["events_peaks"](spark, d).collect()
        )
        assert got == [(2, 300), (4, 500)]

    def test_gate_peaks_are_interior(self, spark, sf_dir):
        rows = QUERIES["events_peaks"](spark, sf_dir).collect()
        assert rows
        # no peak may fall on a series endpoint: recompute day bounds
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        bounds = {
            r.event_type: (r.lo, r.hi)
            for r in ev.filter("value is not null and ts is not null")
            .groupBy("event_type")
            .agg(
                F.min(F.date_trunc("day", "ts")).alias("lo"),
                F.max(F.date_trunc("day", "ts")).alias("hi"),
            )
            .collect()
        }
        for r in rows:
            lo, hi = bounds[r.event_type]
            assert lo < r.day < hi


class TestExponentialDecaySample:
    def test_python_rederivation(self, spark, sf_dir):
        import math

        pdf = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter("ts is not null and value is not null")
            .select("event_type", "event_id", "ts", "value")
            .toPandas()
        )
        import datetime as _dt

        ref = _dt.date(2024, 1, 31)
        want = {}
        for _, row in pdf.iterrows():
            age = (ref - row.ts.date()).days
            h = min(max(age, 0) // 7, 20)
            keep = (
                (row.event_id * 1103515245 + 12345) % 2147483647 % 1000
                < (1000 >> h)
            )
            cents = math.floor(row.value * 100 + 0.5)
            a = want.setdefault(row.event_type, [0, 0, 0])
            a[0] += 1
            if keep:
                a[1] += 1
                a[2] += cents
        got = {
            r.event_type: [r.n_total, r.n_kept, r.kept_cents]
            for r in QUERIES["sample_exponential_decay"](
                spark, sf_dir
            ).collect()
        }
        assert got == want

    def test_decay_monotone_in_age(self, spark, sf_dir):
        # sanity: keep RATE should be non-trivial (neither 0 nor 1)
        rows = QUERIES["sample_exponential_decay"](spark, sf_dir).collect()
        total = sum(r.n_total for r in rows)
        kept = sum(r.n_kept for r in rows)
        assert 0 < kept < total
