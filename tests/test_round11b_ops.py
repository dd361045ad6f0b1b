"""Round-11 batch 11: dense-series repair (interpolate_hourly) and
the lagged-pair autocorrelation screen (acf_daily).  The gate oracles
cover the SQL restatements at both SFs; these pin the lattice math
(exact floor fills on non-divisible gaps), boundary/flag semantics,
and the degenerate-series contracts on crafted frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.events import acf_daily, interpolate_hourly

_T0 = dt.datetime(2024, 3, 1, 0, 30)


def _ev(spark, rows):
    # rows: (hour_offset, value) -> one event of the target type
    data = [
        (i, _T0 + dt.timedelta(hours=h), 1, "purchase", float(v), None)
        for i, (h, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


class TestInterpolateHourly:
    def test_exact_floor_fill_on_non_divisible_gap(self, spark):
        # observed: hour 0 -> 100 cents, hour 3 -> 110 cents
        # gap hours 1, 2: exact lattice fills floor(100 + k*10/3)
        df = _ev(spark, [(0, 1.00), (3, 1.10)])
        out = {
            r.hour.hour: (r.is_observed, r.val_cents)
            for r in interpolate_hourly(df).collect()
        }
        assert out == {
            0: (True, 100),
            1: (False, 103),  # floor(310/3)
            2: (False, 106),  # floor(320/3)
            3: (True, 110),
        }

    def test_observed_hours_sum_multiple_events(self, spark):
        df = _ev(spark, [(0, 1.00), (0, 2.00), (1, 5.00)])
        out = {
            r.hour.hour: (r.is_observed, r.val_cents)
            for r in interpolate_hourly(df).collect()
        }
        assert out == {0: (True, 300), 1: (True, 500)}

    def test_boundaries_always_observed_and_flags(self, spark):
        df = _ev(spark, [(2, 1.00), (5, 1.00), (9, 4.00)])
        rows = sorted(
            interpolate_hourly(df).collect(), key=lambda r: r.hour
        )
        assert len(rows) == 8  # hours 2..9 inclusive
        assert rows[0].is_observed and rows[-1].is_observed
        # constant segment interpolates flat; rising segment is
        # monotone on the lattice
        vals = [r.val_cents for r in rows]
        assert vals[:4] == [100, 100, 100, 100]
        assert vals[3:] == sorted(vals[3:])

    def test_other_types_and_nulls_ignored(self, spark):
        base = _ev(spark, [(0, 1.00), (2, 1.00)])
        noise = spark.createDataFrame(
            [
                (90, _T0 + dt.timedelta(hours=1), 1, "click", 9.0, None),
                (91, _T0 + dt.timedelta(hours=1), 1, "purchase", None, None),
                (92, None, 1, "purchase", 5.0, None),
            ],
            base.schema,
        )
        out = {
            r.hour.hour: r.val_cents
            for r in interpolate_hourly(base.unionAll(noise)).collect()
        }
        assert out == {0: 100, 1: 100, 2: 100}

    def test_single_observed_hour_degenerates_to_one_row(self, spark):
        df = _ev(spark, [(4, 2.50)])
        rows = interpolate_hourly(df).collect()
        assert [(r.is_observed, r.val_cents) for r in rows] == [
            (True, 250)
        ]


class TestAcfDaily:
    def _daily(self, spark, cents_by_day):
        data = [
            (i, dt.datetime(2024, 3, 1 + d, 12), 1, "purchase",
             c / 100.0, None)
            for i, (d, c) in enumerate(cents_by_day)
        ]
        return spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    def test_linear_series_perfect_correlation(self, spark):
        # x_t = 100*(t+1): every lagged pair set is perfectly linear
        df = self._daily(spark, [(d, 100 * (d + 1)) for d in range(10)])
        out = {r.lag: (r.n_pairs, r.acf_milli)
               for r in acf_daily(df, max_lag=3).collect()}
        assert out == {1: (9, 1000), 2: (8, 1000), 3: (7, 1000)}

    def test_alternating_series_negative_lag1(self, spark):
        # x = a,b,a,b,... -> lag-1 pairs are perfectly anti-correlated,
        # lag-2 pairs perfectly correlated
        df = self._daily(
            spark, [(d, 100 if d % 2 == 0 else 300) for d in range(8)]
        )
        out = {r.lag: r.acf_milli
               for r in acf_daily(df, max_lag=2).collect()}
        assert out == {1: -1000, 2: 1000}

    def test_zero_fill_of_missing_days(self, spark):
        # days 0 and 4 observed; days 1-3 zero-fill -> lag-4 pair set
        # is {(x4, x0)} with n_pairs == 1 (zero variance -> NULL acf)
        df = self._daily(spark, [(0, 200), (4, 200)])
        out = {r.lag: (r.n_pairs, r.acf_milli)
               for r in acf_daily(df, max_lag=4).collect()}
        assert out[4] == (1, None)
        # lag-1 overlap includes the zero days
        assert out[1][0] == 4

    def test_constant_series_null_acf(self, spark):
        df = self._daily(spark, [(d, 500) for d in range(6)])
        rows = acf_daily(df, max_lag=2).collect()
        assert all(r.acf_milli is None for r in rows)
        assert {r.lag: r.n_pairs for r in rows} == {1: 5, 2: 4}

    def test_max_lag_guard(self, spark):
        df = self._daily(spark, [(0, 100)])
        with pytest.raises(ValueError):
            acf_daily(df, max_lag=0)

    def test_lags_beyond_span_absent(self, spark):
        # 3-day span -> lag 3+ has no pairs, rows absent (not NULL)
        df = self._daily(spark, [(0, 100), (1, 200), (2, 100)])
        lags = {r.lag for r in acf_daily(df, max_lag=7).collect()}
        assert lags == {1, 2}


from pandasy_spark.extended.ml import (  # noqa: E402
    fairness_panel,
    mrr_exact,
    roc_points,
)


class TestRocPoints:
    def _scored(self, spark, rows):
        return spark.createDataFrame(rows, "score double, pos boolean")

    def test_crafted_curve_points(self, spark):
        # scores .9(P) .8(N) .8(P) .5(N): thresholds 9000, 8000, 5000
        df = self._scored(
            spark,
            [(0.9, True), (0.8, False), (0.8, True), (0.5, False)],
        )
        out = {
            r.thr: (r.tp, r.fp, r.fn, r.tn, r.tpr_bp, r.fpr_bp,
                    r.prec_bp)
            for r in roc_points(df, "score", F.col("pos")).collect()
        }
        assert out == {
            9000: (1, 0, 1, 2, 5000, 0, 10000),
            8000: (2, 1, 0, 1, 10000, 5000, 6666),
            5000: (2, 2, 0, 0, 10000, 10000, 5000),
        }

    def test_null_nan_scores_excluded_null_label_negative(self, spark):
        df = self._scored(
            spark,
            [(0.7, True), (None, True), (float("nan"), True),
             (0.7, None)],
        )
        rows = roc_points(df, "score", F.col("pos")).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.thr, r.tp, r.fp) == (7000, 1, 1)

    def test_curve_identities(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (round(rng.random(), 3), rng.random() < 0.4)
            for _ in range(200)
        ]
        df = self._scored(spark, rows)
        pts = roc_points(df, "score", F.col("pos")).collect()
        n_pos = sum(1 for _, p in rows if p)
        n = len(rows)
        for r in pts:
            assert r.tp + r.fn == n_pos
            assert r.tp + r.fp + r.fn + r.tn == n
        # descending threshold -> tp and fp nondecreasing
        srt = sorted(pts, key=lambda r: -r.thr)
        for a, b in zip(srt, srt[1:]):
            assert b.tp >= a.tp and b.fp >= a.fp


class TestFairnessPanel:
    def _lp(self, spark, rows):
        return spark.createDataFrame(
            rows, "g string, y boolean, p boolean"
        )

    def test_rates_and_gaps(self, spark):
        # A: sel 2/4, tpr 1/2, fpr 1/2;  B: sel 3/4 (max), tpr 2/2
        df = self._lp(
            spark,
            [("A", True, True), ("A", True, False),
             ("A", False, True), ("A", False, False),
             ("B", True, True), ("B", True, True),
             ("B", False, True), ("B", False, False)],
        )
        out = {
            r.g: (r.n, r.n_pos, r.sel_bp, r.tpr_bp, r.fpr_bp,
                  r.dp_gap_bp, r.eo_gap_bp)
            for r in fairness_panel(
                df, "g", F.col("y"), F.col("p")
            ).collect()
        }
        assert out == {
            "A": (4, 2, 5000, 5000, 5000, 2500, 5000),
            "B": (4, 2, 7500, 10000, 5000, 0, 0),
        }

    def test_null_rows_dropped_empty_class_null(self, spark):
        df = self._lp(
            spark,
            [("A", True, True), ("A", None, True), ("A", True, None),
             ("B", False, False)],
        )
        out = {
            r.g: (r.n, r.tpr_bp, r.fpr_bp)
            for r in fairness_panel(
                df, "g", F.col("y"), F.col("p")
            ).collect()
        }
        # A has no negatives -> fpr NULL; B has no positives -> tpr NULL
        assert out == {"A": (1, 10000, None), "B": (1, None, 0)}

    def test_maxima_ignore_null_rates(self, spark):
        df = self._lp(
            spark,
            [("A", False, True), ("B", True, True),
             ("B", True, False)],
        )
        out = {
            r.g: (r.tpr_bp, r.eo_gap_bp)
            for r in fairness_panel(
                df, "g", F.col("y"), F.col("p")
            ).collect()
        }
        # A's tpr is NULL (no positives): eo gap NULL for A, 0 for B
        assert out == {"A": (None, None), "B": (5000, 0)}


class TestMrrExact:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "q long, it long, rel boolean, s double"
        )

    def test_first_hit_ranks_and_lattice(self, spark):
        # q0: hit at rank 1; q1: hit at rank 3 -> floor(1e9/3)
        df = self._ev(
            spark,
            [(0, 1, True, 0.9), (0, 2, False, 0.5),
             (1, 1, False, 0.9), (1, 2, False, 0.8),
             (1, 3, True, 0.7)],
        )
        r = mrr_exact(df, "q", "it", F.col("rel"), "s").collect()[0]
        assert (r.n_queries, r.n_hit) == (2, 2)
        assert r.mean_rr_nano == (1_000_000_000 + 333_333_333) // 2

    def test_no_hit_counts_zero(self, spark):
        df = self._ev(
            spark,
            [(0, 1, True, 0.9), (1, 1, False, 0.9)],
        )
        r = mrr_exact(df, "q", "it", F.col("rel"), "s").collect()[0]
        assert (r.n_queries, r.n_hit, r.mean_rr_nano) == (
            2, 1, 500_000_000
        )

    def test_tiebreak_by_item_id(self, spark):
        # equal scores: item 5 (relevant) ranks after item 2 -> rank 2
        df = self._ev(
            spark,
            [(0, 5, True, 0.5), (0, 2, False, 0.5)],
        )
        r = mrr_exact(df, "q", "it", F.col("rel"), "s").collect()[0]
        assert r.mean_rr_nano == 500_000_000

    def test_nan_and_null_excluded(self, spark):
        df = self._ev(
            spark,
            [(0, 1, True, float("nan")), (0, 2, True, 0.5),
             (None, 3, True, 0.9), (0, None, True, 0.9)],
        )
        r = mrr_exact(df, "q", "it", F.col("rel"), "s").collect()[0]
        # only (0, 2) survives -> rank 1
        assert (r.n_queries, r.mean_rr_nano) == (1, 1_000_000_000)


from pandasy_spark.extended.profile import (  # noqa: E402
    id_gap_profile,
    null_pattern_panel,
)


class TestNullPatternPanel:
    def test_bitmask_counts_and_shares(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, "x"), (None, 1.0, "x"), (None, None, "x"),
             (None, None, None)],
            "a int, b double, c string",
        )
        out = {
            r.mask: (r.pattern, r.n, r.pct_bp)
            for r in null_pattern_panel(df, ["a", "b", "c"]).collect()
        }
        assert out == {
            0: ("000", 1, 2500),
            4: ("100", 1, 2500),
            6: ("110", 1, 2500),
            7: ("111", 1, 2500),
        }

    def test_nan_counts_as_missing_for_floats(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (float("nan"), 1)], "a double, b int"
        )
        out = {
            r.pattern: r.n
            for r in null_pattern_panel(df, ["a", "b"]).collect()
        }
        assert out == {"00": 1, "10": 1}

    def test_bit_order_leftmost_high(self, spark):
        df = spark.createDataFrame([(None, 1)], "a int, b int")
        r = null_pattern_panel(df, ["a", "b"]).collect()[0]
        assert (r.mask, r.pattern) == (2, "10")

    def test_guards(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(ValueError):
            null_pattern_panel(df, [])
        with pytest.raises(ValueError):
            null_pattern_panel(df, ["a"] * 21)

    def test_absent_patterns_absent(self, spark):
        df = spark.createDataFrame([(1, 2)] * 5, "a int, b int")
        rows = null_pattern_panel(df, ["a", "b"]).collect()
        assert len(rows) == 1
        assert (rows[0].pattern, rows[0].n, rows[0].pct_bp) == (
            "00", 5, 10000
        )


class TestIdGapProfile:
    def _keys(self, spark, ks):
        return spark.createDataFrame([(k,) for k in ks], "id long")

    def test_gaps_found_with_bounds(self, spark):
        df = self._keys(spark, [1, 2, 5, 6, 10])
        out = sorted(
            (r.gap_start, r.gap_end, r.gap_len)
            for r in id_gap_profile(df, "id").collect()
        )
        assert out == [(3, 4, 2), (7, 9, 3)]

    def test_duplicates_and_nulls_ignored(self, spark):
        df = self._keys(spark, [1, 1, 4, 4, None])
        out = [(r.gap_start, r.gap_end, r.gap_len)
               for r in id_gap_profile(df, "id").collect()]
        assert out == [(2, 3, 2)]

    def test_dense_sequence_no_gaps(self, spark):
        df = self._keys(spark, list(range(100)))
        assert id_gap_profile(df, "id").count() == 0

    def test_first_key_opens_no_gap(self, spark):
        df = self._keys(spark, [100, 101])
        assert id_gap_profile(df, "id").count() == 0

    def test_many_distinct_keys_distributed(self, spark):
        # enough keys to spread over multiple range partitions; every
        # odd key missing -> every even key (except the first) opens
        # a length-1 gap
        df = self._keys(spark, [2 * i for i in range(5000)])
        gaps = id_gap_profile(df, "id")
        assert gaps.count() == 4999
        assert gaps.agg(F.max("gap_len")).collect()[0][0] == 1


from pandasy_spark.extended.sampling import matched_pairs  # noqa: E402
from pandasy_spark.sources.sinks import compaction_plan  # noqa: E402


class TestMatchedPairs:
    def _u(self, spark, rows):
        return spark.createDataFrame(
            rows, "id long, stratum long, t boolean"
        )

    def test_greedy_by_ascending_id_within_stratum(self, spark):
        df = self._u(
            spark,
            [(10, 1, True), (20, 1, True), (11, 1, False),
             (21, 1, False), (31, 1, False)],
        )
        out = sorted(
            (r.t_id, r.c_id)
            for r in matched_pairs(
                df, "stratum", F.col("t"), "id", salts=1
            ).collect()
        )
        # t ranks: 10->1, 20->2; c ranks: 11->1, 21->2 (31 unmatched)
        assert out == [(10, 11), (20, 21)]

    def test_no_cross_stratum_or_cross_salt_matches(self, spark):
        df = self._u(
            spark,
            [(0, 1, True), (1, 1, False),  # salts=2: 0 even, 1 odd
             (2, 2, True), (3, 2, False)],
        )
        rows = matched_pairs(
            df, "stratum", F.col("t"), "id", salts=2
        ).collect()
        assert rows == []  # every potential partner in another cell

    def test_salts_one_recovers_full_matching(self, spark):
        df = self._u(
            spark,
            [(0, 1, True), (1, 1, False), (2, 2, True), (3, 2, False)],
        )
        out = sorted(
            (r.stratum, r.t_id, r.c_id)
            for r in matched_pairs(
                df, "stratum", F.col("t"), "id", salts=1
            ).collect()
        )
        assert out == [(1, 0, 1), (2, 2, 3)]

    def test_null_rows_dropped_and_guard(self, spark):
        df = self._u(
            spark,
            [(None, 1, True), (1, None, False), (2, 1, None),
             (3, 1, True), (4, 1, False)],
        )
        out = [(r.t_id, r.c_id)
               for r in matched_pairs(
                   df, "stratum", F.col("t"), "id", salts=1
               ).collect()]
        assert out == [(3, 4)]
        with pytest.raises(ValueError):
            matched_pairs(df, "stratum", F.col("t"), "id", salts=0)


class TestCompactionPlan:
    def _rows(self, spark, rows):
        return spark.createDataFrame(rows, "p string, nb long")

    def test_ceiling_splits_and_rows_per_file(self, spark):
        # partition A: 3 rows x 100 bytes = 300 -> 3 files at t=100,
        # rows_per_file ceil(3/3)=1; B: 1 row x 50 -> 1 file, coalesce
        df = self._rows(
            spark, [("A", 100), ("A", 100), ("A", 100), ("B", 50)]
        )
        out = {
            r.p: (r.n_rows, r.est_bytes, r.n_files, r.rows_per_file,
                  r.coalesce_candidate)
            for r in compaction_plan(
                df, ["p"], F.col("nb"), 100
            ).collect()
        }
        assert out == {
            "A": (3, 300, 3, 1, False),
            "B": (1, 50, 1, 1, False),
        }

    def test_coalesce_candidate_under_half_target(self, spark):
        df = self._rows(spark, [("A", 49), ("B", 50)])
        out = {
            r.p: r.coalesce_candidate
            for r in compaction_plan(
                df, ["p"], F.col("nb"), 100
            ).collect()
        }
        assert out == {"A": True, "B": False}

    def test_non_divisible_ceilings(self, spark):
        # 250 bytes at t=100 -> 3 files; 7 rows / 3 files -> 3 per file
        df = self._rows(spark, [("A", 250 // 7 + (1 if i < 250 % 7 else 0)) for i in range(7)])
        r = compaction_plan(df, ["p"], F.col("nb"), 100).collect()[0]
        assert (r.n_rows, r.est_bytes, r.n_files, r.rows_per_file) == (
            7, 250, 3, 3
        )

    def test_target_guard(self, spark):
        df = self._rows(spark, [("A", 1)])
        with pytest.raises(ValueError):
            compaction_plan(df, ["p"], F.col("nb"), 0)


import numpy as np  # noqa: E402

from pandasy_spark.extended.audio import (  # noqa: E402
    encode_wav,
    fingerprint_landmarks,
    fingerprint_match,
)


def _clip(bins, frame_len=64, amp=8000):
    t = np.arange(frame_len)
    return encode_wav(
        np.concatenate(
            [
                np.round(
                    amp * np.cos(2 * np.pi * b * t / frame_len)
                ).astype(np.int16)
                for b in bins
            ]
        ),
        8000,
    )


class TestFingerprint:
    def _wavs(self, spark, clips):
        return spark.createDataFrame(
            [(i, _clip(b)) for i, b in clips],
            "doc_id long, payload binary",
        )

    def test_landmark_extraction_exact(self, spark):
        df = self._wavs(spark, [(0, [3, 7, 11])])
        lm = sorted(
            (r.t, r.hash)
            for r in fingerprint_landmarks(
                df, frame_len=64, fanout=2
            ).collect()
        )
        assert lm == [
            (0, (3 * 256 + 7) * 8 + 1),
            (0, (3 * 256 + 11) * 8 + 2),
            (1, (7 * 256 + 11) * 8 + 1),
        ]

    def test_shifted_copy_matches_with_offset(self, spark):
        ref_bins = [3, 9, 4, 12, 6, 8]
        q_bins = ref_bins[2:] + [30, 30]  # shift 2, filler tail
        refs = fingerprint_landmarks(
            self._wavs(spark, [(0, ref_bins)]), frame_len=64
        )
        qs = fingerprint_landmarks(
            self._wavs(spark, [(100, q_bins)]), frame_len=64
        )
        r = fingerprint_match(qs, refs, min_count=3).collect()
        assert [(x.query_id, x.ref_id, x.offset_frames) for x in r] == [
            (100, 0, 2)
        ]

    def test_scattered_collisions_rejected(self, spark):
        # query shares single hashes with the ref at DIFFERENT offsets
        # (no coherent alignment): every offset bucket holds 1 < 3
        refs = fingerprint_landmarks(
            self._wavs(spark, [(0, [3, 7, 9, 13, 5, 11])]), frame_len=64
        )
        qs = fingerprint_landmarks(
            self._wavs(spark, [(100, [9, 13, 30, 3, 7, 31])]),
            frame_len=64,
        )
        assert fingerprint_match(qs, refs, min_count=3).count() == 0

    def test_tie_break_smallest_ref_id(self, spark):
        # two identical refs: the query aligns equally with both
        refs = fingerprint_landmarks(
            self._wavs(spark, [(5, [3, 7, 11, 5]), (2, [3, 7, 11, 5])]),
            frame_len=64,
        )
        qs = fingerprint_landmarks(
            self._wavs(spark, [(100, [3, 7, 11, 5])]), frame_len=64
        )
        r = fingerprint_match(qs, refs, min_count=3).collect()
        assert [(x.query_id, x.ref_id, x.offset_frames) for x in r] == [
            (100, 2, 0)
        ]

    def test_undecodable_payloads_quarantined(self, spark):
        df = spark.createDataFrame(
            [(0, b"not a wav"), (1, _clip([3, 7, 9]))],
            "doc_id long, payload binary",
        )
        lm = fingerprint_landmarks(df, frame_len=64)
        assert {r.id for r in lm.collect()} == {1}


from pandasy_spark.extended.text import boilerplate_strip  # noqa: E402
from pandasy_spark.operators.rangejoin import (  # noqa: E402
    allen_relation,
    interval_join,
)


class TestBoilerplateStrip:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_drops_all_copies_keeps_unique(self, spark):
        df = self._docs(
            spark,
            [(1, "NAV\nalpha\nFOOT"), (2, "NAV\nbeta\nFOOT"),
             (3, "NAV\ngamma\nFOOT")],
        )
        out = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
            for r in boilerplate_strip(df, min_docs=2).collect()
        }
        assert out == {
            1: ("alpha", 3, 1),
            2: ("beta", 3, 1),
            3: ("gamma", 3, 1),
        }

    def test_repeats_within_one_doc_not_boilerplate(self, spark):
        # same line twice in ONE doc: df=1, kept both times
        df = self._docs(spark, [(1, "x\nx\ny"), (2, "z")])
        out = {
            r.doc_id: (r.clean_text, r.n_kept)
            for r in boilerplate_strip(df, min_docs=2).collect()
        }
        assert out[1] == ("x\nx\ny", 3)

    def test_all_chrome_doc_empty_string(self, spark):
        df = self._docs(spark, [(1, "NAV"), (2, "NAV"), (3, "NAV\nreal")])
        out = {
            r.doc_id: (r.clean_text, r.n_kept)
            for r in boilerplate_strip(df, min_docs=2).collect()
        }
        assert out[1] == ("", 0)
        assert out[3] == ("real", 1)

    def test_whitespace_lines_excluded_trim_keying(self, spark):
        # '  NAV ' and 'NAV' share a trim key; blank lines vanish
        df = self._docs(spark, [(1, "  NAV \n\n a "), (2, "NAV\nb")])
        out = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
            for r in boilerplate_strip(df, min_docs=2).collect()
        }
        assert out[1] == (" a ", 2, 1)
        assert out[2] == ("b", 2, 1)

    def test_min_docs_guard(self, spark):
        df = self._docs(spark, [(1, "x")])
        with pytest.raises(ValueError):
            boilerplate_strip(df, min_docs=1)


class TestAllenRelation:
    def test_all_eleven_relations(self, spark):
        # intervals as integer micros rendered into timestamps
        cases = [
            # (s1, e1, s2, e2, expected)
            (0, 10, 0, 10, "equals"),
            (0, 5, 0, 10, "starts"),
            (0, 10, 0, 5, "started_by"),
            (5, 10, 0, 10, "finishes"),
            (0, 10, 5, 10, "finished_by"),
            (0, 5, 5, 10, "meets"),
            (5, 10, 0, 5, "met_by"),
            (2, 8, 0, 10, "during"),
            (0, 10, 2, 8, "contains"),
            (0, 6, 4, 10, "overlaps"),
            (4, 10, 0, 6, "overlapped_by"),
        ]
        df = spark.createDataFrame(
            [(i, s1, e1, s2, e2) for i, (s1, e1, s2, e2, _) in
             enumerate(cases)],
            "i long, s1 long, e1 long, s2 long, e2 long",
        ).select(
            "i",
            allen_relation(
                F.timestamp_micros(F.col("s1")),
                F.timestamp_micros(F.col("e1")),
                F.timestamp_micros(F.col("s2")),
                F.timestamp_micros(F.col("e2")),
            ).alias("rel"),
        )
        got = {r.i: r.rel for r in df.collect()}
        assert got == {i: exp for i, (_, _, _, _, exp) in
                       enumerate(cases)}

    def test_census_composes_with_interval_join(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)

        def ts(m):
            return t0 + dt.timedelta(minutes=m)

        left = spark.createDataFrame(
            [(1, ts(0), ts(10))], "k long, ls timestamp, le timestamp"
        )
        right = spark.createDataFrame(
            [(1, ts(2), ts(8)), (1, ts(10), ts(15)), (1, ts(20), ts(30))],
            "k long, rs timestamp, re timestamp",
        )
        pairs = interval_join(
            left, right, ["k"], "ls", "le", "rs", "re",
            bucket_seconds=300,
        )
        rel = allen_relation(
            F.col("ls"), F.col("le"), F.col("rs"), F.col("re")
        )
        out = sorted(r.rel for r in pairs.select(rel.alias("rel")).collect())
        assert out == ["contains", "meets"]


from pandasy_spark.extended.events import burst_segments_per_key  # noqa: E402
from pandasy_spark.extended.profile import fd_check  # noqa: E402


class TestFdCheck:
    def test_holds_and_violations(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x"), (1, "a", "x"), (2, "b", "x"),
             (3, "b", "y")],
            "k long, a string, b string",
        )
        out = {
            (r.det, r.dep): (r.n_det, r.n_pairs, r.n_violating,
                             r.fd_holds)
            for r in fd_check(
                df, [("k", "a"), ("a", "b"), ("b", "a")]
            ).collect()
        }
        # k -> a holds (3 keys, 3 pairs); a -> b fails on 'b'
        assert out[("k", "a")] == (3, 3, 0, True)
        assert out[("a", "b")] == (2, 3, 1, False)
        assert out[("b", "a")] == (2, 3, 1, False)

    def test_nulls_are_values(self, spark):
        df = spark.createDataFrame(
            [(1, None), (1, "x"), (2, None), (2, None)],
            "a long, b string",
        )
        r = fd_check(df, [("a", "b")]).collect()[0]
        # a=1 maps to {NULL, 'x'} -> violation; a=2 maps to {NULL}
        assert (r.n_det, r.n_pairs, r.n_violating, r.fd_holds) == (
            2, 3, 1, False
        )

    def test_empty_pairs_guard(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError):
            fd_check(df, [])


class TestBurstSegments:
    def _ev(self, spark, us_list, key=1):
        return spark.createDataFrame(
            [(i, key, dt.datetime(2024, 1, 1)
              + dt.timedelta(microseconds=u))
             for i, u in enumerate(us_list)],
            "event_id long, user_id long, ts timestamp",
        )

    def test_hysteresis_sticky_middle(self, spark):
        # gaps: 5 (open), 50 (sticky: stays IN burst), 200 (close),
        # 50 (sticky: stays OUT), 5 (open again)
        us = [0, 5, 55, 255, 305, 310]
        df = self._ev(spark, us)
        r = burst_segments_per_key(
            df, enter_us=10, exit_us=100
        ).collect()[0]
        assert (r.n_events, r.n_bursts, r.n_burst_events) == (6, 2, 3)

    def test_first_event_never_in_burst(self, spark):
        df = self._ev(spark, [0, 5])
        r = burst_segments_per_key(df, enter_us=10, exit_us=100
                                   ).collect()[0]
        assert (r.n_bursts, r.n_burst_events) == (1, 1)

    def test_no_small_gaps_no_bursts(self, spark):
        df = self._ev(spark, [0, 1000, 2000, 3000])
        r = burst_segments_per_key(df, enter_us=10, exit_us=100
                                   ).collect()[0]
        assert (r.n_bursts, r.n_burst_events) == (0, 0)

    def test_guards(self, spark):
        df = self._ev(spark, [0])
        with pytest.raises(ValueError):
            burst_segments_per_key(df, enter_us=0, exit_us=10)
        with pytest.raises(ValueError):
            burst_segments_per_key(df, enter_us=10, exit_us=10)

    def test_exit_boundary_closes_enter_boundary_opens(self, spark):
        # gap exactly == enter opens; gap exactly == exit closes
        df = self._ev(spark, [0, 10, 110, 120])
        r = burst_segments_per_key(df, enter_us=10, exit_us=100
                                   ).collect()[0]
        # 10 opens (burst 1); 100 closes; 10 opens (burst 2)
        assert (r.n_bursts, r.n_burst_events) == (2, 2)


from pandasy_spark.extended.graph import degree_assortativity  # noqa: E402
from pandasy_spark.extended.sketches import quantile_kmv_sketch  # noqa: E402


class TestDegreeAssortativity:
    def _e(self, spark, pairs):
        return spark.createDataFrame(pairs, "x long, y long")

    def test_star_graph_disassortative(self, spark):
        # star K1,4: hub deg 4 joins leaves deg 1 -> r = -1000
        df = self._e(spark, [(0, i) for i in range(1, 5)])
        r = degree_assortativity(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.r_milli) == (5, 4, -1000)

    def test_regular_graph_null(self, spark):
        # 4-cycle: every degree 2 -> zero variance -> NULL
        df = self._e(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
        r = degree_assortativity(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.r_milli) == (4, 4, None)

    def test_two_cliques_bridged(self, spark):
        # two triangles joined by one bridge: positive-leaning mix,
        # exact value pinned from hand computation
        edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5),
                 (2, 3)]
        r = degree_assortativity(self._e(spark, edges)).collect()[0]
        assert (r.n_nodes, r.n_edges) == (6, 7)
        # symmetrized pairs: deg seq {0:2,1:2,2:3,3:3,4:2,5:2}
        import math

        pairs = []
        for a, b in edges:
            pairs.append((a, b)); pairs.append((b, a))
        deg = {n: sum(1 for a, b in pairs if a == n) for n in range(6)}
        xs = [deg[a] for a, b in pairs]; ys = [deg[b] for a, b in pairs]
        m = len(xs)
        num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        dx = m * sum(x * x for x in xs) - sum(xs) ** 2
        dy = m * sum(y * y for y in ys) - sum(ys) ** 2
        expect = math.floor(1000.0 * (num / math.sqrt(dx * dy)) + 0.5)
        assert r.r_milli == expect


class TestQuantileKmv:
    def _vals(self, spark, vals):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "rid long, v long"
        )

    def test_small_data_exact_disc_quantiles(self, spark):
        # n < k: the sample IS the data -> DISC quantiles exact
        df = self._vals(spark, [10, 20, 30, 40, 50, 60, 70, 80, 90,
                                100])
        out = {
            r.p_bp: (r.est, r.n, r.true_rank, r.within_eps)
            for r in quantile_kmv_sketch(
                df, "v", "rid", ps_bp=(5000, 9000), k=1000,
                eps_bp=500,
            ).collect()
        }
        # rank ceil(.5*10)=5 -> 50; ceil(.9*10)=9 -> 90
        assert out[5000] == (50, 10, 5, True)
        assert out[9000] == (90, 10, 9, True)

    def test_sampled_estimates_certified(self, spark):
        vals = list(range(1, 5001))  # uniform 1..5000
        df = self._vals(spark, vals)
        out = {
            r.p_bp: r
            for r in quantile_kmv_sketch(
                df, "v", "rid", ps_bp=(2500, 5000, 7500), k=500,
                eps_bp=500,
            ).collect()
        }
        for p, r in out.items():
            assert r.n == 5000
            assert r.within_eps, (p, r)

    def test_deterministic_across_runs(self, spark):
        df = self._vals(spark, [((i * 37) % 1000) for i in range(2000)])
        a = sorted(map(tuple, quantile_kmv_sketch(
            df, "v", "rid", k=200).collect()))
        b = sorted(map(tuple, quantile_kmv_sketch(
            df.repartition(7), "v", "rid", k=200).collect()))
        assert a == b

    def test_guards(self, spark):
        df = self._vals(spark, [1])
        with pytest.raises(ValueError):
            quantile_kmv_sketch(df, "v", "rid", k=1)
        with pytest.raises(ValueError):
            quantile_kmv_sketch(df, "v", "rid", ps_bp=())
        with pytest.raises(ValueError):
            quantile_kmv_sketch(df, "v", "rid", ps_bp=(0,))


from pandasy_spark.extended.events import pattern_match_per_key  # noqa: E402
from pandasy_spark.extended.sampling import systematic_sample  # noqa: E402


class TestPatternMatch:
    def _seq(self, spark, types, key=1):
        return spark.createDataFrame(
            [(i, key, dt.datetime(2024, 1, 1)
              + dt.timedelta(seconds=i), t)
             for i, t in enumerate(types)],
            "event_id long, user_id long, ts timestamp, "
            "event_type string",
        )

    def _run(self, spark, types):
        r = pattern_match_per_key(self._seq(spark, types)).collect()[0]
        return (r.n_matches, r.pending)

    def test_basic_and_wildcards(self, spark):
        assert self._run(spark, ["click", "purchase"]) == (1, False)
        assert self._run(
            spark, ["click", "view", "view", "purchase"]
        ) == (1, False)

    def test_breaker_resets(self, spark):
        assert self._run(
            spark, ["click", "error", "purchase"]
        ) == (0, False)
        assert self._run(spark, ["click", "signup"]) == (0, False)

    def test_skip_past_last_row_non_overlapping(self, spark):
        # click p p: second purchase has no fresh anchor
        assert self._run(
            spark, ["click", "purchase", "purchase"]
        ) == (1, False)

    def test_reanchor_and_pending(self, spark):
        assert self._run(
            spark, ["click", "click", "purchase", "click"]
        ) == (1, True)

    def test_purchase_without_anchor(self, spark):
        assert self._run(spark, ["purchase", "view"]) == (0, False)

    def test_multiple_users_isolated(self, spark):
        a = self._seq(spark, ["click", "purchase"], key=1)
        b = self._seq(spark, ["purchase", "click"], key=2)
        out = {
            r.user_id: (r.n_matches, r.pending)
            for r in pattern_match_per_key(a.unionAll(b)).collect()
        }
        assert out == {1: (1, False), 2: (0, True)}


class TestSystematicSample:
    def test_exact_stride_on_gappy_keys(self, spark):
        # keys with gaps: stride is over ORDER, not value
        keys = [1, 5, 6, 20, 21, 22, 50, 51, 52, 90]
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        out = sorted(
            (r.row_id, r.k)
            for r in systematic_sample(df, ["k"], every=3,
                                       offset=1).collect()
        )
        # ranks 1, 4, 7 -> keys 5, 21, 51
        assert out == [(1, 5), (4, 21), (7, 51)]

    def test_offset_zero_includes_first(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], "k long")
        rows = systematic_sample(df, ["k"], every=4, offset=0).collect()
        assert sorted(r.k for r in rows) == [0, 4, 8]

    def test_guards(self, spark):
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            systematic_sample(df, ["k"], every=1)
        with pytest.raises(ValueError):
            systematic_sample(df, ["k"], every=3, offset=3)


class TestStreamingPatternMatch:
    def test_boundary_mid_pattern_preserves_match(self, spark):
        import pandas as pd

        from pandasy_spark.streaming import (
            run_stream_to_memory,
            staged_file_stream,
            stateful_pattern_match,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, 1, t0 + dt.timedelta(seconds=0), "click"),
            (2, 1, t0 + dt.timedelta(seconds=1), "view"),
            # ---- micro-batch boundary lands HERE (mid-pattern) ----
            (3, 1, t0 + dt.timedelta(seconds=2), "purchase"),
            (4, 1, t0 + dt.timedelta(seconds=3), "purchase"),
            (5, 2, t0 + dt.timedelta(seconds=0), "purchase"),
        ]
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "event_type"]
        )
        batches = [pdf.iloc[:2], pdf.iloc[2:]]
        stream = staged_file_stream(spark, batches)
        q = run_stream_to_memory(
            stateful_pattern_match(stream),
            "t_stream_pattern_boundary",
            output_mode="append",
        )
        q.stop()
        out = {
            r.event_id: r.matched
            for r in spark.table("t_stream_pattern_boundary").collect()
        }
        # purchase 3 completes the click-view-purchase pattern even
        # though the anchor arrived in the PREVIOUS micro-batch;
        # purchase 4 has no fresh anchor; user 2's purchase never had one
        assert out == {1: False, 2: False, 3: True, 4: False, 5: False}

    def test_string_key_rejected_at_plan_build(self, spark):
        from pandasy_spark.streaming import stateful_pattern_match

        df = spark.createDataFrame(
            [("u1", 1, dt.datetime(2024, 1, 1), "click")],
            "user_id string, event_id long, ts timestamp, "
            "event_type string",
        )
        with pytest.raises(TypeError):
            stateful_pattern_match(df)


from pandasy_spark.extended.sketches import kmv_diff_estimate  # noqa: E402


class TestKmvDiff:
    def _keys(self, spark, ks):
        return spark.createDataFrame([(k,) for k in ks], "k long")

    def test_disjoint_sets_estimate_full_cardinality(self, spark):
        a = self._keys(spark, range(0, 500))
        b = self._keys(spark, range(10_000, 10_100))
        r = kmv_diff_estimate(a, b, "k", k=64).collect()[0]
        assert r.n_sample_not_in_b == 64  # nothing in B
        assert r.diff_exact == 500
        assert r.ok

    def test_subset_gives_zero(self, spark):
        a = self._keys(spark, range(0, 300))
        b = self._keys(spark, range(0, 300))
        r = kmv_diff_estimate(a, b, "k", k=64).collect()[0]
        assert (r.n_sample_not_in_b, r.diff_est, r.diff_exact) == (
            0, 0, 0
        )
        assert r.ok  # exact-zero difference needs exact-zero estimate

    def test_partial_overlap_certified(self, spark):
        a = self._keys(spark, range(0, 1000))
        b = self._keys(spark, range(500, 1500))
        r = kmv_diff_estimate(a, b, "k", k=64).collect()[0]
        assert r.diff_exact == 500
        assert r.ok

    def test_under_k_distinct_emits_empty(self, spark):
        a = self._keys(spark, range(0, 10))
        b = self._keys(spark, [1])
        assert kmv_diff_estimate(a, b, "k", k=64).count() == 0

    def test_k_guard(self, spark):
        a = self._keys(spark, [1])
        with pytest.raises(ValueError):
            kmv_diff_estimate(a, a, "k", k=1)


class TestRound11bReviewFixes:
    """Regression pins for the round-11 session-2 review findings."""

    def test_compaction_zero_bytes_partition_one_file(self, spark):
        df = spark.createDataFrame(
            [("A", 0), ("A", 0), ("B", 300)], "p string, nb long"
        )
        out = {
            r.p: (r.n_files, r.rows_per_file, r.coalesce_candidate)
            for r in compaction_plan(
                df, ["p"], F.col("nb"), 100
            ).collect()
        }
        # zero-byte partition still needs one file; no ANSI % 0 crash
        assert out["A"] == (1, 2, True)
        assert out["B"] == (3, 1, False)

    def test_fingerprint_packing_guards(self, spark):
        df = spark.createDataFrame(
            [(0, b"x")], "doc_id long, payload binary"
        )
        from pandasy_spark.extended.audio import fingerprint_landmarks

        with pytest.raises(ValueError):
            fingerprint_landmarks(df, fanout=8)
        with pytest.raises(ValueError):
            fingerprint_landmarks(df, frame_len=512)

    def test_matched_pairs_negative_ids_dividend_mod(self, spark):
        # -3 % 2 == -1 (dividend-signed): negative ids land in their
        # own salt cell, exactly as the documented `id % salts` and
        # the DuckDB oracle compute it
        df = spark.createDataFrame(
            [(-3, 1, True), (-1, 1, False), (2, 1, True),
             (4, 1, False)],
            "id long, stratum long, t boolean",
        )
        out = sorted(
            (r.salt, r.t_id, r.c_id)
            for r in matched_pairs(
                df, "stratum", F.col("t"), "id", salts=2
            ).collect()
        )
        assert out == [(-1, -3, -1), (0, 2, 4)]

    def test_boilerplate_empty_doc_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "  \n "), (3, "real\nx"), (4, "real\ny")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_kept)
            for r in boilerplate_strip(df, min_docs=2).collect()
        }
        assert out[1] == ("", 0, 0)
        assert out[2] == ("", 0, 0)
        assert out[3] == ("x", 2, 1)

    def test_interpolate_negative_sums_true_floor(self, spark):
        # refund hours: -1.00 at hour 0, -1.10 at hour 3 ->
        # fills floor(-310/3) = -104 and floor(-320/3) = -107
        df = _ev(spark, [(0, -1.00), (3, -1.10)])
        out = {
            r.hour.hour: r.val_cents
            for r in interpolate_hourly(df).collect()
        }
        assert out == {0: -100, 1: -104, 2: -107, 3: -110}


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H = {"max_examples": 20, "deadline": None, "derandomize": True}


@pytest.mark.slow
class TestFoldFuzzVsPython:
    """Property fuzzes for the session-2 sequential folds against
    pure-Python replays — the token-bucket fuzz discipline applied
    to hysteresis and the pattern automaton (random sequences hunt
    the state-transition corners crafted frames miss)."""

    @given(
        gaps=st.lists(st.integers(1, 200), min_size=0, max_size=30),
        lo=st.integers(1, 50),
        span=st.integers(1, 100),
    )
    @settings(**_H)
    def test_hysteresis_fuzz(self, spark, gaps, lo, span):
        hi = lo + span
        us = [0]
        for g in gaps:
            us.append(us[-1] + g)
        df = spark.createDataFrame(
            [(i, 1, dt.datetime(2024, 1, 1)
              + dt.timedelta(microseconds=u))
             for i, u in enumerate(us)],
            "event_id long, user_id long, ts timestamp",
        )
        r = burst_segments_per_key(
            df, enter_us=lo, exit_us=hi
        ).collect()[0]
        # python replay
        stt = nb = ne = 0
        for g in gaps:
            if stt == 0 and g <= lo:
                stt, nb, ne = 1, nb + 1, ne + 1
            elif stt == 1 and g < hi:
                ne += 1
            else:
                stt = 0
        assert (r.n_events, r.n_bursts, r.n_burst_events) == (
            len(us), nb, ne
        )

    @given(
        types=st.lists(
            st.sampled_from(
                ["click", "purchase", "view", "error", "signup"]
            ),
            min_size=0,
            max_size=30,
        ),
    )
    @settings(**_H)
    def test_pattern_fuzz(self, spark, types):
        if not types:
            return
        df = spark.createDataFrame(
            [(i, 1, dt.datetime(2024, 1, 1)
              + dt.timedelta(seconds=i), t)
             for i, t in enumerate(types)],
            "event_id long, user_id long, ts timestamp, "
            "event_type string",
        )
        r = pattern_match_per_key(df).collect()[0]
        stt = n = 0
        for t in types:
            if t == "click":
                stt = 1
            elif t == "purchase":
                if stt == 1:
                    n += 1
                stt = 0
            elif t == "view":
                pass
            else:
                stt = 0
        assert (r.n_matches, r.pending) == (n, stt == 1)


from pandasy_spark.extended.graph import clustering_coefficient  # noqa: E402
from pandasy_spark.extended.ml import bcubed  # noqa: E402


class TestClusteringCoefficient:
    def _e(self, spark, pairs):
        return spark.createDataFrame(pairs, "x long, y long")

    def test_triangle_full_closure(self, spark):
        df = self._e(spark, [(0, 1), (1, 2), (0, 2)])
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
            3, 3, 3, 1
        )
        assert r.c_micro == 1_000_000

    def test_star_zero_closure(self, spark):
        df = self._e(spark, [(0, i) for i in range(1, 5)])
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_wedges, r.n_triangles, r.c_micro) == (6, 0, 0)

    def test_path_no_wedge_free_null(self, spark):
        # single edge: no wedges at all -> NULL
        df = self._e(spark, [(0, 1)])
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_wedges, r.c_micro) == (0, None)

    def test_hand_computed_mixed_graph(self, spark):
        # triangle 0-1-2 plus pendant 2-3: wedges = 3 + C(3,2 at 2)
        # deg: 0:2 1:2 2:3 3:1 -> wedges 1+1+3+0 = 5; T=1 -> 3/5
        df = self._e(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        r = clustering_coefficient(df).collect()[0]
        assert (r.n_wedges, r.n_triangles) == (5, 1)
        assert r.c_micro == 600_000


class TestBcubed:
    def _lp(self, spark, rows):
        return spark.createDataFrame(rows, "g string, p long")

    def test_perfect_clustering(self, spark):
        df = self._lp(
            spark, [("a", 1), ("a", 1), ("b", 2), ("b", 2)]
        )
        r = bcubed(df, "g", "p").collect()[0]
        assert (r.bcubed_p_bp, r.bcubed_r_bp, r.bcubed_f_bp) == (
            10000, 10000, 10000
        )

    def test_all_in_one_predicted_cluster(self, spark):
        # two gold groups of 2 merged into one predicted cluster of 4:
        # per-item precision 2/4, recall 1 -> P=5000, R=10000, F=6666
        df = self._lp(
            spark, [("a", 1), ("a", 1), ("b", 1), ("b", 1)]
        )
        r = bcubed(df, "g", "p").collect()[0]
        assert (r.bcubed_p_bp, r.bcubed_r_bp, r.bcubed_f_bp) == (
            5000, 10000, 6666
        )

    def test_singletons_precision_one_recall_low(self, spark):
        # one gold group of 4 shattered into singletons:
        # precision 1, recall 1/4
        df = self._lp(
            spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)]
        )
        r = bcubed(df, "g", "p").collect()[0]
        assert (r.bcubed_p_bp, r.bcubed_r_bp) == (10000, 2500)

    def test_item_weighting_punishes_megacluster(self, spark):
        # 6 items: gold {a:3, b:3}; pred merges everything.
        # P per item = 3/6 -> 5000; shattering instead would score
        # P=10000 R=3333 — B-cubed separates the two failure modes
        df = self._lp(spark, [("a", 9)] * 3 + [("b", 9)] * 3)
        r = bcubed(df, "g", "p").collect()[0]
        assert (r.bcubed_p_bp, r.bcubed_r_bp) == (5000, 10000)

    def test_null_labels_dropped(self, spark):
        df = self._lp(
            spark, [("a", 1), (None, 1), ("a", None), ("a", 1)]
        )
        r = bcubed(df, "g", "p").collect()[0]
        assert r.n_items == 2
        assert r.bcubed_p_bp == 10000


class TestUpliftGate:
    def test_gate_pairs_within_strata_and_signed_uplift(self, spark):
        # crafted via the workload gate machinery is oracle-covered;
        # here pin the composition arithmetic: build a users frame
        # where treatment outcome rate is 2/3 and control 1/3 in the
        # matched set, uplift = +3333 bp
        from pandasy_spark.extended.sampling import matched_pairs

        users = spark.createDataFrame(
            [  # (id, stratum, treated, y) — salts=1 matches by rank
                (0, 1, True, 1), (1, 1, False, 0),
                (2, 1, True, 1), (3, 1, False, 1),
                (4, 1, True, 0), (5, 1, False, 0),
            ],
            "user_id long, stratum long, treated boolean, y long",
        )
        pairs = matched_pairs(
            users, "stratum", F.col("treated"), "user_id", salts=1
        )
        out = users.select(F.col("user_id").alias("uid"), "y")
        j = (
            pairs.join(out, pairs["t_id"] == F.col("uid"))
            .select("c_id", F.col("y").alias("ty"))
            .join(
                out.select(F.col("uid").alias("cid"),
                           F.col("y").alias("cy")),
                F.col("c_id") == F.col("cid"),
            )
        )
        r = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ty").alias("st"),
            F.sum("cy").alias("sc"),
        ).collect()[0]
        assert (r.n, r.st, r.sc) == (3, 2, 1)
