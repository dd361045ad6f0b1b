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
