"""Scalar (constant) cast matrix — the reference's ~90-assert table
(/root/reference/slide_test/suite.py:1119-1203, fixtures F3), evaluated
through the engine's scalar path (1-row-frame eval)."""

import datetime as dt

import pytest

from pandasy_spark.convert import eval_scalar
from pandasy_spark.functions import cast


@pytest.fixture(scope="module")
def ev(spark):
    def _eval(value, target, input_type=None):
        return eval_scalar(spark, cast(value, target, input_type=input_type))

    return _eval


def test_null_casts(ev):
    for target in ["bool", "int", "long", "double", "str", "datetime", "date"]:
        assert ev(None, target) is None


def test_bool_source(ev):
    assert ev(True, "str", input_type="bool") == "true"
    assert ev(False, "str", input_type="bool") == "false"
    assert ev(True, "long", input_type="bool") == 1
    assert ev(False, "long", input_type="bool") == 0
    assert ev(True, "double", input_type="bool") == 1.0
    assert ev(True, "bool", input_type="bool") is True


def test_numeric_to_bool(ev):
    assert ev(2, "bool", input_type="long") is True
    assert ev(0, "bool", input_type="long") is False
    assert ev(-2, "bool", input_type="long") is True
    assert ev(0.1, "bool", input_type="double") is True
    assert ev(0.0, "bool", input_type="double") is False
    assert ev(float("nan"), "bool", input_type="double") is None


def test_string_to_bool(ev):
    assert ev("tRue", "bool", input_type="str") is True
    assert ev("fAlse", "bool", input_type="str") is False
    assert ev("1", "bool", input_type="str") is True
    assert ev("0", "bool", input_type="str") is False
    assert ev("1.0", "bool", input_type="str") is True
    assert ev("0.0", "bool", input_type="str") is False
    assert ev("abc", "bool", input_type="str") is None


def test_to_int(ev):
    assert ev(1.1, "long", input_type="double") == 1
    assert ev(-2.7, "long", input_type="double") == -2
    assert ev(2, "long", input_type="long") == 2
    assert ev("10", "long", input_type="str") == 10
    assert ev("1.1", "long", input_type="str") == 1
    assert ev("-2.2", "long", input_type="str") == -2
    assert ev("nan", "long", input_type="str") is None
    assert ev(float("nan"), "long", input_type="double") is None
    assert ev(True, "long", input_type="bool") == 1
    assert ev("abc", "long", input_type="str") is None


def test_to_float(ev):
    assert ev("1.5", "double", input_type="str") == 1.5
    assert ev("nan", "double", input_type="str") is None  # NaN ≡ NULL
    assert ev(float("nan"), "double", input_type="double") is None
    assert ev("inf", "double", input_type="str") == float("inf")
    assert ev(1, "double", input_type="long") == 1.0


def test_to_str(ev):
    assert ev(2, "str", input_type="long") == "2"
    assert ev(1.1, "str", input_type="double") == "1.1"
    assert ev(10.0, "str", input_type="double") == "10.0"
    assert (
        ev(dt.datetime(2020, 1, 1, 15, 2, 3), "str", input_type="datetime")
        == "2020-01-01 15:02:03"
    )
    assert ev(dt.date(2020, 1, 1), "str", input_type="date") == "2020-01-01"
    assert ev(float("inf"), "str", input_type="double").lower() in (
        "inf",
        "infinity",
    )


def test_to_datetime_and_date(ev):
    assert ev("2020-01-01 15:00:00", "datetime", input_type="str") == dt.datetime(
        2020, 1, 1, 15, 0, 0
    )
    assert ev("2020-01-01", "date", input_type="str") == dt.date(2020, 1, 1)
    # datetime -> date truncates the time part
    assert ev(
        dt.datetime(2020, 1, 1, 15, 2, 3), "date", input_type="datetime"
    ) == dt.date(2020, 1, 1)
    assert ev(
        dt.date(2020, 1, 1), "datetime", input_type="date"
    ) == dt.datetime(2020, 1, 1)


def test_datetime_to_bool_raises(ev):
    from pandasy_spark.exceptions import CastError

    with pytest.raises(CastError):
        ev(dt.datetime(2020, 1, 1), "bool", input_type="datetime")
