"""Portable cardinality sketches (extended/sketches.py): register
parity against DuckDB, estimator exactness, and accuracy contracts."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.sketches import (
    hll_estimate,
    hll_sketch,
    kmv_estimate,
    kmv_kth_hash,
    portable_hash31,
    portable_hash56,
)
from tests.helpers import assert_duck_eq, spark_to_pd

_H31 = (
    "('0x' || substring(md5(CAST({c} AS VARCHAR)), 1, 8))::BIGINT"
    " % 2147483648"
)
_H56 = "('0x' || substring(md5(CAST({c} AS VARCHAR)), 1, 14))::BIGINT"


def _keys(spark, n, dup=1):
    return spark.range(n * dup).select(
        (F.col("id") % n).alias("k"), (F.col("id") % 3).alias("g")
    )


def test_hash31_matches_duckdb(spark):
    df = _keys(spark, 50)
    out = df.select("k", portable_hash31(F.col("k")).alias("h"))
    assert_duck_eq(
        out,
        f"SELECT k, {_H31.format(c='k')} AS h FROM t",
        t=spark_to_pd(df),
    )


def test_hash56_matches_duckdb(spark):
    df = _keys(spark, 50)
    out = df.select("k", portable_hash56(F.col("k")).alias("h"))
    assert_duck_eq(
        out,
        f"SELECT k, {_H56.format(c='k')} AS h FROM t",
        t=spark_to_pd(df),
    )


def test_hll_registers_match_duckdb(spark):
    df = _keys(spark, 300, dup=2)
    regs = hll_sketch(df, ["g"], "k", p=6)
    assert_duck_eq(
        regs,
        f"""
        WITH h AS (SELECT g, {_H31.format(c='k')} AS h FROM t)
        SELECT g, h % 64 AS bucket,
               CAST(MAX(CASE WHEN h // 64 = 0 THEN 26
                        ELSE 26 - length(bin(h // 64)) END) AS INT) AS rho
        FROM h GROUP BY g, h % 64
        """,
        t=spark_to_pd(df),
    )


def test_hll_estimate_accuracy_and_dup_invariance(spark):
    # duplicates must not move a distinct sketch
    once = hll_estimate(_keys(spark, 500), [], "k").collect()[0]
    thrice = hll_estimate(_keys(spark, 500, dup=3), [], "k").collect()[0]
    assert once.asDict() == thrice.asDict()
    assert abs(once["est"] - 500) <= 0.35 * 500
    assert once["m"] == 64


def test_kmv_kth_is_true_order_statistic(spark):
    df = _keys(spark, 400)
    kth = kmv_kth_hash(df, [], "k", k=64).collect()[0]["kth_hash"]
    hs = sorted(
        r["h"]
        for r in df.select(portable_hash56(F.col("k")).alias("h"))
        .distinct()
        .collect()
    )
    assert kth == hs[63]


def test_kmv_estimate_accuracy_and_dup_invariance(spark):
    once = kmv_estimate(_keys(spark, 400), [], "k").collect()[0]
    thrice = kmv_estimate(_keys(spark, 400, dup=3), [], "k").collect()[0]
    assert once.asDict() == thrice.asDict()
    assert abs(once["est"] - 400) <= 0.35 * 400


def test_kmv_small_group_dropped(spark):
    # a group with < k distinct keys has no k-th order statistic
    df = _keys(spark, 30)
    assert kmv_estimate(df, [], "k", k=64).count() == 0


def test_kmv_k_bounds(spark):
    df = _keys(spark, 10)
    with pytest.raises(ValueError):
        kmv_estimate(df, [], "k", k=1)
    with pytest.raises(ValueError):
        kmv_estimate(df, [], "k", k=128)


def test_hll_p_bounds(spark):
    df = _keys(spark, 10)
    with pytest.raises(ValueError):
        hll_sketch(df, [], "k", p=3)
