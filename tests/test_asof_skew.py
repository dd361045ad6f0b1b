"""As-of join semantics + salted skew join equivalence."""

import datetime as dt

from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.operators import asof_join, join, salted_join
from tests.helpers import assert_duck_eq


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = to_df(
        spark,
        [
            [1, _ts("2024-01-01 10:00:00"), "L1"],
            [1, _ts("2024-01-01 12:00:00"), "L2"],
            [2, _ts("2024-01-01 09:00:00"), "L3"],  # no prior right row
            [3, _ts("2024-01-01 09:00:00"), "L4"],  # key with no right rows
        ],
        "k:long,ts:datetime,lv:str",
    )
    right = to_df(
        spark,
        [
            [1, _ts("2024-01-01 09:30:00"), "R1"],
            [1, _ts("2024-01-01 11:00:00"), "R2"],
            [1, _ts("2024-01-01 12:00:00"), "R3"],  # equal ts: inclusive
            [2, _ts("2024-01-01 10:00:00"), "R4"],
        ],
        "k:long,ts:datetime,rv:str",
    )
    out = asof_join(left, right, on=["k"], left_time="ts", right_time="ts")
    got = {(r["k"], r["lv"]): r["asof_rv"] for r in out.collect()}
    assert got == {(1, "L1"): "R1", (1, "L2"): "R3"}

    out_left = asof_join(
        left, right, on=["k"], left_time="ts", right_time="ts", how="left"
    )
    got = {(r["k"], r["lv"]): r["asof_rv"] for r in out_left.collect()}
    assert got == {
        (1, "L1"): "R1",
        (1, "L2"): "R3",
        (2, "L3"): None,
        (3, "L4"): None,
    }


def test_salted_join_matches_plain_join(spark, sf_dir):
    from pandasy_spark.sources import load_table

    # skewed big side: most lineitems share one suppkey after remap
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("suppkey"),
        "l_orderkey",
        "l_quantity",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    plain = join(li, supp, "inner", on=["suppkey"])
    salted = salted_join(li, supp, on=["suppkey"], salt=8)
    assert salted.count() == plain.count()
    a = sorted(
        (r["suppkey"], r["l_orderkey"], r["s_name"]) for r in salted.collect()
    )
    b = sorted(
        (r["suppkey"], r["l_orderkey"], r["s_name"]) for r in plain.collect()
    )
    assert a == b


def test_salted_left_join(spark):
    big = to_df(spark, [[1, "a"], [1, "b"], [9, "c"]], "k:long,v:str")
    small = to_df(spark, [[1, "X"]], "k:long,w:str")
    out = salted_join(big, small, on=["k"], salt=4, how="left")
    got = sorted((r["k"], r["v"], r["w"]) for r in out.collect())
    assert got == [(1, "a", "X"), (1, "b", "X"), (9, "c", None)]


def test_tolerance_join_semantics(spark):
    from pandasy_spark.operators import tolerance_join

    left = to_df(
        spark,
        [
            [1, _ts("2024-01-01 10:00:00"), "L1"],
            [1, _ts("2024-01-01 11:00:00"), "L2"],
            [2, _ts("2024-01-01 10:00:00"), "L3"],
        ],
        "k:long,lts:datetime,lv:str",
    )
    right = to_df(
        spark,
        [
            [1, _ts("2024-01-01 10:04:59"), "R1"],   # within 5 min of L1
            [1, _ts("2024-01-01 10:05:00"), "R2"],   # exactly 5 min: inclusive
            [1, _ts("2024-01-01 10:05:01"), "R3"],   # just outside
            [1, _ts("2024-01-01 10:55:30"), "R4"],   # within 5 min of L2
            [2, _ts("2024-01-01 10:00:00"), "R5"],   # equal ts, other key
        ],
        "k:long,rts:datetime,rv:str",
    )
    out = tolerance_join(
        left, right, on=["k"], left_time="lts", right_time="rts",
        tolerance_seconds=300,
    )
    got = sorted((r["lv"], r["rv"]) for r in out.collect())
    assert got == [("L1", "R1"), ("L1", "R2"), ("L2", "R4"), ("L3", "R5")]


def test_tolerance_join_rejects_column_clash(spark):
    import pytest
    from pandasy_spark.operators import tolerance_join

    a = to_df(spark, [[1, _ts("2024-01-01 10:00:00"), "x"]], "k:long,ts:datetime,v:str")
    b = to_df(spark, [[1, _ts("2024-01-01 10:00:00"), "y"]], "k:long,ts2:datetime,v:str")
    with pytest.raises(ValueError):
        tolerance_join(a, b, on=["k"], left_time="ts", right_time="ts2", tolerance_seconds=60)


def test_adaptive_salted_join_matches_plain_join(spark):
    from pandasy_spark.operators import adaptive_salted_join

    # one pathologically hot key (k=1: 20k rows) among uniform cold keys
    big = spark.range(0, 20000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(0, 2000).select(
        (F.col("id") % 100 + 2).alias("k"), (F.col("id") + 100000).alias("payload")
    )
    big = big.unionByName(cold)
    small = spark.range(0, 102).select(
        (F.col("id") + 1).alias("k"), (F.col("id") * 7).alias("info")
    )
    plain = big.join(small, on=["k"], how="inner")
    salted = adaptive_salted_join(
        big, small, on=["k"], rows_per_task=1000, sample_fraction=0.5
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched big rows too
    plain_l = big.join(small, on=["k"], how="left")
    salted_l = adaptive_salted_join(
        big, small, on=["k"], how="left", rows_per_task=1000, sample_fraction=0.5
    )
    assert salted_l.count() == plain_l.count()


def test_asof_join_null_payload_not_backfilled(spark):
    """A genuine NULL in the matched right row must stay NULL, not be
    back-filled from an older right row (ADVICE r1: payload travels as
    one struct). Matches DuckDB ASOF JOIN semantics."""
    left = to_df(spark, [[1, _ts("2024-01-01 10:00:00")]], "k:long,ts:datetime")
    right = to_df(
        spark,
        [
            [1, _ts("2024-01-01 01:00:00"), 100, 200],
            [1, _ts("2024-01-01 05:00:00"), None, 300],
        ],
        "k:long,ts:datetime,a:long,b:long",
    )
    out = asof_join(left, right, on=["k"], left_time="ts", right_time="ts")
    row = out.collect()[0]
    assert row["asof_a"] is None  # NOT 100
    assert row["asof_b"] == 300


def test_asof_join_null_keys_never_match(spark):
    """NULL join keys follow SQL equi-join semantics: they match nothing
    (ADVICE r1). inner drops them; left keeps them with NULL payload."""
    left = to_df(
        spark,
        [[None, _ts("2024-01-01 10:00:00"), "LN"], [1, _ts("2024-01-01 10:00:00"), "L1"]],
        "k:long,ts:datetime,lv:str",
    )
    right = to_df(
        spark,
        [[None, _ts("2024-01-01 09:00:00"), "RN"], [1, _ts("2024-01-01 09:00:00"), "R1"]],
        "k:long,ts:datetime,rv:str",
    )
    inner = asof_join(left, right, on=["k"], left_time="ts", right_time="ts")
    assert {(r["lv"], r["asof_rv"]) for r in inner.collect()} == {("L1", "R1")}

    lft = asof_join(left, right, on=["k"], left_time="ts", right_time="ts", how="left")
    got = {r["lv"]: r["asof_rv"] for r in lft.collect()}
    assert got == {"L1": "R1", "LN": None}
