"""Round-6 tenth batch: bitmap distinct, nth_value windows,
union-by-name, week-over-week."""

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.sketches import bitmap_distinct


def test_bitmap_distinct_exact(spark):
    rows = [("a", i % 7) for i in range(100)] + [("b", i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long")
    out = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(df, "g", "id", domain=128).collect()
    }
    assert out == {"a": 7, "b": 50}


def test_bitmap_distinct_shard_merge_equals_direct(spark):
    rows = [("g", (i * 37) % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, id long").withColumn(
        "sh", F.monotonically_increasing_id() % 5
    )
    direct = bitmap_distinct(df, "g", "id", domain=512).first()["n_distinct"]
    merged = bitmap_distinct(
        df, "g", "id", domain=512, shard_col=F.col("sh")
    ).first()["n_distinct"]
    exact = df.select("id").distinct().count()
    assert direct == merged == exact


def test_bitmap_distinct_domain_guard(spark):
    df = spark.createDataFrame([("g", 100)], "g string, id long")
    with pytest.raises(Exception, match="outside"):
        bitmap_distinct(df, "g", "id", domain=50).collect()
    with pytest.raises(ValueError):
        bitmap_distinct(df, "g", "id", domain=0)
    # boundary ids 0 and domain-1 both count
    edge = spark.createDataFrame(
        [("g", 0), ("g", 61), ("g", 62), ("g", 123)], "g string, id long"
    )
    assert bitmap_distinct(edge, "g", "id", 124).first()["n_distinct"] == 4


def test_union_byname_fills_missing(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    r = QUERIES["setop_union_byname"](spark, sf_dir).first()
    assert r["n"] == r["null_a"] + (r["n"] - r["null_a"])
    assert r["null_a"] > 0 and r["null_b"] > 0
    assert r["null_a"] + r["null_b"] == r["n"]


def test_wow_permille_definition(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["events_wow"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["prev"] is None:
            assert r["change_permille"] is None
        else:
            assert r["change_permille"] == (r["n"] * 1000) // r["prev"] - 1000
