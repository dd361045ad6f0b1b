"""Sinks: partitioned write round-trip + partition pruning, and
bucketed tables joining with no shuffle exchange."""

import os
import tempfile

from pyspark.sql import functions as F

from pandasy_spark.sources import (
    load_table,
    read_back,
    write_bucketed_table,
    write_parquet,
)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "li_part")
        write_parquet(li, path, partition_by=["l_returnflag"])
        # hive-style partition directories exist
        assert any(x.startswith("l_returnflag=") for x in os.listdir(path))
        back = read_back(spark, path)
        assert back.count() == li.count()
        # partition pruning: only one partition directory is scanned
        pruned = back.filter(F.col("l_returnflag") == "R")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        expected = li.filter(F.col("l_returnflag") == "R").count()
        assert pruned.count() == expected


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "li_bkt", ["l_orderkey"], 4, sort_by=["l_orderkey"])
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        ["l_orderkey"],
        4,
        sort_by=["l_orderkey"],
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join (small test tables would otherwise
        # broadcast, bypassing the bucketed layout entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("li_bkt")
        b = spark.table("ord_bkt")
        joined = a.join(b, on="l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
