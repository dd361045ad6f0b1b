"""ANALYZE TABLE / cost-based-optimizer statistics surface.

ROADMAP item: CBO needs table/column statistics in the catalog;
AQE covers runtime re-planning, but persisted stats drive compile-time
join strategy and reordering on a real warehouse.
"""

from pyspark.sql import functions as F


def test_analyze_table_records_statistics(spark, sf_dir):
    from pandasy_spark.sources import load_table

    od = load_table(spark, sf_dir, "orders").limit(1000)
    spark.sql("DROP TABLE IF EXISTS t6_stats")
    od.write.mode("overwrite").saveAsTable("t6_stats")
    spark.sql(
        "ANALYZE TABLE t6_stats COMPUTE STATISTICS FOR COLUMNS o_orderkey"
    )
    desc = spark.sql("DESCRIBE EXTENDED t6_stats").toPandas()
    stats = desc[desc["col_name"] == "Statistics"]["data_type"]
    assert len(stats) == 1
    assert "1000 rows" in stats.iloc[0]
    # column-level stats are queryable
    cdesc = spark.sql(
        "DESCRIBE EXTENDED t6_stats o_orderkey"
    ).toPandas()
    got = dict(zip(cdesc["info_name"], cdesc["info_value"]))
    assert got.get("distinct_count") is not None
    spark.sql("DROP TABLE IF EXISTS t6_stats")


def test_stats_drive_broadcast_decision(spark, sf_dir):
    from pandasy_spark.sources import load_table

    # a tiny analyzed table under the broadcast threshold should
    # broadcast against a big fact without an explicit hint
    spark.sql("DROP TABLE IF EXISTS t6_dim")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "t6_dim"
    )
    spark.sql("ANALYZE TABLE t6_dim COMPUTE STATISTICS")
    li = load_table(spark, sf_dir, "customer")
    j = li.join(spark.table("t6_dim"), li.c_nationkey == F.col("n_nationkey"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    spark.sql("DROP TABLE IF EXISTS t6_dim")
