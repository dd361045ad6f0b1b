"""Structured Streaming twins: the streaming path must produce the
same result as the batch path (which is itself DuckDB-oracle-checked
in test_workload.py)."""

import pandas as pd
from pyspark.sql import functions as F

from pandasy_spark.sources import read_stream_table
from pandasy_spark.streaming import (
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    windowed_agg,
)
from pandasy_spark.sources import load_table
from tests.helpers import assert_pdf_eq


def test_streaming_windowed_agg_matches_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = read_stream_table(spark, sf_dir, "events")
    aggs = {
        "n_events": F.count(F.lit(1)),
        "sum_value": F.round(F.sum("value"), 2),
    }
    expected = (
        windowed_agg(batch, "ts", "1 day", aggs, keys=["event_type"])
        .select("bucket", "event_type", "n_events", "sum_value")
        .toPandas()
    )
    streamed = windowed_agg(
        stream, "ts", "1 day", aggs, keys=["event_type"], watermark="1 hour"
    ).select("bucket", "event_type", "n_events", "sum_value")
    q = run_stream_to_memory(streamed, "win_agg_test", output_mode="complete")
    try:
        actual = spark.table("win_agg_test").toPandas()
    finally:
        q.stop()
    assert_pdf_eq(actual, expected)


def test_streaming_session_window_matches_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = read_stream_table(spark, sf_dir, "events")
    expected = session_window_agg(batch).toPandas()
    streamed = session_window_agg(stream, watermark="10 days")
    q = run_stream_to_memory(streamed, "sess_win_test", output_mode="complete")
    try:
        actual = spark.table("sess_win_test").toPandas()
    finally:
        q.stop()
    assert_pdf_eq(actual, expected)


def test_session_window_agrees_with_gap_sessionize(spark, sf_dir):
    """session_window(gap) and the lag-based sessionizer must agree on
    session count and total events per user (same gap semantics)."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        sessionize_batch(ev, gap_minutes=30)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
    )
    b = (
        session_window_agg(ev, gap="30 minutes")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
    )
    assert_pdf_eq(a, b)


def test_streaming_stateful_dedup(spark, sf_dir):
    """applyInPandasWithState dedup: first event per user, matched
    against the batch window equivalent."""
    from pandasy_spark.streaming import streaming_dedup
    from pyspark.sql.window import Window

    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .select("user_id", "event_id")
        .toPandas()
    )
    stream = read_stream_table(spark, sf_dir, "events")
    deduped = streaming_dedup(stream, ["user_id"], order_col="ts")
    q = run_stream_to_memory(deduped, "dedup_test", output_mode="append")
    try:
        actual = spark.table("dedup_test").select("user_id", "event_id").toPandas()
    finally:
        q.stop()
    assert_pdf_eq(actual, expected)


def test_stream_stream_tolerance_join_matches_batch(spark, sf_dir):
    from pandasy_spark.operators import tolerance_join
    from pandasy_spark.streaming.ops import stream_stream_tolerance_join

    batch = load_table(spark, sf_dir, "events")
    bl = batch.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("err_ts")
    ) if "err_ts" in batch.columns else batch.filter(
        F.col("event_type") == "error"
    ).select("user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts"))
    br = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("buy_ts")
    )
    expected = (
        tolerance_join(
            bl, br, on=["user_id"], left_time="err_ts", right_time="buy_ts",
            tolerance_seconds=600,
        )
        .select("user_id", "err_id", "buy_id")
        .toPandas()
    )

    stream = read_stream_table(spark, sf_dir, "events")
    sl = stream.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    sr = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
    )
    joined = stream_stream_tolerance_join(
        sl.withColumnRenamed("user_id", "l_user_id"),
        sr,
        on=[],
        left_time="err_ts",
        right_time="buy_ts",
        tolerance_seconds=600,
        watermark="30 days",
    )
    # key equality added manually since the helper's `on` list compares
    # identically-named columns; names differ here
    from pandasy_spark.streaming import run_stream_to_memory

    joined = joined.filter(F.col("l_user_id") == F.col("r_user_id"))
    q = run_stream_to_memory(
        joined.select(F.col("l_user_id").alias("user_id"), "err_id", "buy_id"),
        "ss_join_test",
        output_mode="append",
    )
    try:
        actual = spark.table("ss_join_test").toPandas()
    finally:
        q.stop()
    assert_pdf_eq(actual, expected)


def test_foreach_batch_sink(spark, sf_dir):
    from pandasy_spark.streaming.ops import foreach_batch

    stream = read_stream_table(spark, sf_dir, "events")
    counts = []

    def collect(batch_df, batch_id):
        counts.append(batch_df.count())

    foreach_batch(stream.select("event_id"), collect, "fb_test")
    assert sum(counts) == load_table(spark, sf_dir, "events").count()


def test_aqe_splits_skewed_join(spark, sf_dir):
    """Force a skewed sort-merge join and observe AQE's skew-split in
    the final adaptive plan."""
    old = {
        k: spark.conf.get(k)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        ]
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        # NB: AQE splits a skewed reduce partition by MAPPER ranges, so
        # a single-file (single-mapper) input can never be skew-split;
        # repartition(8) gives the join stage real mappers.
        li = load_table(spark, "/root/testdata/sf0.01", "lineitem").repartition(8).select(
            F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .cast("long")
            .alias("k"),
            "l_orderkey",
            "l_quantity",
        )  # ~90% of rows share one key: heavy skew (data-dependent so
        # Catalyst cannot constant-fold the key away)
        other = load_table(spark, "/root/testdata/sf0.01", "orders").filter(
            F.col("o_orderkey") % 100 == 0
        ).select(
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(1))
            .otherwise(F.col("o_orderkey"))
            .cast("long")
            .alias("k"),
            "o_totalprice",
        )
        # aggregate on top so the action is cheap; the skewed join is
        # inside this DataFrame's own QueryExecution, whose FINAL
        # adaptive plan (with skew annotations) becomes observable
        # after collect()
        # keep payload columns in the shuffle (a constant-key-only
        # shuffle compresses below the skew threshold)
        res = li.join(other, on="k").groupBy().agg(
            F.sum("l_quantity"), F.sum("o_totalprice"), F.count(F.lit(1))
        )
        res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
