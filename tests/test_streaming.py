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
