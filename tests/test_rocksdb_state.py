"""RocksDB state-store provider (streaming/state.py): the production
state backend must produce IDENTICAL results to the default
HDFS-backed provider — windowed aggregation (built-in stateful op)
and applyInPandasWithState dedup (custom stateful op) both run under
RocksDB and match their batch twins.  Scale rationale in the module
docstring: state on local SSD with bounded memory + changelog
checkpointing, instead of JVM-heap state objects."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandasy_spark.sources import load_table, read_stream_table
from pandasy_spark.streaming import (
    rocksdb_state_conf,
    run_stream_to_memory,
    streaming_dedup,
    use_rocksdb_state,
    windowed_agg,
)
from tests.helpers import assert_pdf_eq


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_conf_block_shape():
    conf = rocksdb_state_conf(bounded_memory_mb=512)
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider"
    )
    assert (
        conf[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ]
        == "true"
    )
    assert (
        conf["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"]
        == "512"
    )
    # memory cap is opt-in
    assert (
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
        not in rocksdb_state_conf()
    )


def test_windowed_agg_on_rocksdb_matches_batch(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    aggs = {
        "n_events": F.count(F.lit(1)),
        "sum_value": F.round(F.sum("value"), 2),
    }
    expected = (
        windowed_agg(batch, "ts", "1 day", aggs, keys=["event_type"])
        .select("bucket", "event_type", "n_events", "sum_value")
        .toPandas()
    )
    prev = use_rocksdb_state(spark)
    try:
        stream = read_stream_table(spark, sf_dir, "events")
        streamed = windowed_agg(
            stream, "ts", "1 day", aggs, keys=["event_type"],
            watermark="1 hour",
        ).select("bucket", "event_type", "n_events", "sum_value")
        q = run_stream_to_memory(
            streamed, "rocksdb_win_agg", output_mode="complete"
        )
        try:
            actual = spark.table("rocksdb_win_agg").toPandas()
        finally:
            q.stop()
    finally:
        _restore(spark, prev)
    assert_pdf_eq(actual, expected)


def test_stateful_dedup_on_rocksdb_matches_batch(spark, sf_dir):
    """The CUSTOM stateful operator (applyInPandasWithState) must be
    provider-agnostic too — its GroupState round-trips through
    RocksDB row encoding instead of heap maps."""
    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .toPandas()
    )
    prev = use_rocksdb_state(spark)
    try:
        stream = read_stream_table(spark, sf_dir, "events")
        deduped = streaming_dedup(stream, ["user_id"], order_col="ts")
        q = run_stream_to_memory(
            deduped, "rocksdb_dedup", output_mode="append"
        )
        try:
            actual = (
                spark.table("rocksdb_dedup")
                .select("user_id", "event_id")
                .toPandas()
            )
        finally:
            q.stop()
    finally:
        _restore(spark, prev)
    assert_pdf_eq(actual, expected)


def test_streaming_dedup_rocksdb_gate_restores_conf(spark, sf_dir):
    """The driver gate wraps exactly one stream in the RocksDB
    provider conf and restores the previous session state after."""
    from pandasy_spark.workload import QUERIES

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    out = QUERIES["streaming_dedup_rocksdb"](spark, sf_dir)
    assert out.count() > 0
    assert spark.conf.get(key, None) == before
