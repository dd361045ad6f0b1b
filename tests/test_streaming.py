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


def test_streaming_hopping_window_matches_batch(spark, sf_dir):
    """Sliding (hopping) windows stream==batch: 10-minute windows every
    5 minutes — each event lands in exactly two windows; the streaming
    path must produce the identical multi-assignment."""
    batch = load_table(spark, sf_dir, "events")
    stream = read_stream_table(spark, sf_dir, "events")
    aggs = {"n_events": F.count(F.lit(1))}
    expected = (
        windowed_agg(
            batch, "ts", "10 minutes", aggs, keys=["event_type"],
            slide="5 minutes",
        )
        .select("bucket", "event_type", "n_events")
        .toPandas()
    )
    streamed = windowed_agg(
        stream, "ts", "10 minutes", aggs, keys=["event_type"],
        watermark="1 hour", slide="5 minutes",
    ).select("bucket", "event_type", "n_events")
    q = run_stream_to_memory(streamed, "hop_agg_test", output_mode="complete")
    try:
        actual = spark.table("hop_agg_test").toPandas()
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


def test_stateful_sessions_with_timeout_eviction(spark, sf_dir, tmp_path):
    """applyInPandasWithState session windows with EventTimeTimeout:
    closed sessions are emitted in-batch; held-open sessions are
    evicted and emitted when a later micro-batch advances the
    watermark past session_end + gap.

    Two micro-batches (maxFilesPerTrigger=1): the real events, then a
    far-future sentinel event that pushes the watermark forward.
    Checked against sessionize_batch: every emitted session must be a
    real batch session, and every session provably closed w.r.t. the
    batch-1 watermark must have been emitted."""
    import shutil

    from pandasy_spark.streaming import sessionize_batch, stateful_sessions

    gap_min = 30
    batch = load_table(spark, sf_dir, "events")
    expected_all = (
        sessionize_batch(batch, gap_minutes=gap_min)
        .select("user_id", "session_start", "session_end", "n_events")
        .toPandas()
    )
    max_real_ms = (
        pd.to_datetime(batch.agg(F.max("ts")).collect()[0][0]).value // 1_000_000
    )

    # two-file stream dir: real events then one sentinel far in the future
    stream_dir = str(tmp_path / "sessions_stream")
    (tmp_path / "sessions_stream").mkdir()
    events_pdf = batch.toPandas()
    # store as us-precision so the stream reads TimestampType (ns parquet
    # would hit the nanosAsLong legacy path and arrive as long)
    events_pdf["ts"] = events_pdf["ts"].astype("datetime64[us]")
    events_pdf.to_parquet(stream_dir + "/a_events.parquet", index=False)
    sentinel = events_pdf.head(1).copy()
    sentinel["user_id"] = -1
    sentinel["ts"] = pd.Series(
        [events_pdf["ts"].max() + pd.Timedelta(days=30)], dtype="datetime64[us]"
    ).values
    sentinel.to_parquet(stream_dir + "/b_sentinel.parquet", index=False)

    stream = (
        spark.readStream.schema(spark.read.parquet(stream_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        # parquet-from-pandas reads back as TIMESTAMP_NTZ; watermarks
        # require TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = stateful_sessions(stream, gap_minutes=gap_min)
    q = run_stream_to_memory(sessions, "stateful_sessions_test", output_mode="append")
    try:
        actual = (
            spark.table("stateful_sessions_test")
            .filter(F.col("user_id") >= 0)
            .toPandas()
        )
    finally:
        q.stop()

    key = ["user_id", "session_start", "session_end", "n_events"]
    exp_keys = set(map(tuple, expected_all[key].itertuples(index=False)))
    act_keys = set(map(tuple, actual[key].itertuples(index=False)))
    # 1) no fabricated sessions
    assert act_keys <= exp_keys
    # 2) everything provably closed by the batch-1 watermark was evicted
    gap_ms = gap_min * 60 * 1000
    end_ms = pd.to_datetime(expected_all["session_end"]).astype("int64") // 1_000_000
    closed = expected_all[end_ms + gap_ms < max_real_ms]
    closed_keys = set(map(tuple, closed[key].itertuples(index=False)))
    assert closed_keys <= act_keys
    # and the stream actually emitted the overwhelming majority
    assert len(act_keys) >= len(closed_keys) > 0


def test_rate_source_soak(spark):
    """Continuous-source stability: a rate stream (500 rows/s) through
    the windowed-agg path for a few micro-batches — verifies the
    operator works on an unbounded source (not just file streams) and
    that state/watermark advance across batches."""
    import time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .withColumn("user_id", F.col("value") % 7)
    )
    windowed = (
        stream.withWatermark("timestamp", "0 seconds")
        .groupBy(F.window("timestamp", "1 second"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("rate_soak")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 20
        rows = 0
        while time.time() < deadline:
            time.sleep(1)
            rows = spark.table("rate_soak").count()
            if rows >= 14 and q.lastProgress:  # ≥2 full windows x 7 users
                break
        assert q.isActive and q.exception() is None
        assert rows >= 14
        # state metrics show the aggregation is genuinely stateful
        prog = q.lastProgress
        assert prog is not None and any(
            op.get("numRowsTotal", 0) > 0 for op in prog.get("stateOperators", [])
        )
    finally:
        q.stop()


def test_stream_stream_left_outer_tolerance_join(spark, sf_dir, tmp_path):
    """Outer stream-stream join: errors with no same-user purchase
    within ±10 min appear with NULL buy columns once the watermark
    passes err_ts + tolerance.  Outer stream-stream joins require an
    equality predicate, and results finalize only on a LATER
    micro-batch — so the stream is two files (events, then a
    far-future sentinel) like the stateful-sessions test."""
    from pandasy_spark.operators import tolerance_join
    from pandasy_spark.streaming.ops import stream_stream_tolerance_join

    batch = load_table(spark, sf_dir, "events")
    bl = batch.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    br = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
    )
    inner = tolerance_join(
        bl.withColumnRenamed("user_id", "l_user_id"), br, on=[],
        left_time="err_ts", right_time="buy_ts", tolerance_seconds=600,
    ).filter(F.col("l_user_id") == F.col("r_user_id"))
    matched_err = set(r["err_id"] for r in inner.select("err_id").collect())
    err_pdf = bl.toPandas()
    all_err = set(err_pdf["err_id"])
    max_real_ms = pd.to_datetime(batch.toPandas()["ts"]).max().value // 1_000_000
    err_ms = pd.to_datetime(err_pdf["err_ts"]).astype("int64") // 1_000_000
    finalized = set(err_pdf.loc[err_ms + 600_000 < max_real_ms, "err_id"])
    expected_null = (all_err - matched_err) & finalized

    stream_dir = str(tmp_path / "ss_outer_stream")
    (tmp_path / "ss_outer_stream").mkdir()
    ev_pdf = batch.toPandas()
    ev_pdf["ts"] = ev_pdf["ts"].astype("datetime64[us]")
    ev_pdf.to_parquet(stream_dir + "/a_events.parquet", index=False)
    sentinel = ev_pdf.head(1).copy()
    sentinel["user_id"] = -1
    sentinel["ts"] = pd.Series(
        [ev_pdf["ts"].max() + pd.Timedelta(days=30)], dtype="datetime64[us]"
    ).values
    sentinel.to_parquet(stream_dir + "/b_sentinel.parquet", index=False)
    stream = (
        spark.readStream.schema(spark.read.parquet(stream_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    sl = stream.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    sr = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("buy_ts")
    )
    joined = stream_stream_tolerance_join(
        sl, sr, on=["user_id"], left_time="err_ts", right_time="buy_ts",
        tolerance_seconds=600, watermark="0 seconds", how="left_outer",
    ).select("err_id", "buy_id")
    q = run_stream_to_memory(joined, "ss_outer_test", output_mode="append")
    try:
        out = spark.table("ss_outer_test").toPandas()
    finally:
        q.stop()

    got_matched = set(out.loc[out["buy_id"].notna(), "err_id"])
    got_null = set(out.loc[out["buy_id"].isna(), "err_id"])
    assert got_matched == matched_err
    # all provably-finalized unmatched errors emitted with NULL right side;
    # nothing emitted as NULL that actually had a match
    assert expected_null <= got_null <= (all_err - matched_err)
    assert len(expected_null) > 0


def test_stateful_dedup_on_rocksdb_state_store(spark, sf_dir):
    """The production state backend: RocksDB state store provider
    (bounded executor memory at 100 TB-scale state, incremental
    checkpoints) must produce identical results to the default
    HDFS-backed store."""
    from pandasy_spark.streaming import streaming_dedup

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_stream_table(spark, sf_dir, "events")
        deduped = streaming_dedup(stream, ["user_id"], order_col="ts")
        q = run_stream_to_memory(deduped, "rocksdb_dedup_test", output_mode="append")
        try:
            actual = spark.table("rocksdb_dedup_test").count()
        finally:
            q.stop()
        expected = (
            load_table(spark, sf_dir, "events").select("user_id").distinct().count()
        )
        assert actual == expected
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_streaming_dedup_against_index(spark, tmp_path):
    """Continuous ingestion with incremental near-dedup: batch 2's
    near-copy of a batch-1 doc is dropped by the persisted index;
    batch 2's internal duplicate pair keeps only the smaller id; the
    index grows by exactly the survivors' buckets."""
    from pandasy_spark.streaming import streaming_dedup_against_index

    stream_dir = str(tmp_path / "in")
    index_path = str(tmp_path / "index")
    surv_path = str(tmp_path / "survivors")

    b1 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "pack my box with five dozen liquor jugs for the trip home",
            ],
        }
    )
    b2 = pd.DataFrame(
        {
            # the near-copy gets id 0 (SMALLER than its batch-1
            # original): only the cross-batch index drops it — a
            # single-batch self-dedup would keep 0 and drop 1 instead,
            # so this distinguishes the two code paths
            "doc_id": [0, 4, 5],
            "text": [
                # near-copy of batch-1 doc 1 -> dropped by the index
                "the quick brown fox jumps over the lazy dog again and again!",
                # novel -> survives
                "zebras graze quietly while violet thunderclouds gather east",
                # near-copy of doc 4 within the SAME batch -> dropped
                "zebras graze quietly while violet thunderclouds gather east.",
            ],
        }
    )
    # two files -> two micro-batches (lexicographic arrival order)
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(
        stream_dir + "/f1"
    )
    spark.createDataFrame(b2).coalesce(1).write.mode("overwrite").parquet(
        stream_dir + "/f2"
    )
    schema = "doc_id bigint, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    streaming_dedup_against_index(
        stream, index_path, surv_path, num_hashes=32, bands=16
    )
    surv = sorted(
        r["doc_id"] for r in spark.read.parquet(surv_path).collect()
    )
    assert surv == [1, 2, 4]
    idx = spark.read.parquet(index_path)
    assert sorted(set(r["id"] for r in idx.collect())) == [1, 2, 4]
    # 16 bands per admitted doc
    assert idx.count() == 3 * 16


def test_stream_table_matches_batch(spark, sf_dir):
    """stream_table + windowed_agg drained through the memory sink must
    equal the batch aggregate — the exact contract the
    streaming_window driver gate states in SQL."""
    from pandasy_spark.sources import load_table
    from pandasy_spark.streaming import (
        run_stream_to_memory,
        stream_table,
        windowed_agg,
    )

    aggs = lambda: {"n_events": F.count(F.lit(1))}
    out = windowed_agg(
        stream_table(spark, sf_dir, "events"), "ts", "1 day", aggs(),
        keys=["event_type"],
    )
    q = run_stream_to_memory(out, "stream_table_smoke", output_mode="complete")
    q.stop()
    streamed = sorted(map(tuple, spark.table("stream_table_smoke").collect()))
    batch = sorted(
        map(
            tuple,
            windowed_agg(
                load_table(spark, sf_dir, "events"), "ts", "1 day", aggs(),
                keys=["event_type"],
            ).collect(),
        )
    )
    assert streamed == batch and len(streamed) > 0


def test_streaming_bloom_decontaminate_matches_batch(spark, tmp_path, sf_dir):
    """Two micro-batches of documents decontaminated against a fixed
    eval set must leave exactly the survivors the batch operator
    computes over the union — per-batch blooms change nothing because
    the eval side is constant."""
    import os

    from pandasy_spark.extended.dedup import bloom_decontaminate
    from pandasy_spark.streaming import streaming_bloom_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    ev = docs.filter("doc_id % 13 = 0").select("text")
    src = str(tmp_path / "in")
    out = str(tmp_path / "survivors")
    os.makedirs(src)
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(src)
    streaming_bloom_decontaminate(stream, ev, out)
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    expect = sorted(
        r["doc_id"] for r in bloom_decontaminate(docs, ev).collect()
    )
    assert got == expect and len(got) > 0


def test_staged_stream_drops_late_data_after_eviction(spark):
    """The watermark-eviction contract: once a window has been evicted
    (watermark passed its end, with one extra batch for the
    late-record filter to pick the new watermark up), a late row for
    that window is DROPPED — the sink shows the pre-late aggregate,
    not an absorbed or duplicated one.  Also pins that still-open
    (sentinel) windows are NOT emitted by availableNow's final batch."""
    import pandas as pd

    from pandasy_spark.streaming import (
        run_stream_to_memory,
        staged_file_stream,
        windowed_agg,
    )

    def mk(ts_list, vals):
        return pd.DataFrame(
            {"ts": pd.to_datetime(ts_list, format="ISO8601"), "v": vals}
        )

    real = mk(["2024-01-01 00:30:00", "2024-01-01 01:30:00"], [1.0, 2.0])
    sentinel1 = mk(["2024-01-01 10:00:00"], [3.0])
    sentinel2 = mk(["2024-01-01 10:05:00"], [4.0])
    late = mk(["2024-01-01 00:45:00"], [100.0])
    stream = staged_file_stream(spark, [real, sentinel1, sentinel2, late])
    out = windowed_agg(
        stream,
        "ts",
        "1 hour",
        {"n": F.count(F.lit(1)), "s": F.sum("v")},
        watermark="1 hour",
    ).select("bucket", "n", "s")
    q = run_stream_to_memory(out, "late_drop_test", output_mode="append")
    q.stop()
    rows = {
        str(r["bucket"]): (r["n"], r["s"])
        for r in spark.table("late_drop_test").collect()
    }
    assert rows == {
        "2024-01-01 00:00:00": (1, 1.0),  # late v=100 dropped, not absorbed
        "2024-01-01 01:00:00": (1, 2.0),
    }
