"""Synthetic scale-up smoke: replicate sf tables 10x in-memory and run
the skew-critical operators.  This is the closest a local round gets
to "would it hold at 10x" — every replica shares content with its
siblings, so dedup fingerprints become deliberately HOT keys (the
exact shape the min_by partial-combine rewrite exists for)."""

import time

from pyspark.sql import functions as F

from pandasy_spark.sources import load_table


def _replicate(df, id_col, times=10):
    """times-x copies with distinct ids (id*times+k), identical text."""
    reps = df.sparkSession.range(times).select(F.col("id").alias("__rep"))
    return df.crossJoin(F.broadcast(reps)).withColumn(
        id_col, F.col(id_col) * times + F.col("__rep")
    ).drop("__rep")


def test_exact_dedup_on_hot_duplicate_keys_10x(spark, sf_dir):
    from pandasy_spark.extended.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    n_distinct = docs.select(
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    ).distinct().count()
    big = _replicate(docs, "doc_id", times=10)
    t0 = time.perf_counter()
    survivors = exact_dedup(big)
    n = survivors.count()
    elapsed = time.perf_counter() - t0
    # every content key now has >=10 copies (hot by construction);
    # survivors = distinct contents, and each survivor keeps the
    # minimum id (original id*10 + rep 0 of the smallest source doc)
    assert n == n_distinct
    assert elapsed < 120, f"hot-key dedup took {elapsed:.1f}s at 10x"
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan


def test_q1_partial_agg_holds_10x(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    li = load_table(spark, sf_dir, "lineitem")
    big = _replicate(li, "l_orderkey", times=10)
    big.createOrReplaceTempView("__li10x")
    # same aggregate shape as q1 over 10x rows: counts scale by exactly 10
    base = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    t0 = time.perf_counter()
    scaled = (
        big.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    elapsed = time.perf_counter() - t0
    assert {(r["l_returnflag"], r["l_linestatus"]): r["n"] * 10 for r in base} == {
        (r["l_returnflag"], r["l_linestatus"]): r["n"] for r in scaled
    }
    assert elapsed < 120, f"10x aggregate took {elapsed:.1f}s"


def test_span_dedup_hot_chunks_10x(spark, sf_dir):
    from pandasy_spark.extended.dedup import span_dedup

    docs = load_table(spark, sf_dir, "documents").limit(1000)
    big = _replicate(docs, "doc_id", times=10)
    t0 = time.perf_counter()
    out = span_dedup(big, "text", "doc_id", span_words=8)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    n_rows = out.count()
    elapsed = time.perf_counter() - t0
    assert n_rows == big.count()  # every doc gets a row
    # each replicated chunk survives exactly once corpus-wide, so the
    # kept total equals the DISTINCT chunk count of the 10x corpus
    distinct_chunks = (
        span_dedup(docs, "text", "doc_id", span_words=8)
        .agg(F.sum("n_kept"))
        .collect()[0][0]
    )
    assert total_kept == distinct_chunks
    assert elapsed < 120, f"hot-chunk span dedup took {elapsed:.1f}s at 10x"
