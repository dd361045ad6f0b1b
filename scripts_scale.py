"""Materialize a synthetic sf1.0-equivalent dataset and spot-bench the
most expensive queries against it (dev utility, not shipped API).

The driver provides sf0.001/0.01/0.1; the 100 TB question the sf0.1
bench cannot answer is NONLINEARITY — a plan that is accidentally
O(n^2), or spills, shows a >>10x wall-clock ratio at 10x the rows.
This script builds ``/root/repo/.bench_sf1`` by replicating the sf0.1
fact tables 10x with shifted keys (dimension tables are copied as-is,
like TPC-H's fixed-size dims):

- ``lineitem``/``orders``: orderkey' = orderkey*10 + rep, all other
  columns preserved, so join fan-out and date selectivity scale
  exactly 10x.
- ``documents``: doc_id' = doc_id*10 + rep and a per-replica token is
  interleaved between words, so every replica is a DISTINCT document
  (distinct shingles/fingerprints) — corpus stats scale ~10x instead
  of creating an artificial 90%-duplicate corpus.
- ``events``: event_id' shifted, user_id preserved (10x denser
  sessions per user — the realistic direction).

Usage::

    python scripts_scale.py build   # write .bench_sf1 (once, ~1 min)
    python scripts_scale.py bench   # run the top-5 at sf0.1 and sf1.0
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.bench_sf1"
TOP5 = [
    "pipeline_pretraining",
    "q5_local_supplier",
    "expr_casts",
    "text_lm_score",
    "dedup_components",
    # round-3 additions that read a FULL scaled table (gates filtered
    # on doc_id < N shrink under the id-shifting replication and are
    # excluded — they'd measure less data at sf1.0, not more)
    "text_collocations",
    "decontaminate_bloom",
    "profile_heavy_hitters",
    "streaming_window",
    "events_funnel",
    # late round-3 additions: the iterative graph rounds and the
    # decimal moment aggregate are where superlinear behavior would
    # hide; sequence mining adds the user-window + vocab-count shape
    "graph_pagerank",
    "profile_corr",
    "events_sequences",
]
COPY = [
    "region", "nation", "customer", "supplier", "part", "embeddings",
]


def build() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    reps = spark.range(10).select(F.col("id").alias("__rep"))

    def rep10(df):
        return df.crossJoin(F.broadcast(reps))

    os.makedirs(DST, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    rep10(li).withColumn(
        "l_orderkey", F.col("l_orderkey") * 10 + F.col("__rep")
    ).drop("__rep").write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    o = spark.read.parquet(f"{SRC}/orders.parquet")
    rep10(o).withColumn(
        "o_orderkey", F.col("o_orderkey") * 10 + F.col("__rep")
    ).drop("__rep").write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    rep10(docs).withColumn(
        "doc_id", F.col("doc_id") * 10 + F.col("__rep")
    ).withColumn(
        "text",
        F.regexp_replace(
            F.col("text"), r"\s+", F.concat(F.lit(" zz"), F.col("__rep"), F.lit(" "))
        ),
    ).drop("__rep").write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    rep10(ev).withColumn(
        "event_id", F.col("event_id") * 10 + F.col("__rep")
    ).drop("__rep").write.mode("overwrite").parquet(f"{DST}/events.parquet")
    spark.stop()
    print("built", DST)


def bench() -> None:
    env = dict(os.environ, SPARK_GRAFT_QUERIES=",".join(TOP5))
    out = {}
    for label, sf_dir in [("sf0.1", SRC), ("sf1.0", DST)]:
        r = subprocess.run(
            [sys.executable, "/root/repo/bench.py"],
            env=dict(env, SPARK_GRAFT_SF_DIR=sf_dir),
            capture_output=True,
            text=True,
            check=True,
        )
        out[label] = json.loads(r.stdout.strip().splitlines()[-1])
        print(label, out[label])
    ratios = {
        q: round(out["sf1.0"]["queries"][q] / out["sf0.1"]["queries"][q], 2)
        for q in TOP5
    }
    print(json.dumps({"sf1_over_sf01_ratio": ratios}))


if __name__ == "__main__":
    {"build": build, "bench": bench}[sys.argv[1]]()
