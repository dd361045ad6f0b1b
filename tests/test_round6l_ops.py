"""Round-6 twelfth batch: decimal arithmetic, levenshtein,
explode_outer, token-length quantiles."""

from pyspark.sql import functions as F


def test_decimal_parse_and_sum_is_exact(spark):
    # 0.1 + 0.2 style traps: decimal sums are exact where doubles drift
    df = spark.createDataFrame(
        [("0.10",), ("0.20",), ("0.30",)], "s string"
    )
    r = df.select(F.col("s").cast("decimal(18,2)").alias("d")).agg(
        F.sum("d").alias("t")
    ).first()
    assert str(r["t"]) == "0.60"


def test_explode_outer_keeps_empty_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, None)],
        "id long, arr array<string>",
    )
    rows = df.select("id", F.explode_outer("arr").alias("t")).collect()
    got = sorted((r["id"], r["t"]) for r in rows)
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]


def test_levenshtein_gate_histogram_total(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["expr_levenshtein"](spark, sf_dir).collect()
    from pandasy_spark.sources import load_table

    assert sum(r["n"] for r in rows) == load_table(spark, sf_dir, "part").count()


def test_length_quantiles_ordered(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["text_length_quantiles"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["q_milli"]] = r["q_value"]
    for lang, qs in by_lang.items():
        assert qs[250] <= qs[500] <= qs[900], lang
