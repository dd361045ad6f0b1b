"""Round-6 ninth batch: key-skew report, inter-arrival medians,
seasonal profile."""

from pyspark.sql import functions as F

from pandasy_spark.extended.profile import key_skew_report


def test_key_skew_report_values(spark):
    # key 'a' x 8, 'b' x 1, 'c' x 1 -> n_keys 3, rows 10, max 8
    rows = [("a",)] * 8 + [("b",)], [("c",)]
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",), ("c",)], "k string"
    )
    r = key_skew_report(df, "k").first()
    assert r["n_keys"] == 3
    assert r["n_rows"] == 10
    assert r["max_count"] == 8
    assert r["top1_permille"] == 800
    assert r["p50_count"] == 1
    assert r["p99_count"] == 8


def test_key_skew_null_key_counted(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "k string"
    )
    r = key_skew_report(df, "k").first()
    assert r["n_keys"] == 2
    assert r["max_count"] == 2


def test_interarrival_gate_positive_gaps(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    rows = QUERIES["events_interarrival"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q_value"] > 0
        assert r["n"] > 0


def test_seasonal_flag_rule(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    out = QUERIES["events_seasonal"](spark, sf_dir)
    pdf = out.toPandas()
    # replay the exact inequality in pandas and compare flags
    tot = pdf.groupby("event_type").agg(
        n_all=("n", "sum"), s_all=("value_cents", "sum")
    )
    for _, r in pdf.iterrows():
        t = tot.loc[r["event_type"]]
        expect = abs(
            5 * int(r["value_cents"]) * int(t["n_all"])
            - 5 * int(t["s_all"]) * int(r["n"])
        ) > int(t["s_all"]) * int(r["n"])
        assert bool(r["seasonal_flag"]) == expect
