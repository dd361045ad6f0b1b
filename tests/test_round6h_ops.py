"""Round-6 eighth batch: negative sampling, vocabulary growth, OOV
rate, sliding distinct."""

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.sampling import negative_pairs
from pandasy_spark.extended.text import oov_rate, vocab_growth


def test_negative_pairs_contract(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = negative_pairs(df, "doc_id", k=4, salt=1).collect()
    # negatives come from the corpus, never the anchor itself
    ids = set(range(50))
    for r in out:
        assert r["negative"] in ids
        assert r["negative"] != r["anchor"]
        assert 0 <= r["draw"] < 4
    # deterministic
    again = negative_pairs(df, "doc_id", k=4, salt=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # ~k pairs per anchor (self-draws drop, so <= k; most have k)
    per = {}
    for r in out:
        per[r["anchor"]] = per.get(r["anchor"], 0) + 1
    assert max(per.values()) <= 4
    assert sum(per.values()) >= 50 * 3
    with pytest.raises(ValueError):
        negative_pairs(df, "doc_id", k=0)


def test_negative_pairs_salt_varies(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = set(map(tuple, negative_pairs(df, "doc_id", 2, salt=1).collect()))
    b = set(map(tuple, negative_pairs(df, "doc_id", 2, salt=2).collect()))
    assert a != b


def test_vocab_growth_monotone(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b"),
            (2, "d"),
            (3, "a e f"),
        ],
        "doc_id long, text string",
    )
    rows = {r["quarter"]: r for r in vocab_growth(docs, quarters=4).collect()}
    # thresholds: 1, 2, 3, 4 docs
    assert rows[1]["vocab"] == 3  # a b c
    assert rows[2]["vocab"] == 3
    assert rows[3]["vocab"] == 4  # + d
    assert rows[4]["vocab"] == 6  # + e f
    assert all(
        rows[i]["vocab"] <= rows[i + 1]["vocab"] for i in range(1, 4)
    )
    with pytest.raises(ValueError):
        vocab_growth(docs, quarters=0)


def test_oov_rate_threshold(spark):
    docs = spark.createDataFrame(
        [
            (0, "en", "x x x y"),
            (1, "en", "x z"),
            (2, "de", "x q"),
        ],
        "doc_id long, lang string, text string",
    )
    # min_count=2: vocab = {x}; en: 6 tokens, oov = y,z = 2
    rows = {r["lang"]: r for r in oov_rate(docs, min_count=2).collect()}
    assert rows["en"]["total_tokens"] == 6
    assert rows["en"]["oov_tokens"] == 2
    assert rows["en"]["oov_permille"] == 333
    assert rows["de"]["oov_tokens"] == 1
    # global form (no group)
    g = oov_rate(docs, min_count=2, group_col=None).first()
    assert g["total_tokens"] == 8 and g["oov_tokens"] == 3
    with pytest.raises(ValueError):
        oov_rate(docs, min_count=0)


def test_sliding_distinct_window_math(spark, sf_dir):
    from pandasy_spark.workload import QUERIES

    out = QUERIES["events_sliding_distinct"](spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["n_users"] <= r["n_events"]
        delta = r["window_end"] - r["window_start"]
        assert delta.total_seconds() == 600
