"""Edge-case hardening for the text/dedup surface: empty strings,
whitespace-only text, single tokens, and unicode content must flow
through every operator without errors and with sane values."""

import pytest
from pyspark.sql import functions as F

import pandasy_spark.extended.dedup as X_dedup
import pandasy_spark.extended.text as X_text

EDGE_TEXTS = [
    (0, ""),
    (1, " "),
    (2, "   "),
    (3, "word"),
    (4, "two words"),
    (5, "a a a a a a"),
    (6, "café naïve über"),
    (7, "日本語 テスト"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, ["doc_id", "text"])


def test_text_stats_on_edges(edge_df):
    rows = {r["doc_id"]: r for r in X_text.with_text_stats(edge_df).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[2]["n_tokens"] == 0
    assert rows[3]["n_tokens"] == 1
    assert rows[6]["n_tokens"] == 3
    for r in rows.values():
        assert r["quality"] is not None
        assert r["fingerprint"] is not None


def test_repetition_stats_on_edges(edge_df):
    rows = {r["doc_id"]: r for r in X_text.repetition_stats(edge_df).collect()}
    assert rows[0]["dup_2gram_frac"] == 0.0
    assert rows[5]["dup_2gram_frac"] > 0.5  # "a a a..." is all-dup
    assert rows[5]["top_token_share"] == 1.0
    assert rows[3]["top_token_share"] == 1.0


def test_span_dedup_on_edges(spark, edge_df):
    out = {
        r["doc_id"]: r
        for r in X_dedup.span_dedup(edge_df, "text", "doc_id", 4).collect()
    }
    assert set(out) == set(range(8))  # every doc id survives
    assert out[3]["kept_text"] == "word"
    assert out[7]["kept_text"] == "日本語 テスト"


def test_lm_score_skips_sub_bigram_docs(spark, edge_df):
    ids = {
        r["doc_id"] for r in X_text.bigram_lm_score(edge_df, "text", "doc_id").collect()
    }
    # docs with <2 tokens have no bigrams and produce no row
    assert ids == {4, 5, 6, 7}


def test_minhash_and_simhash_run_on_edges(edge_df):
    sigs = X_dedup.minhash_signatures(edge_df, "doc_id", "text", num_hashes=8)
    assert sigs.count() >= 4  # docs with at least one shingle
    sim = edge_df.select(
        "doc_id", X_dedup.simhash(F.col("text")).alias("sh")
    ).collect()
    assert all(r["sh"] is not None for r in sim)


def test_fingerprint_distinguishes_unicode(edge_df):
    fps = {
        r["doc_id"]: r["fp"]
        for r in edge_df.select(
            "doc_id", X_text.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[6] != fps[7]
    # whitespace-only normalizes to the empty fingerprint class
    assert fps[1] == fps[2]


def test_canonicalize_url_rules(spark):
    from pandasy_spark.extended.text import canonicalize_url

    cases = {
        # host case + default port + fragment
        "HTTP://WWW.Ex.COM:80/a/b#frag": "http://www.ex.com/a/b",
        # https default port kept-host, non-default port preserved
        "https://Ex.com:443/x": "https://ex.com/x",
        "https://ex.com:8443/x": "https://ex.com:8443/x",
        # tracking params dropped, rest sorted, empty query dropped
        "http://e.com/p?utm_source=x&b=2&a=1&gclid=9": "http://e.com/p?a=1&b=2",
        "http://e.com/p?utm_source=x": "http://e.com/p",
        # trailing slash stripped except root; empty path -> root
        "http://e.com/a/": "http://e.com/a",
        "http://e.com/": "http://e.com/",
        "http://e.com": "http://e.com/",
        # ref is tracking, bare and valued
        "http://e.com/p?ref=abc&z=1&ref": "http://e.com/p?z=1",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got == cases


def test_kmeans_exact_matches_python(spark):
    """Grid-exact Lloyd's must reproduce a literal Python run of the
    same integer algorithm (seeds = smallest ids, floor-div means)."""
    import numpy as np

    from pandasy_spark.extended.similarity import kmeans_exact

    rng = np.random.default_rng(3)
    vecs = {i: rng.normal(size=4).astype(np.float32) for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["cluster"]: (r["n_members"], r["c_sum"], r["c_min"], r["c_max"])
        for r in kmeans_exact(df, k=3, iters=2).collect()
    }

    import math

    q = {i: [math.floor(float(x) * 1000 + 0.5) for x in v] for i, v in vecs.items()}
    cents = {i: q[i][:] for i in range(3)}
    asg = {}
    for _ in range(2):
        asg = {}
        for i, v in q.items():
            best = min(
                cents, key=lambda c: (sum((a - b) ** 2 for a, b in zip(v, cents[c])), c)
            )
            asg[i] = best
        new = {}
        for c in set(asg.values()):
            members = [q[i] for i in q if asg[i] == c]
            new[c] = [
                math.floor(sum(col) / len(members))
                for col in zip(*members)
            ]
        cents = new
    exp = {}
    for c, cv in cents.items():
        n = sum(1 for i in asg if asg[i] == c)
        exp[c] = (n, sum(cv), min(cv), max(cv))
    assert got == exp
