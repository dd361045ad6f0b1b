"""Tests for the round-3 operator additions: RAG chunking,
collocations, bloom decontamination, per-group reservoir sampling,
and BPE tokenizer inference.

Each has a DuckDB-oracle gate query in workload.py; these tests pin
the properties and edge cases the row-level gates can't state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended import dedup as X_dedup
from pandasy_spark.extended import sampling as X_samp
from pandasy_spark.extended import text as X_text


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunking_reconstruction(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    ch = X_text.chunk_documents(docs, size=100, overlap=20)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    chunks = {}
    for r in ch.collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert set(chunks) == set(texts)
    for did, rows in chunks.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        recon = rows[0]["chunk_text"] + "".join(
            r["chunk_text"][20:] for r in rows[1:]
        )
        assert recon == texts[did]
        # starts advance by the step; lengths are size except the tail
        for i, r in enumerate(rows):
            assert r["start"] == 1 + i * 80
            assert r["chunk_len"] == len(r["chunk_text"])
            if i < len(rows) - 1:
                assert r["chunk_len"] == 100


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, ""), (3, "x" * 100)], "doc_id long, text string"
    )
    rows = X_text.chunk_documents(df, size=50, overlap=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["chunk_text"] for r in by_doc[1]] == ["short"]
    assert [r["chunk_text"] for r in by_doc[2]] == [""]
    assert len(by_doc[3]) == 3  # starts 1, 41, 81


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        X_text.chunk_documents(df, size=10, overlap=10)


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------


def test_collocations_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c c")],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in X_text.collocations(df, min_count=2).collect()
    }
    # bigrams: (a,b)x2 + (b,a) + (a,b) + (b,c) + (c,c) => only (a,b) has >= 2
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    # 9 tokens total: a:3 b:3 c:3; 6 bigrams; pair_ct(a,b)=3
    assert (r["pair_ct"], r["ct1"], r["ct2"]) == (3, 3, 3)
    expected = math.log((3 / 6) / ((3 / 9) * (3 / 9)))
    assert abs(r["pmi"] - round(expected, 4)) < 1e-9


# ---------------------------------------------------------------------------
# bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_exact_vs_antijoin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter("doc_id % 7 = 0").select("text")
    out = X_dedup.bloom_decontaminate(docs, ev)
    expect = docs.join(ev.distinct(), "text", "left_anti")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in expect.collect()
    )


def test_bloom_exact_even_with_tiny_filter(spark, sf_dir):
    """A deliberately undersized bloom (1 word = 64 bits) floods the
    candidate set with false positives — the exact confirm join must
    still restore the exact result."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    ev = docs.filter("doc_id % 11 = 0").select("text")
    out = X_dedup.bloom_decontaminate(docs, ev, num_words=1, num_hashes=2)
    expect = docs.join(ev.distinct(), "text", "left_anti")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in expect.collect()
    )


def test_bloom_has_no_false_negatives(spark):
    """Every eval member must probe True — the bloom invariant the
    exactness argument rests on."""
    df = spark.createDataFrame(
        [(f"text number {i}",) for i in range(500)], "text string"
    )
    bloom = X_dedup.bloom_build(df)
    probed = df.crossJoin(F.broadcast(bloom)).select(
        X_dedup.bloom_might_contain(F.col("bloom"), F.col("text")).alias("hit")
    )
    assert probed.filter(~F.col("hit")).count() == 0


# ---------------------------------------------------------------------------
# reservoir_per_group
# ---------------------------------------------------------------------------


def test_reservoir_bounds_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = X_samp.reservoir_per_group(docs, ["lang"], "doc_id", k=4)
    b = X_samp.reservoir_per_group(docs, ["lang"], "doc_id", k=4)
    ra = sorted((r["lang"], r["doc_id"]) for r in a.collect())
    assert ra == sorted((r["lang"], r["doc_id"]) for r in b.collect())
    per = {}
    for lang, _ in ra:
        per[lang] = per.get(lang, 0) + 1
    assert all(v <= 4 for v in per.values())
    # salt changes the winners
    c = X_samp.reservoir_per_group(docs, ["lang"], "doc_id", k=4, salt=99)
    assert ra != sorted((r["lang"], r["doc_id"]) for r in c.collect())


def test_reservoir_sample_is_stable_under_growth(spark, sf_dir):
    """Hash priorities don't depend on the rest of the data: a winner
    can only be displaced by a new row with smaller priority, never by
    reshuffling — growing the corpus keeps any winner whose priority
    still ranks in the top k."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = docs.filter("doc_id < 100")
    win_small = {
        (r["lang"], r["doc_id"])
        for r in X_samp.reservoir_per_group(small, ["lang"], "doc_id", 3).collect()
    }
    win_full = {
        (r["lang"], r["doc_id"])
        for r in X_samp.reservoir_per_group(docs, ["lang"], "doc_id", 3).collect()
    }
    # every full-corpus winner with doc_id < 100 must also win on the subset
    assert {w for w in win_full if w[1] < 100} <= win_small


def test_reservoir_weighted_prefers_heavy_rows(spark):
    rows = [(i, "g", 1.0 if i else 1e9) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = X_samp.reservoir_per_group(df, ["g"], "id", k=5, weight_col="w")
    ids = {r["id"] for r in out.collect()}
    assert 0 in ids  # the 10^9-weight row essentially always survives
    assert len(ids) == 5


def test_reservoir_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "g")], "id long, g string")
    with pytest.raises(ValueError):
        X_samp.reservoir_per_group(df, ["g"], "id", k=0)


# ---------------------------------------------------------------------------
# tokenize_bpe
# ---------------------------------------------------------------------------


def _reference_encode(word: str, merges):
    """Independent BPE inference: apply merges in rank order, each one
    scanned left-to-right until exhausted (the original Sennrich
    formulation) — equivalent to lowest-rank-first greedy merging."""
    syms = list(word)
    for _rank, left, right, merged, _ct in sorted(merges):
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [merged]
            else:
                i += 1
    return syms


def test_tokenize_matches_reference_encoder(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    merges = X_text.bpe_learn(docs, num_merges=15)
    out = {
        r["doc_id"]: r
        for r in X_text.tokenize_bpe(docs, merges, keep_word_tokens=True).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    checked_words = 0
    for did, text in texts.items():
        words = text.split()
        if not words:
            assert did not in out
            continue
        r = out[did]
        assert r["n_words"] == len(words)
        expect = [_reference_encode(w, merges) for w in words]
        assert [list(t) for t in r["word_tokens"]] == expect
        assert list(r["tokens"]) == [t for w in expect for t in w]
        assert r["n_tokens"] == len(r["tokens"])
        checked_words += len(words)
    assert checked_words > 100


def test_tokenize_empty_merge_table_yields_chars(spark):
    df = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    r = X_text.tokenize_bpe(df, []).collect()[0]
    assert list(r["tokens"]) == ["a", "b", "c", "d"]
    assert (r["n_words"], r["n_tokens"]) == (2, 4)


# ---------------------------------------------------------------------------
# heavy_hitters (count-min prefilter)
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    from pandasy_spark.extended.profile import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(X_text.tokens(F.col("text"))).alias("w"))
    exact = sorted(
        (r["w"], r["count"])
        for r in words.groupBy("w").count().filter("count >= 50").collect()
    )
    got = sorted(
        (r["w"], r["ct"]) for r in heavy_hitters(words, "w", 50).collect()
    )
    assert got == exact and len(exact) > 0


def test_heavy_hitters_exact_with_tiny_sketch(spark, sf_dir):
    """A 2x8 sketch collides massively — candidates balloon but the
    exact confirm pass must still produce the exact answer."""
    from pandasy_spark.extended.profile import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(X_text.tokens(F.col("text"))).alias("w"))
    exact = sorted(
        (r["w"], r["count"])
        for r in words.groupBy("w").count().filter("count >= 50").collect()
    )
    got = sorted(
        (r["w"], r["ct"])
        for r in heavy_hitters(words, "w", 50, depth=2, width=8).collect()
    )
    assert got == exact


def test_heavy_hitters_rejects_bad_min_count(spark):
    from pandasy_spark.extended.profile import heavy_hitters

    df = spark.createDataFrame([("a",)], "w string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "w", 0)


# ---------------------------------------------------------------------------
# embedding_pca
# ---------------------------------------------------------------------------


def test_embedding_pca_matches_numpy(spark, sf_dir):
    import numpy as np

    from pandasy_spark.extended.similarity import embedding_pca

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out, eigvals, comp = embedding_pca(emb, k=4)
    rows = {r["vec_id"]: np.array(r["proj"]) for r in out.collect()}

    pdf = emb.toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mu = X.mean(axis=0)
    C = np.cov(X.T, bias=True)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:4]
    V = vecs[:, order]
    for c in range(4):
        j = int(np.argmax(np.abs(V[:, c])))
        if V[j, c] < 0:
            V[:, c] = -V[:, c]
    ref = (X - mu) @ V
    got = np.stack([rows[i] for i in pdf["vec_id"].to_numpy()])
    assert np.abs(got - ref).max() < 1e-8
    assert np.abs(np.sort(vals)[::-1][:4] - eigvals).max() < 1e-12
    # model invariants: orthonormal components, decreasing eigenvalues
    assert np.abs(comp.T @ comp - np.eye(4)).max() < 1e-10
    assert all(eigvals[i] >= eigvals[i + 1] for i in range(3))


def test_pca_moments_empty_raises(spark):
    from pandasy_spark.extended.similarity import pca_moments

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca_moments(df)


# ---------------------------------------------------------------------------
# funnel / retention_cohorts
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering(spark):
    import datetime as dt

    from pandasy_spark.extended.events import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full funnel in order
        (1, t(0), "signup"), (1, t(5), "purchase"), (1, t(9), "error"),
        # user 2: purchase BEFORE signup must not count; no later purchase
        (2, t(3), "purchase"), (2, t(4), "signup"),
        # user 3: signup only
        (3, t(1), "signup"),
        # user 4: never signed up -> absent from output
        (4, t(2), "purchase"),
        # user 5: error between signup and purchase counts only if a
        # NEW error follows the purchase
        (5, t(0), "signup"), (5, t(1), "error"), (5, t(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in funnel(df, ["signup", "purchase", "error"]).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["steps_completed"] == 3
    assert out[1]["t_2"] == t(9)
    assert out[2]["steps_completed"] == 1 and out[2]["t_1"] is None
    assert out[3]["steps_completed"] == 1
    assert out[5]["steps_completed"] == 2 and out[5]["t_2"] is None


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pytest

    from pandasy_spark.extended.events import funnel

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError):
        funnel(df, [])


def test_retention_hand_computed(spark):
    import datetime as dt

    from pandasy_spark.extended.events import retention_cohorts

    # weeks starting Mon 2024-01-01 and Mon 2024-01-08
    w0, w1 = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 10)
    rows = [
        (1, w0, "x"), (1, w1, "x"),   # cohort w0, active offsets {0, 1}
        (2, w0, "x"),                 # cohort w0, offset {0}
        (3, w1, "x"),                 # cohort w1, offset {0}
        (1, w0 + dt.timedelta(days=1), "x"),  # same week, distinct-folded
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    mon0, mon1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    assert got == {(mon0, 0): 2, (mon0, 1): 1, (mon1, 0): 1}


def test_retention_rejects_bad_period(spark):
    import pytest as _pytest

    from pandasy_spark.extended.events import retention_cohorts

    df = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
    with _pytest.raises(ValueError):
        retention_cohorts(df, period="fortnight")


def test_reservoir_null_ids_lose_deterministically(spark):
    rows = [(None, "g"), (1, "g"), (2, "g"), (3, "g")]
    df = spark.createDataFrame(rows, "id long, g string")
    out = {r["id"] for r in
           X_samp.reservoir_per_group(df, ["g"], "id", k=3).collect()}
    # NULL id gets the max priority: never selected while non-NULL rows fill k
    assert out == {1, 2, 3}


def test_chunking_null_text_yields_one_null_chunk(spark):
    """greatest() ignores NULLs in BOTH Spark and DuckDB, so a NULL
    text emits exactly one chunk row with NULL chunk_text — the same
    row the SQL oracle derives (verified cross-engine)."""
    df = spark.createDataFrame(
        [(1, "hello"), (2, None)], "doc_id long, text string"
    )
    rows = X_text.chunk_documents(df, size=10, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["chunk_text"] for r in by_doc[1]] == ["hello"]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] is None


# ---------------------------------------------------------------------------
# containment_pairs / inverted index search
# ---------------------------------------------------------------------------


def test_containment_is_directional(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "a", "en"),
            (2, "the quick brown fox jumps over the lazy dog tonight", "a", "en"),
            (3, "completely different words here", "a", "en"),
        ],
        "doc_id long, text string, source string, lang string",
    )
    out = {
        (r["id1"], r["id2"]): r["containment"]
        for r in X_dedup.containment_pairs(
            df, ["source", "lang"], threshold=0.5
        ).collect()
    }
    # doc1's shingles are (almost) all inside doc2, not vice versa
    assert out[(1, 2)] > 0.9
    assert (2, 1) not in out or out[(2, 1)] < out[(1, 2)]
    assert not any(3 in k for k in out)


def test_inverted_index_search_and_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "spark data query engine"),
            (2, "spark data"),           # missing 'query' -> excluded
            (3, "query data spark spark data query"),  # tf 6 over terms
        ],
        "doc_id long, text string",
    )
    idx = X_text.build_inverted_index(df)
    got = {r["doc_id"]: r["score"] for r in
           X_text.search_index(idx, ["spark", "data", "query"]).collect()}
    assert got == {1: 3, 3: 6}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        X_text.search_index(idx, [])


def test_bucketed_index_search_prunes_buckets(spark, sf_dir, tmp_path):
    """The 100 TB search story: the inverted index persisted as a
    table bucketed on token lets a conjunctive search scan only the
    buckets holding the query terms (SelectedBucketsCount in the scan)
    instead of the whole index."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    idx = X_text.build_inverted_index(docs)
    from pandasy_spark.sources.sinks import write_bucketed_table

    spark.sql("DROP TABLE IF EXISTS inv_idx_test")
    write_bucketed_table(idx, "inv_idx_test", ["token"], 8)
    table = spark.table("inv_idx_test")
    out = X_text.search_index(table, ["data", "spark"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan[:2000]
    # and the pruned search still returns the same answer as unbucketed
    expect = sorted(map(tuple, X_text.search_index(idx, ["data", "spark"]).collect()))
    assert sorted(map(tuple, out.collect())) == expect
    spark.sql("DROP TABLE IF EXISTS inv_idx_test")


# ---------------------------------------------------------------------------
# asof directions / dq_check / scd2_apply
# ---------------------------------------------------------------------------


def test_asof_directions_and_tolerance_vs_bruteforce(spark):
    from pandasy_spark.operators import asof_join

    lrows = [(1, 10.0, "a"), (1, 25.0, "b"), (2, 5.0, "c"), (3, 7.0, "d")]
    rrows = [(1, 8.0, 100), (1, 12.0, 200), (1, 30.0, 300), (2, 6.0, 400)]
    left = spark.createDataFrame(lrows, "k long, t double, lbl string")
    right = spark.createDataFrame(rrows, "k long, t double, v int")

    def brute(direction, tol):
        out = {}
        for k, lt, lbl in lrows:
            cands = [(rt, v) for rk, rt, v in rrows if rk == k]
            back = [c for c in cands if c[0] <= lt]
            fwd = [c for c in cands if c[0] >= lt]
            b = max(back, key=lambda c: c[0]) if back else None
            f = min(fwd, key=lambda c: c[0]) if fwd else None
            if tol is not None:
                if b and abs(lt - b[0]) > tol:
                    b = None
                if f and abs(lt - f[0]) > tol:
                    f = None
            if direction == "backward":
                pick = b
            elif direction == "forward":
                pick = f
            else:  # nearest, ties backward
                if b and f:
                    pick = f if abs(lt - f[0]) < abs(lt - b[0]) else b
                else:
                    pick = b or f
            out[(k, lbl)] = pick
        return out

    for direction in ["backward", "forward", "nearest"]:
        for tol in [None, 3.0]:
            got = {
                (r["k"], r["lbl"]): (
                    None if r["asof_t"] is None else (r["asof_t"], r["asof_v"])
                )
                for r in asof_join(
                    left, right, ["k"], "t", "t", how="left",
                    direction=direction, tolerance=tol,
                ).collect()
            }
            assert got == brute(direction, tol), (direction, tol)


def test_asof_nearest_tie_goes_backward(spark):
    from pandasy_spark.operators import asof_join

    left = spark.createDataFrame([(1, 10.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 8.0, "back"), (1, 12.0, "fwd")], "k long, t double, tag string"
    )
    r = asof_join(
        left, right, ["k"], "t", "t", direction="nearest"
    ).collect()[0]
    assert r["asof_tag"] == "back"


def test_dq_check_report(spark):
    from pandasy_spark.extended.profile import dq_check

    df = spark.createDataFrame(
        [(1, 5.0, "x"), (2, None, "y"), (2, 70.0, "z"), (3, 10.0, None)],
        "id long, val double, cat string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    report = {
        (r["rule"], r["target"]): (r["violations"], r["total"], r["passed"])
        for r in dq_check(
            df,
            [
                ("not_null", "cat"),
                ("in_range", "val", 0, 50),
                ("accepted_values", "cat", ["x", "y", "z"]),
                ("unique", ["id"]),
                ("ref_integrity", "id", ref, "id"),
            ],
        ).collect()
    }
    assert report[("not_null", "cat")] == (1, 4, False)
    # NULL val violates in_range; 70 violates range
    assert report[("in_range", "val")] == (2, 4, False)
    assert report[("accepted_values", "cat")] == (1, 4, False)
    assert report[("unique", "id")] == (2, 4, False)  # both id=2 rows
    assert report[("ref_integrity", "id")] == (1, 4, False)  # id=3 orphan

    clean = spark.createDataFrame([(1, 1.0, "x")], "id long, val double, cat string")
    ok = dq_check(clean, [("not_null", "cat"), ("unique", ["id"])]).collect()
    assert all(r["passed"] for r in ok)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dq_check(clean, [])
    with _pytest.raises(ValueError):
        dq_check(clean, [("made_up_rule", "cat")])


def test_scd2_apply_all_transitions(spark):
    import datetime as dt

    from pandasy_spark.operators import scd2_apply

    d0, d1 = dt.date(2024, 1, 1), dt.date(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "alice", 100.0, d0, None, True),
            (2, "bob", None, d0, None, True),      # NULL tracked value
            (3, "carol", 300.0, d0, None, True),
            (1, "alice", 50.0, dt.date(2023, 1, 1), d0, False),  # history
        ],
        "k long, name string, bal double, eff_from date, eff_to date,"
        " is_current boolean",
    )
    snap = spark.createDataFrame(
        [
            (1, "alice", 150.0),  # changed
            (2, "bob", None),     # unchanged (null-safe equal)
            (4, "dan", 400.0),    # new key; key 3 absent -> untouched
        ],
        "k long, name string, bal double",
    )
    rows = sorted(map(tuple, scd2_apply(dim, snap, ["k"], ["name", "bal"], d1).collect()))
    assert rows == sorted(
        [
            (1, "alice", 50.0, dt.date(2023, 1, 1), d0, False),
            (1, "alice", 100.0, d0, d1, False),
            (1, "alice", 150.0, d1, None, True),
            (2, "bob", None, d0, None, True),
            (3, "carol", 300.0, d0, None, True),
            (4, "dan", 400.0, d1, None, True),
        ]
    )


def test_pack_manifest_covers_every_chunk_token(spark, sf_dir):
    from pandasy_spark.extended.sampling import chunk_pack, pack_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = docs.select(
        "doc_id", F.size(X_text.tokens(F.col("text"))).alias("n_tok")
    )
    packed = chunk_pack(t, "doc_id", "n_tok", budget=128)
    man = {r["chunk"]: r for r in pack_manifest(packed).collect()}
    total = t.filter("n_tok > 0").agg(F.sum("n_tok")).collect()[0][0]
    # every full chunk holds exactly 128 tokens; the tail holds the rest
    sizes = sorted((c, r["n_tokens"]) for c, r in man.items())
    assert sum(s for _, s in sizes) == total
    assert all(s == 128 for _, s in sizes[:-1])
    # segments string matches n_docs and is ordered by doc id
    for r in man.values():
        segs = r["segments"].split(";")
        assert len(segs) == r["n_docs"]
        ids = [int(s.split(":")[0]) for s in segs]
        assert ids == sorted(ids)
