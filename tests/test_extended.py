"""Extended operators: correctness on planted duplicates/near-dups and
known-geometry vectors (things the sf-table oracles can't probe)."""

import math

import pytest
from pyspark.sql import functions as F

from pandasy_spark.convert import to_df
from pandasy_spark.extended import dedup as X_dedup
from pandasy_spark.extended import multimodal as X_mm
from pandasy_spark.extended import similarity as X_sim
from pandasy_spark.extended import text as X_text


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")  # one-word change
    other = "completely different content about spark engines " * 8
    rows = [
        [1, base],
        [2, base],          # exact duplicate of 1
        [3, near],          # near duplicate of 1
        [4, other],
        [5, base + " tail"],  # near duplicate with suffix
    ]
    return to_df(spark, rows, "doc_id:long,text:str")


def test_exact_dedup_keeps_lowest_id(spark):
    df = _docs(spark)
    out = X_dedup.exact_dedup(df)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5]  # doc 2 removed (exact dup of 1)


def test_ngram_jaccard_finds_near_dups(spark):
    df = _docs(spark)
    pairs = X_dedup.ngram_jaccard_pairs(df, threshold=0.7)
    got = {(r["id1"], r["id2"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in got and got[(1, 3)] >= 0.7
    assert (1, 5) in got
    assert all(4 not in p for p in got)  # unrelated doc never pairs


def test_minhash_lsh_finds_near_dups_without_full_cross(spark):
    df = _docs(spark)
    pairs = X_dedup.minhash_dedup_pairs(
        df, num_hashes=32, bands=8, threshold=0.5
    )
    got = {(r["id1"], r["id2"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0  # identical signatures
    assert (1, 3) in got  # near dup surfaces via shared bands
    assert all(4 not in p for p in got)


def test_minhash_estimate_tracks_exact_jaccard(spark):
    df = _docs(spark)
    exact = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in X_dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    est = {
        (r["id1"], r["id2"]): r["est_jaccard"]
        for r in X_dedup.minhash_dedup_pairs(df, threshold=0.0).collect()
    }
    for pair, e in est.items():
        assert abs(e - exact[pair]) < 0.35  # 32 hashes -> coarse but close


def test_simhash_identical_docs_zero_hamming(spark):
    df = _docs(spark)
    pairs = X_dedup.simhash_candidate_pairs(df, bits=32, blocks=4)
    got = {(r["id1"], r["id2"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0
    if (1, 3) in got:
        assert got[(1, 3)] <= 8  # near dup: small hamming distance


def test_cosine_topk_known_geometry(spark):
    rows = [
        [0, [1.0, 0.0, 0.0]],   # query
        [10, [1.0, 0.0, 0.0]],  # identical -> sim 1
        [11, [0.0, 1.0, 0.0]],  # orthogonal -> sim 0
        [12, [-1.0, 0.0, 0.0]], # opposite -> sim -1
        [13, [1.0, 1.0, 0.0]],  # 45 degrees -> ~0.7071
    ]
    df = to_df(spark, rows, "vec_id:long,embedding:[double]")
    out = X_sim.cosine_topk(
        df.filter(F.col("vec_id") >= 10),
        df.filter(F.col("vec_id") < 10),
        k=4,
        query_id_col="vec_id",
    )
    by_id = {r["id"]: (r["sim"], r["rk"]) for r in out.collect()}
    assert by_id[10] == (1.0, 1)
    assert by_id[13][0] == pytest.approx(0.7071, abs=1e-4)
    assert by_id[11] == (0.0, 3)
    assert by_id[12] == (-1.0, 4)


def test_lsh_recall_against_bruteforce(spark, sf_dir):
    from pandasy_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = X_sim.cosine_topk(corpus, queries, k=5, query_id_col="vec_id")
    approx = X_sim.lsh_cosine_topk(
        corpus, queries, k=5, query_id_col="vec_id", planes=4, tables=8
    )
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    # weakly-clustered random vectors are LSH's worst case; multi-table
    # OR (8 tables x 4 planes) must still recover a solid fraction
    assert len(a & e) / len(e) > 0.3
    assert len(a) <= len(e)


def test_multimodal_plumbing(spark):
    df = to_df(spark, [[1, "hello world"], [2, ""]], "doc_id:long,text:str")
    out = X_mm.extract_features(X_mm.with_binary_payload(df))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["byte_len"] == 11
    assert rows[1]["width"] == 11 and rows[1]["height"] == 77
    assert rows[2]["byte_len"] == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "byte_len", "width", "height", "n_frames",
    ]


def test_multimodal_decode_boundaries():
    # baseline JPEG decodes natively now (extended/jpeg.py), so a
    # truncated JPEG is a MALFORMED payload (quarantine drop); lossless
    # WebP (VP8L) decodes natively too, so only LOSSY WebP (VP8/VP8X)
    # stays NotImplementedError
    with pytest.raises(X_mm.DECODE_ERRORS):
        X_mm.decode_image(b"\xff\xd8\xff\xe0jpeg")
    with pytest.raises(NotImplementedError):
        X_mm.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_text_kernels_edge_cases(spark):
    df = to_df(
        spark,
        [[1, ""], [2, "   "], [3, "one"], [4, "a b  c"], [5, None]],
        "doc_id:long,text:str",
    )
    out = X_text.with_text_stats(df).toPandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 0
    assert out.loc[2, "n_tokens"] == 0
    assert out.loc[3, "n_tokens"] == 1
    assert out.loc[4, "n_tokens"] == 3
    assert out.loc[4, "avg_token_len"] == 1.0
    # identical normalized content -> identical fingerprint
    df2 = to_df(
        spark, [[1, "A  b"], [2, "a b"]], "doc_id:long,text:str"
    )
    fps = [r["fp"] for r in df2.select(X_text.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_lang_id_markers(spark):
    df = to_df(
        spark,
        [
            [1, "the cat and the dog of the house"],
            [2, "der hund und die katze ist hier"],
            [3, "le chat et les chiens des villes"],
            [4, "xyz qwerty"],
        ],
        "doc_id:long,text:str",
    )
    out = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", X_text.lang_id(F.col("text")).alias("lang")
    ).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"


def test_approx_aggs_within_bounds(spark, sf_dir):
    """agg_approx is a self-certifying gate: the plan computes both
    the sketch and its exact twin and emits per-group bound booleans.
    The test pins those booleans (and the exact anchors' sanity)."""
    from pandasy_spark.sources import load_table
    from pandasy_spark.workload import QUERIES

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    rows = QUERIES["agg_approx"](spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        assert r["hll_ok"] is True
        assert r["p50_ok"] is True
        assert r["exact_parts"] == exact[r["l_returnflag"]]
        assert r["ct"] > 0


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    from pandasy_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = X_sim.cosine_topk(corpus, queries, k=5, query_id_col="vec_id")
    approx = X_sim.ivf_topk(
        corpus, queries, k=5, n_clusters=8, nprobe=4, query_id_col="vec_id"
    )
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    # probing half the clusters must recover a solid fraction even on
    # weakly-clustered random vectors
    assert len(a & e) / len(e) >= 0.4
    assert len(a) <= len(e)


def test_kmeans_centroids_shape(spark, sf_dir):
    from pandasy_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = X_sim.kmeans_centroids(emb, k=8, iters=2).collect()
    assert len(cents) <= 8  # empty clusters may drop out
    dims = {len(r["cv"]) for r in cents}
    assert dims == {64}
    assert len({r["cluster"] for r in cents}) == len(cents)


def test_sample_frames_expansion(spark):
    # 47 bytes -> fake decoder says 47 % 30 = 17 frames, stride 2;
    # every 5th frame sampled -> idx 0,5,10,15
    text_47 = "x" * 47
    df = to_df(spark, [[1, text_47], [2, "y" * 30]], "doc_id:long,text:str")
    out = X_mm.sample_frames(X_mm.with_binary_payload(df), every_n=5, fps=30.0)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["frame_idx"]))
    # doc 2: 30 % 30 == 0 frames -> contributes nothing (row-expanding 1->0)
    assert [r["doc_id"] for r in rows] == [1, 1, 1, 1]
    assert [r["frame_idx"] for r in rows] == [0, 5, 10, 15]
    # ts at 30 fps: int(idx * 1000 / 30)
    assert [r["frame_ts_ms"] for r in rows] == [0, 166, 333, 500]
    # stride = 47 // 17 = 2; frame at idx 15 starts at byte 30 -> 16 bytes left
    assert [len(r["frame"]) for r in rows] == [16, 16, 16, 16]
    assert bytes(rows[0]["frame"]) == b"x" * 16


def test_audio_features_arithmetic(spark):
    df = to_df(spark, [[1, "a" * 32000], [2, "b"]], "doc_id:long,text:str")
    out = {r["doc_id"]: r for r in
           X_mm.audio_features(X_mm.with_binary_payload(df)).collect()}
    assert out[1]["n_samples"] == 16000 and out[1]["duration_ms"] == 1000
    assert out[2]["n_samples"] == 0 and out[2]["duration_ms"] == 0


def test_rolling_dup_pairs_bucket_edges(spark):
    """Pairs straddling a bucket boundary are found exactly once; pairs
    outside the window are excluded."""
    from pandasy_spark.convert import to_df

    rows = [
        [1, "u", "2020-01-01 00:09:59"],
        [2, "u", "2020-01-01 00:10:01"],   # 2s after id1, crosses 600s bucket edge
        [3, "u", "2020-01-01 00:30:00"],   # >600s from both
        [4, "v", "2020-01-01 00:10:00"],   # different key
    ]
    df = to_df(spark, rows, "event_id:long,k:str,ts:datetime")
    pairs = X_dedup.rolling_dup_pairs(df, "event_id", ["k"], "ts", 600)
    got = sorted((r["id1"], r["id2"]) for r in pairs.collect())
    assert got == [(1, 2)]


def test_cosine_dup_pairs_lsh_blocked_recall(spark, sf_dir):
    """The LSH-blocked pair finder must (a) return a subset of the
    exact pairs with identical sims, (b) recover most of them, and
    (c) never plan a cartesian product."""
    from pandasy_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    exact = {
        (r["id1"], r["id2"]): r["sim"]
        for r in X_sim.cosine_dup_pairs(emb, threshold=0.40, exact=True).collect()
    }
    blocked_df = X_sim.cosine_dup_pairs(emb, threshold=0.40)  # LSH default
    blocked = {(r["id1"], r["id2"]): r["sim"] for r in blocked_df.collect()}
    assert set(blocked) <= set(exact)
    for k, v in blocked.items():
        assert v == exact[k]
    assert len(exact) > 0
    # threshold 0.40 on random vectors is a stress case (pairs sit just
    # above threshold, where bucket-collision probability is lowest);
    # the default 4 planes x 8 tables is tuned for near-dup thresholds
    # (>=0.8, where expected recall is >0.99)
    assert len(blocked) / len(exact) >= 0.4
    wide = {
        (r["id1"], r["id2"])
        for r in X_sim.cosine_dup_pairs(
            emb, threshold=0.40, lsh_planes=3, lsh_tables=8
        ).collect()
    }
    assert wide <= set(exact)
    assert len(wide) / len(exact) >= 0.6  # fewer planes -> higher recall
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_resize_images_fixed_output_size(spark):
    df = to_df(spark, [[1, "a" * 10000], [2, "b" * 100]], "doc_id:long,text:str")
    out = {
        r["doc_id"]: r
        for r in X_mm.resize_images(
            X_mm.with_binary_payload(df), out_w=32, out_h=32
        ).collect()
    }
    assert len(bytes(out[1]["resized"])) == 32 * 32  # strided downsample
    assert len(bytes(out[2]["resized"])) == 32 * 32  # zero-padded upsample
    assert bytes(out[2]["resized"])[:100] == b"b" * 100
    assert out[1]["out_w"] == 32 and out[1]["out_h"] == 32


def test_quadratic_guard_blocks_unbounded_exact_paths(spark):
    """The exact O(n^2) kernels refuse inputs above max_rows unless the
    caller explicitly opts into an unbounded run (VERDICT r1: scalable
    paths are the defaults, exact kernels are gated)."""
    import pytest

    df = to_df(spark, [[i, "text %d" % i] for i in range(30)], "doc_id:long,text:str")
    with pytest.raises(ValueError, match="quadratic"):
        X_dedup.ngram_jaccard_pairs(df, max_rows=10)
    # explicit unbounded opt-in runs
    X_dedup.ngram_jaccard_pairs(df, threshold=0.99, max_rows=None).collect()

    emb = to_df(
        spark,
        [[i, [float(i), 1.0, 0.5]] for i in range(30)],
        "vec_id:long,embedding:[double]",
    )
    with pytest.raises(ValueError, match="quadratic"):
        X_sim.cosine_dup_pairs(emb, threshold=0.9, exact=True, exact_max_rows=10)
    with pytest.raises(ValueError, match="exact=True"):
        X_sim.cosine_dup_pairs(emb, threshold=0.9, lsh_planes=0)


def test_dedup_against_index_incremental(spark):
    """Incremental dedup: new docs sharing any LSH band bucket with the
    indexed corpus are dropped; genuinely novel docs survive; indexing
    a corpus against itself drops every doc."""
    corpus = to_df(
        spark,
        [
            [1, "the quick brown fox jumps over the lazy dog again and again"],
            [2, "pack my box with five dozen liquor jugs for the trip home"],
        ],
        "doc_id:long,text:str",
    )
    new = to_df(
        spark,
        [
            # near-copy of doc 1 -> must be dropped
            [10, "the quick brown fox jumps over the lazy dog again and again!"],
            # unrelated text -> must survive
            [11, "zebras graze quietly while violet thunderclouds gather east"],
        ],
        "doc_id:long,text:str",
    )
    idx = X_dedup.minhash_index(corpus, num_hashes=32, bands=16)
    out = X_dedup.dedup_against_index(new, idx, num_hashes=32, bands=16)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 10 not in ids
    assert ids == [11]
    # self-dedup: every corpus doc shares all its buckets with itself
    self_out = X_dedup.dedup_against_index(corpus, idx, num_hashes=32, bands=16)
    assert self_out.count() == 0
    # the index side never touches new-doc text: plan joins on
    # (band, bucket) hash keys only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Python" not in plan


def test_quantized_knn_recall_and_layout(spark, sf_dir):
    """int8-quantized ANN: codes really are array<tinyint> (the 4x
    memory claim), scores stay within quantization error of the exact
    float path, and top-5 recall vs exact brute force is high."""
    from pandasy_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 10)

    qz = X_sim.quantize_embeddings(emb)
    el = qz.schema["codes"].dataType.elementType.simpleString()
    assert el == "tinyint", el

    exact = X_sim.cosine_topk(corpus, queries, k=5, query_id_col="vec_id")
    quant = X_sim.quantized_cosine_topk(
        corpus, queries, k=5, query_id_col="vec_id"
    )
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    q = {(r["query_id"], r["id"]) for r in quant.collect()}
    recall = len(e & q) / len(e)
    assert recall >= 0.8, recall


def test_redact_pii_handcrafted(spark):
    df = to_df(
        spark,
        [
            [1, "mail me at jo.doe+x@site.org or call 555-123-4567 now"],
            [2, "ssn 123-45-6789 from host 10.0.255.7 twice 10.0.255.7"],
            [3, "nothing sensitive here"],
        ],
        "doc_id:long,text:str",
    )
    out = {r["doc_id"]: r for r in X_text.redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "[EMAIL]" in out[1]["text_redacted"]
    assert "[PHONE]" in out[1]["text_redacted"]
    assert "jo.doe" not in out[1]["text_redacted"]
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 2
    assert out[2]["text_redacted"].count("[IPV4]") == 2
    # ssn redacted as [SSN], not mis-tagged by the generic phone rule
    assert "[SSN]" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == "nothing sensitive here"
    assert out[3]["n_email"] == out[3]["n_phone"] == 0


def test_repetition_stats_handcrafted(spark):
    df = to_df(
        spark,
        [
            [1, "spam spam spam spam"],        # one token repeated
            [2, "all words here are unique"],  # no repetition
            [3, ""],                            # degenerate
        ],
        "doc_id:long,text:str",
    )
    out = {r["doc_id"]: r for r in X_text.repetition_stats(df).collect()}
    # doc 1: 3 bigrams all "spam spam" -> 2/3 duplicated; top share 1.0
    assert abs(out[1]["dup_2gram_frac"] - 2 / 3) < 1e-3
    assert out[1]["top_token_share"] == 1.0
    assert out[2]["dup_2gram_frac"] == 0.0
    assert abs(out[2]["top_token_share"] - 0.2) < 1e-9
    assert out[3]["dup_2gram_frac"] == 0.0 and out[3]["top_token_share"] == 0.0


def test_ngram_contamination_handcrafted(spark):
    bench = to_df(
        spark,
        [[100, "the capital of france is paris and it is lovely"]],
        "doc_id:long,text:str",
    )
    train = to_df(
        spark,
        [
            # contains the 5-gram "the capital of france is"
            [1, "we know the capital of france is paris obviously"],
            # no shared 5-gram
            [2, "completely unrelated training text about cooking rice"],
        ],
        "doc_id:long,text:str",
    )
    out = {r["doc_id"]: r["n_shared"] for r in
           X_dedup.ngram_contamination(train, bench, n=5).collect()}
    assert 1 in out and out[1] >= 2  # overlapping 5-gram window(s)
    assert 2 not in out


def test_ngram_builders_empty_below_n(spark):
    """Strings shorter than n must yield EMPTY gram arrays — Spark's
    sequence(1, 0) counts DOWN, which silently produced junk shingles
    for 1..n-1-char inputs before the guard."""
    df = to_df(
        spark,
        [[1, "ab"], [2, ""], [3, "abc"], [4, "one two"]],
        "doc_id:long,text:str",
    )
    sh = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", X_dedup.shingles(F.col("text"), 3).alias("s")
        ).collect()
    }
    assert sh[1] == [] and sh[2] == []
    assert sh[3] == ["abc"]
    # minhash silently drops gram-less docs rather than erroring
    sigs = X_dedup.minhash_signatures(df, num_hashes=4)
    assert sorted(r["id"] for r in sigs.collect()) == [3, 4]
    from pandasy_spark.extended.text import word_ngrams

    wg = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", word_ngrams(F.col("text"), 2).alias("g")
        ).collect()
    }
    assert wg[1] == [] and wg[2] == [] and wg[3] == []
    assert wg[4] == ["one two"]


def test_winnowing_guarantee_and_locality(spark):
    """Winnowing guarantee: a shared substring of length >= w + k - 1
    (here 8) always yields a shared fingerprint — even when the rest
    of the documents are completely different (local overlap, which
    whole-document MinHash similarity would miss)."""
    shared = "EXACT COPIED PHRASE"
    df = to_df(
        spark,
        [
            [1, "left document " + shared + " with its own tail words"],
            [2, "totally different beginning " + shared + " other ending"],
            [3, "no overlap with anything else whatsoever in here"],
        ],
        "doc_id:long,text:str",
    )
    pairs = {
        (r["id1"], r["id2"]): r["n_shared"]
        for r in X_dedup.winnow_dup_pairs(df, k=5, w=4, min_shared=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # sketch density: far fewer fingerprints than k-grams
    fps = X_dedup.winnow_fingerprints(df, k=5, w=4)
    n_fp = fps.count()
    total_grams = sum(
        len(r["text"]) - 4 for r in df.collect()
    )
    assert 0 < n_fp < total_grams


def test_quality_quantile_threshold_tracks_exact_percentile(spark, sf_dir):
    """The approx-sketch scale twin keeps ~the same per-group fraction
    as the exact percent_rank path, and at accuracy=10k on 500 docs the
    kept SETS are identical (sketch is exact below its accuracy)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = X_text.with_text_stats(docs).select("doc_id", "lang", "quality")
    exact = X_text.quality_percentile_filter(scored, keep_frac=0.75)
    approx = X_text.quality_quantile_threshold(scored, keep_frac=0.75)
    n_total = scored.count()
    n_exact, n_approx = exact.count(), approx.count()
    assert 0 < n_exact < n_total
    # same ballpark fraction (threshold semantics differ only on ties
    # and sketch rank error)
    assert abs(n_approx - n_exact) <= 0.1 * n_total
    # every exact-path survivor's quality clears the approx threshold
    # group-wise in >= 90% of cases (sanity, not equality: the exact
    # path tie-breaks on doc_id which a pure threshold cannot)
    ex_ids = {r["doc_id"] for r in exact.collect()}
    ap_ids = {r["doc_id"] for r in approx.collect()}
    assert len(ex_ids & ap_ids) >= 0.9 * len(ex_ids)


def test_semantic_dedup_survivors_partition(spark, sf_dir):
    """semantic_dedup survivors + pair losers partition the input id
    set: no survivor appears as a higher-id member of any near-dup
    pair, and every dropped id does."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    pairs = X_sim.cosine_dup_pairs(emb, threshold=0.42)
    losers = {r["id2"] for r in pairs.select("id2").distinct().collect()}
    survivors = {
        r["vec_id"]
        for r in X_sim.semantic_dedup(emb, threshold=0.42).collect()
    }
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert survivors | losers == all_ids
    assert survivors & losers == set()


def _uf_components(edges):
    """Driver-side union-find oracle for connected_components tests."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # chain (worst-case diameter), cycle, two components, self-loopish dup edges
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
        [(5, 9), (9, 5), (5, 9), (100, 2), (7, 7), (3, 8)],
        [(i, i + 1) for i in range(1, 30)] + [(50, 60), (60, 70)],
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    df = to_df(spark, [(u, v) for u, v in edges], "id1:long,id2:long")
    got = {
        (r["node"], r["component"])
        for r in X_dedup.connected_components(df).collect()
    }
    # distributed star-contraction path must agree with the
    # small-graph union-find endgame on the same graph
    got_dist = {
        (r["node"], r["component"])
        for r in X_dedup.connected_components(
            df, small_graph_edges=0
        ).collect()
    }
    assert got == got_dist
    exp = {(n, c) for n, c in _uf_components(edges).items()}
    # self-loops contribute no nodes on the Spark side (u != v filter);
    # mirror that in the oracle.
    loop_only = {u for u, v in edges if u == v} - {
        x for u, v in edges if u != v for x in (u, v)
    }
    exp = {(n, c) for (n, c) in exp if n not in loop_only}
    assert got == exp


def test_connected_components_converges_on_star_heavy_graph(spark):
    """A hub-and-spoke plus long chain converges within the iteration
    cap and labels every node with the component minimum."""
    edges = [(0, i) for i in range(1, 40)] + [(200 + i, 201 + i) for i in range(20)]
    df = to_df(spark, edges, "id1:long,id2:long")
    out = X_dedup.connected_components(df, small_graph_edges=0).collect()
    comp = {r["node"]: r["component"] for r in out}
    assert all(comp[i] == 0 for i in range(40))
    assert all(comp[200 + i] == 200 for i in range(21))


def test_connected_components_exact_confirm_runs_once(spark):
    """The distributed loop treats a stable checksum as a CANDIDATE
    fixpoint and confirms exactly with one exceptAll — the confirm
    round must fire exactly once per converged run, and a
    max_iterations exhaustion must report converged=False."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    df = to_df(spark, edges, "id1:long,id2:long")
    stats: dict = {}
    X_dedup.connected_components(
        df, small_graph_edges=0, stats=stats
    ).collect()
    assert stats["converged"] is True
    assert stats["confirm_rounds"] == 1
    assert 1 <= stats["iterations"] <= 25

    # exhausting the cap on a long chain: no convergence, no confirm
    chain = to_df(
        spark, [(i, i + 1) for i in range(1, 40)], "id1:long,id2:long"
    )
    stats2: dict = {}
    with pytest.warns(RuntimeWarning, match="did not converge"):
        X_dedup.connected_components(
            chain, small_graph_edges=0, max_iterations=1, stats=stats2
        ).collect()
    assert stats2["converged"] is False
    assert stats2["confirm_rounds"] == 0

    # the small-graph endgame is exact by construction
    stats3: dict = {}
    X_dedup.connected_components(df, stats=stats3).collect()
    assert stats3 == {"iterations": 0, "confirm_rounds": 0, "converged": True}


def test_bpe_pair_counts_hand_checked(spark):
    df = to_df(spark, [("aaab ab",), ("xy",)], "text:str")
    out = {
        (r["pair"], r["cnt"], r["rk"])
        for r in X_text.bpe_pair_counts(df, "text", top_n=10).collect()
    }
    # word types: aaab (aa,aa,ab), ab (ab), xy (xy)
    assert out == {("aa", 2, 1), ("ab", 2, 2), ("xy", 1, 3)}


def test_bpe_pair_counts_weighs_by_type_not_occurrence(spark):
    # "ab" occurs 3 times but is ONE word type -> wc=3 feeds the pair
    df = to_df(spark, [("ab ab ab",)], "text:str")
    rows = X_text.bpe_pair_counts(df, "text").collect()
    assert [(r["pair"], r["cnt"]) for r in rows] == [("ab", 3)]


def test_semantic_contamination_flags_planted_dup(spark):
    rows = [
        [100, [1.0, 0.0, 0.0]],  # corpus: identical to bench 1
        [101, [0.0, 1.0, 0.0]],  # corpus: orthogonal to both bench vecs
        [1, [1.0, 0.0, 0.0]],    # bench
        [2, [0.0, 0.0, 1.0]],    # bench
    ]
    df = to_df(spark, rows, "vec_id:long,embedding:[double]")
    out = {
        r["corpus_id"]: (r["nearest_bench_id"], r["max_sim"], r["contaminated"])
        for r in X_sim.semantic_contamination(
            df.filter(F.col("vec_id") >= 100),
            df.filter(F.col("vec_id") < 100),
            threshold=0.9,
        ).collect()
    }
    assert out[100] == (1, 1.0, True)
    assert out[101][2] is False and out[101][1] == 0.0


def test_semantic_contamination_broadcasts_bench(spark):
    emb = to_df(
        spark,
        [[i, [float(i), 1.0]] for i in range(20)],
        "vec_id:long,embedding:[double]",
    )
    plan = (
        X_sim.semantic_contamination(
            emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5)
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_span_dedup_removes_repeated_chunk_globally(spark):
    from pandasy_spark.extended.dedup import span_dedup

    # doc 1 repeats doc 0's first 4-word chunk; doc 2 is clean
    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d x y z w"),
        (2, "p q r s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in span_dedup(df, "text", "doc_id", span_words=4).collect()
    }
    assert out[0]["kept_text"] == "a b c d e f g h"
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    # duplicate leading chunk dropped, unique tail survives
    assert out[1]["kept_text"] == "x y z w"
    assert out[1]["n_kept"] == 1
    assert out[2]["kept_text"] == "p q r s"


def test_span_dedup_fully_duplicate_doc_keeps_empty(spark):
    from pandasy_spark.extended.dedup import span_dedup

    rows = [(0, "a b c d"), (1, "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in span_dedup(df, "text", "doc_id", span_words=4).collect()
    }
    assert out[0]["n_kept"] == 1
    assert out[1]["n_kept"] == 0 and out[1]["kept_text"] == ""


def test_bigram_lm_score_prefers_common_bigrams(spark):
    from pandasy_spark.extended.text import bigram_lm_score

    # "x y" appears 3x; "q z" once — doc 3's bigram is rarer
    rows = [(0, "x y"), (1, "x y"), (2, "x y"), (3, "q z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "text", "doc_id").collect()}
    assert out[0]["score_scaled"] == out[1]["score_scaled"]
    assert out[0]["score_scaled"] > out[3]["score_scaled"]


def test_domain_cap_keeps_top_n_per_domain(spark):
    from pandasy_spark.extended.sampling import domain_cap

    rows = [(i, "d1" if i < 5 else "d2", 100 - i) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = domain_cap(df, "source", "n_chars", "doc_id", cap=2)
    kept = sorted((r["source"], r["doc_id"]) for r in out.collect())
    # d1 keeps its two longest (ids 0,1); d2 keeps ids 5,6
    assert kept == [("d1", 0), ("d1", 1), ("d2", 5), ("d2", 6)]


@pytest.mark.slow
def test_bpe_learn_matches_python_reference(spark):
    from pandasy_spark.extended.text import bpe_learn

    corpus = ["low lower lowest low low", "newer newest new low", "wider wide new"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    got = bpe_learn(df, "text", num_merges=6)
    # the fully distributed loop must learn the identical merge table
    # across every batch schedule: adaptive (default), fixed 8, and
    # strictly one-merge-per-pass
    for mb in ("adaptive", 8, 1):
        got_dist = bpe_learn(
            df, "text", num_merges=6, local_types_threshold=0, merge_batch=mb
        )
        assert got == got_dist, f"merge_batch={mb}"

    # reference implementation (Sennrich-style, word types x freq)
    import re
    from collections import Counter

    wf = Counter(
        w for t in corpus for w in re.findall(r"[a-z]+", t.lower()) if len(w) >= 2
    )
    syms = {w: list(w) for w in wf}
    exp = []
    for rank in range(6):
        pc = Counter()
        for w, c in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # ties: count desc, then (left, right) asc — mirror the operator
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append((rank, l, r, l + r, cnt))
        for w in syms:
            s, out = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == exp


def test_levenshtein_dup_pairs_blocked(spark):
    from pandasy_spark.extended.dedup import levenshtein_dup_pairs

    rows = [
        (0, "b1", "the quick brown fox jumps"),
        (1, "b1", "the quick brwon fox jumps"),   # 2-edit transposition
        (2, "b1", "completely different text here"),
        (3, "b2", "the quick brown fox jumps"),   # same text, other block
    ]
    df = spark.createDataFrame(rows, ["doc_id", "blk", "text"])
    out = levenshtein_dup_pairs(df, ["blk"], "doc_id", "text", max_distance=3)
    pairs = {(r["id1"], r["id2"], r["edit_distance"]) for r in out.collect()}
    # only the within-block near-pair survives; cross-block identical
    # text is never compared (blocking is the contract)
    assert pairs == {(0, 1, 2)}


def _make_ppm(w, h, rgb):
    header = f"P6\n# test\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def _make_bmp(w, h, rgb):
    import struct

    row = bytes(rgb[::-1]) * w  # BGR per pixel
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    pixels = (row + pad) * h
    data_offset = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", data_offset + len(pixels), 0, 0, data_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    )
    return header + pixels


def test_decode_image_ppm_and_bmp():
    import numpy as np

    from pandasy_spark.extended.multimodal import decode_image

    ppm = decode_image(_make_ppm(4, 3, (10, 20, 30)))
    assert ppm.shape == (3, 4, 3)
    assert (ppm == np.array([10, 20, 30], dtype=np.uint8)).all()

    bmp = decode_image(_make_bmp(5, 2, (200, 100, 50)))
    assert bmp.shape == (2, 5, 3)
    assert (bmp == np.array([200, 100, 50], dtype=np.uint8)).all()

    import pytest as _pytest

    from pandasy_spark.extended.multimodal import DECODE_ERRORS

    # real PNG and JPEG decode exist now, so signatures with garbage
    # payloads are MALFORMED (quarantine); only codec-less formats
    # (lossy WebP) remain NotImplementedError
    with _pytest.raises(DECODE_ERRORS):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with _pytest.raises(DECODE_ERRORS):
        decode_image(b"\xff\xd8\xff\xe0 jpeg")
    with _pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_png_roundtrip_and_all_filter_types():
    import struct
    import zlib

    import numpy as np

    from pandasy_spark.extended.multimodal import (
        PNG_SIGNATURE,
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 2)]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_png(a)) == a).all()

    # a PNG using every filter type (0..4 cycling per row), filtered
    # with an independent slow reference implementation
    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    h, w, bpp = 5, 7, 3
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lines, prev = [], np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        f, row = y % 5, img[y].reshape(-1)
        filt = row.copy()
        for x in range(w * bpp):
            left = int(row[x - bpp]) if x >= bpp else 0
            up, ul = int(prev[x]), int(prev[x - bpp]) if x >= bpp else 0
            if f == 1:
                filt[x] = (int(row[x]) - left) & 0xFF
            elif f == 2:
                filt[x] = (int(row[x]) - up) & 0xFF
            elif f == 3:
                filt[x] = (int(row[x]) - ((left + up) >> 1)) & 0xFF
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left
                    if (pa <= pb and pa <= pc)
                    else (up if pb <= pc else ul)
                )
                filt[x] = (int(row[x]) - pred) & 0xFF
        lines.append(bytes([f]) + filt.tobytes())
        prev = row
    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert (decode_image(png) == img).all()


def test_png_color_types_and_failure_modes():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from pandasy_spark.extended.multimodal import (
        DECODE_ERRORS,
        PNG_SIGNATURE,
        decode_image,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def build(colortype, rows, extra=b"", depth=8, interlace=0):
        ih = struct.pack(">IIBBBBB", 6, 4, depth, colortype, 0, 0, interlace)
        sc = b"".join(b"\x00" + r for r in rows)
        return (
            PNG_SIGNATURE
            + chunk(b"IHDR", ih)
            + extra
            + chunk(b"IDAT", zlib.compress(sc))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    out = decode_image(build(0, [gray[y].tobytes() for y in range(4)]))
    assert (out == np.repeat(gray, 3, axis=2)).all()
    ga = rng.integers(0, 256, (4, 6, 2), dtype=np.uint8)
    out = decode_image(build(4, [ga[y].tobytes() for y in range(4)]))
    assert (out == np.repeat(ga[:, :, :1], 3, axis=2)).all()
    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    out = decode_image(build(6, [rgba[y].tobytes() for y in range(4)]))
    assert (out == rgba[:, :, :3]).all()
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    out = decode_image(
        build(
            3,
            [idx[y].tobytes() for y in range(4)],
            extra=chunk(b"PLTE", pal.tobytes()),
        )
    )
    assert (out == pal[idx[:, :, 0]]).all()

    rgb_rows = [rng.integers(0, 256, 18, dtype=np.uint8).tobytes() for _ in range(4)]
    for bad in [
        build(2, rgb_rows)[:40],  # truncated mid-chunk
        build(2, rgb_rows, depth=16),  # 16-bit unsupported
        build(2, rgb_rows, interlace=1),  # Adam7 unsupported
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"notzlib")
        + chunk(b"IEND", b""),  # corrupt DEFLATE
        build(3, [idx[y].tobytes() for y in range(4)]),  # palette, no PLTE
    ]:
        with _pytest.raises(DECODE_ERRORS):
            decode_image(bad)


def test_image_stats_real_decode_via_mapinpandas(spark):
    from pandasy_spark.extended.multimodal import image_stats

    good = _make_ppm(8, 4, (255, 0, 0))
    rows = [
        (1, good),
        (2, _make_bmp(6, 6, (0, 128, 0))),
        (3, b"\xff\xd8\xff\xe0 jpeg-needs-a-library"),
        # malformed payloads must be DROPPED, not fail the job: a
        # truncated raster (frombuffer ValueError), a truncated header
        # (IndexError/ValueError), and a BMP whose declared dimensions
        # run past the buffer
        (4, good[: len(good) // 2]),
        (5, b"P6\n8"),
        (6, _make_bmp(6, 6, (0, 128, 0))[:30] + b"\x00" * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert set(out) == {1, 2}  # the JPEG row routes to the absent-decoder path
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    assert out[1]["mean_r"] == 255.0 and out[1]["mean_b"] == 0.0
    assert (out[2]["width"], out[2]["height"]) == (6, 6)
    assert out[2]["mean_g"] == 128.0


def test_resize_decoded_images_round_trips_through_decoder(spark):
    import numpy as np

    from pandasy_spark.extended.multimodal import decode_image, resize_decoded_images

    # 2x2 quadrant image scaled up: nearest-neighbor must preserve the
    # quadrant colors exactly
    quad = np.zeros((2, 2, 3), dtype=np.uint8)
    quad[0, 0] = (255, 0, 0)
    quad[0, 1] = (0, 255, 0)
    quad[1, 0] = (0, 0, 255)
    quad[1, 1] = (255, 255, 0)
    payload = b"P6\n2 2\n255\n" + quad.tobytes()
    df = spark.createDataFrame(
        [(1, payload), (2, b"\x89PNG needs-a-library")],
        "doc_id long, payload binary",
    )
    rows = resize_decoded_images(df, out_w=4, out_h=4).collect()
    assert [r["doc_id"] for r in rows] == [1]
    out = decode_image(bytes(rows[0]["resized"]))
    assert out.shape == (4, 4, 3)
    assert (out[0, 0] == (255, 0, 0)).all() and (out[0, 3] == (0, 255, 0)).all()
    assert (out[3, 0] == (0, 0, 255)).all() and (out[3, 3] == (255, 255, 0)).all()

    # PNG output format round-trips through the same decoder
    png_rows = resize_decoded_images(
        df, out_w=4, out_h=4, out_format="png"
    ).collect()
    png_out = decode_image(bytes(png_rows[0]["resized"]))
    assert bytes(png_rows[0]["resized"])[:4] == b"\x89PNG"
    assert (png_out == out).all()
