"""Round-6 third batch: readability scores, Benford screen, neighbor
Jaccard, session-scoped attribution, PCX codec."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.events import sessionized_attribution
from pandasy_spark.extended.graph import neighbor_jaccard
from pandasy_spark.extended.multimodal import (
    _decode_pcx,
    decode_image,
    encode_pcx,
)
from pandasy_spark.extended.profile import BENFORD_SHARES, benford_screen
from pandasy_spark.extended.text import readability


# -------------------------------------------------------- readability


def test_readability_hand_computed(spark):
    # 2 sentences, 6 words, syllable groups: "the cat sat. the dog ran."
    # vowel groups: e,a,a,e,o,a -> 6
    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran.")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert r["n_sentences"] == 2
    assert r["n_words"] == 6
    assert r["n_syllables"] == 6
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(r["flesch"] - 119.19) < 1e-9
    # fk = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert abs(r["fk_grade"] - (-2.62)) < 1e-9


def test_readability_empty_and_no_punct(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "word word word")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    # floors: everything >= 1, scores defined (no NULL/NaN/div0)
    assert rows[1]["n_sentences"] == 1 and rows[1]["n_words"] == 1
    assert rows[2]["n_sentences"] == 1 and rows[2]["n_words"] == 3
    assert rows[1]["flesch"] is not None


# ------------------------------------------------------------ Benford


def test_benford_shares_sum_to_one():
    assert abs(sum(BENFORD_SHARES.values()) - 1.0) < 1e-12


def test_benford_screen_counts_and_shares(spark):
    # values 1..9 once each (in cents: 0.01..0.09): uniform digits
    rows = [(float(d) / 100,) for d in range(1, 10)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in benford_screen(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d]["n"] == 1
        assert abs(got[d]["obs_share"] - round(1 / 9, 6)) < 2e-6
        assert (
            abs(got[d]["benford_share"] - round(BENFORD_SHARES[d], 6)) < 2e-6
        )
    # non-positive values are excluded
    df2 = spark.createDataFrame([(0.0,), (-3.0,), (1.0,)], "v double")
    got2 = benford_screen(df2, "v").collect()
    assert len(got2) == 1 and got2[0]["n"] == 1


# --------------------------------------------------- neighbor Jaccard


def test_neighbor_jaccard_hand_computed(spark):
    # star: 1-2, 1-3, 2-3 (triangle) plus 4-1
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 1)], "x long, y long"
    )
    got = {
        (r["u1"], r["u2"]): r for r in neighbor_jaccard(e).collect()
    }
    # nbrs: 1:{2,3,4} 2:{1,3} 3:{1,2} 4:{1}
    # pair (2,3): common={1}, jac = 1/(2+2-1)=1/3
    assert got[(2, 3)]["common"] == 1
    assert abs(got[(2, 3)]["jaccard"] - 1 / 3) < 1e-12
    # pair (2,4): common={1}, jac = 1/(2+1-1) = 0.5
    assert got[(2, 4)]["jaccard"] == 0.5
    # (1,2) share neighbor 3 -> present; min_common=2 drops all
    assert (1, 2) in got
    assert neighbor_jaccard(e, min_common=2).count() == 0


# --------------------------------------- session-scoped attribution


def test_sessionized_attribution_scopes_to_session(spark):
    rows = [
        # session 1: click then purchase (same session, 10 min apart)
        (1, "2024-01-01 10:00:00", "u", "click", 0.0),
        (2, "2024-01-01 10:10:00", "u", "purchase", 5.0),
        # > 30 min gap -> session 2: organic purchase (no touch)
        (3, "2024-01-01 12:00:00", "u", "purchase", 7.0),
        # session 3: view, click, purchase -> first touch = view, 2 touches
        (4, "2024-01-01 15:00:00", "u", "view", 0.0),
        (5, "2024-01-01 15:05:00", "u", "click", 0.0),
        (6, "2024-01-01 15:20:00", "u", "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id string, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["conversion_id"]: r for r in sessionized_attribution(df).collect()
    }
    assert got[2]["session_idx"] == 1
    assert got[2]["first_touch_type"] == "click"
    assert got[2]["n_touches_before"] == 1
    assert got[3]["session_idx"] == 2
    assert got[3]["first_touch_type"] is None
    assert got[3]["n_touches_before"] == 0
    assert got[6]["session_idx"] == 3
    assert got[6]["first_touch_type"] == "view"
    assert got[6]["n_touches_before"] == 2


# ---------------------------------------------------------------- PCX


def test_pcx_roundtrip_shapes_and_values():
    rng = np.random.RandomState(1)
    for h, w in [(1, 1), (2, 3), (5, 4), (9, 7), (16, 16)]:
        a = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_pcx(a)) == a).all()


def test_pcx_rle_marker_bytes_and_long_runs():
    # literals >= 0xC0 must be run-wrapped; 100-wide solid row makes
    # runs longer than the 63-count cap
    a = np.full((2, 100, 3), 0xC5, np.uint8)
    a[0, 50] = [1, 2, 3]
    assert (decode_image(encode_pcx(a)) == a).all()


def test_pcx_odd_width_padding():
    # odd widths pad bytes-per-line to even: padding must not leak
    a = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    assert (decode_image(encode_pcx(a)) == a).all()


def test_pcx_grayscale_and_palette_paths():
    import struct

    hdr = struct.pack(
        "<BBBBHHHHHH48sBBHHHH54s",
        0x0A, 5, 1, 8, 0, 0, 2, 1, 72, 72, b"\x00" * 48,
        0, 1, 4, 1, 0, 0, b"\x00" * 54,
    )
    body = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    g = _decode_pcx(hdr + body)
    assert g.shape == (2, 3, 3) and tuple(g[1, 2]) == (60, 60, 60)
    pal = b"".join(
        bytes([i, 255 - i, i // 2]) for i in range(256)
    )
    p = _decode_pcx(hdr + body + b"\x0c" + pal)
    assert tuple(p[0, 1]) == (20, 235, 10)


def test_pcx_quarantines_unsupported():
    import struct

    hdr = struct.pack(
        "<BBBBHHHHHH48sBBHHHH54s",
        0x0A, 5, 1, 4, 0, 0, 2, 1, 72, 72, b"\x00" * 48,
        0, 1, 4, 1, 0, 0, b"\x00" * 54,
    )
    with pytest.raises(NotImplementedError):
        _decode_pcx(hdr + b"\x00" * 8)
    with pytest.raises(ValueError):
        _decode_pcx(b"\x0b" + b"\x00" * 127 + b"\x00" * 8)


def test_pcx_dispatch_does_not_shadow_other_codecs():
    from pandasy_spark.extended.multimodal import encode_bmp, encode_tga

    a = np.full((2, 2, 3), 77, np.uint8)
    assert (decode_image(encode_bmp(a)) == a).all()
    assert (decode_image(encode_tga(a, rle=True)) == a).all()


# ------------------------------------------------------ interval join


def test_interval_join_matches_brute_force(spark):
    import itertools
    import random

    from pandasy_spark.operators.rangejoin import interval_join

    rng = random.Random(11)
    base = 1_700_000_000
    lrows, rrows = [], []
    for i in range(60):
        s = base + rng.randrange(0, 7200)
        lrows.append((1, i, s, s + rng.randrange(0, 900)))
    for j in range(60):
        s = base + rng.randrange(0, 7200)
        rrows.append((1, 1000 + j, s, s + rng.randrange(0, 900)))
    want = {
        (li, rj)
        for (_, li, ls, le), (_, rj, rs, re) in itertools.product(
            lrows, rrows
        )
        if ls <= re and rs <= le
    }

    def df(rows, ids):
        d = spark.createDataFrame(rows, f"k long, {ids} long, s long, e long")
        return d.select(
            "k", ids,
            F.timestamp_micros(F.col("s") * 1_000_000).alias(f"{ids}_s"),
            F.timestamp_micros(F.col("e") * 1_000_000).alias(f"{ids}_e"),
        )

    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            df(lrows, "lid"), df(rrows, "rid"), ["k"],
            "lid_s", "lid_e", "rid_s", "rid_e", bucket_seconds=300,
        ).collect()
    }
    assert got == want


def test_interval_join_emits_pairs_once_and_validates(spark):
    from pandasy_spark.operators.rangejoin import interval_join

    # long intervals spanning many buckets must still emit ONE row
    mk = lambda rows, ids: spark.createDataFrame(  # noqa: E731
        rows, f"k long, {ids} long, s long, e long"
    ).select(
        "k", ids,
        F.timestamp_micros(F.col("s") * 1_000_000).alias(f"{ids}_s"),
        F.timestamp_micros(F.col("e") * 1_000_000).alias(f"{ids}_e"),
    )
    l = mk([(1, 1, 0, 100_000)], "lid")
    r = mk([(1, 2, 50_000, 60_000)], "rid")
    out = interval_join(
        l, r, ["k"], "lid_s", "lid_e", "rid_s", "rid_e", bucket_seconds=60
    ).collect()
    assert len(out) == 1
    # inverted interval fails the in-plan guard
    bad = mk([(1, 3, 100, 50)], "lid")
    with pytest.raises(Exception, match="start > end"):
        interval_join(
            bad, r, ["k"], "lid_s", "lid_e", "rid_s", "rid_e"
        ).collect()


def test_funnel_window_cuts_late_conversions(spark):
    from pandasy_spark.extended.events import funnel

    rows = [
        (1, "2024-01-01 00:00:00", "u1", "signup", 0.0),
        (2, "2024-01-02 00:00:00", "u1", "purchase", 1.0),  # in window
        (3, "2024-01-01 00:00:00", "u2", "signup", 0.0),
        (4, "2024-03-01 00:00:00", "u2", "purchase", 1.0),  # too late
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id string, event_type string,"
        " value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(
            df, ["signup", "purchase"], window_seconds=7 * 86400
        ).collect()
    }
    assert got == {"u1": 2, "u2": 1}
    # unbounded funnel counts the late conversion
    got2 = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(df, ["signup", "purchase"]).collect()
    }
    assert got2 == {"u1": 2, "u2": 2}


def test_bloom_or_merge_equals_union_bloom(spark):
    from pandasy_spark.extended.dedup import bloom_build

    a = spark.createDataFrame([(f"k{i}",) for i in range(50)], "t string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(25, 80)], "t string")
    u = spark.createDataFrame([(f"k{i}",) for i in range(80)], "t string")
    ba = bloom_build(a, "t", num_words=64).collect()[0]["bloom"]
    bb = bloom_build(b, "t", num_words=64).collect()[0]["bloom"]
    bu = bloom_build(u, "t", num_words=64).collect()[0]["bloom"]
    assert [x | y for x, y in zip(ba, bb)] == list(bu)


# ------------------------------------------------------------ KS test


def test_ks_identical_and_disjoint(spark):
    from pandasy_spark.extended.profile import ks_statistic

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_statistic(df, "v", "g", "a", "b").collect()[0]
    assert r["d"] == 0.0 and r["n_a"] == 100 and r["n_values"] == 100
    # fully separated supports: D = 1
    rows2 = [("a", float(v)) for v in range(50)] + [
        ("b", float(v + 1000)) for v in range(50)
    ]
    r2 = ks_statistic(
        spark.createDataFrame(rows2, "g string, v double"), "v", "g", "a", "b"
    ).collect()[0]
    assert r2["d"] == 1.0


def test_ks_hand_computed(spark):
    from pandasy_spark.extended.profile import ks_statistic

    # a = {1,2}, b = {2,3}: ECDFs at v=1: 0.5 vs 0 (D=0.5); v=2: 1 vs
    # 0.5 (0.5); v=3: 1 vs 1 -> D = 0.5
    rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    r = ks_statistic(
        spark.createDataFrame(rows, "g string, v double"), "v", "g", "a", "b"
    ).collect()[0]
    assert r["d"] == 0.5


# ------------------------------------------------------------ A/B test


def test_ab_test_known_rates(spark):
    from pandasy_spark.extended.events import ab_test

    # users 0..9: evens = A, odds = B; conversions: users 0,2 (A), 1 (B)
    rows = []
    for u in range(10):
        rows.append((u, "view"))
    for u in (0, 2, 1):
        rows.append((u, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = ab_test(df).collect()[0]
    assert r["n_a"] == 5 and r["n_b"] == 5
    assert r["conv_a"] == 2 and r["conv_b"] == 1
    assert r["rate_a"] == 0.4 and r["rate_b"] == 0.2
    assert abs(r["lift"] - 0.2) < 2e-6
    # z² = (0.2)² / (0.3*0.7*(0.4)) = 0.04/0.084
    assert abs(r["z_sq"] - 0.04 / 0.084) < 1e-4


def test_ab_test_no_conversions_either_side(spark):
    from pandasy_spark.extended.events import ab_test

    df = spark.createDataFrame(
        [(u, "view") for u in range(6)], "user_id long, event_type string"
    )
    r = ab_test(df).collect()[0]
    # pooled p = 0 -> z² divides by zero -> NULL/NaN is acceptable;
    # rates must be exact zeros and counts exact
    assert r["conv_a"] == 0 and r["conv_b"] == 0
    assert r["rate_a"] == 0.0 and r["rate_b"] == 0.0
