"""Round-6 (second session) operators: Hilbert layout (see
test_sinks.py), HITS, QOI gate plumbing."""

from pyspark.sql import functions as F


def test_hits_hand_computed_two_rounds(spark):
    """1->3, 2->3, 3->4: after two unnormalized rounds
    hub = {1:4, 2:4, 3:1, 4:0}, auth = {3:4, 4:1, 1:0, 2:0}."""
    from pandasy_spark.extended.graph import hits

    e = spark.createDataFrame([(1, 3), (2, 3), (3, 4)], ["src", "dst"])
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got == {1: (4, 0), 2: (4, 0), 3: (1, 4), 4: (0, 1)}


def test_hits_duplicate_edges_collapse(spark):
    """Parallel edges count once (the edge list is distinct-ed)."""
    from pandasy_spark.extended.graph import hits

    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], ["src", "dst"]
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got == {1: (1, 0), 2: (0, 1)}


def test_hits_rejects_zero_iterations(spark):
    import pytest

    from pandasy_spark.extended.graph import hits

    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits(e, iterations=0)


def test_hits_matches_float_reference_ordering(spark):
    """The integer unnormalized scores order identically to the
    classically normalized float HITS on a random-ish digraph."""
    import numpy as np

    from pandasy_spark.extended.graph import hits

    edges = [(a, (a * 7 + b) % 23) for a in range(23) for b in (1, 3, 5)]
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iterations=2).collect()}

    nodes = sorted({n for sd in edges for n in sd})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in set(edges):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(2):
        a = A.T @ h
        h = A @ a
    for n in nodes:
        assert got[n][0] == int(round(h[idx[n]]))
        assert got[n][1] == int(round((A.T @ (A @ (A.T @ np.ones(len(nodes)))))[idx[n]]))


def test_qoi_gate_payloads_exercise_all_op_classes(spark):
    """The multimodal_qoi gate family (delta = doc_id % 4) produces
    streams containing RUN, DIFF, LUMA and INDEX tags across docs."""
    import numpy as np

    from pandasy_spark.extended.qoi import encode_qoi

    seen = set()
    for d in range(8):
        w, h, delta = d % 6 + 2, d % 4 + 1, d % 4
        base = ((d * 97) % 200, (d * 101) % 200, (d * 103) % 200)
        col = np.arange(w, dtype=np.int64) * delta
        row = np.stack([b + col for b in base], axis=-1)
        arr = np.broadcast_to(row, (h, w, 3)).astype(np.uint8)
        enc = encode_qoi(arr)
        body, pos = enc[14:-8], 0
        while pos < len(body):
            tag = body[pos]
            if tag == 0xFE:
                seen.add("rgb")
                pos += 4
            elif tag == 0xFF:
                pos += 5
            else:
                seen.add({0: "index", 1: "diff", 2: "luma", 3: "run"}[tag >> 6])
                pos += 2 if (tag >> 6) == 2 else 1
    assert {"rgb", "index", "diff", "luma", "run"} <= seen, seen


def test_class_balance_equalizes_counts(spark, sf_dir):
    from pandasy_spark.extended.sampling import class_balance
    from pandasy_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    out = class_balance(ev, "event_type", "event_id")
    got = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    k = min(
        r["n"]
        for r in ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert set(got.values()) == {k}, got
    # kept rows are a subset of the input
    assert out.count() == k * len(got)


def test_psi_zero_for_identical_halves(spark):
    """PSI of a distribution against itself is ~0 (smoothing only)."""
    from pandasy_spark.extended.profile import psi_drift

    # halves interleave by 50-cycle so both see every value equally
    # (i % 2 would correlate parity of v with the split — not identical)
    rows = [(float(i % 50), (i // 50) % 2 == 0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v", "base"])
    r = psi_drift(df, "v", F.col("base"), bins=10).first()
    assert r["n_base"] == 1000 and r["n_cur"] == 1000 and r["n_bins"] == 10
    assert abs(r["psi"]) < 1e-9


def test_psi_detects_shift(spark):
    from pandasy_spark.extended.profile import psi_drift

    rows = [(float(i % 50), True) for i in range(1000)] + [
        (float(40 + i % 50), False) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["v", "base"])
    r = psi_drift(df, "v", F.col("base"), bins=10).first()
    assert r["psi"] > 0.25, r["psi"]


def test_psi_rejects_degenerate_bins(spark):
    import pytest

    from pandasy_spark.extended.profile import psi_drift

    df = spark.createDataFrame([(1.0, True)], ["v", "base"])
    with pytest.raises(ValueError):
        psi_drift(df, "v", F.col("base"), bins=1)


def test_exif_roundtrip_both_byte_orders_and_edges():
    import struct

    from pandasy_spark.extended.multimodal import build_exif_app1, parse_exif

    app1 = build_exif_app1(
        make="A", model="LongModelName-12345", orientation=6,
        datetime="2023:12:31 23:59:59",
        datetime_original="2023:01:01 00:00:00", pixel_w=4032, pixel_h=3024,
    )
    payload = b"\xff\xd8" + app1 + b"\xff\xd9"
    m = parse_exif(payload)
    # short ASCII (<= 4 bytes, stored inline) and long (offset area)
    assert m["make"] == "A" and m["model"] == "LongModelName-12345"
    assert m["orientation"] == 6 and m["pixel_w"] == 4032
    # big-endian TIFF block: flip the writer's output header + fields
    # by hand for the minimal MM case (orientation only)
    tiff = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 274, 3, 1) + struct.pack(">HH", 5, 0)
        + struct.pack(">I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    payload = (
        b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
        + b"\xff\xd9"
    )
    assert parse_exif(payload) == {"orientation": 5}


def test_exif_absent_and_non_jpeg():
    import pytest

    from pandasy_spark.extended.multimodal import parse_exif

    assert parse_exif(b"\xff\xd8\xff\xd9") == {}
    with pytest.raises(ValueError):
        parse_exif(b"\x89PNG")


def test_exif_stops_at_sos():
    """APP1 after SOS must NOT be read (EXIF lives before scan data;
    bytes after SOS are entropy-coded and can alias markers)."""
    import struct

    from pandasy_spark.extended.multimodal import build_exif_app1, parse_exif

    app1 = build_exif_app1(make="X", orientation=3)
    sos = b"\xff\xda" + struct.pack(">H", 2)
    payload = b"\xff\xd8" + sos + app1 + b"\xff\xd9"
    assert parse_exif(payload) == {}


def test_golden_records_rules(spark):
    from pandasy_spark.operators.scd import golden_records

    rows = [
        # cluster 1: phones null on latest -> latest_non_null picks v=1
        (1, 0, "a0", "p0", 10, "X"),
        (1, 1, "a1", "p1", 5, "Y"),
        (1, 2, "a2", None, 7, "X"),
        # cluster 2: ALL phones null -> NULL survives
        (2, 0, "b0", None, 1, "Z"),
        # cluster 3: mode tie (W vs V once each) -> smallest value V
        (3, 0, "c0", "q0", 3, "W"),
        (3, 1, "c1", "q1", 4, "V"),
    ]
    df = spark.createDataFrame(
        rows, ["cluster", "v", "name", "phone", "bal", "seg"]
    )
    out = {
        r["cluster"]: r
        for r in golden_records(
            df,
            "cluster",
            {
                "name": ("latest", None),
                "phone": ("latest_non_null", None),
                "bal": ("max", None),
                "seg": ("mode", None),
            },
            recency_col="v",
        ).collect()
    }
    assert out[1]["name"] == "a2" and out[1]["phone"] == "p1"
    assert out[1]["bal"] == 10 and out[1]["seg"] == "X"
    assert out[1]["n_records"] == 3
    assert out[2]["phone"] is None and out[2]["seg"] == "Z"
    assert out[3]["seg"] == "V" and out[3]["name"] == "c1"


def test_golden_records_requires_recency_for_latest(spark):
    import pytest

    from pandasy_spark.operators.scd import golden_records

    df = spark.createDataFrame([(1, "a")], ["cluster", "name"])
    with pytest.raises(ValueError):
        golden_records(df, "cluster", {"name": ("latest", None)})
    with pytest.raises(ValueError):
        golden_records(
            df, "cluster", {"name": ("shiniest", None)}, recency_col="cluster"
        )


def test_kaplan_meier_textbook_with_censoring_and_zero_pin(spark):
    """(1,e)(2,c)(3,e)(3,e)(4,c)(5,e): S = 5/6 at t=1, 5/12 at t=3,
    exactly 0.0 at t=5 (full-churn step must not go through ln(0))."""
    from pandasy_spark.extended.events import kaplan_meier

    rows = [(1, True), (2, False), (3, True), (3, True), (4, False), (5, True)]
    df = spark.createDataFrame(rows, ["duration", "churned"])
    out = {r["t"]: r for r in kaplan_meier(df).collect()}
    assert set(out) == {1, 3, 5}
    assert out[1]["n_risk"] == 6 and out[1]["n_events"] == 1
    assert abs(out[1]["survival"] - 5 / 6) < 1e-12
    assert out[3]["n_risk"] == 4 and out[3]["n_events"] == 2
    assert abs(out[3]["survival"] - 5 / 12) < 1e-12
    assert out[5]["n_risk"] == 1 and out[5]["survival"] == 0.0
    # censored rows never appear as event rows but reduce the risk set
    assert out[3]["n_censored"] == 0 and out[1]["n_censored"] == 0


def test_gopher_rules_crafted_documents(spark):
    from pandasy_spark.extended.text import gopher_quality_flags

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with style and be"]
        * 6
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    symbols = "# " * 60
    short = "too short"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, short), (5, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["keep"] is True, dict(out[1].asDict())
    assert out[2]["ok_bullet_lines"] is False and out[2]["keep"] is False
    assert out[3]["ok_symbol_ratio"] is False
    assert out[4]["ok_word_count"] is False and out[4]["keep"] is False
    assert out[5]["keep"] is False  # empty text: NULL ratios -> not kept


def test_c4_clean_crafted_pages(spark):
    from pandasy_spark.extended.text import c4_clean

    good = "\n".join(
        [
            "This is a fine sentence with enough words.",
            "Another proper sentence keeps the page alive!",
            'A third line ends with a quote."',
            "short line.",  # < 5 words -> dropped
            "no terminal punctuation here at all",  # dropped
            "Please enable javascript to continue reading.",  # dropped
        ]
    )
    lorem = "Lorem ipsum dolor sit amet, consectetur adipiscing elit."
    brace = "if (x) { return y; }. A sentence with five words."
    two_lines = "Only one good sentence lives here.\nAnd a second one too!"
    df = spark.createDataFrame(
        [(1, good), (2, lorem), (3, brace), (4, two_lines)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert out[1]["n_lines"] == 6 and out[1]["n_kept"] == 3
    assert out[1]["keep_page"] is True
    assert "javascript" not in out[1]["clean_text"]
    assert out[1]["clean_text"].count("\n") == 2
    assert out[2]["keep_page"] is False  # lorem ipsum page screen
    assert out[3]["keep_page"] is False  # curly-brace page screen
    assert out[4]["keep_page"] is False  # under the 3-sentence floor
    assert out[4]["n_kept"] == 2


def test_binary_metrics_hand_counts_and_null_ratios(spark):
    from pandasy_spark.extended.ml import binary_metrics

    rows = [
        (True, True), (True, True), (True, False),
        (False, True), (False, False), (None, True),
    ]
    df = spark.createDataFrame(rows, ["label", "pred"])
    r = binary_metrics(df, "label", "pred").first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 1)
    assert abs(r["precision"] - 2 / 3) < 1e-12
    assert abs(r["recall"] - 2 / 3) < 1e-12
    assert abs(r["f1"] - 2 / 3) < 1e-12
    assert abs(r["accuracy"] - 3 / 5) < 1e-12
    # a filter that never fires has NO precision (NULL, not 0.0)
    df2 = spark.createDataFrame(
        [(True, False), (False, False)], ["label", "pred"]
    )
    r2 = binary_metrics(df2, "label", "pred").first()
    assert r2["precision"] is None and r2["recall"] is not None


def test_jsd_properties(spark):
    """JSD is ~0 on identical halves, bounded by ln 2, and symmetric."""
    import math

    from pandasy_spark.extended.profile import jsd_drift

    rows = [(float(i % 50), (i // 50) % 2 == 0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v", "base"])
    r = jsd_drift(df, "v", F.col("base"), bins=10).first()
    assert abs(r["jsd"]) < 1e-9

    # fully disjoint supports: JSD near its ln 2 ceiling (smoothing
    # keeps it strictly under), never the PSI-style blow-up
    rows2 = [(float(i % 10), True) for i in range(1000)] + [
        (1000.0 + i % 10, False) for i in range(1000)
    ]
    df2 = spark.createDataFrame(rows2, ["v", "base"])
    r2 = jsd_drift(df2, "v", F.col("base"), bins=10).first()
    assert 0.5 < r2["jsd"] <= math.log(2) + 1e-12

    # symmetry: swapping the slices gives the same value
    df3 = df2.withColumn("base", ~F.col("base"))
    # reference grid changes with the baseline, so compare on data
    # whose min/max are slice-independent
    # both slices span exactly [0, 19] so the reference grid is
    # slice-independent; the current slice is non-uniform (19 is
    # over-weighted via the min clamp)
    rows4 = [(float(i % 20), True) for i in range(1000)] + [
        (float(min(i % 30, 19)), False) for i in range(1000)
    ]
    d4 = spark.createDataFrame(rows4, ["v", "base"])
    d5 = d4.withColumn("base", ~F.col("base"))
    j4 = jsd_drift(d4, "v", F.col("base"), bins=10).first()["jsd"]
    j5 = jsd_drift(d5, "v", F.col("base"), bins=10).first()["jsd"]
    assert abs(j4 - j5) < 1e-12
