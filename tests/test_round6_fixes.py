"""Round-6 advisor-flagged edge fixes: hll_estimate int64 headroom at
high p (with per-p alpha derivation), gray+alpha (spp=2) TIFF channel
contract, and paragraph_dedup preservation of paragraph-less
documents."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasy_spark.extended.multimodal import _decode_tiff
from pandasy_spark.extended.sketches import hll_estimate


def _keys(spark, n, dup=1):
    return spark.range(n * dup).select(
        (F.col("id") % n).alias("k"), (F.col("id") % 3).alias("g")
    )


def _old_formula(s, p, alpha_milli):
    # the pre-fix unreduced estimator, evaluated in Python's unbounded
    # ints: floor(alpha_milli * m^2 * 2^29 / (125 * S))
    m = 1 << p
    return (alpha_milli * m * m * (1 << 29)) // (125 * s)


@pytest.mark.parametrize("p,alpha", [(6, 709), (13, 720), (16, 721)])
def test_hll_estimate_no_overflow_and_identity(spark, p, alpha):
    """p >= 13 overflowed int64 in the unreduced numerator; the
    reduced form must (a) run, (b) equal the unreduced formula
    evaluated in unbounded integers — the exact-division identity —
    (c) use the per-p derived alpha."""
    m = 1 << p
    if p not in (4, 5, 6):
        alpha = round(721.3 / (1 + 1.079 / m))
    row = hll_estimate(_keys(spark, 2000), [], "k", p=p).collect()[0]
    assert row["m"] == m
    assert row["est"] == _old_formula(row["s"], p, alpha)
    # numerator of the reduced form stays inside int64 at the max p
    assert alpha * (1 << (p + 29)) < 2**63


def test_hll_estimate_p6_value_unchanged(spark):
    """The p=6 default (the sketch_hll gate form) is bit-identical to
    the documented alpha_64=709 unreduced estimator."""
    row = hll_estimate(_keys(spark, 500), [], "k").collect()[0]
    assert row["est"] == _old_formula(row["s"], 6, 709)
    # and the explicit-override path still honors the caller's alpha
    row2 = hll_estimate(_keys(spark, 500), [], "k", p=6, alpha_milli=700).collect()[0]
    assert row2["est"] == _old_formula(row2["s"], 6, 700)


def _le_entry(tag, typ, count, value):
    if typ == 3 and count == 1:
        return struct.pack("<HHIHH", tag, typ, count, value, 0)
    if typ == 3 and count == 2:
        v0, v1 = value
        return struct.pack("<HHIHH", tag, typ, count, v0, v1)
    return struct.pack("<HHII", tag, typ, count, value)


def _gray_alpha_tiff(h=4, w=3):
    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    alpha = np.full((h, w), 200, np.uint8)
    raster = np.dstack([gray, alpha]).tobytes()
    ifd_off, n = 8, 9
    data_off = ifd_off + 2 + n * 12 + 4
    entries = b"".join(
        [
            _le_entry(256, 4, 1, w),
            _le_entry(257, 4, 1, h),
            _le_entry(258, 3, 2, (8, 8)),
            _le_entry(259, 3, 1, 1),
            _le_entry(262, 3, 1, 1),
            _le_entry(273, 4, 1, data_off),
            _le_entry(277, 3, 1, 2),
            _le_entry(278, 4, 1, h),
            _le_entry(279, 4, 1, len(raster)),
        ]
    )
    payload = (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + raster
    )
    return payload, gray


def test_tiff_gray_alpha_spp2_returns_three_channels():
    """spp=2 (gray+alpha) passed every guard but returned an
    (h, w, 2) array; it must replicate the gray plane to (h, w, 3)."""
    payload, gray = _gray_alpha_tiff()
    r = _decode_tiff(payload)
    assert r.shape == (4, 3, 3)
    assert (r[:, :, 0] == gray).all()
    assert (r[:, :, 1] == gray).all() and (r[:, :, 2] == gray).all()


def test_paragraph_dedup_preserves_paragraphless_docs(spark):
    """Documents whose text is empty/whitespace-only emit zero
    exploded paragraphs and previously vanished from the output; they
    must survive as (id, '', 0, 0)."""
    from pandasy_spark.extended.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta"),
            (2, "   \n\n  \n\n"),
            (3, ""),
            (4, "alpha\n\ngamma"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    for empty_id in (2, 3):
        r = out[empty_id]
        assert r["clean_text"] == ""
        assert r["n_paragraphs"] == 0 and r["n_kept"] == 0
    assert out[1]["clean_text"] == "alpha\n\nbeta"
    # doc 4's 'alpha' is a 2nd occurrence: dropped
    assert out[4]["clean_text"] == "gamma"
    assert out[4]["n_paragraphs"] == 2 and out[4]["n_kept"] == 1
