"""Pure-codec tests for extended/jpeg.py plus the Spark decode path.

The driver-level gate is ``workload.multimodal_jpeg`` (closed-form
SQL oracle); these tests pin the codec details the gate can't see:
non-solid content, every encoder mode (4:2:0 / 4:4:4 / grayscale /
restart markers), the quality-scaling formula, and malformed-payload
behavior through ``image_stats``'s drop contract.
"""

import numpy as np
import pytest

from pandasy_spark.extended.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_quant_tables,
)


def _gradient(h, w):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    grad = np.clip(xx * 4 + yy * 2, 0, 255).astype(np.uint8)
    return np.stack([grad, 255 - grad, np.full_like(grad, 90)], axis=2)


def test_quality_scaling_matches_libjpeg_formula():
    luma50, chroma50 = jpeg_quant_tables(50)
    assert luma50[0] == 16 and chroma50[0] == 17  # base tables at Q50
    luma90, _ = jpeg_quant_tables(90)
    assert luma90[0] == (16 * (200 - 180) + 50) // 100 == 3
    luma10, _ = jpeg_quant_tables(10)
    assert luma10[0] == (16 * 500 + 50) // 100
    assert jpeg_quant_tables(1)[0].max() <= 255
    assert jpeg_quant_tables(100)[0].min() >= 1


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"subsample": False},
        {"gray": True},
        {"restart_interval": 2},
        {"subsample": False, "restart_interval": 1},
        {"gray": True, "restart_interval": 3},
    ],
)
def test_roundtrip_modes_small_error(kwargs):
    img = _gradient(37, 50)
    dec = decode_jpeg(encode_jpeg(img, quality=92, **kwargs))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    if kwargs.get("gray"):
        ref = np.floor(
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2] + 0.5
        )
        assert np.abs(dec[..., 0].astype(float) - ref).max() <= 2
        assert np.array_equal(dec[..., 0], dec[..., 1])
    else:
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_restart_markers_do_not_change_pixels():
    img = _gradient(24, 40)
    a = decode_jpeg(encode_jpeg(img, quality=92))
    b = decode_jpeg(encode_jpeg(img, quality=92, restart_interval=2))
    assert np.array_equal(a, b)


def test_solid_gray_closed_form_all_values():
    """The contract the multimodal_jpeg SQL oracle states: solid gray v
    at Q90 (luma DC quantizer q00 = 3) decodes to
    clip(floor(floor(8*(v-128)/3 + 0.5)*3/8 + 128.5)) exactly."""
    for v in range(0, 256, 7):
        arr = np.full((3, 5, 3), v, np.uint8)
        dec = decode_jpeg(encode_jpeg(arr, quality=90))
        dc = np.floor(8 * (v - 128) / 3.0 + 0.5)
        exp = int(np.clip(np.floor(dc * 3 / 8.0 + 128.5), 0, 255))
        u = np.unique(dec)
        assert len(u) == 1 and u[0] == exp, (v, u, exp)


def test_multi_mcu_and_edge_padding_dims():
    for h, w in [(1, 1), (9, 17), (16, 16), (20, 11), (33, 7)]:
        img = _gradient(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == (h, w, 3)


def test_deterministic_bytes():
    img = _gradient(16, 16)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


def test_malformed_payloads_raise():
    p = encode_jpeg(_gradient(16, 16), 85)
    for bad in [p[:2], p[:20], b"\xff\xd8\xff\xdb\x00\x05abc", b"notjpeg"]:
        with pytest.raises((ValueError, NotImplementedError, IndexError)):
            decode_jpeg(bad)


def test_unsupported_processes_quarantined():
    # progressive (SOF2) decodes natively now; a baseline stream
    # mislabeled as progressive is MALFORMED (its interleaved scan
    # claims Ss=0/Se=63, illegal for progressive DC) — while the
    # genuinely unsupported processes (lossless SOF3, arithmetic
    # SOF9) stay NotImplementedError
    p = bytearray(encode_jpeg(_gradient(8, 8), 85))
    idx = bytes(p).find(b"\xff\xc0")
    p[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))
    for bad_sof in (0xC3, 0xC9):
        p[idx + 1] = bad_sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(p))


def test_image_stats_decodes_jpeg_and_drops_malformed(spark):
    """Spark-side: JPEG payloads flow through the same mapInPandas
    stats path as PPM/BMP/PNG; truncated ones are dropped, not fatal."""
    import pandas as pd

    from pandasy_spark.extended.multimodal import image_stats

    good = encode_jpeg(np.full((4, 6, 3), 77, np.uint8), quality=90)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [good, good[:15], b"\x00\x01"]}
    )
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert set(rows) == {1}
    r = rows[1]
    # 77 -> dc = floor(8*(77-128)/3 + 0.5) = -136; 77 round-trips to 77
    assert (r["width"], r["height"]) == (6, 4)
    assert r["mean_r"] == r["mean_g"] == r["mean_b"] == 77.0


def test_corruption_fuzz_never_escapes_quarantine():
    """Truncations and byte flips at every region of a valid JPEG must
    either decode (harmless corruption) or raise one of the declared
    DECODE_ERRORS — never an unexpected exception type that would fail
    a whole Spark job instead of dropping the row."""
    import random

    from pandasy_spark.extended.multimodal import DECODE_ERRORS

    p = encode_jpeg(_gradient(24, 16), 85, restart_interval=2)
    rng = random.Random(7)
    cases = []
    for _ in range(60):
        cut = rng.randrange(2, len(p))
        cases.append(p[:cut])
    for _ in range(60):
        pos = rng.randrange(2, len(p))
        flip = bytes([p[pos] ^ (1 << rng.randrange(8))])
        cases.append(p[:pos] + flip + p[pos + 1 :])
    decoded = 0
    for payload in cases:
        try:
            out = decode_jpeg(payload)
            assert out.dtype == np.uint8 and out.ndim == 3
            decoded += 1
        except DECODE_ERRORS:
            pass
    # some corruptions land in don't-care bytes and still decode
    assert decoded < len(cases)


def test_roundtrip_fuzz_random_images():
    import random

    rng = random.Random(11)
    for _ in range(8):
        h, w = rng.randrange(1, 40), rng.randrange(1, 40)
        arr = np.frombuffer(
            bytes(rng.randrange(256) for _ in range(h * w * 3)), np.uint8
        ).reshape(h, w, 3)
        q = rng.choice([60, 80, 92])
        sub = rng.random() < 0.5
        dec = decode_jpeg(encode_jpeg(arr, q, subsample=sub))
        assert dec.shape == (h, w, 3)
        # re-encode of the decode is a fixpoint-ish sanity: deterministic
        assert encode_jpeg(dec, q, subsample=sub) == encode_jpeg(dec, q, subsample=sub)


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "kwargs", [{}, {"subsample": False}, {"gray": True}]
)
def test_progressive_decodes_identically_to_baseline(kwargs):
    """The progressive scan script re-encodes the SAME quantized
    coefficients, so decoding the SOF2 stream must reproduce the
    baseline decode bit-for-bit — DC/AC first scans, the AC
    successive-approximation refinement and the DC refinement all
    have to round-trip exactly."""
    for h, w in [(8, 8), (17, 9), (37, 50), (1, 1), (20, 33)]:
        img = _gradient(h, w)
        base = decode_jpeg(encode_jpeg(img, 90, **kwargs))
        prog = decode_jpeg(encode_jpeg(img, 90, progressive=True, **kwargs))
        assert np.array_equal(base, prog), (h, w, kwargs)


def test_progressive_random_fuzz():
    import random

    rng = random.Random(23)
    for _ in range(10):
        h, w = rng.randrange(1, 48), rng.randrange(1, 48)
        arr = np.frombuffer(
            bytes(rng.randrange(256) for _ in range(h * w * 3)), np.uint8
        ).reshape(h, w, 3)
        q = rng.choice([50, 75, 90])
        sub = rng.random() < 0.5
        base = decode_jpeg(encode_jpeg(arr, q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(arr, q, subsample=sub, progressive=True)
        )
        assert np.array_equal(base, prog), (h, w, q, sub)


def test_progressive_eobn_runs_gt_one():
    """The encoder caps EOB runs at 1 (the Annex K tables lack EOBn
    symbols), but real progressive files use EOBn freely — drive the
    scan decoder directly with a custom table emitting EOB3."""
    from pandasy_spark.extended.jpeg import (
        _BitReader,
        _BitWriter,
        _HuffDecoder,
        _build_codes,
        _prog_ac_first,
        _prog_ac_refine,
    )

    # tiny table: symbols 0x01 (run0/size1), 0x10 (EOB2..3), 0x00 (EOB)
    bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [0x01, 0x10, 0x00]
    dec_tab = _HuffDecoder(bits, vals)
    codes = _build_codes(bits, vals)

    # encode: block0 has coef at k=1, then EOB3 read inside block0
    # terminates it and covers blocks 1..2 (3 blocks total)
    wtr = _BitWriter()
    c, ln = codes[0x01]
    wtr.write(c, ln)
    wtr.write(1, 1)  # value +1
    c, ln = codes[0x10]  # EOBn with r=1 -> run = 2 + extra(1 bit)
    wtr.write(c, ln)
    wtr.write(1, 1)  # extra -> EOBRUN = 3 (this block + 2 more)
    wtr.flush()
    rdr = _BitReader(bytes(wtr.out))

    blocks = [np.zeros(64, dtype=np.int64) for _ in range(3)]
    eobrun = 0
    for zz in blocks:
        eobrun = _prog_ac_first(rdr, zz, dec_tab, 1, 63, 0, eobrun)
    assert blocks[0][1] == 1
    assert all(int(b.sum()) == (1 if i == 0 else 0)
               for i, b in enumerate(blocks))
    assert eobrun == 0

    # refinement EOB run: 3 blocks, history coefficient picks up
    # correction bits through the run
    wtr = _BitWriter()
    c, ln = codes[0x10]
    wtr.write(c, ln)
    wtr.write(1, 1)  # EOBRUN = 3
    wtr.write(1, 1)  # correction bit block0 (coef k=2 -> +1<<al)
    wtr.write(0, 1)  # correction bit block1
    wtr.write(1, 1)  # correction bit block2
    wtr.flush()
    rdr = _BitReader(bytes(wtr.out))
    blocks = []
    for _ in range(3):
        zz = np.zeros(64, dtype=np.int64)
        zz[2] = -2  # history-significant at al=0 (|c|>>0 == 2)
        blocks.append(zz)
    eobrun = 0
    for zz in blocks:
        eobrun = _prog_ac_refine(rdr, zz, dec_tab, 1, 63, 0, eobrun)
    assert [int(b[2]) for b in blocks] == [-3, -2, -3]
    assert eobrun == 0
