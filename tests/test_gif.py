"""GIF codec tests (pandasy_spark/extended/gif.py): a hand-packed
spec fixture, round-trips across palette sizes and the 12-bit table
reset, interlaced row reordering, transparency + multi-frame
compositing, and the quarantine contract for corrupt payloads."""

from __future__ import annotations

import numpy as np
import pytest

from pandasy_spark.extended import gif as G

# 2x2 red/green checker, hand-packed from the GIF89a spec:
# codes clear(4,w3) 0(w3) 1(w3) 1(w3) 0(w4) end(5,w4) -> 44 02 05
HAND_FIXTURE = bytes.fromhex(
    "474946383961"
    "02000200"
    "81"
    "0000"
    "ff0000" "00ff00" "000000" "000000"
    "2c" "00000000" "02000200" "00"
    "02" "03" "440205" "00"
    "3b"
)


def test_hand_packed_fixture_decodes():
    a = G.decode_gif(HAND_FIXTURE)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 255, 0], [255, 0, 0]]], np.uint8
    )
    assert (a == expect).all()


def test_round_trip_shapes_and_palettes():
    rng = np.random.RandomState(0)
    for shape, ncol in [
        ((1, 1), 1), ((2, 3), 2), ((7, 5), 4), ((16, 16), 8),
        ((33, 47), 200), ((64, 64), 256), ((128, 3), 16),
    ]:
        pal = np.unique(
            rng.randint(0, 256, (ncol, 3), dtype=np.uint8), axis=0
        )
        img = pal[rng.randint(0, len(pal), shape)]
        rt = G.decode_gif(G.encode_gif(img))
        assert rt.shape == img.shape and (rt == img).all(), (shape, ncol)


def test_round_trip_through_12bit_table_reset():
    rng = np.random.RandomState(1)
    pal = np.array([[i, 255 - i, (i * 7) % 256] for i in range(256)], np.uint8)
    img = pal[rng.randint(0, 256, (200, 300))]
    assert (G.decode_gif(G.encode_gif(img)) == img).all()


def test_constant_image_kwkwk_chains():
    c = np.full((100, 100, 3), 9, np.uint8)
    assert (G.decode_gif(G.encode_gif(c)) == c).all()


def test_grayscale_input_promoted():
    g = np.arange(100, dtype=np.uint8).reshape(10, 10)
    assert (G.decode_gif(G.encode_gif(g)) == np.stack([g] * 3, -1)).all()


def test_interlaced_rows_reordered():
    rng = np.random.RandomState(2)
    h, w = 13, 6
    pal = np.unique(rng.randint(0, 256, (8, 3), dtype=np.uint8), axis=0)
    img = pal[rng.randint(0, len(pal), (h, w))]
    # storage order = display rows traversed in the four passes
    storage = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
               for y in range(s, h, st)]
    enc = bytearray(G.encode_gif(img[storage]))
    psize = 2 << (enc[10] & 0x07)
    packed_at = 13 + psize * 3 + 9
    assert enc[packed_at - 9] == 0x2C
    enc[packed_at] |= 0x40  # set the interlace flag
    assert (G.decode_gif(bytes(enc)) == img).all()


def _minimal_gif(frames: list[bytes], sw: int, sh: int) -> bytes:
    """Assemble header + GCT(4) + given pre-built frame blocks."""
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += b"\x81\x00\x00"  # GCT size 4, bg index 0
    out += bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    for f in frames:
        out += f
    out += b"\x3b"
    return bytes(out)


def _frame(left, top, w, h, indices, mcs=2, gce=None):
    out = bytearray()
    if gce is not None:
        out += b"\x21\xf9\x04" + gce + b"\x00"
    out += b"\x2c"
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x00"
    out.append(mcs)
    lzw = G._lzw_encode(bytes(indices), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def test_multiframe_composites_and_transparency():
    # frame 1: full 2x2 screen of color 1 (green); frame 2: a 1x2
    # strip at the top where index 3 is TRANSPARENT -> green shows
    # through under the transparent cell, blue lands on the other
    f1 = _frame(0, 0, 2, 2, [1, 1, 1, 1])
    f2 = _frame(0, 0, 2, 1, [2, 3], gce=bytes([0x01, 0, 0, 3]))
    frames = G.decode_gif_frames(_minimal_gif([f1, f2], 2, 2))
    assert len(frames) == 2
    assert (frames[0] == [0, 255, 0]).all()
    assert (frames[1][0, 0] == [0, 0, 255]).all()  # blue painted
    assert (frames[1][0, 1] == [0, 255, 0]).all()  # transparent: green
    assert (frames[1][1] == [0, 255, 0]).all()  # untouched rows


def test_subrect_frame_on_background():
    # 3x3 screen, bg index 0 (red); frame paints a 1x1 blue at (1,1)
    f = _frame(1, 1, 1, 1, [2])
    a = G.decode_gif(_minimal_gif([f], 3, 3))
    assert (a[1, 1] == [0, 0, 255]).all()
    assert (a[0, 0] == [255, 0, 0]).all()


def test_corrupt_payloads_raise():
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        G.decode_gif(HAND_FIXTURE[:-6])  # truncated sub-blocks
    # flipping an LZW data byte must not decode silently to the
    # original -- either raises or yields different pixels
    broken = bytearray(HAND_FIXTURE)
    broken[-5] ^= 0xFF
    try:
        a = G.decode_gif(bytes(broken))
        orig = G.decode_gif(HAND_FIXTURE)
        assert not (a == orig).all()
    except ValueError:
        pass


def test_encode_rejects_too_many_colors_and_bad_shapes():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(NotImplementedError):
        G.encode_gif(img)
    with pytest.raises(ValueError):
        G.encode_gif(np.zeros((2, 2, 4), np.uint8))


def test_decode_image_dispatches_gif():
    from pandasy_spark.extended.multimodal import decode_image

    img = np.array([[[255, 0, 0], [0, 255, 0]]], np.uint8)
    assert (decode_image(G.encode_gif(img)) == img).all()


def test_image_stats_drops_corrupt_gif(spark):
    from pandasy_spark.extended.multimodal import image_stats

    good = G.encode_gif(np.full((2, 2, 3), 5, np.uint8))
    rows = [(1, bytearray(good)), (2, bytearray(good[:-8]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = image_stats(df).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["mean_r"] == 5.0


# ---------------------------------------------------------------------------
# perceptual hash (lives here with the codecs it depends on)
# ---------------------------------------------------------------------------


def test_phash_format_agnostic_and_resize_robust():
    from pandasy_spark.extended.multimodal import (
        decode_image,
        encode_png,
        phash64,
    )

    rng = np.random.RandomState(5)
    pal = np.unique(rng.randint(0, 256, (64, 3), dtype=np.uint8), axis=0)
    img = pal[rng.randint(0, len(pal), (40, 48))]
    h = phash64(img)
    assert phash64(decode_image(encode_png(img))) == h
    assert phash64(decode_image(G.encode_gif(img))) == h
    big = np.kron(img, np.ones((2, 2, 1), np.uint8))
    assert bin((phash64(big) ^ h) & (2**64 - 1)).count("1") <= 2


def test_phash_distinct_images_far_apart():
    import itertools

    from pandasy_spark.extended.multimodal import phash64

    hs = []
    for s in range(30):
        r = np.random.RandomState(s)
        pal = np.unique(r.randint(0, 256, (64, 3), dtype=np.uint8), axis=0)
        hs.append(phash64(pal[r.randint(0, len(pal), (40, 48))]))
    mind = min(
        bin((a ^ b) & (2**64 - 1)).count("1")
        for a, b in itertools.combinations(hs, 2)
    )
    assert mind > 8  # banded threshold 2 has wide margin


def test_phash_dup_pairs_finds_cross_format_twins(spark):
    from pandasy_spark.extended.multimodal import (
        image_phash,
        phash_dup_pairs,
        encode_png,
    )

    rng = np.random.RandomState(9)
    rows = []
    for d in range(6):
        pal = np.unique(
            np.random.RandomState(d % 3)
            .randint(0, 256, (32, 3), dtype=np.uint8),
            axis=0,
        )
        img = pal[np.random.RandomState(d % 3).randint(0, len(pal), (20, 24))]
        payload = encode_png(img) if d < 3 else G.encode_gif(img)
        rows.append((d, bytearray(payload)))
    rows.append((99, bytearray(b"not an image")))  # dropped, not fatal
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["id1"], r["id2"])
        for r in phash_dup_pairs(image_phash(df), max_hamming=2).collect()
    }
    assert pairs == {(0, 3), (1, 4), (2, 5)}


def test_phash_dup_pairs_validates_blocks(spark):
    from pandasy_spark.extended.multimodal import phash_dup_pairs

    df = spark.createDataFrame([(1, 0)], "doc_id long, phash long")
    with pytest.raises(ValueError):
        phash_dup_pairs(df, max_hamming=4, blocks=4)
