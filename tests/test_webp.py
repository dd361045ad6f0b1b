"""VP8L (lossless WebP) codec tests.

Round-trips cover the encoder's literal-only path; the hand-crafted
bitstreams (built with the encoder's bit-writer primitives) cover the
decoder paths the minimal encoder never emits: LZ77 backward
references with the 2-D distance map, the color cache, subtract-green
/ predictor / color-indexing transforms with sub-byte bundling, and
meta-Huffman group switching.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pandasy_spark.extended.webp import (
    _BitWriter,
    _build_lengths,
    _write_huffman,
    decode_webp,
    encode_webp_lossless,
)


def _wrap(bw: _BitWriter) -> bytes:
    payload = bytes([0x2F]) + bytes(bw.bytes)
    padded = payload + (b"\x00" if len(payload) % 2 else b"")
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(padded)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(payload)) + padded
    )


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _code(bw: _BitWriter, syms: list[int], alphabet: int):
    return _write_huffman(bw, _build_lengths({s: 1 for s in syms}, alphabet))


def _emit(bw: _BitWriter, codes, sym: int) -> None:
    c, n = codes[sym]
    bw.write_code(c, n)


def test_roundtrip_random_images():
    rng = np.random.default_rng(7)
    for trial in range(12):
        h, w = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        ch = 3 if trial % 2 else 4
        arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        dec = decode_webp(encode_webp_lossless(arr))
        exp = (
            arr if ch == 4
            else np.concatenate([arr, np.full((h, w, 1), 255, np.uint8)], 2)
        )
        assert dec.shape == (h, w, 4)
        assert (dec == exp).all()


def test_roundtrip_simple_code_checkerboard():
    rr, cc = np.indices((5, 7))
    arr = np.where(
        ((rr + cc) % 2 == 0)[:, :, None],
        np.array([10, 200, 30], np.uint8),
        np.array([250, 5, 99], np.uint8),
    ).astype(np.uint8)
    assert (decode_webp(encode_webp_lossless(arr))[:, :, :3] == arr).all()


def test_lz77_backward_reference_and_distance_map():
    # 4x1: one literal then a length-3 copy at distance 1 -> PPPP
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g = _code(bw, [5, 258], 280)  # literal green 5 + length prefix code 2
    _code(bw, [7], 256)  # red: single, 0 bits
    _code(bw, [9], 256)  # blue
    _code(bw, [255], 256)  # alpha
    _code(bw, [1], 40)  # distance: prefix code 1 -> value 2 -> map (1,0)
    _emit(bw, g, 5)  # literal pixel (r/b/a single-symbol: no bits)
    _emit(bw, g, 258)  # length prefix code 2 -> length 3, no extra bits
    # distance code is single-symbol: no bits; (1,0) -> dist 1
    out = decode_webp(_wrap(bw))
    assert out.shape == (1, 4, 4)
    assert (out == np.array([7, 5, 9, 255], np.uint8)).all()


def test_color_cache_hit():
    P = (255 << 24) | (1 << 16) | (2 << 8) | 3
    idx = ((0x1E35A7BD * P) & 0xFFFFFFFF) >> 28  # cache_bits = 4
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(4, 4)  # cache_bits
    bw.write(0, 1)  # no meta
    g = _code(bw, [2, 8, 280 + idx], 280 + 16)
    r = _code(bw, [1, 7], 256)
    b = _code(bw, [3, 9], 256)
    _code(bw, [255], 256)
    _code(bw, [0], 40)
    _emit(bw, g, 2)
    _emit(bw, r, 1)
    _emit(bw, b, 3)  # P
    _emit(bw, g, 280 + idx)  # cache hit -> P again
    _emit(bw, g, 8)
    _emit(bw, r, 7)
    _emit(bw, b, 9)  # Q
    out = decode_webp(_wrap(bw))
    assert out[0, 0].tolist() == [1, 2, 3, 255]
    assert out[0, 1].tolist() == [1, 2, 3, 255]
    assert out[0, 2].tolist() == [7, 8, 9, 255]


def test_subtract_green_transform():
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _code(bw, [10], 280)
    _code(bw, [20], 256)
    _code(bw, [30], 256)
    _code(bw, [255], 256)
    _code(bw, [0], 40)
    out = decode_webp(_wrap(bw))  # every code single-symbol: no pixel bits
    assert out[0, 0].tolist() == [30, 10, 40, 255]  # r+g, g, b+g


def test_predictor_transform_top_mode():
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 transform image
    # transform subimage: mode 2 (top) in the green channel, all singles
    bw.write(0, 1)  # subimage: no cache
    _code(bw, [2], 280)
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 40)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g = _code(bw, [10, 5, 1, 2], 280)  # green residuals
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 40)
    for sym in (10, 5, 1, 2):
        _emit(bw, g, sym)
    out = decode_webp(_wrap(bw))
    # (0,0): +0xff000000 -> g=10, a=255; (1,0): +left -> g=15;
    # (0,1): +top -> g=11; (1,1): mode 2 (top of x=1) -> g=17
    assert out[:, :, 1].tolist() == [[10, 15], [11, 17]]
    assert (out[:, :, 3] == 255).all()
    assert (out[:, :, 0] == 0).all() and (out[:, :, 2] == 0).all()


def test_color_indexing_with_bundling():
    # 2-entry palette -> 1-bit indices, 8 pixels per packed byte
    bw = _BitWriter()
    _header(bw, 5, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # palette size - 1 = 1
    # palette subimage (2x1): A then delta(B - A), component-wise
    bw.write(0, 1)  # no cache
    g = _code(bw, [0x20, 0x30], 280)
    r = _code(bw, [0x10, 0x30], 256)
    _code(bw, [0x30], 256)  # blue single (A blue = delta blue = 0x30)
    a = _code(bw, [0xFF, 0x00], 256)
    _code(bw, [0], 40)
    _emit(bw, g, 0x20)
    _emit(bw, r, 0x10)
    _emit(bw, a, 0xFF)  # A = ff102030
    _emit(bw, g, 0x30)
    _emit(bw, r, 0x30)
    _emit(bw, a, 0x00)  # delta -> B = ff405060
    bw.write(0, 1)  # end transforms
    # main image at bundled width ceil(5/8) = 1
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _code(bw, [13], 280)  # indices 1,0,1,1,0 packed LSB-first = 0b01101
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 40)
    out = decode_webp(_wrap(bw))
    A, B = [0x10, 0x20, 0x30, 0xFF], [0x40, 0x50, 0x60, 0xFF]
    assert out[0].tolist() == [B, A, B, B, A]


def test_meta_huffman_group_switch():
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-Huffman present
    bw.write(0, 3)  # meta_bits = 2 -> blocks of 4 -> meta image 2x1
    bw.write(0, 1)  # meta subimage: no cache
    mg = _code(bw, [0, 1], 280)  # group index lives in (red<<8)|green
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 256)
    _code(bw, [0], 40)
    _emit(bw, mg, 0)
    _emit(bw, mg, 1)
    # group 0: rgb (1, 42, 2); group 1: rgb (3, 99, 4) — all singles
    for green, red, blue in ((42, 1, 2), (99, 3, 4)):
        _code(bw, [green], 280)
        _code(bw, [red], 256)
        _code(bw, [blue], 256)
        _code(bw, [255], 256)
        _code(bw, [0], 40)
    out = decode_webp(_wrap(bw))
    assert out[0, :4].tolist() == [[1, 42, 2, 255]] * 4
    assert out[0, 4:].tolist() == [[3, 99, 4, 255]] * 4


def test_lossy_and_garbage_boundaries():
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all....")
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((2, 2), np.uint8))


def test_decode_image_dispatches_webp():
    from pandasy_spark.extended.multimodal import decode_image

    arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    out = decode_image(encode_webp_lossless(arr))
    assert out.shape == (2, 4, 3)
    assert (out == arr).all()
