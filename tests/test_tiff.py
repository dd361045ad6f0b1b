"""TIFF codec: round-trip plus crafted-stream decoder paths the
in-repo encoder never emits (big-endian MM, grayscale, multi-strip,
WhiteIsZero inversion, quarantine of compressed/tiled/planar forms)."""

import struct

import numpy as np
import pytest

from pandasy_spark.extended.multimodal import (
    _decode_tiff,
    decode_image,
    encode_tiff,
)


def _be_entry(tag, typ, count, value):
    # big-endian IFD entry; inline values are LEFT-justified in the
    # 4-byte field per TIFF 6.0 §2
    if typ == 3 and count == 1:
        return struct.pack(">HHIHH", tag, typ, count, value, 0)
    return struct.pack(">HHII", tag, typ, count, value)


def _mm_gray_two_strips(photometric: int, h=4, w=3):
    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w, 1)
    raster = gray.tobytes()
    ifd_off, n = 8, 9
    so_off = ifd_off + 2 + n * 12 + 4
    sc_off = so_off + 8
    data_off = sc_off + 8
    entries = b"".join(
        [
            _be_entry(256, 4, 1, w),
            _be_entry(257, 4, 1, h),
            _be_entry(258, 3, 1, 8),
            _be_entry(259, 3, 1, 1),
            _be_entry(262, 3, 1, photometric),
            _be_entry(273, 4, 2, so_off),
            _be_entry(277, 3, 1, 1),
            _be_entry(278, 4, 1, 2),
            _be_entry(279, 4, 2, sc_off),
        ]
    )
    strip1, strip2 = raster[: 2 * w], raster[2 * w :]
    payload = (
        struct.pack(">2sHI", b"MM", 42, ifd_off)
        + struct.pack(">H", n)
        + entries
        + struct.pack(">I", 0)
        + struct.pack(">II", data_off, data_off + len(strip1))
        + struct.pack(">II", len(strip1), len(strip2))
        + strip1
        + strip2
    )
    return payload, gray


def test_tiff_roundtrip_rgb():
    a = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (decode_image(encode_tiff(a)) == a).all()
    one = np.full((1, 1, 3), 200, np.uint8)
    assert (decode_image(encode_tiff(one)) == one).all()


def test_tiff_dispatch_from_decode_image():
    a = np.zeros((2, 2, 3), np.uint8)
    p = encode_tiff(a)
    assert p[:2] == b"II"
    assert decode_image(p).shape == (2, 2, 3)


def test_tiff_big_endian_gray_multistrip():
    payload, gray = _mm_gray_two_strips(photometric=1)
    r = _decode_tiff(payload)
    assert r.shape == (4, 3, 3)
    assert (r[:, :, 0] == gray[:, :, 0]).all()
    # gray replicated across channels
    assert (r[:, :, 1] == r[:, :, 0]).all() and (r[:, :, 2] == r[:, :, 0]).all()


def test_tiff_white_is_zero_inverts():
    payload, gray = _mm_gray_two_strips(photometric=0)
    r = _decode_tiff(payload)
    assert (r[:, :, 0] == 255 - gray[:, :, 0]).all()


def test_tiff_quarantines_unsupported():
    a = np.zeros((2, 2, 3), np.uint8)
    p = bytearray(encode_tiff(a))
    # flip Compression (tag 259, 4th entry) value to LZW (5)
    off = 8 + 2 + 3 * 12 + 8
    assert struct.unpack("<H", p[off - 8 : off - 6])[0] == 259
    p[off : off + 2] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression"):
        _decode_tiff(bytes(p))
    # planar configuration = 2: overwrite the RowsPerStrip entry (the
    # decoder never reads it — strips are concatenated) in place so no
    # stored offsets shift
    q = bytearray(encode_tiff(a))
    entry7 = 8 + 2 + 7 * 12
    assert struct.unpack("<H", q[entry7 : entry7 + 2])[0] == 278
    q[entry7 : entry7 + 12] = struct.pack("<HHIHH", 284, 3, 1, 2, 0)
    with pytest.raises(NotImplementedError, match="planar"):
        _decode_tiff(bytes(q))


def test_tiff_bad_magic_raises():
    with pytest.raises(ValueError):
        _decode_tiff(b"II\x00\x00\x00\x00\x00\x00")
