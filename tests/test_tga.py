"""TGA codec: round-trips plus crafted-stream decoder paths the
in-repo encoder never emits (bottom-up order, right-to-left flag,
grayscale types 3/11, 32-bit depth, RLE packets crossing rows,
quarantine of colormapped/15-bit forms)."""

import struct

import numpy as np
import pytest

from pandasy_spark.extended.multimodal import (
    _decode_tga,
    decode_image,
    encode_tga,
    sniff_format,  # noqa: F401  (format routing covered in round6 ops)
)


def _header(img_type, w, h, depth, desc, id_len=0, cmap_type=0, cm_len=0):
    return struct.pack(
        "<BBBHHBHHHHBB",
        id_len, cmap_type, img_type, 0, cm_len, 0, 0, 0, w, h, depth, desc,
    )


FOOTER = struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"


def test_tga_roundtrip_uncompressed_and_rle():
    a = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert (_decode_tga(encode_tga(a)) == a).all()
    assert (_decode_tga(encode_tga(a, rle=True)) == a).all()
    one = np.full((1, 1, 3), 77, np.uint8)
    assert (decode_image(encode_tga(one)) == one).all()


def test_tga_rle_compresses_flat_images():
    flat = np.full((8, 100, 3), 42, np.uint8)
    rle = encode_tga(flat, rle=True)
    raw = encode_tga(flat)
    assert len(rle) < len(raw) / 10
    assert (_decode_tga(rle) == flat).all()


def test_tga_bottom_up_and_right_to_left():
    a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    bgr = a[:, :, ::-1]
    # bottom-up (desc bit5 clear): rows stored last-first
    p = _header(2, 3, 2, 24, 0x00) + bgr[::-1].tobytes()
    assert (_decode_tga(p) == a).all()
    # right-to-left (bit4): columns stored reversed
    p2 = _header(2, 3, 2, 24, 0x30) + bgr[:, ::-1].tobytes()
    assert (_decode_tga(p2) == a).all()


def test_tga_grayscale_types():
    g = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p = _header(3, 3, 2, 8, 0x20) + g.tobytes()
    r = _decode_tga(p)
    assert r.shape == (2, 3, 3) and (r[:, :, 0] == g).all()
    assert (r[:, :, 1] == g).all() and (r[:, :, 2] == g).all()
    # RLE grayscale (type 11): run of 5 then raw of 1
    body = bytes([0x84, 9, 0x00, 250])
    p2 = _header(11, 3, 2, 8, 0x20) + body
    r2 = _decode_tga(p2)
    assert (r2[:, :, 0].ravel() == [9, 9, 9, 9, 9, 250]).all()


def test_tga_rle_crosses_row_boundary():
    # single run packet spanning both rows (legal per spec)
    body = bytes([0x85, 1, 2, 3])  # 6 pixels BGR=(1,2,3)
    p = _header(10, 3, 2, 24, 0x20) + body
    r = _decode_tga(p)
    assert r.shape == (2, 3, 3)
    assert (r == np.array([3, 2, 1], np.uint8)).all()


def test_tga_32bit_drops_alpha():
    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    bgra = np.dstack([a[:, :, ::-1], np.full((2, 2), 200, np.uint8)])
    p = _header(2, 2, 2, 32, 0x28) + bgra.tobytes()
    assert (_decode_tga(p) == a).all()


def test_tga_quarantines_unsupported():
    with pytest.raises(NotImplementedError, match="colormapped"):
        _decode_tga(_header(1, 2, 2, 8, 0x20, cmap_type=1, cm_len=4) + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="depth"):
        _decode_tga(_header(2, 2, 2, 16, 0x20) + b"\x00" * 16)
    with pytest.raises(ValueError):
        _decode_tga(b"\x00" * 10)
    # RLE overrun: 128-pixel run into a 4-pixel image
    with pytest.raises(ValueError, match="overran"):
        _decode_tga(_header(10, 2, 2, 24, 0x20) + bytes([0xFF, 1, 2, 3]))


def test_tga_footer_dispatch_and_sniff():
    a = np.full((2, 2, 3), 5, np.uint8)
    p = encode_tga(a)
    assert p.endswith(b"TRUEVISION-XFILE.\x00")
    assert (decode_image(p) == a).all()
