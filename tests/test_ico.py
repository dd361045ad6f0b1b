"""ICO container codec: PNG entries, legacy doubled-height DIBs,
entry selection, quarantine."""

import struct

import numpy as np
import pytest

from pandasy_spark.extended.ico import decode_ico, encode_ico
from pandasy_spark.extended.multimodal import decode_image


def _solid(h, w, rgb):
    a = np.zeros((h, w, 3), np.uint8)
    a[:, :] = rgb
    return a


def test_png_entries_roundtrip_largest_wins():
    small = _solid(2, 2, (1, 2, 3))
    big = _solid(3, 5, (10, 200, 30))
    out = decode_ico(encode_ico([small, big]))
    assert out.shape == (3, 5, 3)
    assert (out == (10, 200, 30)).all()
    # dispatcher routes on the ICONDIR signature
    out2 = decode_image(encode_ico([big]))
    assert (out2 == out).all()


def test_dib_entry_32bpp_bottom_up():
    w, h = 3, 2
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0)
    pix = np.zeros((h, w, 4), np.uint8)
    pix[0, :] = (30, 200, 10, 255)  # BGRA: top row RGB (10,200,30)
    pix[1, :] = (3, 2, 1, 255)      # bottom row RGB (1,2,3)
    xor_rows = pix[::-1].tobytes()  # stored bottom-up
    and_mask = b"\x00" * ((((w + 31) // 32) * 4) * h)
    dib = hdr + xor_rows + and_mask
    ico = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", w, h, 0, 0, 1, 32, len(dib), 22
    ) + dib
    out = decode_ico(ico)
    assert (out[0] == (10, 200, 30)).all()
    assert (out[1] == (1, 2, 3)).all()


def test_dib_unsupported_depth_quarantines():
    w, h = 2, 2
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 8, 0, 0, 0, 0, 0, 0)
    dib = hdr + b"\x00" * 64
    ico = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", w, h, 0, 0, 1, 8, len(dib), 22
    ) + dib
    with pytest.raises(NotImplementedError):
        decode_ico(ico)


def test_corrupt_payloads_raise_valueerror():
    with pytest.raises(ValueError):
        decode_ico(b"\x01\x02\x03")
    with pytest.raises(ValueError):
        decode_ico(struct.pack("<HHH", 0, 1, 0))  # zero entries
    # truncated entry payload
    good = encode_ico([_solid(2, 2, (5, 5, 5))])
    with pytest.raises(ValueError):
        decode_ico(good[:-4])


def test_256_dimension_encoding():
    # a 256-wide entry stores width byte 0
    big = _solid(1, 256, (9, 9, 9))
    out = decode_ico(encode_ico([big]))
    assert out.shape == (1, 256, 3)
    with pytest.raises(ValueError):
        encode_ico([_solid(1, 257, (0, 0, 0))])
