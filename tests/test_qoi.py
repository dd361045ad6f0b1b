"""QOI codec tests: crafted byte streams exercising every decode op
(not just encoder round-trips — the encoder never emits some
sequences, e.g. an INDEX hit straight after a RUN of the same pixel),
plus randomized round-trips and the decoder's error surface."""

import struct

import numpy as np
import pytest

from pandasy_spark.extended.qoi import decode_qoi, encode_qoi

MAGIC = b"qoif"
END = b"\x00" * 7 + b"\x01"


def _header(w, h, channels=3):
    return MAGIC + struct.pack(">II", w, h) + bytes([channels, 0])


def test_rgb_and_rgba_literals():
    # 2x1: RGB literal then RGBA literal (alpha decoded, dropped)
    stream = _header(2, 1, 4) + bytes(
        [0xFE, 10, 20, 30, 0xFF, 40, 50, 60, 128]
    ) + END
    arr = decode_qoi(stream)
    assert arr.shape == (1, 2, 3)
    assert arr.tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_diff_wraps_mod_256():
    # start pixel (0,0,0,255); DIFF dr=-1 dg=-2 db=+1 -> (255, 254, 1)
    tag = 0x40 | ((-1 + 2) << 4) | ((-2 + 2) << 2) | (1 + 2)
    stream = _header(1, 1) + bytes([tag]) + END
    assert decode_qoi(stream).tolist() == [[[255, 254, 1]]]


def test_luma_relative_diffs():
    # RGB(100, 100, 100) then LUMA dg=+20, dr-dg=-8, db-dg=+7
    stream = _header(2, 1) + bytes(
        [0xFE, 100, 100, 100, 0x80 | (20 + 32), ((-8 + 8) << 4) | (7 + 8)]
    ) + END
    arr = decode_qoi(stream)
    assert arr[0, 1].tolist() == [100 + 20 - 8, 100 + 20, 100 + 20 + 7]


def test_run_repeats_previous_pixel():
    # RGB literal then RUN of 5 -> six identical pixels
    stream = _header(6, 1) + bytes([0xFE, 7, 8, 9, 0xC0 | 4]) + END
    arr = decode_qoi(stream)
    assert (arr == [7, 8, 9]).all() and arr.shape == (1, 6, 3)


def test_index_recalls_seen_pixel():
    # (7,8,9) hashes to (21+40+63+2805)%64; write it, move away via
    # literal, recall via INDEX
    slot = (7 * 3 + 8 * 5 + 9 * 7 + 255 * 11) % 64
    stream = _header(3, 1) + bytes(
        [0xFE, 7, 8, 9, 0xFE, 200, 200, 200, slot]
    ) + END
    arr = decode_qoi(stream)
    assert arr[0, 2].tolist() == [7, 8, 9]


def test_index_zero_slot_initial_state():
    # INDEX op on the zeroed table yields (0,0,0,0): transparent black
    stream = _header(1, 1, 4) + bytes([0x00]) + END
    assert decode_qoi(stream).tolist() == [[[0, 0, 0]]]


def test_run_straddling_rows():
    # runs ignore row boundaries: 2x2 filled by literal + run of 3
    stream = _header(2, 2) + bytes([0xFE, 1, 2, 3, 0xC0 | 2]) + END
    assert (decode_qoi(stream) == [1, 2, 3]).all()


def test_missing_end_marker_raises():
    stream = _header(1, 1) + bytes([0xFE, 1, 2, 3]) + b"\x00" * 8
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(stream)


def test_bad_magic_and_header_raise():
    with pytest.raises(ValueError, match="magic"):
        decode_qoi(b"notq" + b"\x00" * 20)
    with pytest.raises(ValueError, match="header"):
        decode_qoi(MAGIC + struct.pack(">II", 1, 1) + bytes([5, 0]) + END)
    with pytest.raises(ValueError, match="dimensions"):
        decode_qoi(MAGIC + struct.pack(">II", 0, 1) + bytes([3, 0]) + END)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_roundtrip_rgb(seed):
    rng = np.random.default_rng(seed)
    # low-entropy patches so every op class appears: constant runs,
    # small diffs, index recalls, literals
    h, w = 13, 17
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base[3:6] = base[3]  # vertical repetition -> runs after row flatten
    base[:, 10:] = base[:, 10:11]  # horizontal runs
    arr = base.copy()
    assert (decode_qoi(encode_qoi(arr)) == arr).all()


def test_random_roundtrip_rgba_alpha_dropped():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9, 4), dtype=np.uint8)
    out = decode_qoi(encode_qoi(arr, channels=4))
    assert (out == arr[:, :, :3]).all()


def test_gradient_hits_diff_and_luma_ops():
    # first half ramps all channels +1/col (DIFF territory), second
    # half ramps green +3/col (forces LUMA)
    w = 60
    col = np.arange(w, dtype=np.int64)
    g = np.where(col < 30, 50 + col, 80 + 3 * (col - 30))
    arr = np.stack([100 + col, g, 25 + col], axis=-1)[None, :, :].astype(
        np.uint8
    )
    enc = encode_qoi(arr)
    # scan the tag stream (skipping literal/LUMA payload bytes) and
    # assert both delta ops actually appear
    ops, pos, body = set(), 0, enc[14:-8]
    while pos < len(body):
        tag = body[pos]
        if tag == 0xFE:
            pos += 4
        elif tag == 0xFF:
            pos += 5
        else:
            ops.add(tag & 0xC0)
            pos += 2 if (tag & 0xC0) == 0x80 else 1
    assert 0x40 in ops and 0x80 in ops, ops
    assert (decode_qoi(enc) == arr).all()


def test_run_longer_than_62_splits():
    arr = np.full((1, 200, 3), 9, dtype=np.uint8)
    enc = encode_qoi(arr)
    assert (decode_qoi(enc) == arr).all()


def test_decode_image_dispatch_and_sniff():
    from pandasy_spark.extended.multimodal import decode_image

    arr = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert (decode_image(encode_qoi(arr)) == arr).all()
