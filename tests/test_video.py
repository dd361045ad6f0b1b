"""MJPEG/AVI codec + frame-sampling tests
(pandasy_spark/extended/video.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pandasy_spark.extended.jpeg import decode_jpeg, encode_jpeg
from pandasy_spark.extended.video import (
    decode_mjpeg_frames,
    encode_mjpeg_avi,
    video_frame_stats,
)


def test_frames_equal_direct_jpeg_round_trip():
    frames = [np.full((8, 12, 3), v, np.uint8) for v in (10, 130, 250)]
    dec = decode_mjpeg_frames(encode_mjpeg_avi(frames, fps=5, quality=90))
    assert len(dec) == 3
    for orig, d in zip(frames, dec):
        ref = decode_jpeg(encode_jpeg(orig, quality=90))
        assert d.shape == ref.shape and (d == ref).all()


def test_random_frames_and_order_preserved():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(4)]
    dec = decode_mjpeg_frames(encode_mjpeg_avi(frames))
    assert len(dec) == 4
    for orig, d in zip(frames, dec):
        ref = decode_jpeg(encode_jpeg(orig, quality=90))
        assert (d == ref).all()


def test_rec_list_nesting_walked():
    # some muxers wrap frame chunks in 'rec ' LISTs: splice one in
    import struct

    frames = [np.full((4, 4, 3), 99, np.uint8)]
    avi = bytearray(encode_mjpeg_avi(frames))
    jpeg = encode_jpeg(frames[0], quality=90)
    body = b"00dc" + struct.pack("<I", len(jpeg)) + jpeg + (b"\x00" if len(jpeg) & 1 else b"")
    rec = b"LIST" + struct.pack("<I", 4 + len(body)) + b"rec " + body
    movi_at = bytes(avi).find(b"movi")
    spliced = bytes(avi[: movi_at + 4]) + rec + bytes(avi[movi_at + 4 :])
    # patch the movi LIST size and RIFF size
    lsz_at = movi_at - 8
    (old,) = struct.unpack("<I", spliced[lsz_at + 4 : lsz_at + 8])
    spliced = (
        spliced[: lsz_at + 4]
        + struct.pack("<I", old + len(rec))
        + spliced[lsz_at + 8 :]
    )
    (riff,) = struct.unpack("<I", spliced[4:8])
    spliced = spliced[:4] + struct.pack("<I", riff + len(rec)) + spliced[8:]
    dec = decode_mjpeg_frames(spliced)
    assert len(dec) == 2  # the spliced frame plus the original


def test_quarantine_and_validation():
    with pytest.raises(ValueError):
        decode_mjpeg_frames(b"JUNK" * 10)
    with pytest.raises(NotImplementedError):
        decode_mjpeg_frames(b"RIFF\x04\x00\x00\x00AVI ")  # no frames
    with pytest.raises(ValueError):
        encode_mjpeg_avi([])


def test_video_frame_stats_sampling_and_drop(spark):
    frames = [np.full((4, 6, 3), v, np.uint8) for v in (40, 80, 120, 160, 200)]
    good = encode_mjpeg_avi(frames, quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a video"))],
        "doc_id long, payload binary",
    )
    rows = video_frame_stats(df, every_k=2).collect()
    assert [r["doc_id"] for r in rows] == [1, 1, 1]
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r, v in zip(rows, (40, 120, 200)):
        ref = decode_jpeg(encode_jpeg(np.full((4, 6, 3), v, np.uint8), quality=90))
        assert r["mean_r"] == ref[:, :, 0].astype(np.int64).sum() / 24
    with pytest.raises(ValueError):
        video_frame_stats(df, every_k=0)
