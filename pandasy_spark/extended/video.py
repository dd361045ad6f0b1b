"""Pure numpy+stdlib video: MJPEG-in-AVI codec + frame sampling.

Implemented from the public RIFF/AVI container description (the
Microsoft AVI file format reference): the container is a RIFF chunk
walk exactly like WAV (``extended/audio.py``), and Motion-JPEG frames
are ordinary baseline JPEGs decoded by ``extended/jpeg.py`` — so this
module turns the video surface from a byte-derived fake into a REAL
decode path with no external library.  Inter-frame codecs
(H.264/VP9/AV1) need a library and raise NotImplementedError — the
same quarantine contract as WebP images and MP3 audio.

Scale posture: payloads are opaque ``binary`` columns; decode +
frame-sample run inside Arrow-batched ``mapInPandas`` (narrow, no
shuffle), emitting one row per SAMPLED frame — the
``sample_frames``-shaped row expansion with real pixels behind it.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "encode_mjpeg_avi",
    "decode_mjpeg_frames",
    "video_frame_stats",
    "video_motion_stats",
]


def encode_mjpeg_avi(
    frames: "list", fps: int = 10, quality: int = 90
) -> bytes:
    """Encode a list of ``(h, w, 3) uint8`` arrays as a minimal valid
    MJPEG AVI (one 'vids' stream, one '00dc' chunk per frame, JPEG
    via ``extended.jpeg.encode_jpeg``)."""
    import numpy as np

    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_mjpeg_avi needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    payloads = [encode_jpeg(np.asarray(f, np.uint8), quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi4h", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 10000, -1, 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def decode_mjpeg_frames(payload: bytes) -> "list":
    """Decode every MJPEG frame of an AVI payload to ``(h, w, 3)
    uint8`` arrays.  Walks the RIFF tree (nested 'rec ' LISTs
    included), decodes ``..dc``/``..db`` chunks that carry a JPEG
    SOI; a compressed stream with no JPEG frames raises
    NotImplementedError."""
    from .jpeg import decode_jpeg

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    frames: list = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_end = min(pos + 8 + size, end)
            if cid == b"LIST":
                kind = buf[pos + 8 : pos + 12]
                if kind in (b"movi", b"rec ", b"hdrl", b"strl"):
                    walk(buf, pos + 12, body_end)
            elif cid[2:4] in (b"dc", b"db"):
                body = buf[pos + 8 : body_end]
                if body[:2] == b"\xff\xd8":
                    frames.append(decode_jpeg(body))
            pos = pos + 8 + size + (size & 1)

    walk(payload, 12, len(payload))
    if not frames:
        raise NotImplementedError(
            "AVI contains no MJPEG frames (inter-frame codecs like "
            "H.264/VP9 need an external decoder)"
        )
    return frames


def video_frame_stats(
    df: DataFrame,
    every_k: int = 1,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """One row per SAMPLED frame (every ``every_k``-th, starting at
    0): (doc_id, frame_idx, width, height, mean_r, mean_g, mean_b)
    with exact integer-sum channel means.  Non-decodable payloads are
    dropped (quarantine contract)."""
    import numpy as np

    from .multimodal import DECODE_ERRORS

    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    id_name, payload_name = id_col, payload_col

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    frames = decode_mjpeg_frames(bytes(p))
                except DECODE_ERRORS:
                    continue
                for idx in range(0, len(frames), every_k):
                    f = frames[idx].astype(np.int64)
                    h, w = f.shape[:2]
                    n = h * w
                    rows.append(
                        (
                            int(did), idx, w, h,
                            float(f[:, :, 0].sum()) / n,
                            float(f[:, :, 1].sum()) / n,
                            float(f[:, :, 2].sum()) / n,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            ).astype(
                {
                    "doc_id": "int64", "frame_idx": "int32",
                    "width": "int32", "height": "int32",
                    "mean_r": "float64", "mean_g": "float64",
                    "mean_b": "float64",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _stats,
        schema=(
            "doc_id long, frame_idx int, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def video_motion_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-video MOTION features: the sum of absolute pixel
    differences between consecutive frames (channel 0) — the
    scene-change / static-content screen a video-corpus intake runs
    to drop slideshows and test patterns before expensive sampling.

    One row per video: ``(doc_id, n_frames, width, height,
    motion_total, max_pair_diff)`` with all sums in int64 — exact, so
    a synthetic-frame oracle can pin decode + differencing end to end.
    Arrow-batched mapInPandas, narrow, no shuffle; non-decodable
    payloads drop (quarantine contract)."""
    import numpy as np

    from .multimodal import DECODE_ERRORS

    id_name, payload_name = id_col, payload_col

    def _motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    frames = decode_mjpeg_frames(bytes(p))
                except DECODE_ERRORS:
                    continue
                if not frames:
                    continue
                h, w = frames[0].shape[:2]
                total = 0
                mx = 0
                for a, b in zip(frames, frames[1:]):
                    d = int(
                        np.abs(
                            a[:, :, 0].astype(np.int64)
                            - b[:, :, 0].astype(np.int64)
                        ).sum()
                    )
                    total += d
                    mx = max(mx, d)
                rows.append((int(did), len(frames), w, h, total, mx))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "width", "height",
                    "motion_total", "max_pair_diff",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_frames": "int32",
                    "width": "int32", "height": "int32",
                    "motion_total": "int64", "max_pair_diff": "int64",
                }
            )

    return df.mapInPandas(
        _motion,
        schema=(
            "doc_id long, n_frames int, width int, height int, "
            "motion_total long, max_pair_diff long"
        ),
    )
