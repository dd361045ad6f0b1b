"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
pandas iterators over ``mapInPandas`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.  Decoding is
REAL for uncompressed formats a pure-numpy path can handle (PPM P6 and
24-bit BMP — ``decode_image`` / ``image_stats``); compressed formats
(JPEG/PNG) require PIL/cv2, absent in this container, and raise
NotImplementedError.  ``extract_features`` keeps the deterministic
byte-derived fake so its gate query stays engine-oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import parse_schema

__all__ = [
    "with_binary_payload",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "AUDIO_SCHEMA",
    "extract_features",
    "decode_image",
    "sample_frames",
    "resize_images",
    "RESIZED_SCHEMA",
    "audio_features",
    "image_stats",
    "IMAGE_STATS_SCHEMA",
    "resize_decoded_images",
]

# typed metadata produced by the (fake) feature extractor
FEATURE_SCHEMA = parse_schema(
    "doc_id:long,byte_len:long,width:int,height:int,n_frames:int"
)

# Everything the "drop non-decodable rows" contract must swallow:
# NotImplementedError for formats needing an absent library, and the
# malformed-payload failure modes of the numpy decoders (truncated
# buffers -> ValueError from np.frombuffer/reshape, header fields past
# buffer end -> IndexError, absurd dimensions -> OverflowError).
DECODE_ERRORS = (NotImplementedError, ValueError, IndexError, OverflowError)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text in
    this synthetic setting; parquet `binary` in production)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an ``(h, w, 3) uint8`` numpy array.

    REAL decode for the uncompressed formats a pure-numpy path can
    handle — PPM (``P6``) and 24-bit uncompressed (BI_RGB) BMP.
    Compressed formats (JPEG/PNG/WebP) genuinely require PIL/cv2,
    absent in this container, and still raise NotImplementedError —
    swap in a library decoder for those in production; every consumer
    of this function (mapInPandas feature extractors) is agnostic to
    which branch produced the array."""
    import numpy as np

    if payload[:2] == b"P6":
        # PPM: 'P6' <ws> width <ws> height <ws> maxval <single ws> raw RGB
        # '#' starts a comment running to end-of-line anywhere in header
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace before raster data
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return arr.reshape(h, w, 3)

    if payload[:2] == b"BM":
        data_offset = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
                f"compression={compression})"
            )
        bottom_up = h > 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)
        rgb = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return rgb[::-1] if bottom_up else rgb

    raise NotImplementedError(
        "compressed image formats require PIL/cv2 which are not "
        "installed; PPM (P6) and 24-bit BMP decode natively"
    )


def _fake_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a decoder: metadata derived purely
    from the byte length, reproducible in any engine."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, n % 30


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    The iterator-of-batches shape is the production pattern for media
    decode: per-batch vectorized work, bounded memory, no per-row
    Python call overhead beyond the batch loop."""
    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p) for p in pdf[payload_name]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "byte_len": pd.Series([f[0] for f in feats], dtype="int64"),
                    "width": pd.Series([f[1] for f in feats], dtype="int32"),
                    "height": pd.Series([f[2] for f in feats], dtype="int32"),
                    "n_frames": pd.Series([f[3] for f in feats], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


# one row per sampled video frame (row-expanding 1->many mapInPandas)
FRAME_SCHEMA = parse_schema(
    "doc_id:long,frame_idx:int,frame_ts_ms:long,frame:bytes"
)

# fixed-rate audio metadata derived from the payload size
AUDIO_SCHEMA = parse_schema(
    "doc_id:long,byte_len:long,n_samples:long,duration_ms:long"
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 5,
    fps: float = 30.0,
    frame_bytes: int = 16,
) -> DataFrame:
    """Frame sampling over a binary "video" column: every ``every_n``-th
    frame becomes its own output row (frame index, event-time stamp at
    ``fps``, and the frame payload slice).

    This is the production shape for video pipelines — a row-EXPANDING
    ``mapInPandas`` (one input row yields 0..n_frames/every_n rows) so
    downstream operators see plain rows they can filter/join/aggregate,
    and partitions stay bounded because each batch expands locally.
    The decoder is a deterministic fake (n_frames and the slice offsets
    derive from the byte length alone); swap the slicing for a real
    codec (pyav/cv2) in production — the schema, batching, and
    expansion plumbing are unchanged.
    """
    id_name, payload_name = id_col, payload_col

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            tss: list[int] = []
            frames: list[bytes] = []
            for did, payload in zip(pdf[id_name], pdf[payload_name]):
                payload = bytes(payload)
                n = len(payload)
                n_frames = n % 30  # fake decoder: same rule as _fake_features
                if n_frames == 0:
                    continue
                stride = n // n_frames
                for i in range(0, n_frames, every_n):
                    off = i * stride
                    ids.append(int(did))
                    idxs.append(i)
                    tss.append(int(i * 1000.0 / fps))
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema=FRAME_SCHEMA)


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio metadata stub: treats the payload as 16-bit PCM at a fixed
    rate and derives sample count / duration — pure column arithmetic,
    fully JVM-side (no Python), because nothing here needs decoding.
    A real feature extractor (rms/mfcc) would follow the
    ``extract_features`` mapInPandas pattern instead."""
    n = F.length(F.col(payload_col)).cast("long")
    n_samples = F.floor(n / F.lit(bytes_per_sample)).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("byte_len"),
        n_samples.alias("n_samples"),
        F.floor(n_samples * F.lit(1000) / F.lit(sample_rate))
        .cast("long")
        .alias("duration_ms"),
    )


RESIZED_SCHEMA = parse_schema(
    "doc_id:long,out_w:int,out_h:int,resized:bytes"
)


def resize_images(
    df: DataFrame,
    out_w: int = 64,
    out_h: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas``: binary in, binary
    out at a fixed target size — the normalization step in front of an
    embedding model.

    The "resampler" is a deterministic fake (strided byte sampling to
    exactly ``out_w*out_h`` bytes, zero-padded); swap in PIL/cv2 in
    production — schema, batching, and memory shape (each batch holds
    decoded output for its rows only) are the real deliverable."""
    id_name, payload_name = id_col, payload_col
    target = out_w * out_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[bytes] = []
            for payload in pdf[payload_name]:
                b = bytes(payload)
                if len(b) >= target:
                    stride = len(b) // target
                    out.append(b[:: stride][:target])
                else:
                    out.append(b + b"\x00" * (target - len(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                    "resized": pd.Series(out, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)


# real-decode image statistics (works for PPM/BMP payloads natively)
IMAGE_STATS_SCHEMA = parse_schema(
    "doc_id:long,width:int,height:int,mean_r:double,mean_g:double,mean_b:double"
)


def image_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL per-image statistics over ``mapInPandas``: decode each
    binary payload with :func:`decode_image` (pure-numpy PPM/BMP) and
    emit dimensions + per-channel means.  Same Arrow-batched iterator
    shape as `extract_features`; rows whose payloads need an absent
    library decoder are dropped (production: route them to a quarantine
    sink instead)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {k: [] for k in
                ["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"]}
        for pdf in batches:
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(bytes(payload))
                except DECODE_ERRORS:
                    continue
                means = img.reshape(-1, 3).mean(axis=0)
                rows["doc_id"].append(int(doc_id))
                rows["height"].append(img.shape[0])
                rows["width"].append(img.shape[1])
                rows["mean_r"].append(float(means[0]))
                rows["mean_g"].append(float(means[1]))
                rows["mean_b"].append(float(means[2]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "mean_r": pd.Series(rows["mean_r"], dtype="float64"),
                "mean_g": pd.Series(rows["mean_g"], dtype="float64"),
                "mean_b": pd.Series(rows["mean_b"], dtype="float64"),
            }
        )

    return df.select(id_col, payload_col).mapInPandas(
        _stats, schema=IMAGE_STATS_SCHEMA
    )


def resize_decoded_images(
    df: DataFrame,
    out_w: int = 64,
    out_h: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL nearest-neighbor resize for decodable payloads (PPM/BMP
    via :func:`decode_image`): each image is decoded, index-strided to
    ``(out_h, out_w, 3)``, and re-emitted as a P6 PPM payload — a
    genuine pixel-space pipeline with no external library.
    Non-decodable payloads (JPEG/PNG without PIL) are dropped
    (production: quarantine sink).  Same RESIZED_SCHEMA and
    Arrow-batched shape as `resize_images` (the format-agnostic
    byte-plumbing twin)."""
    import numpy as np

    id_name, payload_name = id_col, payload_col

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        payloads: list[bytes] = []
        for pdf in batches:
            for did, payload in zip(pdf[id_name], pdf[payload_name]):
                try:
                    img = decode_image(bytes(payload))
                except DECODE_ERRORS:
                    continue
                h, w = img.shape[:2]
                # nearest-neighbor: center-of-cell index striding
                ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(int)
                xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(int)
                resized = img[ys][:, xs]
                header = f"P6\n{out_w} {out_h}\n255\n".encode()
                ids.append(int(did))
                payloads.append(header + resized.tobytes())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_w": pd.Series([out_w] * len(ids), dtype="int32"),
                "out_h": pd.Series([out_h] * len(ids), dtype="int32"),
                "resized": pd.Series(payloads, dtype="object"),
            }
        )

    return df.select(id_col, payload_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)
