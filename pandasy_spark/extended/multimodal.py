"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
pandas iterators over ``mapInPandas`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested, while the
actual media decoding is STUBBED (the image/audio libraries are not in
this container): ``decode_image`` raises NotImplementedError and
``extract_features`` uses a deterministic fake derived from the bytes,
so pipelines are end-to-end runnable and oracle-checkable.
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
]

# typed metadata produced by the (fake) feature extractor
FEATURE_SCHEMA = parse_schema(
    "doc_id:long,byte_len:long,width:int,height:int,n_frames:int"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text in
    this synthetic setting; parquet `binary` in production)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes) -> "object":
    """STUB — real image decoding needs PIL/cv2, absent here.  The
    surrounding plumbing (binary column in, typed struct out, Arrow
    batching) is the deliverable; swap this function in production."""
    raise NotImplementedError(
        "image decoding requires PIL/cv2 which are not installed; "
        "extract_features uses a deterministic fake instead"
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
