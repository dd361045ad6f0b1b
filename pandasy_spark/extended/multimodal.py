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
    "extract_features",
    "decode_image",
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
