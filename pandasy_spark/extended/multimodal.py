"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
pandas iterators over ``mapInPandas`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.  Decoding is
REAL for every format a numpy+stdlib path can handle: PPM P6, 24-bit
BMP, baseline 8-bit PNG, GIF (``extended/gif.py``), WAV audio
(``extended/audio.py``), and the JPEG Huffman processes — BASELINE
and PROGRESSIVE/SOF2 (``decode_image`` / ``image_stats``;
``encode_png`` / ``extended.jpeg.encode_jpeg`` are the round-trip
writers).  Only WebP/AVIF, compressed/float audio (MP3/AAC/Opus),
and the rare JPEG processes (arithmetic coding, lossless, 12-bit)
still require an external codec and raise NotImplementedError.  ``extract_features`` keeps the
deterministic byte-derived fake so its gate query stays
engine-oracle-checkable.
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
    "encode_png",
    "encode_tiff",
    "phash64",
    "image_phash",
    "phash_dup_pairs",
    "sniff_format",
    "build_exif_app1",
    "parse_exif",
    "exif_features",
    "EXIF_SCHEMA",
    "encode_tga",
]

# typed metadata produced by the (fake) feature extractor
FEATURE_SCHEMA = parse_schema(
    "doc_id:long,byte_len:long,width:int,height:int,n_frames:int"
)

# Everything the "drop non-decodable rows" contract must swallow:
# NotImplementedError for formats needing an absent library, and the
# malformed-payload failure modes of the numpy/zlib decoders
# (truncated buffers -> ValueError from np.frombuffer/reshape or
# struct.error from header unpacking, header fields past buffer end ->
# IndexError, absurd dimensions -> OverflowError, corrupt DEFLATE
# streams -> zlib.error).
import struct as _struct
import zlib as _zlib

DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    IndexError,
    OverflowError,
    _struct.error,
    _zlib.error,
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text in
    this synthetic setting; parquet `binary` in production)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: "object", h: int, stride: int, bpp: int) -> "object":
    """Reverse PNG row filters (RFC 2083 §6): ``raw`` is the
    decompressed IDAT stream of ``h`` rows, each 1 filter byte +
    ``stride`` data bytes; returns an (h, stride) uint8 array.

    Filters None/Up are whole-row vectorized; Sub is vectorized as a
    wrapping cumulative sum per byte lane (uint8 accumulate is mod-256
    by construction); Average/Paeth carry an intra-row serial
    dependence and fall back to a per-pixel loop for just those rows —
    encoders that matter here (ours, and most tooling writing small
    thumbnails) emit None/Sub/Up."""
    import numpy as np

    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].copy()
        if f == 0:  # None
            line = cur
        elif f == 1:  # Sub
            lanes = cur[: (stride // bpp) * bpp].reshape(-1, bpp)
            np.add.accumulate(lanes, axis=0, out=lanes)
            line = cur
        elif f == 2:  # Up
            line = cur + prev
        elif f == 3:  # Average
            line = cur
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = cur
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line
        prev = out[y]
    return out


def _decode_png(payload: bytes) -> "object":
    """Pure zlib+numpy PNG decode to ``(h, w, 3) uint8``.

    Supports the baseline that covers web thumbnails and our own
    encoder: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced, all five row filters.
    Alpha is dropped (composited over black would be a policy choice;
    stats consumers want the raw channels).  16-bit depth and Adam7
    interlacing raise NotImplementedError — rare in training corpora
    and cheap to quarantine."""
    import struct
    import zlib

    import numpy as np

    pos = len(PNG_SIGNATURE)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} not supported")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise ValueError("PNG IDAT size does not match dimensions")
    px = _png_unfilter(raw, height, stride, channels).reshape(
        height, width, channels
    )
    if color_type == 2:
        return px
    if color_type == 6:
        return px[:, :, :3].copy()
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color_type == 3: palette lookup
    if palette is None:
        raise ValueError("paletted PNG missing PLTE")
    return palette[px[:, :, 0]]


def encode_png(arr: "object") -> bytes:
    """Encode an ``(h, w, 3) uint8`` array as a minimal valid PNG
    (8-bit RGB, filter None per row, one zlib IDAT).  The round-trip
    partner of :func:`_decode_png` — lets pipelines emit a compressed,
    externally-readable payload with no image library installed."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(arr: "object") -> bytes:
    """Encode an ``(h, w, 3) uint8`` array as a 24-bit uncompressed
    (BI_RGB) Windows BMP — BITMAPINFOHEADER, bottom-up rows, BGR byte
    order, rows padded to 4 bytes.  The round-trip partner of the BMP
    branch in :func:`decode_image`."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    # bottom-up: last image row first; RGB -> BGR
    raster = b"".join(a[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
    data_offset = 14 + 40
    file_header = struct.pack(
        "<2sIHHI", b"BM", data_offset + len(raster), 0, 0, data_offset
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_header + info_header + raster


def encode_tiff(arr: "object") -> bytes:
    """Encode an ``(h, w, 3) uint8`` array as an uncompressed baseline
    TIFF 6.0 (little-endian ``II``, chunky RGB, one strip) — the
    round-trip partner of the TIFF branch in :func:`decode_image`.
    Layout: 8-byte header, IFD at offset 8 (9 entries), BitsPerSample
    triple after the IFD, raster last."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    raster = a.tobytes()
    n_entries = 9
    ifd_off = 8
    bits_off = ifd_off + 2 + n_entries * 12 + 4
    data_off = bits_off + 6

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, typ, count, value)

    entries = b"".join(
        [
            entry(256, 4, 1, w),              # ImageWidth
            entry(257, 4, 1, h),              # ImageLength
            entry(258, 3, 3, bits_off),       # BitsPerSample -> offset
            entry(259, 3, 1, 1),              # Compression: none
            entry(262, 3, 1, 2),              # Photometric: RGB
            entry(273, 4, 1, data_off),       # StripOffsets
            entry(277, 3, 1, 3),              # SamplesPerPixel
            entry(278, 4, 1, h),              # RowsPerStrip
            entry(279, 4, 1, len(raster)),    # StripByteCounts
        ]
    )
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + struct.pack("<H", n_entries)
        + entries
        + struct.pack("<I", 0)  # next IFD
        + struct.pack("<HHH", 8, 8, 8)
        + raster
    )


def _decode_tiff(payload: bytes) -> "object":
    """Baseline TIFF 6.0 decode: both byte orders, IFD walk,
    uncompressed chunky strips, 8-bit grayscale (PhotometricInterp
    0/1) or RGB(A) — alpha dropped for the RGB stats surface.
    Compression, tiling, planar and non-8-bit depths quarantine with
    NotImplementedError (bind libtiff in production)."""
    import struct

    import numpy as np

    bo = {"II": "<", "MM": ">"}[payload[:2].decode("latin1")]
    if struct.unpack(bo + "H", payload[2:4])[0] != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    type_size = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(bo + "HHI", payload[off : off + 8])
        if typ not in type_size:
            continue  # RATIONAL/ASCII metadata tags: not needed here
        size = type_size[typ] * count
        if size <= 4:
            raw = payload[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
            raw = payload[voff : voff + size]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(bo + fmt * count, raw))
    w, h = tags[256][0], tags[257][0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    if compression != 1 or any(b != 8 for b in bits):
        raise NotImplementedError(
            f"only uncompressed 8-bit TIFF supported (compression="
            f"{compression}, bits={bits})"
        )
    if photometric not in (0, 1, 2) or 322 in tags or 324 in tags:
        raise NotImplementedError(
            f"unsupported TIFF layout (photometric={photometric}, "
            f"tiled={322 in tags or 324 in tags})"
        )
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported")
    strips = b"".join(
        payload[o : o + n] for o, n in zip(tags[273], tags[279])
    )
    arr = np.frombuffer(strips, dtype=np.uint8, count=h * w * spp).reshape(
        h, w, spp
    )
    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero
        arr = 255 - arr
    if spp in (1, 2):
        # grayscale, optionally +alpha: replicate the gray plane so
        # the (h, w, 3) contract holds (spp=2 would otherwise leak a
        # 2-channel array past the slice below)
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if spp not in (3, 4):
        raise NotImplementedError(f"unsupported TIFF spp={spp}")
    return np.ascontiguousarray(arr[:, :, :3])


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an ``(h, w, 3) uint8`` numpy array.

    REAL decode for every format a pure numpy+stdlib path can handle —
    PPM (``P6``), 24-bit uncompressed (BI_RGB) BMP, baseline 8-bit
    PNG (gray/RGB/palette/alpha, all five row filters,
    non-interlaced; DEFLATE via the stdlib ``zlib``), GIF
    (``extended/gif.py``: variable-width LZW, interlacing,
    transparency, multi-frame), and the JPEG Huffman processes —
    BASELINE (SOF0/SOF1) and PROGRESSIVE (SOF2, spectral selection +
    successive approximation), 4:4:4/4:2:2/4:2:0, grayscale, restart
    markers — ``extended/jpeg.py``, implemented from the public T.81
    spec.  Only formats needing an
    external library (WebP/AVIF, arithmetic/lossless/12-bit JPEG)
    still raise NotImplementedError —
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

    if payload[:4] == b"\x00\x00\x01\x00":
        from .ico import decode_ico

        return decode_ico(payload)

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

    if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return _decode_png(payload)

    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)

    if payload[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(payload)

    if payload[:2] in (b"II", b"MM") and len(payload) >= 4 and payload[2:4] in (b"*\x00", b"\x00*"):
        return _decode_tiff(payload)

    if payload[:4] == b"qoif":
        from .qoi import decode_qoi

        return decode_qoi(payload)

    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp

        # lossless VP8L decodes natively (raises NotImplementedError
        # for lossy VP8/VP8X); alpha dropped for the RGB stats surface
        return decode_webp(payload)[:, :, :3]

    if (
        len(payload) >= 128
        and payload[0] == 0x0A
        and payload[2] == 1
        and payload[1] in (0, 2, 3, 4, 5)
    ):
        return _decode_pcx(payload)

    # TGA has no header magic: detect by the TGA 2.0 footer signature
    if len(payload) >= 44 and payload[-18:] == b"TRUEVISION-XFILE.\x00":
        return _decode_tga(payload)

    raise NotImplementedError(
        "lossy WebP (VP8) / AVIF require an external codec, not "
        "installed; PPM (P6), 24-bit BMP, baseline PNG, GIF, lossless "
        "WebP (VP8L), baseline TIFF, TGA 2.0, and baseline/progressive "
        "JPEG decode natively"
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
    out_format: str = "ppm",
) -> DataFrame:
    """REAL nearest-neighbor resize for decodable payloads (PPM/BMP/
    PNG via :func:`decode_image`): each image is decoded,
    index-strided to ``(out_h, out_w, 3)``, and re-emitted as a P6
    PPM payload (``out_format="ppm"``, default) or a compressed PNG
    (``out_format="png"`` via :func:`encode_png`) — a genuine
    pixel-space pipeline with no external library.  Non-decodable
    payloads (JPEG) are dropped (production: quarantine sink).  Same
    RESIZED_SCHEMA and Arrow-batched shape as `resize_images` (the
    format-agnostic byte-plumbing twin)."""
    import numpy as np

    if out_format not in ("ppm", "png"):
        raise ValueError(f"out_format must be 'ppm' or 'png', got {out_format!r}")
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
                ids.append(int(did))
                if out_format == "png":
                    payloads.append(encode_png(resized))
                else:
                    header = f"P6\n{out_w} {out_h}\n255\n".encode()
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


def phash64(arr: "object") -> int:
    """64-bit perceptual hash (pHash) of an ``(h, w, 3)`` or
    ``(h, w)`` uint8 array: nearest-neighbor resample to 32x32,
    integer-weight grayscale, orthonormal 2-D DCT-II, top-left 8x8
    low-frequency block thresholded at its median.  Byte-format
    agnostic by construction — a PNG and a GIF of the same pixels
    hash identically — and robust to resizing/minor noise, which
    exact payload hashing can never be."""
    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 3:
        a = (
            299 * a[:, :, 0].astype(np.int64)
            + 587 * a[:, :, 1].astype(np.int64)
            + 114 * a[:, :, 2].astype(np.int64)
        ) // 1000
    h, w = a.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    g = a[np.ix_(ys, xs)].astype(np.float64)
    n = 32
    k = np.arange(n)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    c[0] = np.sqrt(1.0 / n)
    d = c @ g @ c.T
    low = d[:8, :8].ravel()
    med = np.median(low)
    bits = 0
    for i, v in enumerate(low):
        if v > med:
            bits |= 1 << i
    return int(np.int64(np.uint64(bits)))  # wrap to signed for LongType


def image_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual hash per image payload over Arrow-batched
    ``mapInPandas`` (decode + pHash inside the batch loop;
    non-decodable payloads dropped like :func:`image_stats`).
    Output: (``id_col`` — preserved, not renamed — , phash long)."""
    id_name, payload_name = id_col, payload_col

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    arr = decode_image(bytes(p))
                except DECODE_ERRORS:
                    continue
                ids.append(int(did))
                hashes.append(phash64(arr))
            yield pd.DataFrame(
                {
                    id_name: pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _hash, schema=f"{id_name} long, phash long"
    )


def phash_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 2,
    blocks: int = 4,
    id_col: str = "doc_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate IMAGE pairs by pHash Hamming distance — the
    visual twin of text SimHash dedup (extended/dedup.py
    simhash_candidate_pairs, same pigeonhole shape): hashes within
    distance < ``blocks`` must agree exactly on one of ``blocks``
    16-bit bands, so a per-band equi-join finds all candidates
    without O(n^2); ``bit_count(xor)`` verifies in codegen.

    Scale: the join is (band, key)-equi — sum(|bucket|^2) work, the
    same story as every LSH path here; at 100 TB band keys are
    uniformly spread unless the corpus is one giant near-dup cluster,
    which is a data finding, not a plan failure."""
    if max_hamming >= blocks:
        raise ValueError(
            f"pigeonhole needs blocks > max_hamming "
            f"(got {blocks} blocks, max_hamming={max_hamming})"
        )
    width = 64 // blocks
    mask = (1 << width) - 1
    blocked = hashes.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("ph"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(hash_col, b * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("block", "key"),
    )
    left, right = blocked.alias("l"), blocked.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.block") == F.col("r.block"),
                F.col("l.key") == F.col("r.key"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            F.bit_count(F.col("l.ph").bitwiseXOR(F.col("r.ph"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def sniff_format(payload) -> "object":
    """Container-format detection from magic bytes — the first gate of
    any multimodal ingest (route each blob to the right decoder, count
    the format mix, quarantine the unknowns) — as a PURE CODEGEN
    expression: ``hex(substring(payload, 1, 16))`` prefix comparisons,
    no UDF, no shuffle.  Sniffing 100 TB of blobs is a narrow map that
    fuses into the scan.

    Detects: jpeg (FF D8 FF), png, gif (87a/89a), bmp, tiff (II/MM),
    webp (RIFF....WEBP), wav (RIFF....WAVE), ppm (``P6``), qoi
    (``qoif``), else ``'unknown'``.  NULL payloads sniff to NULL.
    """
    head = F.hex(F.substring(payload, 1, 16))
    p4 = F.substring(head, 1, 8)
    return (
        F.when(F.substring(head, 1, 6) == "FFD8FF", "jpeg")
        .when(p4 == "89504E47", "png")
        .when(
            F.substring(head, 1, 12).isin("474946383761", "474946383961"),
            "gif",
        )
        .when(F.substring(head, 1, 4) == "424D", "bmp")
        .when(p4.isin("49492A00", "4D4D002A"), "tiff")
        .when(
            (p4 == "52494646") & (F.substring(head, 17, 8) == "57454250"),
            "webp",
        )
        .when(
            (p4 == "52494646") & (F.substring(head, 17, 8) == "57415645"),
            "wav",
        )
        .when(F.substring(head, 1, 4) == "5036", "ppm")
        .when(p4 == "716F6966", "qoi")
        .when(
            # TGA has no header magic: TGA 2.0 footer signature
            F.hex(F.substring(payload, -18, 18))
            == "54525545564953494F4E2D5846494C452E00",
            "tga",
        )
        .when(payload.isNull(), F.lit(None).cast("string"))
        .otherwise("unknown")
    )


TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def encode_tga(arr: "object", rle: bool = False) -> bytes:
    """Encode ``(h, w, 3) uint8`` as a Truevision TGA (public TGA 2.0
    spec): 24-bit truecolor, TOP-DOWN row order (descriptor bit 5),
    BGR pixel order, type 2 (uncompressed) or type 10 (RLE packets —
    maximal runs, raw packets for the remainder), with the TGA 2.0
    footer so payloads are self-identifying (the format has no header
    magic)."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    bgr = a[:, :, ::-1]
    header = struct.pack(
        "<BBBHHBHHHHBB",
        0,              # id length
        0,              # no color map
        10 if rle else 2,
        0, 0, 0,        # color map spec
        0, 0,           # x/y origin
        w, h,
        24,
        0x20,           # top-down, no alpha bits
    )
    if not rle:
        body = bgr.tobytes()
    else:
        out = bytearray()
        for y in range(h):
            row = bgr[y]
            x = 0
            while x < w:
                # measure run of identical pixels
                run = 1
                while (
                    x + run < w
                    and run < 128
                    and (row[x + run] == row[x]).all()
                ):
                    run += 1
                if run >= 2:
                    out.append(0x80 | (run - 1))
                    out.extend(row[x].tobytes())
                    x += run
                else:
                    # raw packet: until next run of >= 2 or 128 pixels
                    start = x
                    x += 1
                    while (
                        x < w
                        and x - start < 128
                        and not (
                            x + 1 < w and (row[x + 1] == row[x]).all()
                        )
                    ):
                        x += 1
                    out.append((x - start) - 1)
                    out.extend(row[start:x].tobytes())
        body = bytes(out)
    # TGA 2.0 footer: ext/dev offsets 0 + signature
    footer = struct.pack("<II", 0, 0) + TGA_FOOTER
    return header + body + footer


def _decode_tga(payload: bytes) -> "object":
    """Decode Truevision TGA to ``(h, w, 3) uint8``: types 2/10
    (truecolor ± RLE) and 3/11 (grayscale ± RLE), 8/24/32-bit
    depths, both vertical orders and the right-to-left flag;
    colormapped (1/9) and 15/16-bit quarantined via
    NotImplementedError.  RLE packets (header bit 7) may cross row
    boundaries per the spec."""
    import struct

    import numpy as np

    if len(payload) < 18:
        raise ValueError("truncated TGA header")
    (
        id_len, cmap_type, img_type,
        _cm_first, cm_len, _cm_size,
        _xo, _yo, w, h, depth, desc,
    ) = struct.unpack("<BBBHHBHHHHBB", payload[:18])
    if cmap_type != 0 or img_type in (1, 9) or cm_len:
        raise NotImplementedError("colormapped TGA not supported")
    if img_type not in (2, 3, 10, 11):
        raise NotImplementedError(f"TGA image type {img_type} not supported")
    if depth not in (8, 24, 32):
        raise NotImplementedError(f"TGA depth {depth} not supported")
    bpp = depth // 8
    if img_type in (3, 11) and bpp != 1:
        raise ValueError("grayscale TGA must be 8-bit")
    pos = 18 + id_len
    n_px = w * h
    if img_type in (2, 3):
        raw = np.frombuffer(payload, np.uint8, count=n_px * bpp, offset=pos)
        px = raw.reshape(n_px, bpp)
    else:
        out = np.empty((n_px, bpp), np.uint8)
        filled = 0
        while filled < n_px:
            head = payload[pos]
            pos += 1
            count = (head & 0x7F) + 1
            if head & 0x80:
                pix = np.frombuffer(payload, np.uint8, count=bpp, offset=pos)
                pos += bpp
                out[filled : filled + count] = pix
            else:
                chunk = np.frombuffer(
                    payload, np.uint8, count=count * bpp, offset=pos
                )
                pos += count * bpp
                out[filled : filled + count] = chunk.reshape(count, bpp)
            filled += count
        if filled != n_px:
            raise ValueError("TGA RLE stream overran the pixel count")
        px = out
    px = px.reshape(h, w, bpp)
    if not desc & 0x20:      # bottom-up (the default) -> flip
        px = px[::-1]
    if desc & 0x10:          # right-to-left
        px = px[:, ::-1]
    if bpp == 1:
        return np.repeat(px, 3, axis=2)
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def _pcx_rle(row_bytes: bytes) -> bytes:
    """PCX RLE for one scanline: runs of up to 63 identical bytes
    become ``0xC0|count, value``; any literal byte >= 0xC0 MUST be
    wrapped as a count-1 run (the top two bits are the run marker)."""
    out = bytearray()
    i, n = 0, len(row_bytes)
    while i < n:
        v = row_bytes[i]
        run = 1
        while i + run < n and run < 63 and row_bytes[i + run] == v:
            run += 1
        if run > 1 or v >= 0xC0:
            out.append(0xC0 | run)
            out.append(v)
        else:
            out.append(v)
        i += run
    return bytes(out)


def encode_pcx(arr: "object") -> bytes:
    """Encode ``(h, w, 3) uint8`` as a ZSoft PCX (public PCX 5 spec):
    version 5, RLE encoding, 8 bits per plane, 3 planes (R, G, B
    plane rows interleaved per scanline), even bytes-per-line padding.
    PCX is ALWAYS RLE-compressed — the format has no uncompressed
    mode — so round-trips are lossless by construction."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    bpl = w + (w & 1)  # scanline bytes per plane, even per spec
    header = struct.pack(
        "<BBBBHHHHHH48sBBHHHH54s",
        0x0A,          # manufacturer
        5,             # version 5 (24-bit capable)
        1,             # RLE encoding
        8,             # bits per pixel per plane
        0, 0, w - 1, h - 1,
        72, 72,        # dpi
        b"\x00" * 48,  # EGA palette (unused)
        0,             # reserved
        3,             # planes
        bpl,
        1,             # palette info: color
        0, 0,          # screen size
        b"\x00" * 54,
    )
    body = bytearray()
    pad = bpl - w
    for y in range(h):
        for p in range(3):
            row = a[y, :, p].tobytes() + b"\x00" * pad
            body += _pcx_rle(row)
    return header + bytes(body)


def _decode_pcx(payload: bytes) -> "object":
    """Decode PCX to ``(h, w, 3) uint8``: RLE, 8 bits/plane, 1 plane
    (grayscale, or 256-color via the trailing VGA palette block) or
    3 planes (RGB).  The RLE stream is decoded continuously per
    scanline group (``planes × bytes_per_line``); runs may cross the
    plane boundary inside a scanline, as real encoders emit."""
    import struct

    import numpy as np

    if len(payload) < 128:
        raise ValueError("truncated PCX header")
    (
        man, version, encoding, bits,
        xmin, ymin, xmax, ymax,
    ) = struct.unpack("<BBBBHHHH", payload[:12])
    planes = payload[65]
    bpl = int.from_bytes(payload[66:68], "little")
    if man != 0x0A:
        raise ValueError("not a PCX payload")
    if encoding != 1 or bits != 8 or planes not in (1, 3):
        raise NotImplementedError(
            f"only 8-bit RLE PCX with 1 or 3 planes supported "
            f"(bits={bits}, encoding={encoding}, planes={planes})"
        )
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    total = bpl * planes
    rows = np.empty((h, total), np.uint8)
    pos = 128
    for y in range(h):
        filled = 0
        while filled < total:
            v = payload[pos]
            pos += 1
            if v >= 0xC0:
                count = v & 0x3F
                val = payload[pos]
                pos += 1
            else:
                count, val = 1, v
            end = min(filled + count, total)
            rows[y, filled:end] = val
            filled = end
    if planes == 3:
        r = rows[:, 0:w]
        g = rows[:, bpl : bpl + w]
        b = rows[:, 2 * bpl : 2 * bpl + w]
        return np.ascontiguousarray(np.stack([r, g, b], axis=2))
    # single plane: 256-color VGA palette block (0x0C + 768 bytes)
    # at the payload tail, else grayscale
    idx = rows[:, :w]
    if len(payload) - pos >= 769 and payload[-769] == 0x0C:
        pal = np.frombuffer(payload, np.uint8, count=768, offset=len(payload) - 768)
        return np.ascontiguousarray(pal.reshape(256, 3)[idx])
    return np.repeat(idx[:, :, None], 3, axis=2)


# ---------------------------------------------------------------------------
# EXIF metadata (JPEG APP1 / TIFF IFD structure — public EXIF 2.x and
# TIFF 6.0 specs).  Metadata triage is the FIRST pass of an image
# intake pipeline: orientation fixes, capture-time windows, device
# mix, claimed-vs-actual dimension checks — all read from the APP1
# segment without entropy-decoding a single MCU, so the scan costs
# header bytes, not pixels.
# ---------------------------------------------------------------------------

_EXIF_TAGS_IFD0 = {271: "make", 272: "model", 274: "orientation", 306: "datetime"}
_EXIF_TAGS_SUB = {36867: "datetime_original", 40962: "pixel_w", 40963: "pixel_h"}
_EXIF_POINTER = 34665


def build_exif_app1(
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime: str = "",
    datetime_original: str = "",
    pixel_w: int = 0,
    pixel_h: int = 0,
) -> bytes:
    """Build a JPEG APP1 segment (``FF E1 len 'Exif\\0\\0'`` + a
    little-endian TIFF block with IFD0 and the Exif sub-IFD) — the
    writer half used by gates/tests; production metadata comes from
    cameras."""
    import struct

    def _entries(tags: list) -> tuple:
        # returns (entry_bytes, data_bytes, data_offset_base_updater)
        return tags

    # layout: TIFF header (8) | IFD0 count+entries+next (2+12n+4) |
    # sub-IFD count+entries+next | string data area
    ifd0 = [
        (271, make + "\x00"),
        (272, model + "\x00"),
        (274, orientation),
        (306, datetime + "\x00"),
        (_EXIF_POINTER, None),  # pointer patched below
    ]
    sub = [
        (36867, datetime_original + "\x00"),
        (40962, pixel_w),
        (40963, pixel_h),
    ]
    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * len(ifd0) + 4
    data_off = sub_off + 2 + 12 * len(sub) + 4
    data = bytearray()

    def _entry(tag, val, sub_ifd_off):
        nonlocal data
        if tag == _EXIF_POINTER:
            return struct.pack("<HHI", tag, 4, 1) + struct.pack("<I", sub_ifd_off)
        if isinstance(val, int):
            typ = 3 if tag == 274 else 4
            if typ == 3:
                return struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", val, 0)
            return struct.pack("<HHI", tag, 4, 1) + struct.pack("<I", val)
        raw = val.encode("ascii")
        if len(raw) <= 4:
            return struct.pack("<HHI", tag, 2, len(raw)) + raw.ljust(4, b"\x00")
        off = data_off + len(data)
        data += raw
        return struct.pack("<HHI", tag, 2, len(raw)) + struct.pack("<I", off)

    ifd0_b = struct.pack("<H", len(ifd0))
    for tag, val in ifd0:
        ifd0_b += _entry(tag, val, sub_off)
    ifd0_b += struct.pack("<I", 0)
    sub_b = struct.pack("<H", len(sub))
    for tag, val in sub:
        sub_b += _entry(tag, val, sub_off)
    sub_b += struct.pack("<I", 0)
    tiff = b"II*\x00" + struct.pack("<I", ifd0_off) + ifd0_b + sub_b + bytes(data)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def parse_exif(payload: bytes) -> dict:
    """Parse EXIF metadata from a JPEG payload: walk the marker
    segments (skipping entropy-coded data is unnecessary — APP
    segments precede the first SOS), find the ``Exif\\0\\0`` APP1,
    and read IFD0 + the Exif sub-IFD.  Returns a dict with any of
    make/model/orientation/datetime/datetime_original/pixel_w/pixel_h
    present; empty dict when the payload has no EXIF.  Both byte
    orders (II/MM) supported; ASCII/SHORT/LONG tag types only (the
    triage fields are all of those types)."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, n = 2, len(payload)
    tiff = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: metadata segments are all behind us
            break
        (size,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + size]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + size
    if tiff is None:
        return {}
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad EXIF TIFF byte order")
    (ifd_off,) = struct.unpack(bo + "I", tiff[4:8])
    out: dict = {}

    def _read_ifd(off: int, names: dict) -> None:
        (cnt,) = struct.unpack(bo + "H", tiff[off : off + 2])
        for k in range(cnt):
            e = off + 2 + 12 * k
            tag, typ, num = struct.unpack(bo + "HHI", tiff[e : e + 8])
            val_raw = tiff[e + 8 : e + 12]
            if tag == _EXIF_POINTER and typ == 4:
                (sub,) = struct.unpack(bo + "I", val_raw)
                _read_ifd(sub, _EXIF_TAGS_SUB)
                continue
            if tag not in names:
                continue
            if typ == 2:  # ASCII, NUL-terminated
                if num <= 4:
                    raw = val_raw[:num]
                else:
                    (voff,) = struct.unpack(bo + "I", val_raw)
                    raw = tiff[voff : voff + num]
                out[names[tag]] = raw.rstrip(b"\x00").decode("ascii", "replace")
            elif typ == 3:  # SHORT
                out[names[tag]] = struct.unpack(bo + "H", val_raw[:2])[0]
            elif typ == 4:  # LONG
                out[names[tag]] = struct.unpack(bo + "I", val_raw)[0]

    _read_ifd(ifd_off, _EXIF_TAGS_IFD0)
    return out


EXIF_SCHEMA = (
    "doc_id long, make string, model string, orientation int, "
    "datetime string, datetime_original string, pixel_w long, pixel_h long"
)


def exif_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """EXIF triage over Arrow-batched ``mapInPandas``: one row per
    decodable JPEG with its APP1 metadata fields (NULL where a field
    is absent); payloads without EXIF or that are not JPEGs are
    dropped (quarantine contract, as image_stats).  Header-bytes-only
    CPU — no entropy decode — so the 100 TB pass is scan-bound."""

    def _extract(batches):
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    meta = parse_exif(bytes(p))
                except DECODE_ERRORS:
                    continue
                if not meta:
                    continue
                rows.append(
                    (
                        int(did),
                        meta.get("make"),
                        meta.get("model"),
                        meta.get("orientation"),
                        meta.get("datetime"),
                        meta.get("datetime_original"),
                        meta.get("pixel_w"),
                        meta.get("pixel_h"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "make", "model", "orientation",
                    "datetime", "datetime_original", "pixel_w", "pixel_h",
                ],
            ).astype(
                {
                    "doc_id": "int64", "orientation": "Int32",
                    "pixel_w": "Int64", "pixel_h": "Int64",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=EXIF_SCHEMA
    )
