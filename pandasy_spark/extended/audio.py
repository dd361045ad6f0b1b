"""Pure numpy+stdlib WAV codec and exact audio features.

Implemented from the public RIFF/WAVE format description (the
Microsoft multimedia file format spec): chunk walk, PCM fmt parsing,
16-bit sample decode.  Companion to the image codecs
(``extended/gif.py``, ``extended/jpeg.py``): audio payloads are
opaque ``binary`` columns and feature extraction runs inside
Arrow-batched ``mapInPandas``.  Compressed codecs (MP3/AAC/Opus) and
float/24-bit PCM need an external library and raise
NotImplementedError — the same quarantine contract as WebP images.

Features are INTEGER-EXACT so gates can value-hash them: the RMS is
``sqrt(Σx²/n)`` with the sum accumulated in int64 (no float
summation), zero crossings and peak are integer counts — all
bit-reproducible at any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "decode_wav",
    "encode_wav",
    "encode_wav_g711",
    "wav_features",
    "WAV_FEATURE_COLS",
    "spectral_features",
    "SPECTRAL_COLS",
    "resample_linear",
    "wav_resample_features",
    "RESAMPLE_COLS",
    "fingerprint_landmarks",
    "fingerprint_match",
]


def encode_wav(samples: "object", sample_rate: int = 16000) -> bytes:
    """Encode int16 samples (``(n,)`` mono or ``(n, ch)``) as a
    canonical RIFF/WAVE PCM16 payload."""
    import struct

    import numpy as np

    a = np.asarray(samples, np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(payload: bytes) -> "tuple":
    """Decode a RIFF/WAVE payload to ``(samples int16 (n, ch),
    sample_rate)``.  Walks chunks (LIST/INFO etc. are skipped); PCM
    format 1 at 16-bit and ITU-T G.711 formats 6/7 (A-law / mu-law,
    8-bit, expanded to linear int16) decode natively; anything else
    raises NotImplementedError (compressed / float audio needs a
    library)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated WAV data chunk")
            data = body
            break
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, rate, _bps, _block, bits = fmt
    if ch < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == 1 and bits == 16:
        usable = (len(data) // (2 * ch)) * ch
        a = np.frombuffer(data, "<i2", count=usable).reshape(-1, ch)
        return a, rate
    if audio_format in (6, 7) and bits == 8:
        # G.711 companded telephony audio (ITU-T G.711: A-law fmt 6,
        # mu-law fmt 7) — 8-bit codes expanded to linear int16 via the
        # 256-entry tables the spec defines; voicemail/call-center
        # corpora are full of these
        table = _alaw_table() if audio_format == 6 else _mulaw_table()
        usable = (len(data) // ch) * ch
        codes = np.frombuffer(data, np.uint8, count=usable)
        a = table[codes].reshape(-1, ch)
        return a, rate
    raise NotImplementedError(
        f"only PCM16 and G.711 (A-law/mu-law) WAV decode natively "
        f"(format={audio_format}, bits={bits}); other compressed/float "
        f"audio needs a codec library"
    )


def _mulaw_table() -> "object":
    """ITU-T G.711 mu-law expansion table (Sun g711.c reference
    algorithm): invert the code, rebuild the biased mantissa/segment,
    strip the bias.  Pure integer closed form — the gate oracle states
    the identical arithmetic in SQL."""
    import numpy as np

    u = 255 - np.arange(256, dtype=np.int64)  # ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_table() -> "object":
    """ITU-T G.711 A-law expansion table (Sun g711.c reference
    algorithm): XOR 0x55, segment 0 is linear, higher segments shift a
    0x108-biased mantissa.  Sign bit SET means positive in A-law."""
    import numpy as np

    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


WAV_FEATURE_COLS = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, peak int, rms double, zero_crossings long"
)


def wav_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio features over Arrow-batched ``mapInPandas``: decode
    WAV, then per payload (channel 0 for multi-channel):

    - ``peak`` = max |x| (int)
    - ``rms``  = sqrt(Σx²/n) — Σx² in int64, one sqrt: exact-input
      deterministic, so a synthetic-waveform oracle can pin it
    - ``zero_crossings`` = #i>0 with sign(x_i) != sign(x_{i-1}),
      zeros keeping the previous sign (so a square wave's count is
      exact)

    Non-decodable payloads are dropped (quarantine contract, same as
    :func:`image_stats`).  Scale shape: narrow mapInPandas, no
    shuffle; the per-batch loop is numpy-vectorized per payload.
    """
    import numpy as np

    from .multimodal import DECODE_ERRORS

    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    a, rate = decode_wav(bytes(p))
                except DECODE_ERRORS:
                    continue
                x = a[:, 0].astype(np.int64)
                n = len(x)
                if n == 0:
                    continue
                sq = int((x * x).sum())
                sgn = np.sign(x)
                # zeros inherit the previous sign: forward-fill
                nz = sgn != 0
                idx = np.where(nz, np.arange(n), 0)
                np.maximum.accumulate(idx, out=idx)
                filled = sgn[idx]
                zc = int(
                    ((filled[1:] != filled[:-1]) & (filled[:-1] != 0)).sum()
                )
                rows.append(
                    (
                        int(did),
                        int(rate),
                        a.shape[1],
                        n,
                        n * 1000 // int(rate),
                        int(np.abs(x).max()),
                        float(np.sqrt(sq / n)),
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "peak", "rms", "zero_crossings",
                ],
            ).astype(
                {
                    "doc_id": "int64", "sample_rate": "int32",
                    "n_channels": "int32", "n_samples": "int64",
                    "duration_ms": "int64", "peak": "int32",
                    "rms": "float64", "zero_crossings": "int64",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=WAV_FEATURE_COLS
    )


SPECTRAL_COLS = (
    "doc_id long, n_samples long, dominant_bin int, "
    "dominant_freq_hz double, parseval_ok boolean"
)


def spectral_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Dominant-frequency analysis per WAV payload (channel 0): an
    rFFT inside Arrow-batched ``mapInPandas`` emitting the peak
    non-DC bin, its frequency in Hz, and a self-certifying
    ``parseval_ok`` boolean (relative |Σ|X|²/n − Σx²| < 1e-9 — the
    energy identity any correct FFT must satisfy, in the same
    exercise-the-contract style as the expr_cast_strict gate).

    FFT magnitudes are floats and NOT engine-portable bit-for-bit,
    so gates pin the integer peak bin and the exactly-representable
    bin frequency instead of raw magnitudes; the Parseval boolean
    certifies the transform numerically in-plan.  Scale shape:
    narrow mapInPandas, no shuffle; O(n log n) per payload.
    """
    import numpy as np

    from .multimodal import DECODE_ERRORS

    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    a, rate = decode_wav(bytes(p))
                except DECODE_ERRORS:
                    continue
                x = a[:, 0].astype(np.float64)
                n = len(x)
                if n < 2:
                    continue
                spec = np.fft.rfft(x)
                mag2 = (spec * spec.conj()).real
                # Parseval for rFFT of a real signal: Σx² == (Σ|X|²
                # with interior bins doubled) / n
                interior = mag2[1 : (n + 1) // 2].sum() * 2
                total = mag2[0] + interior + (mag2[n // 2] if n % 2 == 0 else 0.0)
                energy = float((x * x).sum())
                ok = bool(
                    energy == 0.0
                    or abs(total / n - energy) <= 1e-9 * max(energy, 1.0)
                )
                bin_ = int(np.argmax(mag2[1:]) + 1) if len(mag2) > 1 else 0
                rows.append(
                    (
                        int(did), n, bin_,
                        bin_ * rate / n, ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "dominant_bin",
                    "dominant_freq_hz", "parseval_ok",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_samples": "int64",
                    "dominant_bin": "int32",
                    "dominant_freq_hz": "float64", "parseval_ok": "bool",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema=SPECTRAL_COLS
    )


def resample_linear(x: "object", up: int, down: int) -> "object":
    """EXACT integer linear-interpolation resampling of int16 PCM by
    the rational factor ``up/down`` (pure numpy, no floats).

    Output sample ``j`` sits at source position ``j*down/up``; with
    ``k = (j*down) div up`` and ``f = (j*down) mod up`` the value is
    the lattice-exact lerp ``(x[k]*(up-f) + x[k+1]*f) div up``.  The
    output length is the count of positions that land inside the
    source, ``(n-1)*up div down + 1``.  Linear interpolation is the
    deterministic baseline (a windowed-sinc polyphase filter is the
    audiophile path and needs float taps); exactness here is what
    makes resampled features oracle-checkable.
    """
    import numpy as np

    if up < 1 or down < 1:
        raise ValueError("up and down must be >= 1")
    a = np.asarray(x, np.int64)
    n = a.shape[0]
    if n == 0:
        return a.astype(np.int16)
    n_out = (n - 1) * up // down + 1
    j = np.arange(n_out, dtype=np.int64)
    num = j * down
    k = num // up
    f = num - k * up
    k1 = np.minimum(k + 1, n - 1)
    out = (a[k] * (up - f) + a[k1] * f) // up
    return out.astype(np.int16)


RESAMPLE_COLS = (
    "doc_id long, n_in long, n_out long, sum_out long, peak_out int, "
    "last_out int"
)


def wav_resample_features(
    df: DataFrame,
    up: int,
    down: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode WAV payloads, resample channel 0 by ``up/down`` with
    :func:`resample_linear`, and emit integer-exact features of the
    RESAMPLED signal (sum, peak, last sample) — the audio analogue of
    the image resize pipeline: per-payload CPU inside Arrow-batched
    ``mapInPandas``, narrow plan, no shuffle.  Non-decodable payloads
    drop (quarantine contract)."""
    import numpy as np

    from .multimodal import DECODE_ERRORS

    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    a, _rate = decode_wav(bytes(p))
                except DECODE_ERRORS:
                    continue
                x = a[:, 0]
                if len(x) == 0:
                    continue
                y = resample_linear(x, up, down).astype(np.int64)
                rows.append(
                    (
                        int(did),
                        len(x),
                        len(y),
                        int(y.sum()),
                        int(np.abs(y).max()),
                        int(y[-1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_in", "n_out", "sum_out", "peak_out",
                    "last_out",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_in": "int64", "n_out": "int64",
                    "sum_out": "int64", "peak_out": "int32",
                    "last_out": "int32",
                }
            )

    return df.mapInPandas(_extract, schema=RESAMPLE_COLS)


def encode_wav_g711(codes: bytes, sample_rate: int = 8000, law: str = "mu") -> bytes:
    """Wrap raw G.711 code bytes in a RIFF/WAVE container (format 7
    mu-law / format 6 A-law, 8-bit mono) — the gate/test writer for
    the companded-telephony decode path."""
    import struct

    if law not in ("mu", "a"):
        raise ValueError("law must be 'mu' or 'a'")
    data = bytes(codes)
    fmt = struct.pack(
        "<HHIIHH", 7 if law == "mu" else 6, 1, sample_rate, sample_rate, 1, 8
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def fingerprint_landmarks(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_len: int = 256,
    fanout: int = 2,
) -> DataFrame:
    """Constellation landmark hashes per WAV payload — the
    Shazam-style acoustic fingerprint (Wang 2003, public spec): the
    clip frames into non-overlapping ``frame_len`` windows, each
    frame's dominant non-DC rFFT bin becomes a constellation peak,
    and every peak pairs with the next ``fanout`` frames' peaks into
    an integer landmark hash ``(b1 * 256 + b2) * 8 + dt`` anchored at
    the first frame's index.

    The hash packs into one small BIGINT so matching is an EQUI-join
    on a well-distributed key (the LSH-bucket posture: never a
    similarity scan) — this function is the indexing half;
    :func:`fingerprint_match` is the retrieval half.

    Scale shape: narrow Arrow-batched ``mapInPandas``, no shuffle;
    O(frames · frame_len log frame_len) per payload; output ~
    ``fanout`` rows per frame.  Peak bins are integers, so the
    landmark stream is deterministic and engine-replayable whenever
    the audio's per-frame peaks are unambiguous (the gate constructs
    exactly that).

    Output: ``(id, t, hash)`` — frame index BIGINT, hash BIGINT.
    """
    import numpy as np

    from .multimodal import DECODE_ERRORS

    # the packed hash holds dt in 3 bits and each peak bin in 8:
    # fanout > 7 or peak bins past 255 (frame_len > 510) would make
    # DISTINCT landmarks share hashes and fingerprint_match report
    # spurious alignments (round-11 session-2 review finding)
    if not 1 <= fanout <= 7:
        raise ValueError("fanout must be in [1, 7] (3-bit dt field)")
    if not 4 <= frame_len <= 510:
        raise ValueError(
            "frame_len must be in [4, 510] (8-bit peak-bin field)"
        )

    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, hs = [], [], []
            for did, p in zip(pdf[id_name], pdf[payload_name]):
                try:
                    a, _rate = decode_wav(bytes(p))
                except DECODE_ERRORS:
                    continue
                x = a[:, 0].astype(np.float64)
                n_frames = len(x) // frame_len
                peaks = []
                for j in range(n_frames):
                    fr = x[j * frame_len : (j + 1) * frame_len]
                    mag2 = np.abs(np.fft.rfft(fr)) ** 2
                    peaks.append(
                        int(np.argmax(mag2[1:]) + 1)
                        if len(mag2) > 1
                        else 0
                    )
                for j in range(n_frames):
                    for dt in range(1, fanout + 1):
                        if j + dt < n_frames:
                            ids.append(int(did))
                            ts.append(j)
                            hs.append(
                                (peaks[j] * 256 + peaks[j + dt]) * 8
                                + dt
                            )
            yield pd.DataFrame(
                {"id": ids, "t": ts, "hash": hs}
            ).astype({"id": "int64", "t": "int64", "hash": "int64"})

    return df.select(id_col, payload_col).mapInPandas(
        _extract, schema="id long, t long, hash long"
    )


def fingerprint_match(
    query_lm: DataFrame, ref_lm: DataFrame, min_count: int = 3
) -> DataFrame:
    """Retrieval half of the acoustic fingerprint: match every query
    clip against the reference index by landmark-hash EQUI-join,
    histogram the frame offsets per (query, ref) candidate, and keep
    each query's best time-coherent alignment.

    A true match concentrates its joined landmarks on ONE offset
    (the clip's shift); chance hash collisions scatter across
    offsets — the offset histogram is the noise filter, and
    ``min_count`` is the accept threshold.  Scale shape: ONE shuffle
    on the hash key (never an all-pairs scan), ONE map-combined
    count per (query, ref, offset), and a per-query top-1 window
    over that query's candidate set (bounded by its landmark
    fan-in), with the deterministic (count DESC, ref ASC, offset
    ASC) tie order.

    Output: ``(query_id, ref_id, offset_frames, n_aligned)`` — one
    row per query with an accepted match; unmatched queries are
    absent.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    q = query_lm.select(
        F.col("id").alias("query_id"),
        F.col("t").alias("__tq"),
        "hash",
    )
    r = ref_lm.select(
        F.col("id").alias("ref_id"), F.col("t").alias("__tr"), "hash"
    )
    cand = q.join(r, "hash").groupBy(
        "query_id",
        "ref_id",
        (F.col("__tr") - F.col("__tq")).alias("offset_frames"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_aligned"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_aligned").desc(),
        F.col("ref_id").asc(),
        F.col("offset_frames").asc(),
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") == 1) & (F.col("n_aligned") >= min_count))
        .select("query_id", "ref_id", "offset_frames", "n_aligned")
    )
