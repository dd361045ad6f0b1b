"""WAV codec + exact-feature tests (pandasy_spark/extended/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pandasy_spark.extended.audio import decode_wav, encode_wav, wav_features


def test_round_trip_mono_and_stereo():
    rng = np.random.RandomState(0)
    mono = rng.randint(-32768, 32768, 500).astype(np.int16)
    a, r = decode_wav(encode_wav(mono, 8000))
    assert r == 8000 and a.shape == (500, 1) and (a[:, 0] == mono).all()
    st = rng.randint(-32768, 32768, (300, 2)).astype(np.int16)
    a, r = decode_wav(encode_wav(st, 44100))
    assert r == 44100 and a.shape == (300, 2) and (a == st).all()


def test_chunk_walk_skips_list_chunks():
    mono = np.arange(-50, 50, dtype=np.int16)
    enc = bytearray(encode_wav(mono, 16000))
    lst = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = bytes(enc[:12]) + lst + bytes(enc[12:])
    a, r = decode_wav(spliced)
    assert (a[:, 0] == mono).all()


def test_quarantine_non_pcm16():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_wav(bad)
    with pytest.raises(ValueError):
        decode_wav(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        decode_wav(encode_wav(np.zeros(4, np.int16))[:20])


def test_features_square_wave_closed_form(spark):
    h, amp, n = 3, 1000, 20
    i = np.arange(n)
    x = np.where((i // h) % 2 == 0, amp, -amp).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(x, 8000))), (2, bytearray(b"bad"))],
        "doc_id long, payload binary",
    )
    rows = wav_features(df).collect()
    assert len(rows) == 1  # corrupt payload dropped
    r = rows[0]
    assert r["n_samples"] == n and r["peak"] == amp
    assert r["rms"] == float(amp)  # Σx² = n·A² exactly
    assert r["zero_crossings"] == (n - 1) // h
    assert r["duration_ms"] == n * 1000 // 8000


def test_zero_samples_keep_previous_sign(spark):
    # +A, 0, -A: the zero keeps +, so exactly ONE crossing (+ -> -);
    # leading zeros never count as a crossing
    x = np.array([0, 0, 5, 0, -5], np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(x, 8000)))], "doc_id long, payload binary"
    )
    r = wav_features(df).collect()[0]
    assert r["zero_crossings"] == 1
    assert r["peak"] == 5


def test_stereo_features_use_channel_zero(spark):
    left = np.array([100, -100, 100, -100], np.int16)
    right = np.zeros(4, np.int16)
    st = np.stack([left, right], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(st, 8000)))], "doc_id long, payload binary"
    )
    r = wav_features(df).collect()[0]
    assert r["n_channels"] == 2
    assert r["rms"] == 100.0 and r["zero_crossings"] == 3


def test_spectral_pure_tone_and_parseval(spark):
    from pandasy_spark.extended.audio import spectral_features

    n, k, amp = 256, 7, 5000
    t = np.arange(n)
    x = np.round(amp * np.cos(2 * np.pi * k * t / n)).astype(np.int16)
    noise = np.random.RandomState(0).randint(-300, 300, n).astype(np.int16)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(x, 8000))),
            (2, bytearray(encode_wav((x + noise).astype(np.int16), 8000))),
            (3, bytearray(b"junk")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in spectral_features(df).collect()}
    assert set(rows) == {1, 2}  # junk dropped
    for d in (1, 2):
        assert rows[d]["dominant_bin"] == k  # peak survives noise
        assert rows[d]["dominant_freq_hz"] == k * 8000 / 256
        assert rows[d]["parseval_ok"] is True


def test_spectral_silence_handled(spark):
    from pandasy_spark.extended.audio import spectral_features

    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(np.zeros(64, np.int16), 8000)))],
        "doc_id long, payload binary",
    )
    r = spectral_features(df).collect()[0]
    assert r["parseval_ok"] is True  # zero-energy special case


def test_g711_tables_match_reference_algorithm():
    """Both expansion tables pinned against the ITU-T G.711 / Sun
    g711.c scalar reference, all 256 codes."""
    from pandasy_spark.extended.audio import _alaw_table, _mulaw_table

    def ulaw_ref(c):
        u = ~c & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw_ref(c):
        a = c ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        return t if (a & 0x80) else -t

    mt, at = _mulaw_table(), _alaw_table()
    assert [int(v) for v in mt] == [ulaw_ref(c) for c in range(256)]
    assert [int(v) for v in at] == [alaw_ref(c) for c in range(256)]
    # spec anchors: both zero codes; A-law +/-8 around the XOR pivot
    assert mt[0xFF] == 0 and mt[0x7F] == 0
    assert at[0xD5] == 8 and at[0x55] == -8
    # mu-law peak magnitude at the 16-bit scale (Sun g711.c
    # convention, 8031 << 2) at codes 0x00/0x80
    assert mt[0x00] == -32124 and mt[0x80] == 32124


def test_g711_wav_roundtrip_and_dispatch():
    from pandasy_spark.extended.audio import (
        _alaw_table,
        _mulaw_table,
        decode_wav,
        encode_wav_g711,
    )

    codes = bytes(range(256))
    a, rate = decode_wav(encode_wav_g711(codes, 8000, "mu"))
    assert rate == 8000 and a.shape == (256, 1)
    assert (a[:, 0] == _mulaw_table()).all()
    a, _ = decode_wav(encode_wav_g711(codes, 8000, "a"))
    assert (a[:, 0] == _alaw_table()).all()


def test_g711_unsupported_law_raises():
    import pytest

    from pandasy_spark.extended.audio import encode_wav_g711

    with pytest.raises(ValueError):
        encode_wav_g711(b"\x00", law="pcm")


def test_non_g711_compressed_still_raises():
    import struct

    import pytest

    from pandasy_spark.extended.audio import decode_wav

    # format 2 (ADPCM) must keep raising NotImplementedError
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4)
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    with pytest.raises(NotImplementedError):
        decode_wav(payload)
