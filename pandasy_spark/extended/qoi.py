"""QOI ("Quite OK Image") codec — pure-Python/numpy, implemented from
the public one-page spec (qoiformat.org, qoi-specification.pdf).

QOI is the simplest real-world lossless image format in wide use
(stb-style single-header C in the reference implementation) and shows
up in game-asset and screenshot corpora.  Like the other codecs here
(T.81 JPEG, RFC 9649 WebP-lossless, GIF/LZW, PCX/TGA/BMP/ICO), the
decode runs per-payload inside Arrow-batched ``mapInPandas`` — CPU
embarrassingly parallel over documents, no shuffle, so the intake
scales linearly with executors however many payloads arrive.

Stream model (all single-byte tags, MSB-first):

- ``QOI_OP_RGB``   ``0xFE r g b``           — literal RGB
- ``QOI_OP_RGBA``  ``0xFF r g b a``         — literal RGBA
- ``QOI_OP_INDEX`` ``0b00iiiiii``           — 64-slot seen-pixel array,
  slot ``(3r + 5g + 7b + 11a) % 64``
- ``QOI_OP_DIFF``  ``0b01_dr_dg_db``        — 2-bit channel diffs,
  bias 2, wrapping mod 256
- ``QOI_OP_LUMA``  ``0b10_dg6 | 0b_drdg4_dbdg4`` — 6-bit green diff
  (bias 32) plus 4-bit red/blue diffs RELATIVE to the green diff
  (bias 8), wrapping
- ``QOI_OP_RUN``   ``0b11rrrrrr``           — repeat previous pixel
  1..62 times (63/64 are the RGB/RGBA tags)

Previous pixel starts (0, 0, 0, 255); the index array starts zeroed;
every emitted pixel is written into its index slot; the stream ends
with seven ``0x00`` bytes then ``0x01``.
"""

from __future__ import annotations

import struct

__all__ = ["decode_qoi", "encode_qoi"]

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _index_pos(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes) -> "object":
    """Decode a QOI payload to an ``(h, w, 3) uint8`` array (alpha
    decoded per spec, dropped for the RGB stats surface)."""
    import numpy as np

    if payload[:4] != _MAGIC:
        raise ValueError("bad QOI magic")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(
            f"bad QOI header (channels={channels}, colorspace={colorspace})"
        )
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError(f"unreasonable QOI dimensions {w}x{h}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    while i < n:
        tag = data[pos]
        pos += 1
        if tag == 0xFE:  # QOI_OP_RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif tag == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            op = tag >> 6
            if op == 0:  # QOI_OP_INDEX
                r, g, b, a = index[tag & 0x3F]
            elif op == 1:  # QOI_OP_DIFF
                r = (r + ((tag >> 4) & 3) - 2) % 256
                g = (g + ((tag >> 2) & 3) - 2) % 256
                b = (b + (tag & 3) - 2) % 256
            elif op == 2:  # QOI_OP_LUMA
                dg = (tag & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # QOI_OP_RUN
                run = (tag & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                index[_index_pos(r, g, b, a)] = (r, g, b, a)
                continue
        out[i] = (r, g, b, a)
        i += 1
        index[_index_pos(r, g, b, a)] = (r, g, b, a)
    if data[pos : pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    return out[:, :3].reshape(h, w, 3)


def encode_qoi(arr: "object", channels: int | None = None) -> bytes:
    """Reference QOI encoder for an ``(h, w, 3)`` or ``(h, w, 4)``
    uint8 array — greedy per the spec's op priority (run, index, diff,
    luma, literal), byte-identical in spirit to the reference C
    encoder.  Exists so gates/tests can synthesize streams that
    exercise every decode op; production writers would use a library."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    px = arr.reshape(h * w, arr.shape[2])
    # the header channels byte must describe the actual pixel layout:
    # an RGBA array under a channels=3 header emits RGBA tags that
    # spec-conformant third-party decoders misparse (ADVICE r6)
    if channels is None:
        channels = arr.shape[2]
    elif channels != arr.shape[2]:
        raise ValueError(
            f"channels={channels} does not match array shape {arr.shape}"
        )
    out = bytearray(_MAGIC)
    out += struct.pack(">II", w, h)
    out += bytes([channels, 0])
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    has_a = arr.shape[2] == 4
    for p in px:
        r, g, b = int(p[0]), int(p[1]), int(p[2])
        a = int(p[3]) if has_a else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ip = _index_pos(r, g, b, a)
        if index[ip] == (r, g, b, a):
            out.append(ip)
        elif a == pa:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
        else:
            out += bytes([0xFF, r, g, b, a])
        index[ip] = (r, g, b, a)
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)
