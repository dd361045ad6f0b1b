"""Pure stdlib+numpy ICO (Windows icon) codec.

Implemented from the public ICO/CUR container format description:
a 6-byte ICONDIR, 16-byte ICONDIRENTRYs, and per-entry payloads that
are either a complete PNG stream (the modern form, signaled by the
PNG signature) or a DIB — a BITMAPINFOHEADER whose ``biHeight`` is
DOUBLED (XOR color data + the legacy 1-bit AND transparency mask).

Companion to the other image codecs (``extended/{gif,jpeg,webp}.py``
and the PNG/BMP/PPM paths in ``multimodal.decode_image``): the
largest entry decodes to the ``(h, w, 3) uint8`` contract.  DIB
entries are supported at 32 and 24 bpp uncompressed (BI_RGB); other
depths/compressions raise NotImplementedError (same quarantine
contract as the other codecs).  The AND mask and the 32bpp alpha
plane are transparency metadata and are dropped — the contract is an
opaque RGB array (multimodal.py image_stats).
"""

from __future__ import annotations

__all__ = ["decode_ico", "encode_ico"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_ico(arrays: "list") -> bytes:
    """Encode ``(h, w, 3) uint8`` arrays as a PNG-compressed ICO (the
    modern form every Windows/browser consumer accepts; dimensions up
    to 256).  Entry order is preserved."""
    import struct

    from .multimodal import encode_png

    if not arrays:
        raise ValueError("encode_ico needs at least one image")
    payloads = []
    for a in arrays:
        h, w = a.shape[:2]
        if h > 256 or w > 256:
            raise ValueError("ICO entries are capped at 256x256")
        payloads.append((w, h, encode_png(a)))
    out = struct.pack("<HHH", 0, 1, len(payloads))
    offset = 6 + 16 * len(payloads)
    body = b""
    for w, h, p in payloads:
        out += struct.pack(
            "<BBBBHHII",
            w % 256,  # 256 encodes as 0
            h % 256,
            0,  # palette size
            0,  # reserved
            1,  # color planes
            32,  # bpp hint
            len(p),
            offset,
        )
        body += p
        offset += len(p)
    return out + body


def decode_ico(payload: bytes) -> "object":
    """Decode the LARGEST entry of an ICO payload to ``(h, w, 3)
    uint8`` RGB.  PNG entries route through the in-repo PNG decoder;
    DIB entries (doubled-height BITMAPINFOHEADER) decode at 32/24 bpp
    BI_RGB."""
    import struct

    import numpy as np

    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO: bad ICONDIR signature")
    (n_entries,) = struct.unpack("<H", payload[4:6])
    if n_entries < 1:
        raise ValueError("ICO with zero entries")
    best = None
    for i in range(n_entries):
        e = payload[6 + 16 * i : 6 + 16 * (i + 1)]
        if len(e) < 16:
            raise ValueError("truncated ICONDIRENTRY")
        w = e[0] or 256
        h = e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0]:
            best = (w * h, size, off)
    _, size, off = best
    entry = payload[off : off + size]
    if len(entry) < size:
        raise ValueError("truncated ICO entry payload")
    if entry[: len(_PNG_SIG)] == _PNG_SIG:
        from .multimodal import decode_image

        return decode_image(entry)
    # DIB: BITMAPINFOHEADER with doubled height (XOR + AND mask)
    if len(entry) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size = int.from_bytes(entry[0:4], "little")
    w = int.from_bytes(entry[4:8], "little", signed=True)
    h2 = int.from_bytes(entry[8:12], "little", signed=True)
    bpp = int.from_bytes(entry[14:16], "little")
    compression = int.from_bytes(entry[16:20], "little")
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only 24/32bpp BI_RGB ICO DIBs decode natively "
            f"(bpp={bpp}, compression={compression})"
        )
    h = abs(h2) // 2  # doubled: XOR rows + AND-mask rows
    row_bytes = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(
        entry, np.uint8, count=row_bytes * h, offset=hdr_size
    ).reshape(h, row_bytes)
    px = raw[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    rgb = px[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB, alpha dropped
    return rgb[::-1].copy()  # DIBs are bottom-up
