"""Pure numpy+stdlib GIF codec (GIF87a/GIF89a).

Implemented from the public GIF89a specification (the W3C-hosted
CompuServe spec): variable-width LZW with a 12-bit code cap and
deferred-clear tolerance, global/local color tables, interlaced row
reordering, graphics-control transparency, and multi-frame reads.
Companion to ``extended/jpeg.py`` and the PNG codec in
``extended/multimodal.py`` — the training-pipeline posture is that
image bytes are opaque ``binary`` columns and decode happens inside
Arrow-batched ``mapInPandas``, so the codec only needs to be correct
and vectorizable per frame, not hand-tuned.

The encoder (``encode_gif``) exists for round-trip tests and sinks:
it palettizes EXACT colors only (<=256 unique; no quantizer) and
writes a single non-interlaced frame.  No counterpart in the
reference (its multimodal surface stops at metadata:
/root/reference — SURVEY.md §2.9).
"""

from __future__ import annotations

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]

_MAX_WIDTH = 12  # LZW codes are capped at 12 bits by the GIF spec


# ----------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Decode a GIF LZW stream (codes packed LSB-first).

    Width bookkeeping follows the giflib convention GIF actually uses
    (NOT TIFF's "early change"): a running counter increments once per
    code read — including the first code after a clear, which adds no
    table entry — and the code width grows when the counter EXCEEDS
    2^width."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [None, None]
    table = list(base)
    counter = end + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # stream ended without END code: tolerate
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            counter = end + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("corrupt GIF: first code not a root")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: code {code} out of range")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_WIDTH):
            table.append(prev + entry[:1])
        counter += 1
        if counter > (1 << width) and width < _MAX_WIDTH:
            width += 1
        prev = entry


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode pixel indices as a GIF LZW stream (clear-first, reset at
    table-full — never relies on deferred clear)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_entry = end + 1
    counter = end + 1  # mirrors the decoder's per-code-read counter
    emit(clear, width)
    buf = b""
    for b in indices:
        trial = buf + bytes([b])
        if trial in table:
            buf = trial
            continue
        emit(table[buf], width)
        counter += 1
        if counter > (1 << width) and width < _MAX_WIDTH:
            width += 1
        if next_entry < (1 << _MAX_WIDTH):
            table[trial] = next_entry
            next_entry += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_entry = end + 1
            counter = end + 1
            width = min_code_size + 1
        buf = bytes([b])
    if buf:
        emit(table[buf], width)
        counter += 1
        if counter > (1 << width) and width < _MAX_WIDTH:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- reader


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("corrupt GIF: unterminated sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("corrupt GIF: sub-block past end of data")
        chunks.append(payload[pos : pos + size])
        pos += size


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(payload: bytes) -> "list":
    """Decode every frame to an ``(h, w, 3) uint8`` array on the full
    logical screen.  Frames composite per the disposal rules a
    training pipeline cares about (draw-over; restore-to-background
    clears the frame rect); transparent pixels leave the canvas
    unchanged."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3

    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), np.uint8)

    frames = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphics control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if marker != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{marker:02x}")
        left = int.from_bytes(payload[pos : pos + 2], "little")
        top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            palette = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(
                size, 3
            )
            pos += size * 3
        if palette is None:
            raise ValueError("corrupt GIF: no color table for frame")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, mcs)), np.uint8, count=fw * fh
        ).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: reorder rows into place
            rows = np.empty(fh, np.int64)
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    rows[y] = r
                    r += 1
            idx = idx[rows]
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background color
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, np.uint8)
            )
            canvas[top : top + fh, left : left + fw] = bg
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def decode_gif(payload: bytes) -> "object":
    """First frame as ``(h, w, 3) uint8`` on the logical screen."""
    return decode_gif_frames(payload)[0]


# --------------------------------------------------------------- writer


def encode_gif(arr: "object") -> bytes:
    """Encode an ``(h, w, 3) uint8`` array as a single-frame GIF89a.

    Exact palettization only: raises NotImplementedError above 256
    unique colors (a median-cut quantizer is a library concern, same
    boundary as the JPEG encoder's unsupported modes)."""
    import numpy as np

    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) or (h, w) uint8")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise NotImplementedError(
            f"{len(colors)} unique colors: GIF needs a quantizer (<=256)"
        )
    pbits = max(2, int(len(colors) - 1).bit_length())
    psize = 1 << pbits
    palette = np.zeros((psize, 3), np.uint8)
    palette[: len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (pbits - 1))  # GCT present, size 2^pbits
    out += b"\x00\x00"  # bg index, aspect
    out += palette.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image descriptor at (0, 0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)  # no LCT, no interlace
    mcs = pbits
    out.append(mcs)
    lzw = _lzw_encode(inverse.astype(np.uint8).tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
