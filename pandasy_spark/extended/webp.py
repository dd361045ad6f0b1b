"""Pure-stdlib/numpy WebP **lossless** (VP8L) codec.

Decoder implements the complete public "WebP Lossless Bitstream
Specification" (RFC 9649 §3-5): LSB-first bitstream, canonical
Huffman codes (simple and code-length-coded forms), meta-Huffman
groups, color cache, LZ77 backward references with the 120-entry 2-D
distance neighborhood, and all four inverse transforms (predictor with
14 modes, color, subtract-green, color indexing with sub-byte pixel
bundling).  Encoder emits valid literal-only VP8L (no transforms, no
LZ77, no cache) — enough to round-trip arbitrary RGB(A) images for
tests and gates; compression quality is a non-goal.

Lossy WebP (VP8) and AVIF stay declared absences: they need full video
intra-frame codecs, out of scope for a pure-numpy port (see
multimodal.decode_image).

No counterpart in the reference (no codec code exists there); this
extends the multimodal family like extended/jpeg.py / gif.py.
"""

from __future__ import annotations

import struct

__all__ = ["decode_webp", "encode_webp_lossless"]

_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# RFC 9649 §4.2.2: distance codes 1..120 map to a 2-D neighborhood
# (xoffset, yoffset); dist = xoffset + yoffset * xsize (min 1).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (5, 8), (-5, 8), (6, 7), (-6, 7), (8, 4), (7, 6), (-7, 6), (8, 5),
    (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.data):
            raise ValueError("VP8L: truncated bitstream")
        b = (self.data[p >> 3] >> (p & 7)) & 1
        self.pos = p + 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _Huffman:
    """Canonical prefix code; decode reads MSB-first bit by bit."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty Huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: shorter codes first, then symbol order
        counts: dict[int, int] = {}
        for ln, _ in nz:
            counts[ln] = counts.get(ln, 0) + 1
        code = 0
        next_code: dict[int, int] = {}
        kraft = 0
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
            kraft += counts.get(ln, 0) << (max(counts) - ln)
        if kraft != 1 << max(counts):
            raise ValueError("VP8L: Huffman code not complete")
        self.table = {}
        for ln, sym in sorted(nz):
            self.table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.max_len = max(counts)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code in stream")


def _read_code_lengths(br: _BitReader, cl_huff: _Huffman, num: int) -> list[int]:
    lengths = [0] * num
    if br.bit():  # length-limited symbol budget
        nbits = 2 + 2 * br.bits(3)
        max_symbols = 2 + br.bits(nbits)
    else:
        max_symbols = num
    prev = 8
    symbol = 0
    while symbol < num:
        if max_symbols == 0:
            break
        max_symbols -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev = cl
        else:
            if cl == 16:
                repeat, value = 3 + br.bits(2), prev
            elif cl == 17:
                repeat, value = 3 + br.bits(3), 0
            else:
                repeat, value = 11 + br.bits(7), 0
            if symbol + repeat > num:
                raise ValueError("VP8L: code-length repeat overflows")
            for _ in range(repeat):
                lengths[symbol] = value
                symbol += 1
    return lengths


def _read_huffman(br: _BitReader, alphabet: int) -> _Huffman:
    if br.bit():  # simple code: 1 or 2 symbols
        n = br.bits(1) + 1
        if br.bit():
            first = br.bits(8)
        else:
            first = br.bits(1)
        lengths = [0] * alphabet
        lengths[first] = 1
        if n == 2:
            second = br.bits(8)
            lengths[second] = 1
        elif n == 1:
            # single-symbol code: zero-length read
            h = _Huffman.__new__(_Huffman)
            h.single, h.table, h.max_len = first, None, 0
            return h
        return _Huffman(lengths)
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_ORDER[i]] = br.bits(3)
    cl_huff = _Huffman(cl_lengths)
    return _Huffman(_read_code_lengths(br, cl_huff, alphabet))


def _prefix_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_entropy_coded_image(
    br: _BitReader, w: int, h: int, level0: bool
) -> list[int]:
    """Decode one spatially-coded ARGB image (main image, transform
    data, entropy image, or palette) into a row-major list of uint32
    ARGB pixels."""
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: cache_bits > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    groups: list[list[_Huffman]] = []
    meta: list[int] | None = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.bit():  # meta-Huffman image
        meta_bits = 2 + br.bits(3)
        mw, mh = _div_round_up(w, 1 << meta_bits), _div_round_up(h, 1 << meta_bits)
        meta_px = _decode_entropy_coded_image(br, mw, mh, False)
        meta = [((p >> 16) & 0xFF) << 8 | ((p >> 8) & 0xFF) for p in meta_px]
        num_groups = max(meta) + 1
    green_alpha = 256 + 24 + cache_size
    for _ in range(num_groups):
        groups.append(
            [
                _read_huffman(br, green_alpha),  # green + length + cache
                _read_huffman(br, 256),  # red
                _read_huffman(br, 256),  # blue
                _read_huffman(br, 256),  # alpha
                _read_huffman(br, 40),  # distance
            ]
        )

    n = w * h
    out = [0] * n
    pos = 0
    hash_mul = 0x1E35A7BD
    while pos < n:
        x, y = pos % w, pos // w
        if meta is not None:
            gi = meta[(y >> meta_bits) * _div_round_up(w, 1 << meta_bits) + (x >> meta_bits)]
        else:
            gi = 0
        g = groups[gi]
        sym = g[0].read(br)
        if sym < 256:  # literal
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(hash_mul * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif sym < 280:  # LZ77 backward reference
            length = _prefix_value(br, sym - 256)
            dcode = _prefix_value(br, g[4].read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[(hash_mul * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:  # color cache
            if not cache_size:
                raise ValueError("VP8L: cache symbol without cache")
            out[pos] = cache[sym - 280]
            pos += 1
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _channels(left)
    ta, tr_, tg, tb = _channels(top)
    if mode == 5:
        xa, xr, xg, xb = _channels(tr)
        return _pack(
            _avg2(_avg2(la, xa), ta), _avg2(_avg2(lr, xr), tr_),
            _avg2(_avg2(lg, xg), tg), _avg2(_avg2(lb, xb), tb),
        )
    ja, jr, jg, jb = _channels(tl)
    if mode == 6:
        return _pack(_avg2(la, ja), _avg2(lr, jr), _avg2(lg, jg), _avg2(lb, jb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_), _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(ja, ta), _avg2(jr, tr_), _avg2(jg, tg), _avg2(jb, tb))
    xa, xr, xg, xb = _channels(tr)
    if mode == 9:
        return _pack(_avg2(ta, xa), _avg2(tr_, xr), _avg2(tg, xg), _avg2(tb, xb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, ja), _avg2(ta, xa)),
            _avg2(_avg2(lr, jr), _avg2(tr_, xr)),
            _avg2(_avg2(lg, jg), _avg2(tg, xg)),
            _avg2(_avg2(lb, jb), _avg2(tb, xb)),
        )
    if mode == 11:  # Select(top, left, topleft)
        pa_minus_pb = (
            (abs(la - ja) - abs(ta - ja))
            + (abs(lr - jr) - abs(tr_ - jr))
            + (abs(lg - jg) - abs(tg - jg))
            + (abs(lb - jb) - abs(tb - jb))
        )
        return top if pa_minus_pb <= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        return _pack(
            _clip255(la + ta - ja), _clip255(lr + tr_ - jr),
            _clip255(lg + tg - jg), _clip255(lb + tb - jb),
        )
    if mode == 13:  # ClampAddSubtractHalf
        def half(avg: int, c: int) -> int:
            d = avg - c
            q = abs(d) >> 1  # C truncation toward zero
            return _clip255(avg + (q if d >= 0 else -q))

        return _pack(
            half(_avg2(la, ta), ja), half(_avg2(lr, tr_), jr),
            half(_avg2(lg, tg), jg), half(_avg2(lb, tb), jb),
        )
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(px: list[int], w: int, h: int, data: list[int], bits: int) -> None:
    bw = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # mode 1 (left)
            elif x == 0:
                pred = px[i - w]  # mode 2 (top)
            else:
                mode = (data[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                left = px[i - 1]
                top = px[i - w]
                tl = px[i - w - 1]
                # TR of the rightmost column is the current row's
                # leftmost (already decoded) pixel — contiguous-buffer
                # addressing per the spec
                tr = px[i - w + 1]
                pred = _predict(mode, left, top, tl, tr)
            pa, pr, pg, pb = _channels(pred)
            a, r, g, b = _channels(px[i])
            px[i] = _pack((a + pa) & 0xFF, (r + pr) & 0xFF, (g + pg) & 0xFF, (b + pb) & 0xFF)


def _ct_delta(t: int, c: int) -> int:
    # (int8(t) * int8(c)) >> 5 with arithmetic shift
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, data: list[int], bits: int) -> None:
    bw = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = data[(y >> bits) * bw + (x >> bits)]
            g2r = cte & 0xFF  # blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            a, r, g, b = _channels(px[i])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            px[i] = _pack(a, r, g, b)


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        a, r, g, b = _channels(p)
        px[i] = _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def decode_webp(payload: bytes) -> "object":
    """Decode a lossless WebP (RIFF/VP8L) payload to an ``(h, w, 4)``
    uint8 RGBA numpy array.  Lossy VP8/VP8X containers raise
    NotImplementedError (declared boundary)."""
    import numpy as np

    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    fourcc = payload[12:16]
    if fourcc in (b"VP8 ", b"VP8X"):
        raise NotImplementedError(
            "lossy WebP (VP8/VP8X) requires a full intra-frame video "
            "codec; only lossless VP8L decodes natively"
        )
    if fourcc != b"VP8L":
        raise ValueError(f"WebP: unknown chunk {fourcc!r}")
    if len(payload) < 21:
        raise ValueError("VP8L: truncated container")
    (chunk_len,) = struct.unpack_from("<I", payload, 16)
    data = payload[20 : 20 + chunk_len]
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(data[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms (each type at most once), applied inverse in reverse
    transforms: list[tuple[int, object, int]] = []
    xsize = w
    palette: list[int] | None = None
    pal_bits = 0
    while br.bit():
        ttype = br.bits(2)
        if ttype in (0, 1):  # predictor / color
            sbits = br.bits(3) + 2
            tw, th = _div_round_up(xsize, 1 << sbits), _div_round_up(h, 1 << sbits)
            tdata = _decode_entropy_coded_image(br, tw, th, False)
            transforms.append((ttype, tdata, sbits))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, 0))
        else:  # color indexing
            pal_size = br.bits(8) + 1
            pal_px = _decode_entropy_coded_image(br, pal_size, 1, False)
            # palette entries are delta-coded component-wise
            acc = 0
            palette = []
            for p in pal_px:
                aa, ar, ag, ab = _channels(acc)
                pa, pr, pg, pb = _channels(p)
                acc = _pack((aa + pa) & 0xFF, (ar + pr) & 0xFF, (ag + pg) & 0xFF, (ab + pb) & 0xFF)
                palette.append(acc)
            if pal_size <= 2:
                pal_bits = 3
            elif pal_size <= 4:
                pal_bits = 2
            elif pal_size <= 16:
                pal_bits = 1
            else:
                pal_bits = 0
            xsize = _div_round_up(w, 1 << pal_bits)
            transforms.append((3, palette, pal_bits))

    px = _decode_entropy_coded_image(br, xsize, h, True)

    cur_w = xsize
    for ttype, tdata, tbits in reversed(transforms):
        if ttype == 3:
            # unbundle sub-byte indices, then map through the palette
            if tbits > 0:
                unb = [0] * (w * h)
                per = 1 << tbits  # pixels per packed green byte
                ibits = 8 >> tbits  # bits per index
                mask = (1 << ibits) - 1
                for y in range(h):
                    for x in range(w):
                        packed = px[y * cur_w + (x >> tbits)]
                        green = (packed >> 8) & 0xFF
                        idx = (green >> ((x % per) * ibits)) & mask
                        unb[y * w + x] = idx
                px = unb
                cur_w = w
            else:
                px = [((p >> 8) & 0xFF) for p in px]
            pal = tdata
            px = [pal[i] if i < len(pal) else 0x00000000 for i in px]
        elif ttype == 2:
            _inv_subtract_green(px)
        elif ttype == 1:
            _inv_color_transform(px, cur_w, h, tdata, tbits)
        else:
            _inv_predictor(px, cur_w, h, tdata, tbits)

    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (arr >> 16) & 0xFF
    rgba[:, :, 1] = (arr >> 8) & 0xFF
    rgba[:, :, 2] = arr & 0xFF
    rgba[:, :, 3] = (arr >> 24) & 0xFF
    return rgba


# ---------------------------------------------------------------------------
# Encoder (literal-only VP8L)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:  # LSB-first
        for i in range(n):
            if self.bitpos % 8 == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << (self.bitpos % 8)
            self.bitpos += 1

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _build_lengths(freq: dict[int, int], alphabet: int, max_len: int = 15) -> list[int]:
    """Huffman code lengths from frequencies; falls back to a
    fixed-length (complete) code if depth exceeds ``max_len``."""
    import heapq

    syms = sorted(freq)
    lengths = [0] * alphabet
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freq.items()))]
    heapq.heapify(heap)
    nxt = len(heap)
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, g1 + g2))
        nxt += 1
    if max(depth.values()) > max_len:
        fl = max(1, (len(syms) - 1).bit_length())
        pad = [s for s in range(alphabet) if s not in freq]
        needed = (1 << fl) - len(syms)
        for s in syms + pad[:needed]:
            lengths[s] = fl
        return lengths
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    counts: dict[int, int] = {}
    for ln, _ in nz:
        counts[ln] = counts.get(ln, 0) + 1
    code = 0
    next_code: dict[int, int] = {}
    for ln in range(1, max(counts) + 1):
        code = (code + counts.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out = {}
    for ln, s in nz:
        out[s] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _write_huffman(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if len(nz) <= 2 and all(s < 256 for s, _ in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        first = nz[0][0]
        if first <= 1 and len(nz) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(first, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        if len(nz) == 1:
            h = {nz[0][0]: (0, 0)}
            return h
        return _canonical_codes(lengths)
    bw.write(0, 1)  # normal: code-length-coded
    # CL alphabet: one CL symbol per literal length (no 16/17/18 runs)
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths = _build_lengths(cl_freq, 19, max_len=7)
    # emit 3-bit CL code lengths in the spec's permuted order, enough
    # entries to cover every used CL symbol
    last_needed = max(i for i, s in enumerate(_ORDER) if cl_lengths[s] > 0)
    num_cl = max(4, last_needed + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # no max-symbol budget: all lengths follow
    for ln in lengths:
        c, n = cl_codes[ln]
        bw.write_code(c, n)
    return _canonical_codes(lengths)


def encode_webp_lossless(arr: "object") -> bytes:
    """Encode an ``(h, w, 3)`` RGB or ``(h, w, 4)`` RGBA uint8 array as
    a valid literal-only VP8L WebP (no transforms, no LZ77, no color
    cache) — byte-exact round-trip with :func:`decode_webp`."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless expects (h, w, 3|4) uint8")
    h, w = a.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    if a.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint8)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    else:
        r, g, b, alpha = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (alpha != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman

    def freqs(chan) -> dict[int, int]:
        vals, counts = np.unique(chan, return_counts=True)
        return {int(v): int(c) for v, c in zip(vals, counts)}

    g_codes = _write_huffman(bw, _build_lengths(freqs(g), 256 + 24))
    r_codes = _write_huffman(bw, _build_lengths(freqs(r), 256))
    b_codes = _write_huffman(bw, _build_lengths(freqs(b), 256))
    a_codes = _write_huffman(bw, _build_lengths(freqs(alpha), 256))
    _write_huffman(bw, _build_lengths({0: 1}, 40))  # unused distance code

    gf, rf, bf, af = g.ravel(), r.ravel(), b.ravel(), alpha.ravel()
    for i in range(w * h):
        for codes, v in (
            (g_codes, gf[i]), (r_codes, rf[i]), (b_codes, bf[i]), (a_codes, af[i])
        ):
            c, n = codes[int(v)]
            bw.write_code(c, n)

    payload = bytes([0x2F]) + bytes(bw.bytes)
    if len(payload) % 2:
        padded = payload + b"\x00"
    else:
        padded = payload
    riff_size = 4 + 8 + len(padded)
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" + b"VP8L"
        + struct.pack("<I", len(payload)) + padded
    )
