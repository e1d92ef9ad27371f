"""WebP lossless (VP8L) decoder — stdlib only, no codec libraries.

Closes the largest remaining gap of the multimodal codec boundary
(VERDICT r12 order #4): `decode_vp8l` really decodes lossless-WebP
pixels — LSB-first bitstream, canonical prefix codes, LZ77 backward
references with the 2-D distance neighborhood, color cache, meta prefix
groups, and all four transforms (predictor, color, subtract-green,
color-indexing with pixel bundling) applied inverse in reverse stream
order. Lossy WebP (VP8 intra-frame coding) stays behind the
NotImplementedError stub in operators/multimodal.py.

Format reference: the public WebP lossless bitstream specification
(RFC 9649; same text as Google's webp-lossless-bitstream-spec). Same
public-spec discipline as the BMP/GIF/JPEG decoders in
operators/imagefmt.py — parity target is the reference repo's opaque
binary-column handling (/root/reference/src, which ships no codecs at
all); the real decode is a beyond-reference capability of this repo.

Design notes mirroring the spec:

- All non-prefix-coded fields are read LSB-first within bytes.
- Prefix codes are DEFLATE-style canonical (within a code length,
  symbols ascending; shorter lengths first) and their bits appear in
  the stream most-significant-bit-of-the-code first, so a bit-at-a-time
  walk accumulates ``code = (code << 1) | bit``. The "simple" code form
  maps the first-read symbol to bit 0 REGARDLESS of symbol order (it is
  not canonicalized), and a single-symbol code consumes zero bits.
- The LZ77 distance-code -> pixel-offset neighborhood (codes 1..120) is
  GENERATED from its ordering rule — all offsets (dx, dy) with dy >= 0
  and (dy > 0 or dx > 0), sorted by (dx*dx + dy*dy) ascending, then dy
  descending, then dx descending, first 120 — which reproduces the
  spec's published table (the first 30 entries are pinned literally in
  tests/test_vp8l.py against the spec text).
"""

from __future__ import annotations

import struct

VP8L_MAGIC = 0x2F

#: LZ77 distance-code neighborhood (see module docstring for the rule).
_DIST_MAP: list[tuple[int, int]] = sorted(
    (
        (dx, dy)
        for dy in range(9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)[:120]

#: Code-length-code transmission order (spec constant).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _Bits:
    """LSB-first bit reader."""

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.pos = start_byte * 8
        self._end = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self._end:
            raise ValueError("truncated VP8L stream")
        v = 0
        d = self.data
        p = self.pos
        for k in range(n):
            v |= ((d[(p + k) >> 3] >> ((p + k) & 7)) & 1) << k
        self.pos = p + n
        return v


class _Prefix:
    """Canonical prefix code over ``lengths`` (DEFLATE construction)."""

    __slots__ = ("lut", "single")

    def __init__(self, lengths: list[int]):
        nonzero = [(l, s) for s, l in enumerate(lengths) if l > 0]
        self.lut: dict[tuple[int, int], int] = {}
        if not nonzero:
            raise ValueError("empty VP8L prefix code")
        if len(nonzero) == 1:
            # degenerate: one symbol, zero bits consumed per read
            self.single: int | None = nonzero[0][1]
            return
        self.single = None
        nonzero.sort()  # (length asc, symbol asc) — canonical order
        code = 0
        prev_len = nonzero[0][0]
        for length, sym in nonzero:
            code <<= length - prev_len
            prev_len = length
            self.lut[(length, code)] = sym
            code += 1
        # complete-code check: after assigning all, code == 2^max_len
        if code != (1 << prev_len):
            raise ValueError("over- or under-subscribed VP8L prefix code")

    @classmethod
    def simple(cls, symbols: list[int]) -> "_Prefix":
        """The 'simple code' form: 1 symbol -> 0 bits; 2 symbols -> the
        FIRST-READ symbol at bit 0 (stream order, not canonical)."""
        p = cls.__new__(cls)
        if len(symbols) == 1:
            p.single = symbols[0]
            p.lut = {}
        else:
            p.single = None
            p.lut = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return p

    def read(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while length <= 15:
            code = (code << 1) | bits.bits(1)
            length += 1
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    if bits.bits(1):  # simple form
        num_symbols = bits.bits(1) + 1
        first_is_8bit = bits.bits(1)
        s0 = bits.bits(8 if first_is_8bit else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(bits.bits(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("VP8L simple-code symbol out of alphabet")
        return _Prefix.simple(syms)
    num_code_lengths = 4 + bits.bits(4)
    if num_code_lengths > len(_CLC_ORDER):
        raise ValueError("bad VP8L code-length count")
    cll = [0] * 19
    for i in range(num_code_lengths):
        cll[_CLC_ORDER[i]] = bits.bits(3)
    clc = _Prefix(cll)
    if bits.bits(1):  # explicit max symbol count
        length_nbits = 2 + 2 * bits.bits(3)
        max_symbol = 2 + bits.bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(bits)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        else:
            if s == 16:
                repeat, fill = 3 + bits.bits(2), prev
            elif s == 17:
                repeat, fill = 3 + bits.bits(3), 0
            else:
                repeat, fill = 11 + bits.bits(7), 0
            if i + repeat > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[i] = fill
                i += 1
    return _Prefix(lengths)


def _lz77_value(bits: _Bits, prefix_code: int) -> int:
    """Length/distance prefix-coded value (spec: GetCopyLength)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + bits.bits(extra_bits) + 1


def _plane_to_dist(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(dy * xsize + dx, 1)


def _subsample(size: int, bits_: int) -> int:
    return (size + (1 << bits_) - 1) >> bits_


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 addition of two packed ARGB values."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | (((a >> 16) + (b >> 16)) & 0xFF) << 16
        | (((a >> 8) + (b >> 8)) & 0xFF) << 8
        | ((a + b) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a & 0xFF) + (b & 0xFF))) >> 1)
    )


def _select(l: int, t: int, tl: int) -> int:
    """Spec Select: return L or T, whichever is closer (Manhattan over
    channels) to the gradient estimate L + T - TL."""
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        # |pred - L| = |T - TL|, |pred - T| = |L - TL|
        p_l += abs(tc - tlc)
        p_t += abs(lc - tlc)
    return l if p_l < p_t else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av, cc = (ave >> sh) & 0xFF, (c >> sh) & 0xFF
        d = av - cc
        # C integer division truncates toward zero (the spec's `/ 2`)
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(av + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _inv_predictor(pix: list[int], xsize: int, ysize: int, size_bits: int,
                   pred_img: list[int], pred_w: int) -> None:
    for y in range(ysize):
        row = y * xsize
        for x in range(xsize):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # top row forces mode 1 (L)
            elif x == 0:
                pred = pix[i - xsize]  # left column forces mode 2 (T)
            else:
                mode = (pred_img[(y >> size_bits) * pred_w + (x >> size_bits)] >> 8) & 0xFF
                # 1-D addressing: at x == xsize-1 the "top-right" index
                # i - xsize + 1 lands on the FIRST pixel of the current
                # row (already reconstructed) — the spec's convention
                pred = _predict(
                    mode, pix[i - 1], pix[i - xsize], pix[i - xsize - 1],
                    pix[i - xsize + 1],
                )
            pix[i] = _add_px(pix[i], pred)


def _inv_color_transform(pix: list[int], xsize: int, ysize: int,
                         size_bits: int, ct_img: list[int], ct_w: int) -> None:
    for y in range(ysize):
        row = y * xsize
        crow = (y >> size_bits) * ct_w
        for x in range(xsize):
            i = row + x
            cte = ct_img[crow + (x >> size_bits)]
            g2r = _int8(cte & 0xFF)
            g2b = _int8((cte >> 8) & 0xFF)
            r2b = _int8((cte >> 16) & 0xFF)
            px = pix[i]
            green = _int8((px >> 8) & 0xFF)
            red = ((px >> 16) & 0xFF) + ((g2r * green) >> 5)
            red &= 0xFF
            blue = (px & 0xFF) + ((g2b * green) >> 5)
            blue += (r2b * _int8(red)) >> 5
            pix[i] = (px & 0xFF00FF00) | (red << 16) | (blue & 0xFF)


def _inv_subtract_green(pix: list[int]) -> None:
    for i, px in enumerate(pix):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(pix: list[int], cur_w: int, orig_w: int, ysize: int,
                        xbits: int, palette: list[int]) -> list[int]:
    n_pal = len(palette)
    out = [0] * (orig_w * ysize)
    per = 8 >> xbits if xbits else 8
    mask = (1 << xbits) - 1
    for y in range(ysize):
        for x in range(orig_w):
            if xbits:
                packed = pix[y * cur_w + (x >> xbits)]
                idx = ((packed >> 8) & 0xFF) >> ((x & mask) * per)
                idx &= (1 << per) - 1
            else:
                idx = (pix[y * cur_w + x] >> 8) & 0xFF
            # out-of-range palette index decodes as transparent black
            out[y * orig_w + x] = palette[idx] if idx < n_pal else 0
    return out


def _decode_entropy_image(bits: _Bits, xsize: int, ysize: int,
                          level0: bool) -> tuple[list[int], list, int]:
    """Decode one (possibly transformed) image stream. Returns the raw
    entropy-decoded pixels, the transform list (level0 only; the CALLER
    applies inverses so it can track widths), and the final entropy
    xsize (reduced when color-indexing pixel bundling is active)."""
    transforms: list[tuple] = []
    seen_types: set[int] = set()
    if level0:
        while bits.bits(1):
            ttype = bits.bits(2)
            if ttype in seen_types:
                raise ValueError("duplicate VP8L transform")
            seen_types.add(ttype)
            if ttype in (0, 1):  # predictor / color transform
                size_bits = bits.bits(3) + 2
                sw = _subsample(xsize, size_bits)
                sh = _subsample(ysize, size_bits)
                sub, _, _ = _decode_entropy_image(bits, sw, sh, False)
                transforms.append((ttype, size_bits, sw, sub, xsize))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None, None, xsize))
            else:  # color indexing
                n_colors = bits.bits(8) + 1
                raw, _, _ = _decode_entropy_image(bits, n_colors, 1, False)
                palette = []
                prev = 0
                for d in raw:  # palette entries are delta-coded
                    prev = _add_px(prev, d)
                    palette.append(prev)
                xbits = 3 if n_colors <= 2 else 2 if n_colors <= 4 else 1 if n_colors <= 16 else 0
                transforms.append((3, xbits, n_colors, palette, xsize))
                xsize = _subsample(xsize, xbits)

    cache_bits = 0
    if bits.bits(1):
        cache_bits = bits.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    meta = None
    n_groups = 1
    if level0 and bits.bits(1):
        hbits = bits.bits(3) + 2
        mw = _subsample(xsize, hbits)
        mh = _subsample(ysize, hbits)
        meta_img, _, _ = _decode_entropy_image(bits, mw, mh, False)
        idxs = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(idxs) + 1
        meta = (hbits, mw, idxs)
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [
        (
            _read_prefix_code(bits, 256 + 24 + cache_size),
            _read_prefix_code(bits, 256),
            _read_prefix_code(bits, 256),
            _read_prefix_code(bits, 256),
            _read_prefix_code(bits, 40),
        )
        for _ in range(n_groups)
    ]

    n = xsize * ysize
    out = [0] * n
    cache = [0] * cache_size
    pos = 0
    grp = groups[0]
    while pos < n:
        if meta is not None:
            hbits, mw, idxs = meta
            y, x = divmod(pos, xsize)
            grp = groups[idxs[(y >> hbits) * mw + (x >> hbits)]]
        s = grp[0].read(bits)
        if s < 256:  # literal
            red = grp[1].read(bits)
            blue = grp[2].read(bits)
            alpha = grp[3].read(bits)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:  # LZ77 backward reference
            length = _lz77_value(bits, s - 256)
            dist = _plane_to_dist(_lz77_value(bits, grp[4].read(bits)), xsize)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:  # color-cache reference
            if s - 280 >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms, xsize


def decode_vp8l_payload(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode the body of a VP8L chunk -> (width, height, 4, RGBA bytes)."""
    if not payload or payload[0] != VP8L_MAGIC:
        raise ValueError("not a VP8L stream")
    bits = _Bits(payload, 1)
    width = bits.bits(14) + 1
    height = bits.bits(14) + 1
    bits.bits(1)  # alpha-is-used hint (informative)
    if bits.bits(3) != 0:
        raise ValueError("unsupported VP8L version")
    pix, transforms, cur_w = _decode_entropy_image(bits, width, height, True)
    # inverses run in REVERSE stream order; color indexing restores the
    # width it reduced, so track the current width through the chain
    for tr in reversed(transforms):
        ttype = tr[0]
        if ttype == 0:
            _inv_predictor(pix, cur_w, height, tr[1], tr[3], tr[2])
        elif ttype == 1:
            _inv_color_transform(pix, cur_w, height, tr[1], tr[3], tr[2])
        elif ttype == 2:
            _inv_subtract_green(pix)
        else:
            pix = _inv_color_indexing(pix, cur_w, tr[4], height, tr[1], tr[3])
            cur_w = tr[4]
    out = bytearray(width * height * 4)
    for i, px in enumerate(pix):
        out[4 * i] = (px >> 16) & 0xFF
        out[4 * i + 1] = (px >> 8) & 0xFF
        out[4 * i + 2] = px & 0xFF
        out[4 * i + 3] = (px >> 24) & 0xFF
    return width, height, 4, bytes(out)


def decode_webp_lossless(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a RIFF-contained lossless WebP. Raises ValueError for a
    non-WebP container and NotImplementedError for lossy (VP8) payloads
    — the caller's stub boundary."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) container")
    i = 12
    while i + 8 <= len(data):
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l_payload(payload)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 intra-frame coding) is not supported; "
                "lossless (VP8L) decodes for real"
            )
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP container has no VP8L or VP8 chunk")


class _BitWriter:
    """LSB-first bit packer (encoder twin of _Bits)."""

    __slots__ = ("buf",)

    def __init__(self):
        self.buf: list[int] = []

    def bits(self, v: int, n: int) -> None:
        for k in range(n):
            self.buf.append((v >> k) & 1)

    def code(self, code: int, length: int) -> None:
        # prefix codes go MSB-of-the-code first
        for i in range(length - 1, -1, -1):
            self.buf.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.buf), 8):
            byte = 0
            for j, b in enumerate(self.buf[i : i + 8]):
                byte |= b << j
            out.append(byte)
        return bytes(out)


def encode_vp8l_rgba(pixels: bytes, width: int, height: int) -> bytes:
    """Encode RGBA bytes as a VALID lossless WebP (RIFF + VP8L) using
    identity prefix codes — no transforms, no cache, no LZ77, so every
    pixel costs 33 bits. Not a compressor: the fixture/round-trip twin
    of decode_vp8l_payload (the test-suite payload generator and the
    sink-side counterpart of the PNG encoder in operators/png.py).

    Identity codes: green gets the complete code {256 literals at 9
    bits, symbol 256 at 1 bit} — canonical assignment then maps literal
    g to the 9-bit code 256+g — and red/blue/alpha get the complete
    all-8-bit code (literal == its own code). Both code-length
    transmissions are nearly free: a degenerate single-symbol
    code-length code costs zero bits per symbol."""
    if len(pixels) != width * height * 4:
        raise ValueError("encode_vp8l_rgba: pixel buffer size mismatch")
    w = _BitWriter()
    w.bits(width - 1, 14)
    w.bits(height - 1, 14)
    w.bits(1, 1)  # alpha may be used
    w.bits(0, 3)  # version
    w.bits(0, 1)  # no transforms
    w.bits(0, 1)  # no color cache
    w.bits(0, 1)  # no meta prefix codes

    def full(lengths: list[int], alphabet: int, k: int) -> None:
        w.bits(0, 1)  # not the simple form
        vals = sorted({l for l in lengths[:k]})
        cll = [0] * 19
        if len(vals) == 1:
            cll[vals[0]] = 1
        else:  # the two-value case is all this encoder emits
            cll[vals[0]] = cll[vals[1]] = 1
        ncl = max(i + 1 for i, sym in enumerate(_CLC_ORDER) if cll[sym])
        ncl = max(ncl, 4)
        w.bits(ncl - 4, 4)
        for i in range(ncl):
            w.bits(cll[_CLC_ORDER[i]], 3)
        if k < alphabet:
            w.bits(1, 1)
            nb = 2
            while (1 << nb) <= k - 2:
                nb += 2
            w.bits((nb - 2) // 2, 3)
            w.bits(k - 2, nb)
        else:
            w.bits(0, 1)
        if len(vals) > 1:
            # canonical 1-bit code over the two used length values
            for l in lengths[:k]:
                w.bits(vals.index(l), 1)

    full([9] * 256 + [1] + [0] * 23, 280, 257)  # green
    for _ in range(3):  # red, blue, alpha: identity byte codes
        full([8] * 256, 256, 256)
    w.bits(1, 1)  # distance: simple, 1 symbol
    w.bits(0, 1)
    w.bits(0, 1)
    w.bits(0, 1)  # symbol 0 in 1 bit

    for i in range(0, len(pixels), 4):
        r, g, b, a = pixels[i : i + 4]
        w.code(256 + g, 9)
        w.code(r, 8)
        w.code(b, 8)
        w.code(a, 8)
    payload = b"\x2f" + w.tobytes()
    if len(payload) % 2:
        payload += b"\x00"
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(payload))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + payload
    )
