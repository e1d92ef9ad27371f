"""WebP lossless (VP8L) decoder tests — fixtures built by a minimal
in-test VP8L writer (LSB-first bit packing, canonical prefix codes),
the same house style as the BMP/GIF/JPEG writers in test_imagefmt.py:
expected pixel values are computed BY HAND from the spec semantics, so
the tests pin the decoder to RFC 9649, not to itself."""

from __future__ import annotations

import struct

import pytest

from randas_spark.operators.vp8l import (
    _DIST_MAP,
    decode_vp8l_payload,
    decode_webp_lossless,
)

# ---------------------------------------------------------------------------
# minimal VP8L writer
# ---------------------------------------------------------------------------

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical(lengths):
    """symbol -> (code, length), DEFLATE canonical assignment."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l)
    out = {}
    code = 0
    prev = nz[0][0]
    for l, s in nz:
        code <<= l - prev
        prev = l
        out[s] = (code, l)
        code += 1
    return out


def _lz77_prefix(value):
    """(prefix_code, extra_value, n_extra_bits) for a length/distance."""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        lo = ((2 + (code & 1)) << extra) + 1
        if lo <= value < lo + (1 << extra):
            return code, value - lo, extra
    raise AssertionError(f"value {value} out of LZ77 range")


class _W:
    """LSB-first bit packer + prefix-code emission helpers."""

    def __init__(self):
        self.buf = []

    def bits(self, v, n):
        for k in range(n):
            self.buf.append((v >> k) & 1)

    def code(self, code, length):
        # prefix codes go MSB-of-the-code first
        for i in range(length - 1, -1, -1):
            self.buf.append((code >> i) & 1)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.buf), 8):
            byte = 0
            for j, b in enumerate(self.buf[i : i + 8]):
                byte |= b << j
            out.append(byte)
        return bytes(out)

    # -- prefix-code transmission ------------------------------------
    def simple(self, symbols):
        self.bits(1, 1)
        self.bits(len(symbols) - 1, 1)
        if symbols[0] <= 1:
            self.bits(0, 1)
            self.bits(symbols[0], 1)
        else:
            self.bits(1, 1)
            self.bits(symbols[0], 8)
        if len(symbols) == 2:
            self.bits(symbols[1], 8)

    def full(self, lengths, alphabet_size, k=None):
        """Normal (code-length-coded) transmission of ``lengths`` for
        the first k symbols (rest zero via max_symbol)."""
        if k is None:
            k = len(lengths)
        self.bits(0, 1)  # not simple
        vals = sorted({l for l in lengths[:k]})
        cll = [0] * 19
        if len(vals) == 1:
            cll[vals[0]] = 1  # degenerate: zero bits per symbol
        elif len(vals) == 2:
            cll[vals[0]] = cll[vals[1]] = 1
        elif len(vals) == 3:
            cll[vals[0]], cll[vals[1]], cll[vals[2]] = 1, 2, 2
        elif len(vals) == 4:
            for v in vals:
                cll[v] = 2
        else:
            raise AssertionError("test writer supports <= 4 distinct lengths")
        ncl = max(
            (i + 1 for i, sym in enumerate(_CLC_ORDER) if cll[sym]), default=4
        )
        ncl = max(ncl, 4)
        self.bits(ncl - 4, 4)
        for i in range(ncl):
            self.bits(cll[_CLC_ORDER[i]], 3)
        if k < alphabet_size:
            self.bits(1, 1)  # explicit max_symbol
            # smallest even nbits holding k-2
            nb = 2
            while (1 << nb) <= max(k - 2, 0):
                nb += 2
            self.bits((nb - 2) // 2, 3)
            self.bits(k - 2, nb)
        else:
            self.bits(0, 1)
        if sum(1 for l in cll if l) == 1:
            return  # degenerate code-length code: zero bits per symbol
        enc = _canonical(cll)
        for l in lengths[:k]:
            c, ln = enc[l]
            self.code(c, ln)


def _riff(payload):
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


def _vp8l(width, height, body):
    w = _W()
    w.bits(width - 1, 14)
    w.bits(height - 1, 14)
    w.bits(0, 1)  # alpha hint
    w.bits(0, 3)  # version
    body(w)
    return b"\x2f" + w.tobytes()


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _no_transform_header(w, cache_bits=0):
    w.bits(0, 1)  # no (more) transforms handled by caller when needed
    if cache_bits:
        w.bits(1, 1)
        w.bits(cache_bits, 4)
    else:
        w.bits(0, 1)
    w.bits(0, 1)  # no meta prefix


def _single_codes(w, g, r, b, a, d=0):
    """Five degenerate single-symbol codes (0 bits per read)."""
    for s in (g, r, b, a, d):
        w.simple([s])


def _rgba(*pix):
    out = bytearray()
    for a, r, g, b in pix:
        out += bytes([r, g, b, a])
    return bytes(out)


# ---------------------------------------------------------------------------
# distance map
# ---------------------------------------------------------------------------


def test_distance_map_head_matches_spec_and_is_well_formed():
    """The first 30 neighborhood offsets as published in the spec text
    (RFC 9649), pinned literally — the full table is generated from the
    ordering rule these 30 entries witness."""
    head = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    ]
    assert _DIST_MAP[:30] == head
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert all(dy > 0 or dx > 0 for dx, dy in _DIST_MAP)


# ---------------------------------------------------------------------------
# literals, prefix-code forms
# ---------------------------------------------------------------------------


def test_literal_image_simple_two_symbol_codes():
    """2x2 two-color image: every channel alphabet has <= 2 symbols, so
    all five prefix codes use the simple form. First-read simple symbol
    maps to bit 0 REGARDLESS of order (not canonicalized)."""
    def body(w):
        _no_transform_header(w)
        w.simple([200, 30])   # green: first-read 200 -> bit 0
        w.simple([10, 250])   # red
        w.simple([5])         # blue: single
        w.simple([255])       # alpha: single
        w.simple([0])         # distance: unused
        # pixels: (g,r) = (200,10), (30,250), (30,10), (200,250)
        for gbit, rbit in ((0, 0), (1, 1), (1, 0), (0, 1)):
            w.bits(gbit, 1)
            w.bits(rbit, 1)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(2, 2, body))
    assert (wpx, hpx, ch) == (2, 2, 4)
    assert px == _rgba(
        (255, 10, 200, 5), (255, 250, 30, 5), (255, 10, 30, 5), (255, 250, 200, 5)
    )


def test_full_code_length_path_with_max_symbol():
    """Green coded with a 4-symbol canonical code transmitted through
    the code-length code + explicit max_symbol; canonical order is
    (length, symbol) ascending, codes MSB-first."""
    lengths = [2, 2, 2, 2]  # symbols 0..3 -> codes 00,01,10,11

    def body(w):
        _no_transform_header(w)
        w.full(lengths, 256 + 24, k=4)
        w.simple([7])    # red
        w.simple([9])    # blue
        w.simple([255])  # alpha
        w.simple([0])    # distance
        for g in (3, 0, 2, 1):
            w.code(g, 2)  # canonical code of symbol == symbol here

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(4, 1, body))
    assert px == _rgba((255, 7, 3, 9), (255, 7, 0, 9), (255, 7, 2, 9), (255, 7, 1, 9))


def test_color_cache_roundtrip():
    """A literal enters the cache at key (0x1e35a7bd*px)>>(32-bits); a
    green symbol >= 256+24 replays it. Cache symbols exceed the simple
    form's 8-bit range, so the green code goes through the code-length
    path."""
    cache_bits = 4
    px0 = _argb(255, 17, 33, 99)
    key = (0x1E35A7BD * px0 & 0xFFFFFFFF) >> (32 - cache_bits)
    glens = [0] * (256 + 24 + 16)
    glens[33] = 1            # the literal
    glens[280 + key] = 1     # the cache reference

    def body(w):
        _no_transform_header(w, cache_bits=cache_bits)
        w.full(glens, len(glens), k=280 + key + 1)
        w.simple([17])
        w.simple([99])
        w.simple([255])
        w.simple([0])
        enc = _canonical(glens)
        w.code(*enc[33])         # literal
        w.code(*enc[280 + key])  # cache hit

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(2, 1, body))
    assert px == _rgba((255, 17, 33, 99), (255, 17, 33, 99))


def test_lz77_direct_distance_and_neighborhood_code():
    """Row 2 copies row 1 via dist_code 1 -> offset (0,1) -> xsize; a
    direct distance (code > 120) copies within a row."""
    # image 4x2: pixels p0 p1 p0 p1 / copy of row above (length 4)
    def body2(w):
        _no_transform_header(w)
        l2_code, l2_extra, l2_nbits = _lz77_prefix(2)
        l4_code, l4_extra, l4_nbits = _lz77_prefix(4)
        glens = [0] * 280
        glens[20] = 2
        glens[40] = 2
        glens[256 + l2_code] = 2
        glens[256 + l4_code] = 2
        w.full(glens, 256 + 24, k=256 + l4_code + 1)
        w.simple([1])    # red
        w.simple([2])    # blue
        w.simple([255])  # alpha
        d2_code, d2_extra, d2_nbits = _lz77_prefix(2 + 120)
        d1_code, d1_extra, d1_nbits = _lz77_prefix(1)
        dsyms = sorted({d2_code, d1_code})
        w.simple(dsyms)
        enc = _canonical(glens)
        w.code(*enc[20])   # p0
        w.code(*enc[40])   # p1
        w.code(*enc[256 + l2_code])  # copy len 2
        w.bits(l2_extra, l2_nbits)
        w.bits(dsyms.index(d2_code), 1)  # direct distance 2
        w.bits(d2_extra, d2_nbits)
        w.code(*enc[256 + l4_code])  # copy len 4, one row up
        w.bits(l4_extra, l4_nbits)
        w.bits(dsyms.index(d1_code), 1)
        w.bits(d1_extra, d1_nbits)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(4, 2, body2))
    row = [(255, 1, 20, 2), (255, 1, 40, 2), (255, 1, 20, 2), (255, 1, 40, 2)]
    assert px == _rgba(*(row + row))


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_subtract_green_inverse():
    def body(w):
        w.bits(1, 1)  # a transform
        w.bits(2, 2)  # subtract green
        w.bits(0, 1)  # no more transforms
        w.bits(0, 1)  # no cache
        w.bits(0, 1)  # no meta
        _single_codes(w, g=100, r=30, b=200, a=255)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(1, 1, body))
    # r = (30+100) & 255 = 130; b = (200+100) & 255 = 44
    assert px == _rgba((255, 130, 100, 44))


def test_predictor_transform_modes_T_and_clamped_gradient():
    """2x2 with one 4x4 predictor block, mode 12 (ClampAddSubtractFull).
    Forced border modes: (0,0) black, row 0 mode L, column 0 mode T.
    Residuals are hand-computed so the decoder must reproduce the
    original pixels exactly."""
    orig = [
        _argb(255, 100, 50, 10), _argb(255, 120, 60, 30),
        _argb(255, 90, 55, 20), _argb(255, 130, 70, 40),
    ]
    # forward residuals (per spec: residual = pixel - pred, mod 256)
    def sub(a, b):
        return (
            (((a >> 24) - (b >> 24)) & 0xFF) << 24
            | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
            | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
            | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
        )
    res = [0] * 4
    res[0] = sub(orig[0], 0xFF000000)        # (0,0): black
    res[1] = sub(orig[1], orig[0])           # row 0: L
    res[2] = sub(orig[2], orig[0])           # col 0: T
    # (1,1): mode 12: clamp(L + T - TL) per channel
    p = 0
    for sh in (24, 16, 8, 0):
        v = ((orig[2] >> sh) & 0xFF) + ((orig[1] >> sh) & 0xFF) - ((orig[0] >> sh) & 0xFF)
        p |= (0 if v < 0 else 255 if v > 255 else v) << sh
    res[3] = sub(orig[3], p)

    def body(w):
        w.bits(1, 1)
        w.bits(0, 2)        # predictor transform
        w.bits(0, 3)        # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
        # sub-image: one pixel, green = mode 12
        w.bits(0, 1)        # no cache (sub-image header)
        _single_codes(w, g=12, r=0, b=0, a=255)
        w.bits(0, 1)        # no more transforms
        w.bits(0, 1)        # no cache (main)
        w.bits(0, 1)        # no meta
        # main image: residual channels -> simple or padded full codes
        chans = {
            "g": [((r_ >> 8) & 0xFF) for r_ in res],
            "r": [((r_ >> 16) & 0xFF) for r_ in res],
            "b": [(r_ & 0xFF) for r_ in res],
            "a": [((r_ >> 24) & 0xFF) for r_ in res],
        }
        emitters = {}
        for name, alph in (("g", 280), ("r", 256), ("b", 256), ("a", 256)):
            syms = sorted(set(chans[name]))
            if len(syms) == 1:
                w.simple(syms)
                emitters[name] = lambda v: None
            elif len(syms) == 2:
                w.simple(syms)
                emitters[name] = (
                    lambda v, syms=syms: w.bits(syms.index(v), 1)
                )
            else:
                # complete 2-bit code over 4 symbols (pad with dummies)
                lens = [0] * alph
                for s in syms:
                    lens[s] = 2
                for s in range(alph):
                    if sum(1 for l in lens if l) == 4:
                        break
                    if lens[s] == 0:
                        lens[s] = 2
                w.full(lens, alph, k=max(s for s in range(alph) if lens[s]) + 1)
                enc = _canonical(lens)
                emitters[name] = lambda v, enc=enc: w.code(*enc[v])
        w.simple([0])  # distance, unused
        for i in range(4):
            for name in ("g", "r", "b", "a"):
                emitters[name](chans[name][i])

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(2, 2, body))
    assert px == _rgba(*[
        ((o >> 24) & 0xFF, (o >> 16) & 0xFF, (o >> 8) & 0xFF, o & 0xFF)
        for o in orig
    ])


def test_color_transform_inverse_hand_computed():
    """One color-transform block with g2r=16, g2b=-8, r2b=4 (as int8
    bytes 16, 248, 4): inverse adds (t*c)>>5 deltas in the spec order."""
    g2r, g2b, r2b = 16, 248, 4  # bytes; 248 = -8 as int8

    def body(w):
        w.bits(1, 1)
        w.bits(1, 2)   # color transform
        w.bits(0, 3)   # size_bits=2
        w.bits(0, 1)   # sub-image: no cache
        # cte pixel: blue=g2r, green=g2b, red=r2b
        _single_codes(w, g=g2b, r=r2b, b=g2r, a=0)
        w.bits(0, 1)   # no more transforms
        w.bits(0, 1)   # no cache
        w.bits(0, 1)   # no meta
        _single_codes(w, g=64, r=10, b=20, a=255)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(1, 1, body))
    green = 64  # int8(64) = 64
    red = (10 + ((16 * green) >> 5)) & 0xFF            # 10 + 32 = 42
    blue = 20 + ((-8 * green) >> 5)                    # 20 - 16 = 4
    blue = (blue + ((4 * (42 if red < 128 else red - 256)) >> 5)) & 0xFF
    assert px == _rgba((255, red, 64, blue))
    assert (red, blue) == (42, 9)  # 4*42>>5 = 5 -> blue 9


def test_color_indexing_with_pixel_bundling():
    """2-color palette on an 8x1 image: xbits=3, the single packed byte
    in the green channel holds 8 one-bit indices LSB-first; palette
    entries are delta-coded."""
    c0 = (255, 10, 20, 30)
    c1 = (255, 200, 150, 100)
    idx_bits = 0b10110100  # pixels 0..7 -> 0,0,1,0,1,1,0,1

    def body(w):
        w.bits(1, 1)
        w.bits(3, 2)        # color indexing
        w.bits(1, 8)        # n_colors - 1 = 1
        # palette image (2x1): entry0 = c0; entry1 delta = c1 - c0
        w.bits(0, 1)        # no cache
        d = [(c1[i] - c0[i]) & 0xFF for i in range(4)]
        w.simple(sorted({c0[2], d[2]}) if c0[2] != d[2] else [c0[2]])
        w.simple(sorted({c0[1], d[1]}) if c0[1] != d[1] else [c0[1]])
        w.simple(sorted({c0[3], d[3]}) if c0[3] != d[3] else [c0[3]])
        w.simple(sorted({c0[0], d[0]}) if c0[0] != d[0] else [c0[0]])
        w.simple([0])
        for a, r, g, b in (c0, tuple(d[i] for i in range(4))):
            for val, pair in ((g, sorted({c0[2], d[2]})), (r, sorted({c0[1], d[1]})),
                              (b, sorted({c0[3], d[3]})), (a, sorted({c0[0], d[0]}))):
                if len(pair) == 2:
                    w.bits(pair.index(val), 1)
        w.bits(0, 1)        # no more transforms
        # main image (reduced to 1x1): green = packed indices
        w.bits(0, 1)        # no cache
        w.bits(0, 1)        # no meta
        _single_codes(w, g=idx_bits, r=0, b=0, a=255)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(8, 1, body))
    expect = [c1 if (idx_bits >> i) & 1 else c0 for i in range(8)]
    assert (wpx, hpx) == (8, 1)
    assert px == _rgba(*expect)


def test_meta_prefix_groups_select_by_block():
    """8x1 image, hbits=2 (4-pixel blocks): meta image 2x1 assigns group
    0 to x<4 and group 1 to x>=4; the groups decode different greens."""
    def body(w):
        w.bits(0, 1)   # no transforms
        w.bits(0, 1)   # no cache
        w.bits(1, 1)   # meta prefix present
        w.bits(0, 3)   # hbits = 2
        # meta image 2x1: (r<<8|g) = 0 and 1
        w.bits(0, 1)   # sub: no cache
        w.simple([0, 1])  # green: 0 then 1
        w.simple([0])
        w.simple([0])
        w.simple([255])
        w.simple([0])
        w.bits(0, 1)   # meta pixel 0: green 0
        w.bits(1, 1)   # meta pixel 1: green 1
        # group 0: all-111 pixel; group 1: all-222
        _single_codes(w, g=111, r=111, b=111, a=255)
        _single_codes(w, g=222, r=222, b=222, a=255)

    wpx, hpx, ch, px = decode_vp8l_payload(_vp8l(8, 1, body))
    expect = [(255, 111, 111, 111)] * 4 + [(255, 222, 222, 222)] * 4
    assert px == _rgba(*expect)


# ---------------------------------------------------------------------------
# container routing + property round-trip
# ---------------------------------------------------------------------------


def test_container_routing_and_lossy_stub():
    def body(w):
        _no_transform_header(w)
        _single_codes(w, g=1, r=2, b=3, a=255)

    data = _riff(_vp8l(1, 1, body))
    assert decode_webp_lossless(data)[:3] == (1, 1, 4)
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError):
        decode_webp_lossless(lossy)
    with pytest.raises(ValueError):
        decode_webp_lossless(b"RIFF\x00\x00\x00\x00NOTW")


def test_decode_image_routes_lossless_webp():
    from randas_spark.operators.multimodal import decode_image

    def body(w):
        _no_transform_header(w)
        _single_codes(w, g=50, r=100, b=150, a=255)

    feats = decode_image(_riff(_vp8l(2, 2, body)))
    assert feats[0:3] == [2.0, 2.0, 4.0]
    # first channel of RGBA is R: all four pixels carry r=100
    assert feats[7] == pytest.approx(100 / 255)
    assert feats[5] == pytest.approx(50 / 255)   # min byte: green
    assert feats[6] == pytest.approx(255 / 255)  # max byte: alpha


def test_property_roundtrip_uncompressed_codes():
    """Hypothesis: arbitrary small RGBA images encoded with identity
    8-bit codes (all 256 lengths == 8 — transmitted in ZERO bits via a
    degenerate code-length code) must decode bit-exact, with and
    without the subtract-green transform."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 5), st.integers(1, 4),
        st.data(), st.booleans(),
    )
    def check(width, height, data, sub_green):
        pix = [
            tuple(data.draw(st.integers(0, 255)) for _ in range(4))
            for _ in range(width * height)
        ]  # (a, r, g, b)

        def body(w):
            if sub_green:
                w.bits(1, 1)
                w.bits(2, 2)
            w.bits(0, 1)  # no (more) transforms
            w.bits(0, 1)  # no cache
            w.bits(0, 1)  # no meta
            # green: 256 literals at 9 bits + symbol 256 at 1 bit is a
            # complete code; canonical gives literal g the code 256+g
            w.full([9] * 256 + [1] + [0] * 23, 280, k=257)
            w.full([8] * 256, 256)   # red: identity byte codes
            w.full([8] * 256, 256)   # blue
            w.full([8] * 256, 256)   # alpha
            w.simple([0])            # distance
            for a, r, g, b in pix:
                if sub_green:
                    r = (r - g) & 0xFF
                    b = (b - g) & 0xFF
                w.code(256 + g, 9)
                w.code(r, 8)
                w.code(b, 8)
                w.code(a, 8)

        wpx, hpx, ch, out = decode_vp8l_payload(_vp8l(width, height, body))
        assert (wpx, hpx, ch) == (width, height, 4)
        assert out == _rgba(*pix)

    check()


def test_encode_vp8l_rgba_roundtrip_and_contract():
    """The package-side identity-code encoder (the payload generator
    behind attach_webp_payload) must round-trip arbitrary RGBA buffers
    through the real decoder and reject size mismatches."""
    import random

    from randas_spark.operators.vp8l import encode_vp8l_rgba

    rng = random.Random(13)
    for w_, h_ in ((1, 1), (8, 8), (5, 3)):
        px = bytes(rng.randrange(256) for _ in range(w_ * h_ * 4))
        data = encode_vp8l_rgba(px, w_, h_)
        assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"
        assert decode_webp_lossless(data) == (w_, h_, 4, px)
    with pytest.raises(ValueError, match="size mismatch"):
        encode_vp8l_rgba(b"\x00" * 7, 2, 2)


def test_attach_webp_payload_decodes_via_real_codec(spark):
    """Spark-side plumbing: attach_webp_payload → extract_features with
    fake=False decodes the VP8L bitstream on executors; features match
    the digest arithmetic that seeded the pixels."""
    import hashlib

    from randas_spark.operators.multimodal import (
        attach_webp_payload,
        extract_features,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "randas")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in extract_features(
            attach_webp_payload(df, "doc_id", "text"), fake=False
        ).collect()
    }
    for doc_id, text in ((1, "hello world"), (2, "randas")):
        dg = hashlib.md5(text.encode()).digest()
        px = (dg * 16)[:256]
        f = rows[doc_id].feature
        assert f[0:3] == [8.0, 8.0, 4.0]
        assert f[3] == sum(px) / 256 / 255
        assert f[5] == min(px) / 255 and f[6] == max(px) / 255
        assert f[7] == sum(px[0::4]) / 64 / 255
