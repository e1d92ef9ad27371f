"""Golden tests for the dependency-free PNG codec
(randas_spark/operators/png.py): roundtrip exactness, all five scanline
filters, every supported color type, palette expansion, and the error
gates for unsupported profiles.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from randas_spark.operators.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    pixel_features,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _png_from_raw(
    width: int,
    height: int,
    color_type: int,
    raw: bytes,
    plte: bytes | None = None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Hand-assemble a PNG from pre-filtered raw scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, interlace)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_roundtrip_rgb_exact():
    pixels = bytes(range(4 * 4 * 3))  # 4x4 RGB, all distinct values
    data = encode_png(pixels, 4, 4, 3)
    w, h, c, got = decode_png(data)
    assert (w, h, c) == (4, 4, 3)
    assert got == pixels


def test_roundtrip_gray_and_rgba():
    g = bytes([0, 64, 128, 255])
    assert decode_png(encode_png(g, 2, 2, 1)) == (2, 2, 1, g)
    rgba = bytes(range(2 * 2 * 4))
    assert decode_png(encode_png(rgba, 2, 2, 4)) == (2, 2, 4, rgba)


def _filter_scanlines(pixels: bytes, width: int, height: int, ch: int, f: int) -> bytes:
    """Reference forward-filter (spec definitions) to build test vectors."""
    stride = width * ch
    out = bytearray()
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
        out.append(f)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - left
            elif f == 2:
                v = line[x] - up
            elif f == 3:
                v = line[x] - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = line[x] - pred
            out.append(v & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_all_filters_unfilter_correctly(f):
    import hashlib

    pixels = hashlib.sha256(b"png-filter-vector").digest()[: 3 * 3 * 3]  # 3x3 RGB
    raw = _filter_scanlines(pixels, 3, 3, 3, f)
    w, h, c, got = decode_png(_png_from_raw(3, 3, 2, raw))
    assert (w, h, c) == (3, 3, 3)
    assert got == pixels


def test_palette_expands_to_rgb():
    # 2x2 palette image: indices 0..3 → distinct RGB triples
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    raw = bytes([0, 0, 1, 0, 2, 3])  # two scanlines, filter 0
    w, h, c, got = decode_png(_png_from_raw(2, 2, 3, raw, plte=plte))
    assert (w, h, c) == (2, 2, 3)
    assert got == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def test_gray_alpha_color_type():
    pixels = bytes([10, 255, 20, 128, 30, 0, 40, 64])  # 2x2 gray+alpha
    raw = b"\x00" + pixels[:4] + b"\x00" + pixels[4:]
    assert decode_png(_png_from_raw(2, 2, 4, raw)) == (2, 2, 2, pixels)


def test_unsupported_profiles_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + bytes(100))
    # r13: depth 16 and Adam7 are now LEGAL — the illegal combos are
    # spec-violating depth/color-type pairs and unknown interlace methods
    ihdr16p = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)  # 16-bit palette
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr16p) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)
    ihdr2rgb = struct.pack(">IIBBBBB", 1, 1, 2, 2, 0, 0, 0)  # 2-bit RGB
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr2rgb) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)  # interlace method 2
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(data)
    # channels=2 (gray+alpha) became legal in r13 — 5 is still not
    with pytest.raises(ValueError, match="channels"):
        encode_png(b"\x00" * 5, 1, 1, 5)


def test_pixel_features_golden():
    # 2x1 RGB: pixels (0,0,0) and (255,255,255) → mean .5, min 0, max 1
    feat = pixel_features(2, 1, 3, bytes([0, 0, 0, 255, 255, 255]))
    assert feat[:3] == [2.0, 1.0, 3.0]
    assert feat[3] == 0.5 and feat[5] == 0.0 and feat[6] == 1.0
    assert feat[4] == 0.5  # population std of {0,255}*3 scaled by 255
    assert feat[7] == 0.5  # channel-0 mean: {0, 255}


# --------------------------------------------------------------------------
# r13 profile matrix: sub-byte depths, 16-bit, Adam7 interlace
# --------------------------------------------------------------------------


def test_sub_byte_gray_depths_scale_exactly():
    # depth 1: 2x2 [[1,0],[0,1]] → one byte per row, MSB-first: 10000000, 01000000
    w, h, c, px = decode_png(_png_from_raw(2, 2, 0, bytes([0, 0x80, 0, 0x40]), depth=1))
    assert (w, h, c) == (2, 2, 1) and list(px) == [255, 0, 0, 255]
    # depth 2: 4x1 levels 0..3 → 00 01 10 11 = 0x1B; scale ×85
    w, h, c, px = decode_png(_png_from_raw(4, 1, 0, bytes([0, 0x1B]), depth=2))
    assert list(px) == [0, 85, 170, 255]
    # depth 4: 3x1 levels 1, 8, 15 packed high-first: 0x18, 0xF0; scale ×17
    w, h, c, px = decode_png(_png_from_raw(3, 1, 0, bytes([0, 0x18, 0xF0]), depth=4))
    assert list(px) == [17, 136, 255]


def test_sub_byte_palette_indices_not_scaled():
    # depth-4 palette: indices must stay RAW (1 → entry 1, not 17)
    plte = bytes([0, 0, 0, 200, 10, 20, 30, 40, 50])
    w, h, c, px = decode_png(
        _png_from_raw(2, 1, 3, bytes([0, 0x12]), plte=plte, depth=4)
    )
    assert (w, h, c) == (2, 1, 3)
    assert list(px) == [200, 10, 20, 30, 40, 50]
    # depth-1 palette with a Sub filter (bpp=1 at byte level)
    plte2 = bytes([5, 5, 5, 250, 250, 250])
    w, h, c, px = decode_png(
        _png_from_raw(8, 1, 3, bytes([1, 0b10100101]), plte=plte2, depth=1)
    )
    assert list(px)[:6] == [250, 250, 250, 5, 5, 5]  # first two pixels 1,0


def test_sixteen_bit_high_byte_downsample():
    # 2x1 RGB16: high bytes (1,2,3) and (250,251,252); low bytes arbitrary
    raw = bytes([0, 1, 99, 2, 98, 3, 97, 250, 1, 251, 2, 252, 3])
    w, h, c, px = decode_png(_png_from_raw(2, 1, 2, raw, depth=16))
    assert (w, h, c) == (2, 1, 3)
    assert list(px) == [1, 2, 3, 250, 251, 252]
    # 16-bit filters act on BYTES with bpp=6: Sub row referencing left texel
    row0 = bytes([0] + [10, 0, 20, 0, 30, 0] + [5, 0, 5, 0, 5, 0])
    png = _png_from_raw(2, 1, 2, bytes([1]) + row0[1:], depth=16)
    w, h, c, px = decode_png(png)
    assert list(px) == [10, 20, 30, 15, 25, 35]


def test_adam7_hand_built_2x2_and_slice_roundtrip_8x8():
    # hand-derived 2x2 gray-8 Adam7: pass1 → (0,0); pass6 → (1,0); pass7 → row 1
    raw = bytes([0, 10]) + bytes([0, 20]) + bytes([0, 30, 40])
    w, h, c, px = decode_png(_png_from_raw(2, 2, 0, raw, depth=8, interlace=1))
    assert (w, h, c) == (2, 2, 1)
    assert list(px) == [10, 20, 30, 40]

    # 8x8 RGB: slice a reference image through the spec pass grid and
    # require exact reassembly (every pass non-empty at 8x8)
    ref = [[(y * 8 + x) * 3 % 256 for x in range(8)] for y in range(8)]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        for y in range(y0, 8, dy):
            raw.append(0)  # filter None
            for x in range(x0, 8, dx):
                v = ref[y][x]
                raw += bytes([v, (v + 1) % 256, (v + 2) % 256])
    w, h, c, px = decode_png(_png_from_raw(8, 8, 2, bytes(raw), interlace=1))
    assert (w, h, c) == (8, 8, 3)
    for y in range(8):
        for x in range(8):
            v = ref[y][x]
            assert list(px[(y * 8 + x) * 3 : (y * 8 + x) * 3 + 3]) == [
                v, (v + 1) % 256, (v + 2) % 256
            ]


def test_adam7_sub_byte_and_narrow_image():
    # 3x3 depth-1 gray Adam7: passes 1 (1px), 4 (1px: x=2,y=0), 5 (row y=2: x=0,2),
    # 6 (x=1, y∈{0,2}), 7 (y=1: x=0,1,2) — each pass row is byte-padded
    # image: [[1,0,1],[0,1,0],[1,1,0]]
    raw = bytes([0, 0x80,   # pass1: (0,0)=1
                 0, 0x80,   # pass4: (2,0)=1
                 0, 0x80,   # pass5: y=2, x∈{0,2} → 1,0 → bits 10
                 0, 0x00,   # pass6 row y=0: (1,0)=0
                 0, 0x80,   # pass6 row y=2: (1,2)=1
                 0, 0x40])  # pass7: y=1 → 0,1,0 → bits 010
    w, h, c, px = decode_png(_png_from_raw(3, 3, 0, raw, depth=1, interlace=1))
    assert (w, h, c) == (3, 3, 1)
    assert [v // 255 for v in px] == [1, 0, 1, 0, 1, 0, 1, 1, 0]
