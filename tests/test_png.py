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
    width: int, height: int, color_type: int, raw: bytes, plte: bytes | None = None
) -> bytes:
    """Hand-assemble a PNG from pre-filtered raw scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
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
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(data)
    with pytest.raises(ValueError, match="channels"):
        encode_png(b"\x00\x00", 1, 1, 2)


def test_pixel_features_golden():
    # 2x1 RGB: pixels (0,0,0) and (255,255,255) → mean .5, min 0, max 1
    feat = pixel_features(2, 1, 3, bytes([0, 0, 0, 255, 255, 255]))
    assert feat[:3] == [2.0, 1.0, 3.0]
    assert feat[3] == 0.5 and feat[5] == 0.0 and feat[6] == 1.0
    assert feat[4] == 0.5  # population std of {0,255}*3 scaled by 255
    assert feat[7] == 0.5  # channel-0 mean: {0, 255}
