"""Dependency-free PNG codec (stdlib zlib + struct only).

A real-but-minimal decoder so the multimodal pipeline's decode stage
(operators/multimodal.decode_image) computes ACTUAL pixel features in
this container, which has no imaging libraries. Supports the full
still-image profile matrix of the spec (r13): bit depths 1/2/4
(gray + palette), 8, and 16 (high-byte downsample to the 8-bit
contract), color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), all five scanline filters, and BOTH interlace methods (none
and Adam7 seven-pass). Only a malformed stream raises ValueError — a
production cluster swaps in PIL/opencv behind the same kernel
signature and nothing else changes (the mapInPandas plumbing is the
contract).

The encoder (8-bit gray/RGB/RGBA, filter 0) exists to build valid
fixtures and deterministic synthetic payloads without any library.

Format reference: the public PNG specification (RFC 2083 / W3C PNG) —
chunk layout, filter algorithms (incl. the Paeth predictor), bit-depth
sample packing (MSB-first), and the Adam7 pass grid.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # per color type, pre-palette

#: spec-legal bit depths per color type (palette caps at 8; the
#: multi-sample types require 8/16)
_LEGAL_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8}, 4: {8, 16}, 6: {8, 16}}

#: Adam7 pass grid: (x0, y0, dx, dy) per pass, in pass order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, off: int, height: int, stride: int, bpp: int) -> bytearray:
    """Undo the five scanline filters over ``height`` rows of ``stride``
    filtered bytes each (filter byte leads every row); ``bpp`` is the
    whole-byte distance to the left neighbor (max(1, channels*depth//8)
    per the spec). Returns the raw byte plane."""
    out = bytearray(stride * height)
    prev_start = -1
    for y in range(height):
        row = off + y * (stride + 1)
        f = raw[row]
        line_in = raw[row + 1 : row + 1 + stride]
        base = y * stride
        if f == 0:  # None
            out[base : base + stride] = line_in
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line_in[x] + left) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if y > 0 else 0
                out[base + x] = (line_in[x] + up) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y > 0 else 0
                out[base + x] = (line_in[x] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y > 0 else 0
                ul = out[prev_start + x - bpp] if (y > 0 and x >= bpp) else 0
                out[base + x] = (line_in[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        prev_start = base
    return out


def _row_samples(
    plane: bytearray, row_base: int, width: int, ch: int, depth: int, scale: bool
) -> list[int]:
    """One scanline of the unfiltered byte plane -> width*ch 8-bit
    samples. Sub-byte depths unpack MSB-first; depth 16 keeps the high
    byte (the spec's 8-bit downsample); ``scale`` stretches sub-byte
    GRAY levels to 0..255 (exact: 255/(2^d-1) is an integer for
    d in {1, 2, 4}) while palette INDICES stay raw."""
    if depth == 8:
        return list(plane[row_base : row_base + width * ch])
    if depth == 16:
        return list(plane[row_base : row_base + width * ch * 2 : 2])
    # depths 1/2/4: single-channel only (gray or palette indices)
    factor = 255 // ((1 << depth) - 1) if scale else 1
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    out = []
    for x in range(width):
        byte = plane[row_base + x // per_byte]
        shift = 8 - depth * (x % per_byte + 1)
        out.append(((byte >> shift) & mask) * factor)
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """data → (width, height, channels, pixels) with pixels row-major
    interleaved 8-bit samples (palette images expand to RGB)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk body")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(
            f"illegal PNG bit depth {bit_depth} for color type {color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")

    ch = _CHANNELS[color_type]
    scale_gray = color_type == 0 and bit_depth < 8
    bpp = max(1, ch * bit_depth // 8)
    raw = zlib.decompress(bytes(idat))

    def sub_stride(w: int) -> int:
        return (w * ch * bit_depth + 7) // 8

    samples = [0] * (width * height * ch)
    if interlace == 0:
        stride = sub_stride(width)
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG pixel data length mismatch")
        plane = _unfilter(raw, 0, height, stride, bpp)
        for y in range(height):
            samples[y * width * ch : (y + 1) * width * ch] = _row_samples(
                plane, y * stride, width, ch, bit_depth, scale_gray
            )
    else:  # Adam7: seven independently filtered sub-images
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            if x0 >= width or y0 >= height:
                continue
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            stride = sub_stride(w_p)
            need = (stride + 1) * h_p
            if off + need > len(raw):
                raise ValueError("PNG pixel data length mismatch (Adam7 pass)")
            plane = _unfilter(raw, off, h_p, stride, bpp)
            off += need
            for r in range(h_p):
                row = _row_samples(plane, r * stride, w_p, ch, bit_depth, scale_gray)
                y = y0 + r * dy
                for cidx in range(w_p):
                    x = x0 + cidx * dx
                    dst = (y * width + x) * ch
                    samples[dst : dst + ch] = row[cidx * ch : (cidx + 1) * ch]
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    out = bytearray(samples)

    if color_type == 3:
        n_entries = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                # a short slice assignment would silently SHRINK the rgb
                # buffer, shifting every later pixel — fail loudly instead
                raise ValueError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """8-bit gray (1), gray+alpha (2), RGB (3), or RGBA (4) → valid
    PNG, filter 0. (GA added r13 so resize_kernel can round-trip
    color-type-4 sources through the same encoder.)"""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"channels must be 1, 2, 3, or 4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def pixel_features(width: int, height: int, channels: int, pixels: bytes) -> list[float]:
    """Deterministic 8-dim feature from decoded pixels: dimensions,
    channel count, global mean/std/min/max (0-1 scaled), first-channel
    mean. Pure integer sums → bit-stable across platforms."""
    n = len(pixels)
    if n == 0 or channels <= 0:
        # zero-dimension images decode to an empty buffer; the contract
        # is ValueError, not a ZeroDivisionError inside an executor task
        raise ValueError("pixel_features: empty pixel buffer")
    s = sum(pixels)
    mean = s / n
    # explicit multiply (not **2): x*x is a single IEEE op both here and in
    # the DuckDB oracle's (p-mean)*(p-mean), with no libm pow() in the loop
    var = sum((p - mean) * (p - mean) for p in pixels) / n
    c0 = pixels[0::channels]
    return [
        float(width),
        float(height),
        float(channels),
        mean / 255.0,
        (var**0.5) / 255.0,
        min(pixels) / 255.0,
        max(pixels) / 255.0,
        (sum(c0) / len(c0)) / 255.0,
    ]
