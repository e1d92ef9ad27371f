"""Dependency-free BMP and GIF decoders (stdlib struct only) — png.py's
siblings (VERDICT r10 order #5: shrink the multimodal stub surface with
the formats that ARE stdlib-decodable).

Both feed operators/multimodal.decode_image the same
(width, height, channels, pixels) contract as decode_png, so the
mapInPandas plumbing above them is untouched; a production cluster
swaps in PIL/opencv behind the same kernel signature. With these, the
NotImplementedError fallback narrows to JPEG/WebP/video — the formats
whose entropy coding genuinely needs a codec library.

Profiles:
- BMP: BITMAPINFOHEADER (and the larger V4/V5 headers, which embed it),
  bottom-up or top-down rows, 24-bit BI_RGB, 8-bit palette BI_RGB, and
  8-bit BI_RLE8 (absolute + encoded runs, EOL/EOD/delta escapes).
- GIF: 87a/89a, global and local color tables, variable-width LZW with
  clear/end codes, interlaced and non-interlaced, first frame of an
  animation; a GCE transparent index is emitted as its palette color
  (single-frame feature extraction has no compositing stack to honor
  transparency against).

Format references: the public Windows BMP file-format documentation and
the GIF89a specification (CompuServe, 1990) — both long-published open
specs.
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"
GIF_MAGICS = (b"GIF87a", b"GIF89a")


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """data → (width, height, channels, pixels), row-major top-down RGB
    (BMP stores BGR bottom-up; both are normalized here so every decoder
    in the family emits the same pixel order)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (BITMAPCOREHEADER era)")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or width <= 0 or width > 1 << 16 or abs(height) > 1 << 16:
        raise ValueError("malformed BMP dimensions")
    top_down = height < 0
    height = abs(height)
    n_colors = struct.unpack_from("<I", data, 46)[0]

    if bpp == 24 and compression == 0:
        row_stride = (width * 3 + 3) & ~3
        need = pix_off + row_stride * height
        if len(data) < need:
            raise ValueError("truncated BMP pixel data")
        out = bytearray(width * height * 3)
        for r in range(height):
            src_row = r if top_down else height - 1 - r
            base = pix_off + src_row * row_stride
            dst = r * width * 3
            for x in range(width):
                b, g, rr = data[base + 3 * x : base + 3 * x + 3]
                out[dst + 3 * x] = rr
                out[dst + 3 * x + 1] = g
                out[dst + 3 * x + 2] = b
        return width, height, 3, bytes(out)

    if bpp == 8 and compression in (0, 1):  # BI_RGB / BI_RLE8
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        if len(data) < pal_off + 4 * n_colors:
            raise ValueError("truncated BMP palette")
        palette = [
            (data[pal_off + 4 * i + 2], data[pal_off + 4 * i + 1], data[pal_off + 4 * i])
            for i in range(n_colors)
        ]
        idx = bytearray(width * height)  # bottom-up index plane
        if compression == 0:
            row_stride = (width + 3) & ~3
            if len(data) < pix_off + row_stride * height:
                raise ValueError("truncated BMP pixel data")
            for r in range(height):
                base = pix_off + r * row_stride
                idx[r * width : (r + 1) * width] = data[base : base + width]
        else:  # RLE8: escapes 0=EOL 1=EOD 2=delta, else absolute run
            i, x, y = pix_off, 0, 0
            while i + 1 < len(data):
                count, val = data[i], data[i + 1]
                i += 2
                if count > 0:  # encoded run: count copies of val
                    if y >= height or x + count > width:
                        raise ValueError("BMP RLE run overflows the bitmap")
                    idx[y * width + x : y * width + x + count] = bytes([val]) * count
                    x += count
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                elif val == 1:  # end of data
                    break
                elif val == 2:  # delta jump (right, up in file order)
                    if i + 1 >= len(data):
                        raise ValueError("truncated BMP RLE delta")
                    x += data[i]
                    y += data[i + 1]
                    i += 2
                else:  # absolute mode: val literal indices, word-aligned
                    if i + val > len(data):
                        raise ValueError("truncated BMP RLE absolute run")
                    if y >= height or x + val > width:
                        raise ValueError("BMP RLE run overflows the bitmap")
                    idx[y * width + x : y * width + x + val] = data[i : i + val]
                    x += val
                    i += val + (val & 1)
                if x > width or y > height:
                    raise ValueError("BMP RLE run overflows the bitmap")
        out = bytearray(width * height * 3)
        for r in range(height):
            src_row = r if top_down else height - 1 - r
            dst = r * width * 3
            for x in range(width):
                c = palette[idx[src_row * width + x]]
                out[dst + 3 * x : dst + 3 * x + 3] = bytes(c)
        return width, height, 3, bytes(out)

    raise ValueError(f"unsupported BMP profile: bpp={bpp} compression={compression}")


def _gif_subblocks(data: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``i``; returns
    (payload, index after the 0x00 terminator)."""
    chunks = []
    while True:
        if i >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[i]
        i += 1
        if n == 0:
            return b"".join(chunks), i
        chunks.append(data[i : i + n])
        if len(data) < i + n:
            raise ValueError("truncated GIF sub-block")
        i += n


def _gif_lzw(min_code_size: int, payload: bytes, n_pixels: int) -> bytearray:
    """GIF variable-width LZW decode → index stream (first n_pixels)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader: GIF packs codes LSB-first
    bitpos = 0
    total_bits = len(payload) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        byte_i, bit_i = divmod(bitpos, 8)
        val = int.from_bytes(payload[byte_i : byte_i + 3], "little")
        val = (val >> bit_i) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset_table() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset_table()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == end:
            break
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return out[:n_pixels]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """data → (width, height, channels, pixels): the FIRST image frame,
    palette-expanded to row-major RGB. Frames smaller than the logical
    screen decode at their own (w, h) — single-frame feature extraction
    needs the frame's pixels, not a compositing canvas."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    flags = data[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [tuple(data[i + 3 * k : i + 3 * k + 3]) for k in range(n)]
        i += 3 * n
    while i < len(data):
        block = data[i]
        if block == 0x21:  # extension: label + sub-blocks, skipped
            _, i = _gif_subblocks(data, i + 2)
        elif block == 0x2C:  # image descriptor
            w, h = struct.unpack_from("<HH", data, i + 5)
            iflags = data[i + 9]
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = [tuple(data[i + 3 * k : i + 3 * k + 3]) for k in range(n)]
                i += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            if w == 0 or h == 0:
                raise ValueError("empty GIF frame")
            min_code_size = data[i]
            payload, i = _gif_subblocks(data, i + 1)
            idx = _gif_lzw(min_code_size, payload, w * h)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                rows = []
                for start, step in _GIF_INTERLACE_PASSES:
                    rows.extend(range(start, h, step))
                deinter = bytearray(w * h)
                for src_r, dst_r in enumerate(rows):
                    deinter[dst_r * w : (dst_r + 1) * w] = idx[
                        src_r * w : (src_r + 1) * w
                    ]
                idx = deinter
            out = bytearray(w * h * 3)
            for p, c in enumerate(idx):
                if c >= len(pal):
                    raise ValueError("GIF index outside the color table")
                out[3 * p : 3 * p + 3] = bytes(pal[c])
            return w, h, 3, bytes(out)
        elif block == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")
