"""Bit-exact decode tests for the stdlib BMP/GIF codecs
(operators/imagefmt.py, VERDICT r10 order #5) and their routing through
the multimodal decode kernel. Fixtures are hand-assembled byte streams
(header fields + LZW bit-packing done right here), so every assertion is
against independently constructed golden pixels — not a round-trip
through the code under test."""

from __future__ import annotations

import struct

from randas_spark.operators.imagefmt import decode_bmp, decode_gif


def _bmp24(width, height, rows_topdown, top_down=False):
    """Assemble a 24-bit BI_RGB BMP from top-down RGB row tuples."""
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    file_rows = rows_topdown if top_down else list(reversed(rows_topdown))
    for row in file_rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        body += line
    h = -height if top_down else height
    dib = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return bytes(hdr + dib + body)


GOLD = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
GOLD_BYTES = b"".join(bytes(c) for c in GOLD)


def test_bmp24_bottom_up_and_top_down_decode_identically():
    rows = [GOLD[:2], GOLD[2:]]
    for td in (False, True):
        w, h, ch, px = decode_bmp(_bmp24(2, 2, rows, top_down=td))
        assert (w, h, ch) == (2, 2, 3)
        assert px == GOLD_BYTES


def test_bmp24_row_padding_is_stripped():
    # width 3: raw row is 9 bytes, stride pads to 12 — pads must not leak
    rows = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    w, h, ch, px = decode_bmp(_bmp24(3, 1, rows))
    assert (w, h, ch) == (3, 1, 3)
    assert px == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])


def _bmp8(width, height, idx_rows_topdown, palette, rle=None):
    """8-bit palette BMP; ``rle`` supplies a raw BI_RLE8 stream."""
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((b, g, r, 0))
    if rle is None:
        stride = (width + 3) & ~3
        body = bytearray()
        for row in reversed(idx_rows_topdown):
            body += bytes(row) + b"\x00" * (stride - width)
        comp = 0
    else:
        body = bytearray(rle)
        comp = 1
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, comp, len(body), 0, 0,
        len(palette), 0,
    )
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return bytes(hdr + dib + pal + body)


def test_bmp8_palette_decode():
    data = _bmp8(2, 2, [[0, 1], [2, 3]], GOLD)
    w, h, ch, px = decode_bmp(data)
    assert (w, h, ch) == (2, 2, 3)
    assert px == GOLD_BYTES


def test_bmp8_rle8_runs_absolute_and_escapes():
    # 4x2 bottom-up: file row 0 (image bottom) = run of 4 zeros; EOL;
    # file row 1 (image top) = absolute run [1,2,3,3] (even count, no
    # pad byte); EOD
    rle = bytes([4, 0, 0, 0, 0, 4, 1, 2, 3, 3, 0, 1])
    data = _bmp8(4, 2, None, GOLD, rle=rle)
    w, h, ch, px = decode_bmp(data)
    assert (w, h, ch) == (4, 2, 3)
    top = b"".join(bytes(GOLD[i]) for i in (1, 2, 3, 3))
    bot = bytes(GOLD[0]) * 4
    assert px == top + bot


def test_bmp8_rle8_rejects_out_of_bounds_writes():
    """ADVICE r11: bounds must be validated BEFORE each RLE8 write —
    slice assignment on a bytearray silently GROWS it, so a post-write
    check accepted streams whose run landed at y == height (after a
    trailing EOL on the last row) or overran the row width."""
    import pytest

    # EOLs walk y to height (2), then an encoded run writes at y==2
    rle_y = bytes([2, 0, 0, 0, 2, 0, 0, 0, 2, 1, 0, 1])
    with pytest.raises(ValueError, match="overflows"):
        decode_bmp(_bmp8(2, 2, None, GOLD, rle=rle_y))
    # delta jump to y == height, then an absolute run writes there
    rle_delta = bytes([0, 2, 0, 2, 2, 1, 2, 0, 1])
    with pytest.raises(ValueError, match="overflows"):
        decode_bmp(_bmp8(2, 2, None, GOLD, rle=rle_delta))
    # encoded run overrunning the row width (x + count > width)
    rle_x = bytes([3, 1, 0, 1])
    with pytest.raises(ValueError, match="overflows"):
        decode_bmp(_bmp8(2, 2, None, GOLD, rle=rle_x))


class _LZWPacker:
    """Minimal GIF LZW encoder emitting only literal codes — tracks the
    decoder's exact table-growth/width schedule so fixtures stay valid."""

    def __init__(self, min_code_size):
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self.bits = []

    def _emit(self, code, width):
        for k in range(width):
            self.bits.append((code >> k) & 1)

    def pack(self, indices):
        width = self.min + 1
        self._emit(self.clear, width)
        table_size = self.clear + 2
        prev = False
        for ix in indices:
            self._emit(ix, width)
            if prev:
                table_size += 1
                if table_size == (1 << width) and width < 12:
                    width += 1
            prev = True
        self._emit(self.end, width)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for k, bit in enumerate(self.bits[i : i + 8]):
                byte |= bit << k
            out.append(byte)
        return bytes(out)


def _gif(width, height, indices, palette, interlaced=False, split_subblocks=False):
    n_pal = len(palette)
    pal_bits = max(1, (n_pal - 1).bit_length()) - 1  # field stores log2(n)-1
    hdr = b"GIF89a" + struct.pack("<HH", width, height)
    hdr += bytes([0x80 | pal_bits, 0, 0])
    gct = b"".join(bytes(c) for c in palette)
    gct += b"\x00" * (3 * ((2 << pal_bits) - n_pal))
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    img += bytes([0x40 if interlaced else 0x00])
    mcs = max(2, pal_bits + 1)
    payload = _LZWPacker(mcs).pack(indices)
    img += bytes([mcs])
    if split_subblocks and len(payload) > 1:
        cut = len(payload) // 2
        img += bytes([cut]) + payload[:cut]
        img += bytes([len(payload) - cut]) + payload[cut:]
    else:
        img += bytes([len(payload)]) + payload
    img += b"\x00"
    return hdr + gct + img + b"\x3b"


def test_gif_first_frame_decode():
    data = _gif(2, 2, [0, 1, 2, 3], GOLD)
    w, h, ch, px = decode_gif(data)
    assert (w, h, ch) == (2, 2, 3)
    assert px == GOLD_BYTES


def test_gif_subblock_chains_and_extensions():
    # graphic-control extension before the frame + payload split across
    # two sub-blocks — both must be walked transparently
    data = _gif(2, 2, [3, 2, 1, 0], GOLD, split_subblocks=True)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    data = data[:13] + data[13 : 13 + 12] + gce + data[13 + 12 :]
    w, h, ch, px = decode_gif(data)
    assert px == b"".join(bytes(GOLD[i]) for i in (3, 2, 1, 0))


def test_gif_interlaced_rows_reorder():
    # 4x1-column image, h=4: interlace passes give source row order
    # [0, 2, 1, 3]; feed indices in that order, expect top-down output
    idx_topdown = [0, 1, 2, 3]
    src_order = [0, 2, 1, 3]
    data = _gif(1, 4, [idx_topdown[r] for r in src_order], GOLD, interlaced=True)
    w, h, ch, px = decode_gif(data)
    assert (w, h, ch) == (1, 4, 3)
    assert px == GOLD_BYTES


def test_gif_lzw_table_growth_crosses_width_boundary():
    # 25 pixels over a 4-color palette forces several table appends past
    # the 8-entry boundary (width 3 -> 4) — decode must track the growth
    idx = [(i * 7 + 3) % 4 for i in range(25)]
    data = _gif(5, 5, idx, GOLD)
    w, h, ch, px = decode_gif(data)
    assert px == b"".join(bytes(GOLD[i]) for i in idx)


def test_decode_image_routes_bmp_gif_and_narrows_the_stub():
    import pytest

    from randas_spark.operators.multimodal import decode_image
    from randas_spark.operators.png import pixel_features

    bmp = _bmp24(2, 2, [GOLD[:2], GOLD[2:]])
    gif = _gif(2, 2, [0, 1, 2, 3], GOLD)
    want = pixel_features(2, 2, 3, GOLD_BYTES)
    assert decode_image(bmp) == want
    assert decode_image(gif) == want
    # the NotImplementedError surface is now JPEG/WebP only
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    assert len(decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32, fake=True)) == 8
