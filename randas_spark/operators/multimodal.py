"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The container has no decode libraries (PIL/ffmpeg/etc.). PNG, BMP, GIF
(single-frame AND animated with GIF89a compositing, r13), baseline +
progressive JPEG, lossless WebP (VP8L, r13), PCM/G.711/IMA-ADPCM WAV
(r13) decode FOR REAL through the dependency-free stdlib codecs in
operators/png.py, operators/imagefmt.py, operators/vp8l.py and
operators/wav.py, and resize is a REAL raster kernel
(operators/raster.py, r13); only the formats whose entropy coding
genuinely needs a codec library (lossy-WebP VP8, arithmetic JPEG,
perceptual audio MP3/AAC/OGG, true video containers mp4/webm) remain
STUBBED — the decode kernels raise NotImplementedError for those unless
`fake=True`, which substitutes a deterministic fake decoder. The
Spark-side plumbing is real and tested either way: schema (binary +
metadata struct), partition-sized Arrow batches, UDF signatures, and
the feature-extract output shape are exactly what a full codec stack
would plug into.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature-extract stage.
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, checksum long, feature array<double>"
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal corpus: derive a binary payload (utf-8 bytes)
    + metadata struct from the documents table. In a real pipeline this
    column comes straight from parquet/webdataset ingest."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            # BYTE length of the payload (octet_length), not the character
            # count — they diverge on any non-ASCII text
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
        ).alias("meta"),
    )


def decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Shared raster router → (width, height, channels, pixel bytes).

    PNG payloads are decoded FOR REAL by the dependency-free codec in
    operators/png.py (stdlib zlib + scanline unfiltering; 8-bit
    gray/RGB/palette/alpha profiles); BMP, GIF and JPEG by its sibling
    operators/imagefmt.py (24-bit/8-bit/RLE8 BMP; LZW + interlace GIF,
    first frame; baseline sequential + progressive SOF2 JFIF — huffman
    + dequant + IDCT + YCbCr->RGB), and lossless WebP by
    operators/vp8l.py (prefix codes + LZ77 + color cache + all four
    transforms, r13) — no imaging library needed for any of the five.
    Only lossy WebP (VP8 intra-frame coding), arithmetic-coded JPEG and
    non-image payloads raise NotImplementedError (the honest codec
    boundary)."""
    from randas_spark.operators.imagefmt import (
        BMP_MAGIC,
        GIF_MAGICS,
        JPEG_MAGIC,
        decode_bmp,
        decode_gif,
        decode_jpeg,
    )
    from randas_spark.operators.png import PNG_MAGIC, decode_png

    b = bytes(payload)
    if b[:8] == PNG_MAGIC:
        return decode_png(b)
    if b[:2] == BMP_MAGIC:
        return decode_bmp(b)
    if b[:6] in GIF_MAGICS:
        return decode_gif(b)
    if b[:2] == JPEG_MAGIC:
        return decode_jpeg(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from randas_spark.operators.vp8l import decode_webp_lossless

        # lossless (VP8L) decodes FOR REAL (operators/vp8l.py, r13);
        # lossy VP8 raises NotImplementedError inside
        return decode_webp_lossless(b)
    raise NotImplementedError(
        "lossy-WebP (VP8) image decode requires a codec library not "
        "present in this container (PNG/BMP/GIF/JPEG/lossless-WebP "
        "decode for real via operators/png.py, operators/imagefmt.py "
        "and operators/vp8l.py); run with fake=True for the "
        "deterministic stub"
    )


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode kernel → 8-dim pixel feature (decode_pixels router +
    png.pixel_features). Formats past the codec boundary raise unless
    fake=True, which substitutes the deterministic md5-derived stub
    feature."""
    from randas_spark.operators.png import pixel_features

    try:
        return pixel_features(*decode_pixels(payload))
    except NotImplementedError:
        if not fake:
            raise
        h = hashlib.md5(payload).digest()
        return [b_ / 255.0 for b_ in h[:8]]


#: SOF markers that carry frame dimensions. C4 (DHT), C8 (JPG ext) and
#: CC (DAC) share the Cx range but are NOT frame headers — skip them.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def sniff_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """Header-only (mime, width, height) probe — NO pixel decode.

    Metadata extraction must not pay decode cost (nor require the decode
    libraries this container lacks): dimensions live in the first few
    hundred bytes of every mainstream container, so a 100 TB metadata
    scan reads headers, not images. Formats:

    - PNG: IHDR is mandated to be the first chunk — width/height are
      big-endian u32 at offsets 16/20.
    - JPEG: walk the FF-marker segment chain to the first SOFn frame
      header (baseline C0, progressive C2, ...); its body is
      [precision u8][height u16][width u16] big-endian.
    - GIF: logical screen descriptor right after the 6-byte signature,
      little-endian u16 pair.
    - WebP: RIFF container, first chunk decides — VP8 (lossy: 14-bit
      dims after the 0x9D012A sync), VP8L (lossless: packed 14-bit
      minus-one dims after the 0x2F signature), VP8X (extended: 24-bit
      minus-one canvas dims). Metadata only; pixel decode stays behind
      the codec-library stub.

    Returns None for anything unrecognized or truncated (callers decide
    whether that's an error row) — never raises on malformed bytes.
    """
    from randas_spark.operators.png import PNG_MAGIC

    b = bytes(payload)
    if b[:8] == PNG_MAGIC and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "image/png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:  # desynced — not a marker where one must be
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(b):
                    return None
                height = int.from_bytes(b[i + 5 : i + 7], "big")
                width = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("image/jpeg", width, height)
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 20:
        # WebP (public container spec): dims live in the first chunk's
        # header — sniffable even though PIXEL decode (VP8 entropy
        # coding) stays behind the NotImplementedError stub.
        fourcc = b[12:16]
        if fourcc == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
            return (
                "image/webp",
                int.from_bytes(b[26:28], "little") & 0x3FFF,
                int.from_bytes(b[28:30], "little") & 0x3FFF,
            )
        if fourcc == b"VP8L" and len(b) >= 25 and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            return (
                "image/webp",
                (bits & 0x3FFF) + 1,
                ((bits >> 14) & 0x3FFF) + 1,
            )
        if fourcc == b"VP8X" and len(b) >= 30:
            return (
                "image/webp",
                int.from_bytes(b[24:27], "little") + 1,
                int.from_bytes(b[27:30], "little") + 1,
            )
        return None
    return None


def jpeg_header_bytes(width: int, height: int, sof: int = 0xC0) -> bytes:
    """Structurally-valid JPEG prefix (SOI, JFIF APP0, a DHT segment,
    SOFn with the given dimensions) — enough container for any
    header-level tool (including :func:`sniff_image_dims`) to parse,
    with no entropy-coded body. Used to exercise the JPEG metadata path
    in a container that cannot encode real JPEGs."""
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    sof_body = b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x03"
    sofseg = bytes([0xFF, sof]) + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    return b"\xff\xd8" + app0 + dht + sofseg


def attach_mixed_probe_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a MIXED-format binary corpus keyed by doc_id % 3:
    real 8×8 RGB PNGs (md5(text)-seeded pixels), JPEG headers whose
    dimensions derive arithmetically from doc_id (width = 16 + id % 1000,
    height = 16 + (7 * id) % 1000 — so an oracle can recompute them), and
    deliberate non-image garbage. The shape every metadata-probe stage
    must survive: heterogeneous, partly junk."""
    import pandas as pd  # noqa: F811

    from randas_spark.operators.png import encode_png

    n_px = 8 * 8 * 3

    @F.pandas_udf("binary")
    def payload_of(ids: pd.Series, texts: pd.Series) -> pd.Series:
        def make(doc_id: int, text: str) -> bytes:
            m = doc_id % 3
            if m == 0:
                seed = hashlib.md5(text.encode()).digest()
                return encode_png((seed * (n_px // len(seed) + 1))[:n_px], 8, 8, 3)
            if m == 1:
                return jpeg_header_bytes(16 + doc_id % 1000, 16 + (7 * doc_id) % 1000)
            return b"\x00garbage:" + text.encode()[:16]

        return pd.Series([make(i, s) for i, s in zip(ids, texts)])

    return df.select(
        F.col(id_col).alias("doc_id"),
        payload_of(F.col(id_col), F.col(text_col)).alias("payload"),
    )


PROBE_SCHEMA = "doc_id long, mime string, width long, height long, n_bytes long"


def probe_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata probe: payload → sniffed (mime, width,
    height) from container headers alone. Unrecognized payloads yield
    null mime/dims rather than failing the scan — at corpus scale a
    metadata pass must classify garbage, not die on it. No shuffle,
    header-sized reads per row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sniffed = [sniff_image_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [s[0] if s else None for s in sniffed],
                    "width": [s[1] if s else None for s in sniffed],
                    "height": [s[2] if s else None for s in sniffed],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(kernel, schema=PROBE_SCHEMA)


def attach_png_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """Simulate a multimodal corpus with REAL image bytes: each document
    gets a valid width×height RGB PNG whose pixels derive
    deterministically from md5(text) — so the decode stage downstream
    exercises the actual PNG codec, not a stub. Arrow-batched pandas_udf
    (the encode is Python, but linear and scan-side)."""
    import pandas as pd  # noqa: F811 (module-level import exists)

    from randas_spark.operators.png import encode_png

    n_px = width * height * 3

    @F.pandas_udf("binary")
    def png_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            seed = hashlib.md5(text.encode()).digest()
            pixels = (seed * (n_px // len(seed) + 1))[:n_px]
            return encode_png(pixels, width, height, 3)

        return texts.map(make)

    # meta.n_bytes must describe the PAYLOAD (the encoded PNG), not the
    # source text it was derived from
    return (
        df.select(
            F.col(id_col).alias("doc_id"), png_of(F.col(text_col)).alias("payload")
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit("image/png").alias("mime"),
                F.length(F.col("payload")).cast("long").alias("n_bytes"),
                F.lit(width).cast("long").alias("width"),
                F.lit(height).cast("long").alias("height"),
            ),
        )
    )


def attach_webp_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """attach_png_payload's lossless-WebP sibling (r13): each document
    gets a valid width×height RGBA VP8L whose pixels derive
    deterministically from md5(text), so the decode stage downstream
    exercises the real WebP codec in operators/vp8l.py — fake=False all
    the way through."""
    import pandas as pd  # noqa: F811 (module-level import exists)

    from randas_spark.operators.vp8l import encode_vp8l_rgba

    n_px = width * height * 4

    @F.pandas_udf("binary")
    def webp_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            seed = hashlib.md5(text.encode()).digest()
            pixels = (seed * (n_px // len(seed) + 1))[:n_px]
            return encode_vp8l_rgba(pixels, width, height)

        return texts.map(make)

    return (
        df.select(
            F.col(id_col).alias("doc_id"), webp_of(F.col(text_col)).alias("payload")
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit("image/webp").alias("mime"),
                F.length(F.col("payload")).cast("long").alias("n_bytes"),
                F.lit(width).cast("long").alias("width"),
                F.lit(height).cast("long").alias("height"),
            ),
        )
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers column batches per partition; the kernel loops a batch
    at a time (vector-friendly), emits one feature row per input. This is
    the canonical shape for decode / resize / frame-sample stages: swap
    the kernel, keep the plumbing.

    Scale: embarrassingly parallel map — no shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
    payload-size-safe.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["mime"].split("/")[0] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [zlib.crc32(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<mime:string, n_bytes:bigint, width:bigint, height:bigint>"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame binary, "
    "meta struct<mime:string, n_bytes:bigint, width:bigint, height:bigint>"
)


def resize_kernel(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize decode→scale→encode kernel — REAL since r13 for every
    decodable format: decode_pixels routes to the stdlib codecs
    (PNG/BMP/GIF/JPEG/VP8L), operators/raster.py resamples (exact
    integer box filter on integer factors, half-pixel bilinear
    otherwise), and the result re-encodes as PNG (the one encoder the
    repo ships). Formats past the codec boundary raise unless
    fake=True, which keeps the old deterministic size-proportional
    md5-keyed stub payload (used by the fixture-chain query whose
    payloads are not images at all)."""
    if fake:
        budget = max(1, (width * height) // 64)
        seed = hashlib.md5(payload).digest()
        return (seed * (budget // len(seed) + 1))[:budget]
    import numpy as np

    from randas_spark.operators.png import encode_png
    from randas_spark.operators.raster import resample

    w, h, c, pix = decode_pixels(bytes(payload))
    px = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c)
    out = resample(px, height, width)
    return encode_png(out.tobytes(), width, height, c)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """mapInPandas resize stage: payload → resized payload, metadata
    rewritten to the target dimensions (real path re-encodes PNG, so
    mime follows suit). 1:1 row mapping, no shuffle — embarrassingly
    parallel; at 100 TB this is a pure scan stage whose cost is the
    codec, not the engine."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_kernel(p, width, height, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        {
                            "mime": m["mime"] if fake else "image/png",
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for m, p in zip(pdf["meta"], out)
                    ],
                }
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def _sample_gif_frames(payload: bytes, max_frames: int) -> list[tuple[bytes, int, int]]:
    """Animated-GIF frame sampler: decode + composite every frame
    (imagefmt.decode_gif_frames), pick `max_frames` evenly strided
    (frame floor(i·n/k) for i < k = min(max_frames, n)), re-encode each
    composited canvas as PNG. Returns [(png_bytes, width, height)]."""
    from randas_spark.operators.imagefmt import decode_gif_frames
    from randas_spark.operators.png import encode_png

    sw, sh, frames = decode_gif_frames(bytes(payload))
    n = len(frames)
    k = min(max_frames, n)
    out = []
    for i in range(k):
        rgb, _delay = frames[(i * n) // k]
        out.append((encode_png(rgb, sw, sh, 3), sw, sh))
    return out


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas frame-sampling stage: one motion payload → up to
    `max_frames` frame rows (row-EXPANDING map).

    REAL since r13 for animated GIF — the one motion format the stdlib
    codecs decode: frames are composited per GIF89a (offsets,
    transparency, disposal), sampled with an even stride, and emitted
    as PNG rows. True video containers (mp4/webm — inter-frame
    prediction needs a codec library) raise unless fake=True, which
    keeps the deterministic payload-chunking stub.

    Scale: expansion happens inside the scan stage (no shuffle); output
    row count is bounded by max_frames so downstream batch sizes stay
    predictable."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from randas_spark.operators.imagefmt import GIF_MAGICS

        for pdf in batches:
            ids, idxs, frames, metas = [], [], [], []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if not fake:
                    if bytes(payload[:6]) not in GIF_MAGICS:
                        raise NotImplementedError(
                            "video frame sampling requires a codec library not "
                            "present in this container (animated GIF samples "
                            "for real via imagefmt.decode_gif_frames); run "
                            "with fake=True for the deterministic stub"
                        )
                    for i, (png, w, h) in enumerate(
                        _sample_gif_frames(payload, max_frames)
                    ):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(png)
                        metas.append(
                            {"mime": "image/png", "n_bytes": len(png), "width": w, "height": h}
                        )
                    continue
                n = min(max_frames, max(1, len(payload) // frame_bytes))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * frame_bytes : (i + 1) * frame_bytes]))
                    metas.append(dict(meta))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "meta": metas}
            )

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)


def attach_gif_payload(
    df: DataFrame, id_col: str, text_col: str, n_frames: int = 4
) -> DataFrame:
    """Simulate an animation corpus with REAL multi-frame GIF bytes
    (r13): each document gets an 8×8 `n_frames`-frame GIF89a animation
    — frame f's palette-index stream is md5(text) rotated by 5·f
    (index j → digest[(j + 5f) mod 16]) over the fixed 256-color
    palette (i, 255−i, (7i+3) mod 256), encoded by
    imagefmt.encode_gif_animation — so the sampling stage downstream
    exercises the actual LZW decode + GIF89a compositing path."""
    from randas_spark.operators.imagefmt import encode_gif_animation

    palette = [(i, 255 - i, (i * 7 + 3) % 256) for i in range(256)]

    @F.pandas_udf("binary")
    def gif_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            dg = hashlib.md5(text.encode()).digest()
            frames = [
                bytes(dg[(j + 5 * f) % 16] for j in range(64)) for f in range(n_frames)
            ]
            return encode_gif_animation(frames, palette, 8, 8, delay_cs=4)

        return texts.map(make)

    return df.select(
        F.col(id_col).alias("doc_id"), gif_of(F.col(text_col)).alias("payload")
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.length(F.col("payload")).cast("long").alias("n_bytes"),
            F.lit(8).cast("long").alias("width"),
            F.lit(8).cast("long").alias("height"),
        ),
    )


FRAME_FEATURE_SCHEMA = (
    "doc_id long, frame_idx long, modality string, feature array<double>"
)


def extract_frame_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-frame feature extraction over sample_frames output: decodes
    each frame payload (PNG rows from the real sampler) through the
    shared decode_image kernel, keyed (doc_id, frame_idx). Same
    embarrassingly parallel mapInPandas shape as extract_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "modality": [m["mime"].split("/")[0] for m in pdf["meta"]],
                    "feature": [decode_image(p, fake=fake) for p in pdf["frame"]],
                }
            )

    return df.mapInPandas(kernel, schema=FRAME_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Audio modality (real dependency-free WAV path — operators/wav.py)
# --------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, sample_rate long, "
    "feature array<double>"
)


def decode_audio(payload: bytes, fake: bool = False) -> tuple[list[float], int]:
    """Audio decode kernel: RIFF WAV payloads decode FOR REAL via the
    dependency-free codec in operators/wav.py — PCM16, G.711 A-law/μ-law
    (telephony companding, r13) and IMA ADPCM (r13), with struct parsing
    + channel averaging. Only perceptual codecs (MP3/AAC/OGG —
    psychoacoustic transform coding) need a library this container
    lacks: they raise unless fake=True, which substitutes a
    deterministic md5-derived stub stream."""
    from randas_spark.operators.wav import WAV_MAGIC, decode_wav

    if bytes(payload[:4]) == WAV_MAGIC:
        return decode_wav(bytes(payload))
    if not fake:
        raise NotImplementedError(
            "perceptual audio codecs (MP3/AAC/OGG) require a codec library "
            "not present in this container (PCM16/G.711/IMA-ADPCM WAV decode "
            "for real via operators/wav.py); run with fake=True for the "
            "deterministic stub"
        )
    h = hashlib.md5(payload).digest()
    return [b / 128.0 - 1.0 for b in h], 8000


def attach_wav_payload(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 8000, n_samples: int = 512
) -> DataFrame:
    """Simulate an audio corpus with REAL WAV bytes: each document gets
    a PCM16 mono tone whose frequency/phase derive deterministically
    from md5(text), so the decode stage downstream exercises the actual
    RIFF parser. Same Arrow-batched shape as attach_png_payload."""
    import math

    import pandas as pd  # noqa: F811

    from randas_spark.operators.wav import encode_wav

    @F.pandas_udf("binary")
    def wav_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            seed = hashlib.md5(text.encode()).digest()
            freq = 100 + seed[0] * 8  # 100..2140 Hz
            phase = seed[1] / 255.0 * 2 * math.pi
            samples = [
                int(30000 * math.sin(2 * math.pi * freq * i / sample_rate + phase))
                for i in range(n_samples)
            ]
            return encode_wav(samples, sample_rate)

        return texts.map(make)

    return df.select(
        F.col(id_col).alias("doc_id"),
        wav_of(F.col(text_col)).alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(n_samples * 2 + 44).cast("long").alias("n_bytes"),
            F.lit(sample_rate).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


def attach_bmp_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """Simulate a corpus of REAL BMP bytes (r13): each document gets a
    24-bit BI_RGB bottom-up BMP whose row-major RGB pixels are the
    REVERSED md5(text) digest tiled to width·height·3 bytes (reversed
    so this fixture is distinguishable from the PNG twin's forward
    tiling), encoded by imagefmt.encode_bmp — the decode stage
    downstream exercises the actual BGR/bottom-up normalization path."""
    from randas_spark.operators.imagefmt import encode_bmp

    n_px = width * height * 3

    @F.pandas_udf("binary")
    def bmp_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            seed = hashlib.md5(text.encode()).digest()[::-1]
            pixels = (seed * (n_px // len(seed) + 1))[:n_px]
            return encode_bmp(pixels, width, height)

        return texts.map(make)

    return df.select(
        F.col(id_col).alias("doc_id"), bmp_of(F.col(text_col)).alias("payload")
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.length(F.col("payload")).cast("long").alias("n_bytes"),
            F.lit(width).cast("long").alias("width"),
            F.lit(height).cast("long").alias("height"),
        ),
    )


def attach_audio_mixed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a MIXED-codec audio corpus (r13): by doc_id mod 4 the
    payload is a PCM16 tone WAV (0), μ-law (1) / A-law (2) G.711
    container, or a single-block IMA ADPCM container (3) — all real
    bytes from the operators/wav encoders, all digest-deterministic.
    The shape a crawl's audio column actually has: heterogeneous
    codecs in one binary column, dispatched by header."""
    import math
    import struct as _struct

    from randas_spark.operators.wav import (
        encode_wav,
        encode_wav_g711,
        wrap_ima_adpcm,
    )

    @F.pandas_udf("binary")
    def audio_of(doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        def make(doc_id: int, text: str) -> bytes:
            dg = hashlib.md5(text.encode()).digest()
            kind = int(doc_id) % 4
            if kind == 0:
                freq = 100 + dg[0] * 8
                phase = dg[1] / 255.0 * 2 * math.pi
                samples = [
                    int(30000 * math.sin(2 * math.pi * freq * i / 8000 + phase))
                    for i in range(512)
                ]
                return encode_wav(samples, 8000)
            if kind in (1, 2):
                law = "mulaw" if kind == 1 else "alaw"
                return encode_wav_g711(dg * 8, law=law, sample_rate=8000)
            data = _struct.pack("<hBB", _struct.unpack("<h", dg[:2])[0], dg[2] % 89, 0)
            return wrap_ima_adpcm(data + dg * 4, 129, 8000, 68, 129)

        return pd.Series([make(i, t) for i, t in zip(doc_ids, texts)])

    return df.select(
        F.col(id_col).alias("doc_id"),
        audio_of(F.col(id_col), F.col(text_col)).alias("payload"),
    )


AUDIO_META_SCHEMA = (
    "doc_id long, codec string, sample_rate long, channels long, n_samples long"
)


def probe_audio_meta(df: DataFrame) -> DataFrame:
    """mapInPandas header-only audio metadata scan (sniff_audio_meta per
    payload): the 100 TB metadata-extraction shape — reads fmt/fact/data
    chunk headers, never the sample stream, embarrassingly parallel,
    zero shuffles. Unknown payloads emit NULL columns rather than
    failing the scan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [sniff_audio_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "codec": [r[0] if r else None for r in rows],
                    "sample_rate": [r[1] if r else None for r in rows],
                    "channels": [r[2] if r else None for r in rows],
                    "n_samples": [r[3] if r else None for r in rows],
                }
            )

    return df.mapInPandas(kernel, schema=AUDIO_META_SCHEMA)


def sniff_audio_meta(payload: bytes) -> tuple[str, int, int, int] | None:
    """Header-only (codec, sample_rate, channels, n_samples) probe for
    RIFF/WAVE payloads — NO sample decode, the audio sibling of
    sniff_image_dims: a 100 TB metadata scan reads fmt/fact/data chunk
    HEADERS, never the sample stream. n_samples comes from the fact
    chunk when present (mandatory for compressed formats), else from
    the data size over the PCM frame width. Returns None for non-WAV
    payloads — never raises on malformed bytes."""
    import struct as _struct

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    names = {1: "pcm", 6: "alaw", 7: "mulaw", 0x11: "ima_adpcm"}
    pos, n = 12, len(b)
    codec = None
    rate = channels = bits = 0
    fact = None
    data_size = None
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        (size,) = _struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt " and size >= 16 and pos + 8 + 16 <= n:
            tag, channels, rate, _, _, bits = _struct.unpack_from("<HHIIHH", b, pos + 8)
            codec = names.get(tag, f"unknown-{tag}")
        elif cid == b"fact" and size >= 4 and pos + 12 <= n:
            (fact,) = _struct.unpack_from("<I", b, pos + 8)
        elif cid == b"data":
            data_size = size  # header only — do NOT touch the samples
        pos += 8 + size + (size % 2)
    if codec is None or data_size is None:
        return None
    if fact is not None:
        n_samples = fact
    elif codec == "pcm" and bits and channels:
        n_samples = data_size // (max(1, bits // 8) * channels)
    elif codec in ("alaw", "mulaw") and channels:
        n_samples = data_size // channels
    else:
        n_samples = -1  # compressed without a fact chunk: unknown
    return codec, rate, channels, n_samples


def attach_g711_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a telephony-audio corpus with REAL G.711 WAV bytes
    (r13): each document's data chunk is its md5(text) digest tiled 8×
    (128 companded bytes), wrapped in a format-7 (μ-law, even doc_id) or
    format-6 (A-law, odd doc_id) RIFF container by operators/wav.
    encode_wav_g711 — so the decode stage downstream exercises the real
    G.711 expansion formulas on both laws. Container size is fixed:
    12 (RIFF) + 26 (fmt) + 12 (fact) + 136 (data) = 186 bytes."""
    from randas_spark.operators.wav import encode_wav_g711

    @F.pandas_udf("binary")
    def g711_of(doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        def make(doc_id: int, text: str) -> bytes:
            data = hashlib.md5(text.encode()).digest() * 8
            law = "mulaw" if int(doc_id) % 2 == 0 else "alaw"
            return encode_wav_g711(data, law=law, sample_rate=8000)

        return pd.Series([make(i, t) for i, t in zip(doc_ids, texts)])

    return df.select(
        F.col(id_col).alias("doc_id"),
        g711_of(F.col(id_col), F.col(text_col)).alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(186).cast("long").alias("n_bytes"),
            F.lit(8000).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


def attach_adpcm_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate an ADPCM-audio corpus with REAL IMA/DVI WAV bytes (r13):
    each document gets a single-block format-0x11 container whose block
    header (predictor = digest bytes 0-1 as int16, step index = byte 2
    mod 89) and 128-nibble code stream (digest tiled 4×, low nibble
    first) derive from md5(text) — so the decode stage downstream runs
    the actual per-nibble predictor/step-index recurrence on a known
    stream. Container size fixed: 12 + 28 (fmt) + 12 (fact) + 76 (data)
    = 128 bytes, 129 samples."""
    import struct as _struct

    from randas_spark.operators.wav import wrap_ima_adpcm

    @F.pandas_udf("binary")
    def adpcm_of(texts: pd.Series) -> pd.Series:
        def make(text: str) -> bytes:
            dg = hashlib.md5(text.encode()).digest()
            pred0 = _struct.unpack("<h", dg[:2])[0]
            idx0 = dg[2] % 89
            data = _struct.pack("<hBB", pred0, idx0, 0) + dg * 4
            return wrap_ima_adpcm(data, 129, 8000, 68, 129)

        return texts.map(make)

    return df.select(
        F.col(id_col).alias("doc_id"),
        adpcm_of(F.col(text_col)).alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(128).cast("long").alias("n_bytes"),
            F.lit(8000).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas audio feature extraction: decode (real WAV path) →
    8-dim deterministic features (duration/RMS/peak/ZCR/...). Same
    embarrassingly-parallel, Arrow-batched, shuffle-free plumbing as
    the image stage."""
    from randas_spark.operators.wav import audio_features

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_audio(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["mime"].split("/")[0] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sample_rate": [r for _, r in decoded],
                    "feature": [audio_features(s, r) for s, r in decoded],
                }
            )

    return df.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)
