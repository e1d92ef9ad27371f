"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The container has no decode libraries (PIL/ffmpeg/etc.), so the decode
kernel itself is STUBBED — `decode_image` raises NotImplementedError
unless `fake=True`, which substitutes a deterministic fake decoder. The
Spark-side plumbing is real and tested: schema (binary + metadata struct),
partition-sized Arrow batches, UDF signatures, and the feature-extract
output shape are exactly what a real decoder would plug into.
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


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode kernel → 8-dim pixel feature.

    PNG payloads are decoded FOR REAL by the dependency-free codec in
    operators/png.py (stdlib zlib + scanline unfiltering; 8-bit
    gray/RGB/palette/alpha profiles) — no imaging library needed. Other
    formats (JPEG/WebP/...) still require a library this container lacks:
    they raise unless fake=True, which substitutes the deterministic
    md5-derived stub feature."""
    from randas_spark.operators.png import PNG_MAGIC, decode_png, pixel_features

    if bytes(payload[:8]) == PNG_MAGIC:
        return pixel_features(*decode_png(bytes(payload)))
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library not present in "
            "this container; run with fake=True for the deterministic stub"
        )
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:8]]


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
    """Resize decode→scale→encode kernel. STUB: real resize needs an
    imaging library; fake=True produces a deterministic size-proportional
    byte payload (md5-keyed) with the target dimensions' byte budget."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an imaging library not present in this "
            "container; run with fake=True for the deterministic stub"
        )
    budget = max(1, (width * height) // 64)
    seed = hashlib.md5(payload).digest()
    return (seed * (budget // len(seed) + 1))[:budget]


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """mapInPandas resize stage: payload → resized payload, metadata
    rewritten to the target dimensions. 1:1 row mapping, no shuffle —
    swap `resize_kernel` for a real PIL/opencv call and nothing else
    changes (schema, batching, partitioning are the contract)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_kernel(p, width, height, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        {
                            "mime": m["mime"],
                            "n_bytes": len(p),
                            "width": width,
                            "height": height,
                        }
                        for m, p in zip(pdf["meta"], out)
                    ],
                }
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """mapInPandas frame-sampling stage: one video payload → up to
    `max_frames` frame rows (row-EXPANDING map, the shape a real
    ffmpeg-backed sampler plugs into; fake slices the payload into
    fixed-size chunks).

    Scale: expansion happens inside the scan stage (no shuffle); output
    row count is bounded by max_frames so downstream batch sizes stay
    predictable."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires a video library not present in this "
            "container; run with fake=True for the deterministic stub"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, metas = [], [], [], []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
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


# --------------------------------------------------------------------------
# Audio modality (real dependency-free WAV path — operators/wav.py)
# --------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, sample_rate long, "
    "feature array<double>"
)


def decode_audio(payload: bytes, fake: bool = False) -> tuple[list[float], int]:
    """Audio decode kernel: RIFF/PCM16 WAV payloads decode FOR REAL via
    the dependency-free codec in operators/wav.py (struct parsing +
    channel averaging). Compressed codecs (MP3/AAC/OGG) need a library
    this container lacks: they raise unless fake=True, which substitutes
    a deterministic md5-derived stub stream."""
    from randas_spark.operators.wav import WAV_MAGIC, decode_wav

    if bytes(payload[:4]) == WAV_MAGIC:
        return decode_wav(bytes(payload))
    if not fake:
        raise NotImplementedError(
            "compressed audio decode requires a codec library not present in "
            "this container; run with fake=True for the deterministic stub"
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
