"""Dependency-free WAV (RIFF/PCM16) codec — the audio twin of
operators/png.py: real bytes in, real samples out, no audio library.

Covers canonical PCM WAV: RIFF/WAVE container, fmt chunk with
format=1 (PCM) 16-bit, mono or multi-channel (channels are averaged to
mono on decode — feature extraction wants one stream). That is the
payload shape a crawl's audio attachments overwhelmingly use; compressed
codecs (MP3/AAC/OGG) still require a library this container lacks and
stay behind the fake= gate in operators/multimodal.py.

Everything is integer/struct parsing plus float feature math —
deterministic, so feature goldens are testable bit-for-bit.
"""

from __future__ import annotations

import math
import struct

WAV_MAGIC = b"RIFF"


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Canonical PCM16 mono WAV bytes from int samples in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[list[float], int]:
    """(mono samples normalized to [-1, 1], sample_rate) from PCM WAV
    bytes. Raises ValueError on non-RIFF/non-PCM/non-16-bit payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    channels = sample_rate = bits = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # declared chunk size exceeds the remaining payload: a
            # truncated fmt chunk would escape as struct.error (breaking
            # the ValueError contract) and a truncated data chunk would
            # silently yield fewer samples
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"compressed WAV (format {audio_fmt}) needs a codec library")
            if bits != 16:
                raise ValueError(f"only PCM16 supported, got {bits}-bit")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if data is None or channels is None:
        raise ValueError("missing fmt/data chunk")
    raw = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
    if channels > 1:  # average interleaved channels to mono
        frames = len(raw) // channels
        raw = [
            sum(raw[f * channels + c] for c in range(channels)) / channels
            for f in range(frames)
        ]
    return [s / 32768.0 for s in raw], sample_rate


def audio_features(samples: list[float], sample_rate: int) -> list[float]:
    """8-dim deterministic feature vector: duration, RMS, peak, zero-
    crossing rate, mean, mean |x|, first/second-half energy ratio,
    spectral-centroid proxy (ZCR × Nyquist)."""
    n = len(samples)
    if n == 0:
        return [0.0] * 8
    rms = math.sqrt(sum(s * s for s in samples) / n)
    peak = max(abs(s) for s in samples)
    zc = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    zcr = zc / (n - 1) if n > 1 else 0.0
    half = n // 2
    e1 = sum(s * s for s in samples[:half]) or 1e-30
    e2 = sum(s * s for s in samples[half:]) or 1e-30
    return [
        n / sample_rate,
        rms,
        peak,
        zcr,
        sum(samples) / n,
        sum(abs(s) for s in samples) / n,
        e1 / e2,
        zcr * sample_rate / 2.0,
    ]
