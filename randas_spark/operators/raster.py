"""Codec-neutral raster resampling (r13) — the compute half of a REAL
image-resize stage, dependency-free (numpy only, no imaging library).

Two exactly-specified kernels so results are bit-stable across
platforms and replayable in a SQL oracle:

- ``box_downscale``: integer-factor reduction as an exact integer box
  filter — each output byte is round-half-up((block sum) / area) done
  entirely in int64 math, so there is no float in the path at all.
- ``bilinear_resize``: the general path — half-pixel-center sampling
  (the OpenCV/PIL convention: src = (dst + 0.5) * scale - 0.5), edge
  clamp, float64 accumulation, round-half-up to a byte.

Beyond-reference operator (training-data pipeline family): the
reference ships no resampler, so the kernel semantics here are the
public half-pixel convention, chosen and pinned by tests/goldens.
"""

from __future__ import annotations

import numpy as np


def box_downscale(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8 → (out_h, out_w, c) uint8; requires integer
    scale factors. Exact integer math: round-half-up of the block mean."""
    h, w, c = px.shape
    if h % out_h or w % out_w:
        raise ValueError(f"box_downscale needs integer factors, got {h}x{w} -> {out_h}x{out_w}")
    fy, fx = h // out_h, w // out_w
    sums = px.astype(np.int64).reshape(out_h, fy, out_w, fx, c).sum(axis=(1, 3))
    area = fy * fx
    return ((sums + area // 2) // area).astype(np.uint8)


def bilinear_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8 → (out_h, out_w, c) uint8 by bilinear sampling at
    half-pixel centers with edge clamp; bytes round half-up."""
    h, w, c = px.shape
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    yf = np.floor(ys).astype(np.int64)
    xf = np.floor(xs).astype(np.int64)
    # clamp BOTH neighbors from the unclipped floor — clamping the floor
    # first and adding 1 would blend edge taps with the second texel
    y0 = np.clip(yf, 0, h - 1)
    y1 = np.clip(yf + 1, 0, h - 1)
    x0 = np.clip(xf, 0, w - 1)
    x1 = np.clip(xf + 1, 0, w - 1)
    # fractional weights from the UNclipped coordinates: outside the
    # image both neighbors clamp to the same texel, so the weight is
    # irrelevant there and the interior stays exact
    wy = (ys - np.floor(ys))[:, None, None]
    wx = (xs - np.floor(xs))[None, :, None]
    p = px.astype(np.float64)
    py0, py1 = p[y0], p[y1]  # hoisted: each row gather used twice below
    top = py0[:, x0] * (1.0 - wx) + py0[:, x1] * wx
    bot = py1[:, x0] * (1.0 - wx) + py1[:, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resample(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Dispatch: exact integer box filter when the factors divide evenly
    (the common thumbnail/training-crop case — and the SQL-replayable
    one), bilinear otherwise."""
    h, w, _ = px.shape
    if h % out_h == 0 and w % out_w == 0:
        return box_downscale(px, out_h, out_w)
    return bilinear_resize(px, out_h, out_w)
