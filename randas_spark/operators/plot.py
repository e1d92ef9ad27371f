"""Dependency-free scatter rasterizer over the stdlib PNG encoder.

Closes the last lib-gated surface in §2.9: the reference renders
scatter_plot with the plotters crate (dataframe.rs:888-944 — numeric-
coerced axes, equal-length assert, PNG output); this renders the same
capability with operators/png.encode_png so no plotting library is
needed in the container. Axes are drawn as 1-px black lines with tick
marks; points are filled 2-px-radius dots. Rendering is a driver-side
convenience over already-collected numeric vectors — the distributed
part (numeric extraction) happens upstream in the frame.
"""

from __future__ import annotations

from randas_spark.operators.png import encode_png

_BG = (255, 255, 255)
_AXIS = (0, 0, 0)
_POINT = (31, 119, 180)  # matplotlib C0 blue, a familiar default


def _scale(vals: list[float], lo_px: int, hi_px: int) -> list[int]:
    """Map data values onto [lo_px, hi_px] pixel coordinates; a
    degenerate (constant) range centers every point."""
    vmin, vmax = min(vals), max(vals)
    span = vmax - vmin
    if span == 0:
        mid = (lo_px + hi_px) // 2
        return [mid] * len(vals)
    f = (hi_px - lo_px) / span
    return [lo_px + round((v - vmin) * f) for v in vals]


def render_scatter(
    xs: list[float],
    ys: list[float],
    width: int = 640,
    height: int = 480,
    margin: int = 40,
    n_ticks: int = 5,
) -> bytes:
    """(xs, ys) → PNG bytes. Equal-length and non-empty asserts match
    the reference's panics (dataframe.rs:896-900)."""
    if len(xs) != len(ys):
        raise ValueError(f"scatter needs equal lengths, got {len(xs)} vs {len(ys)}")
    if not xs:
        raise ValueError("scatter needs at least one point")
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]

    buf = bytearray(_BG * (width * height))

    def put(px: int, py: int, rgb: tuple[int, int, int]) -> None:
        if 0 <= px < width and 0 <= py < height:
            off = (py * width + px) * 3
            buf[off : off + 3] = bytes(rgb)

    left, right = margin, width - margin
    top, bottom = margin, height - margin

    # axis lines: x along the bottom, y along the left
    for px in range(left, right + 1):
        put(px, bottom, _AXIS)
    for py in range(top, bottom + 1):
        put(left, py, _AXIS)
    # tick marks (4 px, outward)
    if n_ticks < 1:
        raise ValueError(f"n_ticks must be >= 1, got {n_ticks}")
    for i in range(n_ticks + 1):
        tx = left + (right - left) * i // n_ticks
        ty = bottom - (bottom - top) * i // n_ticks
        for d in range(1, 5):
            put(tx, bottom + d, _AXIS)
            put(left - d, ty, _AXIS)

    # points: filled 2-px-radius dots, y axis inverted (pixel rows grow down)
    pxs = _scale(xs, left + 2, right - 2)
    pys = _scale(ys, top + 2, bottom - 2)
    r = 2
    for cx, cy in zip(pxs, pys):
        cy = bottom - (cy - top)  # invert
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx * dx + dy * dy <= r * r:
                    put(cx + dx, cy + dy, _POINT)

    return encode_png(bytes(buf), width, height, 3)
