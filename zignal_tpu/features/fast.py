"""FAST corner detector (reference: src/features/Fast.zig).

TPU formulation: the 16 Bresenham-circle taps are shifted copies of the
plane; the contiguous-arc test runs as bitmask shift/AND reductions on a
per-pixel 16-bit mask (log-step run detection) — one fused device program
for the whole image instead of per-pixel loops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["KeyPoint", "Fast"]

# Bresenham circle radius 3, clockwise from 12 o'clock: (dx, dy)
CIRCLE_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


@dataclasses.dataclass
class KeyPoint:
    """Detected feature point (reference: src/features/KeyPoint.zig)."""

    x: float
    y: float
    size: float = 7.0
    angle: float = -1.0
    response: float = 0.0
    octave: int = 0
    class_id: int = -1

    def distance_squared(self, other: "KeyPoint") -> float:
        return (self.x - other.x) ** 2 + (self.y - other.y) ** 2


def _shift_plane(a, dx, dy):
    """out[r, c] = a[r + dy, c + dx], zero fill."""
    out = jnp.roll(a, (-dy, -dx), axis=(0, 1))
    return out


def _has_run(mask16, min_run: int):
    """Per-pixel: does the circular 16-bit mask contain a run >= min_run?
    Wraparound handled by doubling the mask to 32 bits (unsigned, so the
    shifts stay logical — an arithmetic shift would fabricate runs)."""
    m = mask16.astype(jnp.uint32) if hasattr(mask16, "astype") else jnp.uint32(mask16)
    m = m | (m << 16)
    run = 1
    r = m
    for step in (1, 2, 4, 8):
        if run + step <= min_run:
            r = r & (r >> step)
            run += step
    while run < min_run:
        r = r & (r >> 1)
        run += 1
    return r != 0


@partial(jax.jit, static_argnames=("threshold", "min_contiguous"))
def fast_response_map(gray_u8, threshold: int = 20, min_contiguous: int = 9):
    """[H, W] u8 -> [H, W] int32 corner scores (0 = not a corner)."""
    a = gray_u8.astype(jnp.int32)
    h, w = a.shape
    bright_thr = jnp.minimum(a + threshold, 255)
    dark_thr = jnp.maximum(a - threshold, 0)

    bright_mask = jnp.zeros((h, w), jnp.int32)
    dark_mask = jnp.zeros((h, w), jnp.int32)
    score = jnp.zeros((h, w), jnp.int32)
    for i, (dx, dy) in enumerate(CIRCLE_OFFSETS):
        px = _shift_plane(a, dx, dy)
        bright_mask = bright_mask | ((px > bright_thr).astype(jnp.int32) << i)
        dark_mask = dark_mask | ((px < dark_thr).astype(jnp.int32) << i)
        diff = jnp.abs(px - a)
        score = score + jnp.where(diff > threshold, diff, 0)

    corner = _has_run(bright_mask, min_contiguous) | _has_run(dark_mask, min_contiguous)
    # exclude the 3-pixel border (roll wraps around)
    border = jnp.zeros((h, w), bool).at[3:h - 3, 3:w - 3].set(True)
    return jnp.where(corner & border, score, 0)


@dataclasses.dataclass
class Fast:
    """FAST-9/12 detector (reference: Fast.zig:16-24 options)."""

    threshold: int = 20
    nonmax_suppression: bool = True
    min_contiguous: int = 9

    def detect(self, image) -> list:
        """Detect corners in an Image or [H, W] u8 array."""
        from ..image import Image

        if isinstance(image, Image):
            plane = image._gray_u8_plane()
        else:
            plane = jnp.asarray(np.asarray(image))
            if plane.ndim == 3:
                plane = plane[..., 0]
        scores = fast_response_map(plane, self.threshold, self.min_contiguous)
        if self.nonmax_suppression:
            keep = _nms_device(scores)
            scores = jnp.where(keep, scores, 0)
        s = np.asarray(scores)
        ys, xs = np.nonzero(s)
        return [
            KeyPoint(x=float(x), y=float(y), size=7.0, angle=-1.0,
                     response=float(s[y, x]), octave=0)
            for y, x in zip(ys, xs)
        ]


@jax.jit
def _nms_device(scores):
    """Keep pixels whose score is not exceeded within distance < 5
    (reference suppressNonMaximal: dist^2 < 25, strictly greater wins)."""
    keep = scores > 0
    best = scores
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            if dx == 0 and dy == 0:
                continue
            if dx * dx + dy * dy >= 25:
                continue
            best = jnp.maximum(best, _shift_plane(scores, dx, dy))
    return keep & (scores >= best)
