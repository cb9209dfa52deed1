"""Hough line transform (reference: src/image/hough.zig).

Voting is one device scatter-add: every edge pixel contributes a vote at
(rho_bin, theta) for all theta simultaneously (the "scatter-add votes"
TPU formulation from SURVEY.md). The fixed-point rho math replicates the
reference's 16.16 tables exactly.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HoughTransform", "HoughLine"]


@dataclasses.dataclass
class HoughLine:
    angle: float          # degrees; 0 horizontal, +-90 vertical
    radius: float         # distance from image center
    score: int            # votes
    p1: tuple             # start point clipped to bounds
    p2: tuple             # end point


def _tables(size: int):
    even = size if size % 2 == 0 else size - 1
    t = np.arange(size, dtype=np.float64)
    theta = t * np.pi / even
    scale = 1 << 16
    cos_t = np.trunc(scale * np.cos(theta) / np.sqrt(2.0)).astype(np.int64)
    sin_t = np.trunc(scale * np.sin(theta) / np.sqrt(2.0)).astype(np.int64)
    offset = int(round(scale * even / 4.0))
    return cos_t, sin_t, offset, even


@partial(jax.jit, static_argnames=("size",))
def _accumulate(edge_plane, size: int):
    """[H, W] u8 edges (H = W = size) -> [size, size] int32 accumulator."""
    cos_t, sin_t, offset, _ = _tables(size)
    h, w = edge_plane.shape
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    yv = (2 * ys - (size - 1))[:, None]                 # [H, 1]
    xv = (2 * xs - (size - 1))[None, :]                 # [1, W]
    on = (edge_plane > 0).astype(jnp.int32)

    acc = jnp.zeros((size, size), jnp.int32)
    # rho = x*cos + y*sin in 16.16 fixed point fits int32 for size <= 2048
    cos_j = jnp.asarray(cos_t.astype(np.int32))
    sin_j = jnp.asarray(sin_t.astype(np.int32))
    for t in range(size):
        rho = xv * cos_j[t] + yv * sin_j[t]             # [H, W] i32
        rr = ((rho >> 1) + (offset << 1)) >> 16
        valid = (rr >= 0) & (rr < size) & (on > 0)
        rr = jnp.clip(rr, 0, size - 1)
        acc = acc.at[rr.reshape(-1), t].add(valid.reshape(-1).astype(jnp.int32))
    return acc


class HoughTransform:
    """Line detection over a size x size region (reference: hough.zig:11)."""

    def __init__(self, size: int = 256):
        if size <= 1:
            raise ValueError("size must be > 1")
        self.size = size
        _, _, _, self.even_size = _tables(size)

    def compute(self, edges) -> np.ndarray:
        """Edge image (Image or [H, W] array, resized to size x size)
        -> accumulator [size, size]."""
        from ..image import Image

        if isinstance(edges, Image):
            plane = edges._gray_u8_plane()
        else:
            plane = jnp.asarray(np.asarray(edges))
            if plane.ndim == 3:
                plane = plane[..., 0]
        if plane.shape != (self.size, self.size):
            from ..enums import Interpolation
            from .interpolation import resize

            plane = resize(plane[..., None], self.size, self.size,
                           Interpolation.NEAREST)[..., 0]
        return np.asarray(_accumulate(plane, self.size))

    def find_lines(self, accumulator: np.ndarray, threshold: int = 100,
                   angle_nms_thresh: float = 5.0,
                   radius_nms_thresh: float = 10.0) -> list:
        """Local-max peaks + neighborhood suppression
        (reference: hough.zig findLines:142)."""
        acc = np.asarray(accumulator)
        n = self.size
        interior = acc[1:-1, 1:-1]
        win_max = np.stack([
            acc[1 + dr:n - 1 + dr, 1 + dc:n - 1 + dc]
            for dr in (-1, 0, 1) for dc in (-1, 0, 1)
            if (dr, dc) != (0, 0)
        ]).max(axis=0)
        peaks = np.nonzero((interior >= threshold) & (interior >= win_max))
        cands = sorted(
            ((int(interior[r, c]), r + 1, c + 1) for r, c in zip(*peaks)),
            reverse=True,
        )
        lines = []
        for score, r, c in cands:
            angle, radius = self._line_properties(float(c), float(r))
            dup = any(
                abs(angle - ln.angle) < angle_nms_thresh
                and abs(radius - ln.radius) < radius_nms_thresh
                for ln in lines
            )
            if dup:
                continue
            lines.append(self._make_line(angle, radius, score))
        return lines

    def _line_properties(self, c: float, r: float):
        theta = c * 180.0 / self.even_size
        radius = (r - self.even_size / 2.0) * math.sqrt(2.0)
        return theta - 90.0, radius

    def _make_line(self, angle: float, radius: float, score: int) -> HoughLine:
        n = float(self.size)
        cx = cy = n / 2.0
        theta = math.radians(angle + 90.0)
        ct, st = math.cos(theta), math.sin(theta)
        x0 = cx + radius * ct
        y0 = cy + radius * st
        # direction along the line
        dx, dy = -st, ct
        pts = []
        for t in (-2 * n, 2 * n):
            pts.append((x0 + t * dx, y0 + t * dy))
        clipped = [(min(max(p[0], 0.0), n - 1), min(max(p[1], 0.0), n - 1))
                   for p in pts]
        return HoughLine(angle, radius, score, clipped[0], clipped[1])
