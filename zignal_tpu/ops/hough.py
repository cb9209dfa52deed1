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


def _hist_n(values, valid, n_bins: int):
    """Weighted histogram of int values in [0, n_bins) as factored
    one-hot matmuls on the MXU (values = hi*256 + lo; the joint count is
    einsum of the two one-hot factors — exact {0,1} bf16, counts < 2^24).
    Scatter-adds are ~100x slower on TPU."""
    f = values.reshape(-1)
    v = valid.reshape(-1).astype(jnp.bfloat16)
    lo_bins = jnp.arange(256, dtype=jnp.int32)
    n_hi = (n_bins + 255) // 256
    if n_hi == 1:
        oh = (f[:, None] == lo_bins).astype(jnp.bfloat16)
        counts = jnp.einsum("nl,n->l", oh, v,
                            preferred_element_type=jnp.float32)
        return counts.astype(jnp.int32)[:n_bins]
    hi_bins = jnp.arange(n_hi, dtype=jnp.int32)
    oh_hi = ((f[:, None] >> 8) == hi_bins).astype(jnp.bfloat16) * v[:, None]
    oh_lo = ((f[:, None] & 255) == lo_bins).astype(jnp.bfloat16)
    joint = jnp.einsum("nh,nl->hl", oh_hi, oh_lo,
                       preferred_element_type=jnp.float32)
    return joint.reshape(-1).astype(jnp.int32)[:n_bins]


@partial(jax.jit, static_argnames=("size",))
def _accumulate(edge_plane, size: int):
    """[H, W] u8 edges (H = W = size) -> [size, size] int32 accumulator.

    One theta per lax.scan step; each step's rho votes are a weighted
    histogram lowered onto the MXU (_hist_n)."""
    cos_t, sin_t, offset, _ = _tables(size)
    h, w = edge_plane.shape
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    yv = (2 * ys - (size - 1))[:, None]                 # [H, 1]
    xv = (2 * xs - (size - 1))[None, :]                 # [1, W]
    on = edge_plane > 0

    # rho = x*cos + y*sin in 16.16 fixed point fits int32 for size <= 2048
    cos_j = jnp.asarray(cos_t.astype(np.int32))
    sin_j = jnp.asarray(sin_t.astype(np.int32))

    def body(_, ct_st):
        ct, st = ct_st
        rho = xv * ct + yv * st                          # [H, W] i32
        rr = ((rho >> 1) + (offset << 1)) >> 16
        valid = (rr >= 0) & (rr < size) & on
        rr = jnp.clip(rr, 0, size - 1)
        return None, _hist_n(rr, valid, size)

    _, cols = jax.lax.scan(body, None, (cos_j, sin_j))   # [theta, rho]
    return cols.T.astype(jnp.int32)                      # [rho, theta]


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
        pr, pc = np.nonzero((interior >= threshold) & (interior >= win_max))
        if len(pr) == 0:
            return []
        scores = interior[pr, pc].astype(np.int64)
        rr = pr + 1
        cc = pc + 1
        # same ordering as sorting (score, r, c) tuples descending
        order = np.lexsort((-cc, -rr, -scores))
        scores, rr, cc = scores[order], rr[order], cc[order]
        angles = cc * (180.0 / self.even_size) - 90.0
        radii = (rr - self.even_size / 2.0) * math.sqrt(2.0)
        lines = []
        acc_a = np.empty(len(scores))
        acc_r = np.empty(len(scores))
        for i in range(len(scores)):
            n_acc = len(lines)
            if n_acc and np.any(
                    (np.abs(angles[i] - acc_a[:n_acc]) < angle_nms_thresh)
                    & (np.abs(radii[i] - acc_r[:n_acc]) < radius_nms_thresh)):
                continue
            acc_a[n_acc] = angles[i]
            acc_r[n_acc] = radii[i]
            lines.append(self._make_line(float(angles[i]), float(radii[i]),
                                         int(scores[i])))
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
