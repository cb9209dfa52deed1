"""Edge detectors: Canny and Shen-Castan (reference: src/image/edges.zig,
src/image/ShenCastan.zig).

TPU reformulations of the reference's sequential pieces (SURVEY.md "hard
parts"):

- the ISEF recursive smoothing filter (first-order IIR, forward+backward)
  runs as `lax.associative_scan` over (A, B) pairs of the linear
  recurrence y_i = A*y_{i-1} + B_i — parallel-prefix instead of a serial
  loop;
- BFS hysteresis becomes iterated dilate-and-mask to a fixpoint inside
  `lax.while_loop` (identical connected components).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..enums import BorderMode
from .convolution import gaussian_kernel, convolve_separable, sobel_gradients

__all__ = ["canny", "shen_castan"]

_K = 0.414213562  # tan(22.5 deg)


def _shift(a, dr, dc, fill=0.0):
    """Shifted copy of [H, W]: out[r, c] = a[r+dr, c+dc], `fill` outside."""
    out = a
    if dr > 0:
        out = jnp.concatenate([out[dr:], jnp.full((dr, out.shape[1]), fill, out.dtype)], axis=0)
    elif dr < 0:
        out = jnp.concatenate([jnp.full((-dr, out.shape[1]), fill, out.dtype), out[:dr]], axis=0)
    if dc > 0:
        out = jnp.concatenate([out[:, dc:], jnp.full((out.shape[0], dc), fill, out.dtype)], axis=1)
    elif dc < 0:
        out = jnp.concatenate([jnp.full((out.shape[0], -dc), fill, out.dtype), out[:, :dc]], axis=1)
    return out


def _quantized_nms(gx, gy, magnitude):
    """Directional non-max suppression (edges.zig:692-763); border stays 0."""
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    horiz = ay <= _K * ax
    vert = ax <= _K * ay
    diag45 = (~horiz) & (~vert) & (gx * gy > 0)

    m = magnitude
    neighbors = {
        (0, -1): _shift(m, 0, -1), (0, 1): _shift(m, 0, 1),
        (-1, 0): _shift(m, -1, 0), (1, 0): _shift(m, 1, 0),
        (-1, 1): _shift(m, -1, 1), (1, -1): _shift(m, 1, -1),
        (-1, -1): _shift(m, -1, -1), (1, 1): _shift(m, 1, 1),
    }
    n1 = jnp.where(horiz, neighbors[(0, -1)],
                   jnp.where(vert, neighbors[(-1, 0)],
                             jnp.where(diag45, neighbors[(-1, 1)], neighbors[(-1, -1)])))
    n2 = jnp.where(horiz, neighbors[(0, 1)],
                   jnp.where(vert, neighbors[(1, 0)],
                             jnp.where(diag45, neighbors[(1, -1)], neighbors[(1, 1)])))
    keep = (m >= n1) & (m >= n2)
    h, w = m.shape
    interior = jnp.zeros((h, w), bool).at[1:h - 1, 1:w - 1].set(True)
    return keep & interior


def _dilate8(mask):
    """3x3 neighborhood OR, separable: rows then columns (4 shifts
    instead of 8 — the box OR factors exactly)."""
    h = mask | _shift(mask, 0, -1, fill=False) | _shift(mask, 0, 1,
                                                        fill=False)
    return h | _shift(h, -1, 0, fill=False) | _shift(h, 1, 0, fill=False)


def _hysteresis(candidate, gradients, t_low, t_high):
    """Grow strong edges (grad >= high) through weak ones (grad >= low),
    8-connected, to a fixpoint (edges.zig:499-580). Each while_loop
    iteration takes FOUR masked growth steps — growth is monotone, so
    the fixpoint is unchanged and the convergence reduce runs 4x less
    often."""
    weak = candidate & (gradients >= t_low)
    strong = candidate & (gradients >= t_high)

    def cond(state):
        prev, cur = state
        return jnp.any(prev != cur)

    def body(state):
        _, cur = state
        grown = cur
        for _ in range(4):
            grown = (weak & _dilate8(grown)) | grown
        return cur, grown

    first = (weak & _dilate8(strong)) | strong
    _, final = jax.lax.while_loop(cond, body, (strong, first))
    return final


@partial(jax.jit, static_argnames=("sigma", "low", "high"))
def canny(gray_f32, sigma: float = 1.4, low: float = 50.0, high: float = 150.0):
    """Canny edges of a [H, W] 0-255 float plane -> u8 0/255
    (reference: edges.zig:212-275)."""
    x = gray_f32
    if sigma > 0:
        k = gaussian_kernel(sigma)
        x = convolve_separable(x[..., None], k, k, BorderMode.MIRROR)[..., 0]
    gx, gy = sobel_gradients(x, BorderMode.REPLICATE)
    magnitude = jnp.sqrt(gx * gx + gy * gy)
    nms = _quantized_nms(gx, gy, magnitude)
    final = _hysteresis(nms, magnitude, low, high)
    return jnp.where(final, 255, 0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Shen-Castan
# ---------------------------------------------------------------------------


def _isef_scan_axis(x, b, axis):
    """Forward+backward first-order IIR along `axis` via associative scan
    (edges.zig isefFilter1D:281-303)."""
    a = 1.0 - b

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a2 * a1, a2 * b1 + b2

    def linear_scan(vals, first_override=None, coeff=a):
        # y_i = coeff * y_{i-1} + b * vals_i, with y_0 optionally overridden
        bs = b * vals
        if first_override is not None:
            first = jax.lax.slice_in_dim(first_override, 0, 1, axis=axis)
            rest = jax.lax.slice_in_dim(bs, 1, bs.shape[axis], axis=axis)
            bs = jnp.concatenate([first, rest], axis=axis)
        avals = jnp.full_like(bs, coeff)
        zeros = jnp.zeros_like(jax.lax.slice_in_dim(avals, 0, 1, axis=axis))
        avals = jnp.concatenate(
            [zeros, jax.lax.slice_in_dim(avals, 1, avals.shape[axis], axis=axis)],
            axis=axis,
        )
        _, ys = jax.lax.associative_scan(combine, (avals, bs), axis=axis)
        return ys

    temp = linear_scan(x)  # forward: temp[0] = b*x[0]
    trev = jnp.flip(temp, axis=axis)
    # backward: out_rev[0] = t_rev[0]; out_rev[i] = b*t_rev[i] + a*out_rev[i-1]
    out_rev = linear_scan(trev, first_override=trev)
    return jnp.flip(out_rev, axis=axis)


def isef_filter(x, b):
    """2-D ISEF: rows then columns (edges.zig isefFilter2D:306-355)."""
    return _isef_scan_axis(_isef_scan_axis(x, b, axis=1), b, axis=0)


def _box_sum_plane(plane, radius):
    from .integral import _box_sums

    sums, area = _box_sums(
        jnp.cumsum(jnp.cumsum(plane[..., None], axis=0), axis=1), radius
    )
    return sums[..., 0], area[..., 0]


@partial(jax.jit, static_argnames=("smooth", "window_size", "high_ratio",
                                   "low_rel", "hysteresis", "use_nms"))
def shen_castan(gray_f32, smooth: float = 0.9, window_size: int = 7,
                high_ratio: float = 0.99, low_rel: float = 0.5,
                hysteresis: bool = True, use_nms: bool = False):
    """Shen-Castan ISEF edge detector of a [H, W] 0-255 float plane
    (reference: edges.zig shenCastan:84-210)."""
    h, w = gray_f32.shape
    smoothed = isef_filter(gray_f32, smooth)
    laplacian = smoothed - gray_f32
    bli = (laplacian >= 0).astype(jnp.float32)

    if use_nms:
        # 4-neighbor transitions, interior only
        center = bli
        diff = (
            (center != _shift(bli, 0, -1)) | (center != _shift(bli, 0, 1))
            | (center != _shift(bli, -1, 0)) | (center != _shift(bli, 1, 0))
        )
        interior = jnp.zeros((h, w), bool).at[1:h - 1, 1:w - 1].set(True)
        edges = diff & interior
    else:
        # forward-neighbor thinning: east/south/south-east/south-west
        in_e = jnp.zeros((h, w), bool).at[:, : w - 1].set(True)
        in_s = jnp.zeros((h, w), bool).at[: h - 1, :].set(True)
        in_sw = in_s & jnp.zeros((h, w), bool).at[:, 1:].set(True)
        edges = (
            ((bli != _shift(bli, 0, 1)) & in_e)
            | ((bli != _shift(bli, 1, 0)) & in_s)
            | ((bli != _shift(bli, 1, 1)) & in_e & in_s)
            | ((bli != _shift(bli, 1, -1)) & in_sw)
        )

    # adaptive gradients: |mean(gray where bli=1) - mean(gray where bli=0)|
    radius = window_size // 2
    count1, area = _box_sum_plane(bli, radius)
    sum1, _ = _box_sum_plane(gray_f32 * bli, radius)
    sum_total, _ = _box_sum_plane(gray_f32, radius)
    count0 = area - count1
    sum0 = sum_total - sum1
    both = (count0 > 0) & (count1 > 0)
    mean0 = sum0 / jnp.where(count0 == 0, 1.0, count0)
    mean1 = sum1 / jnp.where(count1 == 0, 1.0, count1)
    gradients = jnp.where(edges & both, jnp.abs(mean1 - mean0), 0.0)

    # percentile threshold over gradient histogram at edge pixels
    bins = jnp.floor(jnp.clip(gradients, 0, 255) + 0.5).astype(jnp.int32)
    from .binary import histogram256

    hist = histogram256(bins, weights=edges.astype(jnp.int32))
    total = jnp.sum(hist)
    target = jnp.floor(total.astype(jnp.float32) * high_ratio)
    cum = jnp.cumsum(hist).astype(jnp.float32)
    reached = cum >= target
    k = jnp.where(jnp.any(reached), jnp.argmax(reached), 255)
    t_high = jnp.minimum(k + 1, 255).astype(jnp.float32)
    t_high = jnp.where(target <= 0, 0.0, t_high)
    t_low = low_rel * t_high

    if use_nms:
        gx = 0.5 * (_shift(smoothed, 0, 1) - _shift(smoothed, 0, -1))
        gy = 0.5 * (_shift(smoothed, 1, 0) - _shift(smoothed, -1, 0))
        keep = _quantized_nms_on(gx, gy, gradients)
        edges = edges & keep

    empty = total == 0
    if not hysteresis:
        out = edges & (gradients >= t_high)
    else:
        out = _hysteresis(edges, gradients, t_low, t_high)
    out = out & ~empty
    return jnp.where(out, 255, 0).astype(jnp.uint8)


def _quantized_nms_on(gx, gy, gradients):
    """NMS keep-mask comparing `gradients` along quantized direction of
    (gx, gy) — interior only (edges.zig nonMaxSuppressEdges:582-662)."""
    return _quantized_nms(gx, gy, gradients)
