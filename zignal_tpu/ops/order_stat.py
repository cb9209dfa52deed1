"""Order-statistic blurs: median / percentile / min / max / midpoint /
alpha-trimmed mean (reference: src/image/order_statistic_blur.zig).

The reference slides a per-column histogram (inherently sequential); the
TPU formulation gathers each (2r+1)^2 window into a lane axis and sorts
it (SURVEY.md "hard parts": sorting networks for small windows). Rank
selection over the sorted window is bit-identical to the reference's
histogram rank walk. min/max skip the sort via separable pools.

Border rule: every tap contributes a value; out-of-bounds taps under
ZERO contribute 0 (order_statistic_blur.zig getPixel:338).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import BorderMode
from .interpolation import resolve_index_np

__all__ = ["percentile_blur", "median_blur", "min_blur", "max_blur",
           "midpoint_blur", "alpha_trimmed_mean_blur"]


_PAD_MODE = {
    BorderMode.ZERO: "constant",       # OOB contributes value 0, as masked
    BorderMode.REPLICATE: "edge",
    BorderMode.MIRROR: "reflect",      # reflect-without-edge = resolveIndex
    BorderMode.WRAP: "wrap",
}


def _window_stack(arr, radius: int, border: BorderMode):
    """[H, W, C] -> [H, W, C, k*k] window samples (0 for OOB under ZERO).

    Pad + k*k static stride-1 slices (cheap on TPU; gathers are ~25x off
    the roofline). Falls back to resolved-index gathers when the window
    exceeds the image (pad modes need pad < axis length)."""
    h, w = arr.shape[0], arr.shape[1]
    k = 2 * radius + 1
    if 0 < radius < min(h, w):
        padded = jnp.pad(arr, ((radius, radius), (radius, radius), (0, 0)),
                         mode=_PAD_MODE[border])
        parts = [
            jax.lax.slice(padded, (i, j, 0),
                          (i + h, j + w, arr.shape[2]))
            for i in range(k) for j in range(k)
        ]
        return jnp.stack(parts, axis=-1)
    offs = np.arange(k) - radius
    ys = resolve_index_np(np.arange(h)[:, None] + offs[None, :], h, border)
    xs = resolve_index_np(np.arange(w)[:, None] + offs[None, :], w, border)
    parts = []
    for i in range(k):
        yi = np.where(ys[:, i] >= 0, ys[:, i], 0).astype(np.int32)
        yv = jnp.asarray((ys[:, i] >= 0).astype(np.uint8))
        rows = jnp.take(arr, yi, axis=0) * yv[:, None, None]
        for j in range(k):
            xi = np.where(xs[:, j] >= 0, xs[:, j], 0).astype(np.int32)
            xv = jnp.asarray((xs[:, j] >= 0).astype(np.uint8))
            parts.append(jnp.take(rows, xi, axis=1) * xv[None, :, None])
    return jnp.stack(parts, axis=-1)


def _rank_of(percentile: float, total: int) -> int:
    """reference: histogram.zig percentile():586-610."""
    rank_f = percentile * float(total - 1)
    rank = int(np.trunc(np.floor(rank_f + 1e-12)))
    return min(max(rank, 0), total - 1)


def _batcher_pairs(n: int):
    """Compare-exchange pairs of Batcher's odd-even mergesort for n a
    power of two (191 CEs for n=32 vs 300 for a 25-wide transposition
    network)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def _sorted_window(arr, radius: int, border: BorderMode):
    """Sorted window samples as a LIST of [H, W, C] arrays.

    For windows up to 7x7 a sorting network of fused jnp.minimum/maximum
    chains sorts in place — XLA fuses the whole network into one
    elementwise kernel and dead-code-eliminates comparisons that don't
    feed the ranks a caller consumes; far cheaper than jnp.sort over a
    materialized [..., k*k] axis. u8 inputs use Batcher's odd-even
    mergesort padded to a power of two with 255 sentinels (every
    sentinel CE constant-folds; sentinels sort above or tie with every
    real value, so positions 0..k*k-1 are value-identical to the
    unpadded sort); other dtypes keep the transposition network."""
    k2 = (2 * radius + 1) ** 2
    if k2 <= 49:
        padded = None
        if 0 < radius < min(arr.shape[0], arr.shape[1]):
            padded = jnp.pad(
                arr, ((radius, radius), (radius, radius), (0, 0)),
                mode=_PAD_MODE[border])
        if padded is not None:
            h, w, c = arr.shape
            k = 2 * radius + 1
            parts = [jax.lax.slice(padded, (i, j, 0), (i + h, j + w, c))
                     for i in range(k) for j in range(k)]
        else:
            win = _window_stack(arr, radius, border)
            parts = [win[..., t] for t in range(k2)]
        if arr.dtype == jnp.uint8 and k2 > 2:
            n = 1 << (k2 - 1).bit_length()
            sent = jnp.full_like(parts[0], 255)
            parts = parts + [sent] * (n - k2)
            for a, b in _batcher_pairs(n):
                lo = jnp.minimum(parts[a], parts[b])
                hi = jnp.maximum(parts[a], parts[b])
                parts[a], parts[b] = lo, hi
            return parts[:k2]
        for rnd in range(k2):
            for i in range(rnd % 2, k2 - 1, 2):
                lo = jnp.minimum(parts[i], parts[i + 1])
                hi = jnp.maximum(parts[i], parts[i + 1])
                parts[i], parts[i + 1] = lo, hi
        return parts
    win = _window_stack(arr, radius, border)
    sorted_win = jnp.sort(win, axis=-1)
    return [sorted_win[..., t] for t in range(k2)]


@partial(jax.jit, static_argnames=("radius", "percentile", "border"))
def percentile_blur(arr, radius: int, percentile: float,
                    border: BorderMode = BorderMode.MIRROR):
    k = 2 * radius + 1
    total = k * k
    rank = _rank_of(percentile, total)
    return _sorted_window(arr, radius, BorderMode(border))[rank]


def median_blur(arr, radius: int):
    return percentile_blur(arr, radius, 0.5, BorderMode.MIRROR)


def _sep_pool(arr, radius: int, border: BorderMode, is_max: bool):
    """Separable window min/max with the same border-resolved taps."""
    h, w = arr.shape[0], arr.shape[1]
    k = 2 * radius + 1
    offs = np.arange(k) - radius

    def pool_axis(a, n, axis):
        idx = resolve_index_np(np.arange(n)[:, None] + offs[None, :], n, border)
        acc = None
        for i in range(k):
            ii = np.where(idx[:, i] >= 0, idx[:, i], 0).astype(np.int32)
            valid = jnp.asarray((idx[:, i] >= 0).astype(np.uint8))
            shape = [1] * a.ndim
            shape[axis] = -1
            part = jnp.take(a, ii, axis=axis) * valid.reshape(shape)
            if acc is None:
                acc = part
            elif is_max:
                acc = jnp.maximum(acc, part)
            else:
                acc = jnp.minimum(acc, part)
        return acc

    return pool_axis(pool_axis(arr, h, 0), w, 1)


@partial(jax.jit, static_argnames=("radius", "border"))
def min_blur(arr, radius: int, border: BorderMode = BorderMode.MIRROR):
    return _sep_pool(arr, radius, BorderMode(border), is_max=False)


@partial(jax.jit, static_argnames=("radius", "border"))
def max_blur(arr, radius: int, border: BorderMode = BorderMode.MIRROR):
    return _sep_pool(arr, radius, BorderMode(border), is_max=True)


@partial(jax.jit, static_argnames=("radius", "border"))
def midpoint_blur(arr, radius: int, border: BorderMode = BorderMode.MIRROR):
    """(window_min + window_max + 1) / 2 (MidpointReducer:357-364)."""
    border = BorderMode(border)
    lo = _sep_pool(arr, radius, border, is_max=False).astype(jnp.int32)
    hi = _sep_pool(arr, radius, border, is_max=True).astype(jnp.int32)
    return ((lo + hi + 1) // 2).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("radius", "trim_fraction", "border"))
def alpha_trimmed_mean_blur(arr, radius: int, trim_fraction: float,
                            border: BorderMode = BorderMode.MIRROR):
    """Mean of the window after trimming `trim_each` samples per side
    (AlphaTrimmedMeanReducer:366-410), symmetric integer rounding."""
    k = 2 * radius + 1
    total = k * k
    trim_each = min(int(np.trunc(np.floor(trim_fraction * total))), total // 2)
    parts = _sorted_window(arr, radius, BorderMode(border))
    kept = parts[trim_each:total - trim_each]
    # exact f32 integer sum (<= 49*255 + bias < 2^24); floor-div by the
    # count is safe: quotient <= 255.5 and the 1/count margin dwarfs ulp
    kept_sum = None
    for p in kept:
        pf = p.astype(jnp.float32)
        kept_sum = pf if kept_sum is None else kept_sum + pf
    kept_count = len(kept)
    rounded = jnp.floor((kept_sum + kept_count // 2) * (1.0 / kept_count))
    return jnp.minimum(rounded, 255).astype(jnp.uint8)
