"""Integral image (summed-area table), box blur, sharpen
(reference: src/image/integral.zig).

The SAT is two f32 cumsums — exactly the reference's row-then-column
accumulation. Box blur reads 4 SAT corners per pixel with window edges
clamped to the image (integral.zig:200-270); sharpen is
``2*original - blurred`` (integral.zig:273+).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["integral_image", "box_blur", "sharpen"]


def integral_image(arr):
    """SAT of [H, W, C] -> f32 [H, W, C]; sat[r,c] = sum over [0..r, 0..c]."""
    a = arr.astype(jnp.float32)
    return jnp.cumsum(jnp.cumsum(a, axis=0), axis=1)


def _window_bounds(n: int, radius: int):
    i = np.arange(n, dtype=np.int64)
    lo = np.maximum(i - radius, 0)
    hi = np.minimum(i + radius, n - 1)
    return lo.astype(np.int32), hi.astype(np.int32)


def _box_sums(sat, radius: int):
    """Window sums + per-pixel window areas from a padded SAT."""
    h, w = sat.shape[0], sat.shape[1]
    r1, r2 = _window_bounds(h, radius)
    c1, c2 = _window_bounds(w, radius)
    padded = jnp.pad(sat, ((1, 0), (1, 0), (0, 0)))
    a = jnp.take(jnp.take(padded, r2 + 1, axis=0), c2 + 1, axis=1)
    b = jnp.take(jnp.take(padded, r1, axis=0), c2 + 1, axis=1)
    c = jnp.take(jnp.take(padded, r2 + 1, axis=0), c1, axis=1)
    d = jnp.take(jnp.take(padded, r1, axis=0), c1, axis=1)
    sums = a - b - c + d
    area = (
        (r2 - r1 + 1).astype(np.float32)[:, None]
        * (c2 - c1 + 1).astype(np.float32)[None, :]
    )
    return sums, jnp.asarray(area)[..., None]


def _clamped_band(n: int, radius: int) -> np.ndarray:
    """[n, n] 0/1 matrix: row i sums src max(i-r,0)..min(i+r,n-1)."""
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return (np.abs(i - j) <= radius).astype(np.int64)


def _box_sums_exact(arr, radius: int):
    """Separable clamped-window sums via exact banded MXU contractions
    (ops/mxu_resample.exact_axis_apply). Returns EXACT integer window
    sums — tighter than any f32 SAT: the reference's own f32
    accumulation (integral.zig:41-80) rounds once SAT entries pass
    2^24, and its sequential add order cannot be replicated by a
    parallel cumsum anyway, so the true sum is the faithful target.
    ~4x faster than the SAT path on TPU (no cumsum chain, no 4-corner
    gathers)."""
    from .mxu_resample import exact_axis_apply

    h, w = arr.shape[0], arr.shape[1]
    x = arr.astype(jnp.float32)
    rows, bound = exact_axis_apply(x, _clamped_band(h, radius), 255, 0)
    sums, _ = exact_axis_apply(rows.astype(jnp.float32),
                               _clamped_band(w, radius), bound, 1)
    r1, r2 = _window_bounds(h, radius)
    c1, c2 = _window_bounds(w, radius)
    area = (
        (r2 - r1 + 1).astype(np.float32)[:, None]
        * (c2 - c1 + 1).astype(np.float32)[None, :]
    )
    # keep the exact dtype: for radius >= 128 the sum bound 255*(2r+1)^2
    # passes 2^24 and a cast to f32 would round, breaking the contract
    # above — consumers split int32 sums into (quotient, remainder) instead
    return sums, jnp.asarray(area)[..., None]


def _mean_parts(sums, area):
    """Window mean decomposed as (q, frac): q = sums // area exact, frac =
    remainder/area in [0, 1). For f32 sums (bound < 2^24) q is the float
    mean with frac = 0. Keeps large-radius paths exact where a raw
    int32->f32 cast of the sums would round."""
    if sums.dtype == jnp.int32:
        a = area.astype(jnp.int32)
        q = sums // a
        rem = sums - q * a
        return q.astype(jnp.float32), rem.astype(jnp.float32) / area
    return sums / area, None


def _mean_round_u8(sums, area):
    """floor(mean + 0.5) as u8, exact for both sum dtypes."""
    if sums.dtype == jnp.int32:
        a = area.astype(jnp.int32)
        q = sums // a
        rem = sums - q * a
        return jnp.clip(q + (2 * rem >= a), 0, 255).astype(jnp.uint8)
    vals = sums / area
    return jnp.clip(jnp.floor(vals + 0.5), 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("radius",))
def box_blur(arr, radius: int):
    """Box blur of [H, W, C] via exact banded window sums (u8 inputs)
    or SAT (float); u8 output rounds half away from zero."""
    if radius == 0:
        return arr
    if arr.dtype == jnp.uint8:
        sums, area = _box_sums_exact(arr, radius)
        return _mean_round_u8(sums, area)
    sums, area = _box_sums(integral_image(arr), radius)
    return (sums / area).astype(arr.dtype)


@partial(jax.jit, static_argnames=("radius",))
def sharpen(arr, radius: int):
    """Unsharp mask: 2*original - box_blur (reference: integral.zig sharpen)."""
    if radius == 0:
        return arr
    if arr.dtype == jnp.uint8:
        sums, area = _box_sums_exact(arr, radius)
        if sums.dtype == jnp.int32:
            # floor(2t - s/a + 0.5) = 2t - q - (2*rem > a), all-integer
            a = area.astype(jnp.int32)
            q = sums // a
            rem = sums - q * a
            t2 = 2 * arr.astype(jnp.int32)
            return jnp.clip(t2 - q - (2 * rem > a), 0, 255).astype(jnp.uint8)
        vals = 2.0 * arr.astype(jnp.float32) - sums / area
        return jnp.clip(jnp.floor(vals + 0.5), 0, 255).astype(jnp.uint8)
    sums, area = _box_sums(integral_image(arr), radius)
    vals = 2.0 * arr.astype(jnp.float32) - sums / area
    return vals.astype(arr.dtype)
