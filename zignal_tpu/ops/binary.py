"""Binary thresholding and morphology (reference: src/image/binary.zig).

Otsu's threshold search is vectorized over all 256 candidate thresholds;
morphology with the square all-ones structuring element is two separable
min/max passes (zero padding = background, matching the reference's OOB
rules: dilate ignores OOB, erode treats OOB as background).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["histogram256", "otsu_threshold", "threshold_apply",
           "adaptive_mean_threshold", "dilate", "erode", "open_morph",
           "close_morph"]


def histogram256(plane, weights=None):
    """256-bin histogram of a u8/int plane (any shape); `weights` (same
    shape, values in {0,1} or small ints) turns it into a masked count.

    Lowered as a one-hot bf16 matmul on the MXU — ~100x faster than an
    XLA scatter-add on TPU (measured 0.09 ms vs 9.0 ms for 1024^2).
    Counts are exact: one-hot {0,1} and 128-wide f32 accumulation stay
    integral; the cross-row reduction runs in int32."""
    f = plane.reshape(-1)
    pad = (-f.size) % 128
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
    rows = f.reshape(-1, 128).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    onehot = (rows[:, :, None] == bins).astype(jnp.bfloat16)
    if weights is None:
        vec = jnp.ones((128,), jnp.bfloat16)
        part = jnp.einsum("rkb,k->rb", onehot, vec,
                          preferred_element_type=jnp.float32)
    else:
        wf = weights.reshape(-1)
        if pad:
            wf = jnp.concatenate([wf, jnp.zeros((pad,), wf.dtype)])
        wrows = wf.reshape(-1, 128).astype(jnp.bfloat16)
        part = jnp.einsum("rkb,rk->rb", onehot, wrows,
                          preferred_element_type=jnp.float32)
    hist = part.astype(jnp.int32).sum(axis=0)
    if pad and weights is None:
        hist = hist.at[0].add(-pad)
    return hist


def lut_apply_u8(plane, lut):
    """``lut[plane]`` for a u8/int plane and a [256] or [256, C] u8 LUT
    (the LUT may be a traced device array, e.g. equalize's CDF table).

    Lowered as a telescoping staircase sum: ``lut[x] = lut[0] +
    sum_v (lut[v] - lut[v-1]) * (x >= v)`` — 255 fused compare+FMA VPU
    ops per pixel. Exact: every partial sum equals lut[min(x, v)], an
    integer in [0, 255], so f32 arithmetic is lossless. Per-pixel
    gathers and the one-hot formulation are both far slower on TPU: a
    gather pays ~3 ns/row, and one-hot-times-table is a mat-VEC, which
    cannot use the MXU (measured ~2.6 ms/MPix vs ~0.2 ms for this)."""
    lutf = lut.astype(jnp.float32)
    steps = lutf[1:] - lutf[:-1]
    xi = plane.astype(jnp.int32)
    if lut.ndim == 1:
        acc = jnp.zeros(plane.shape, jnp.float32) + lutf[0]
        for v in range(1, 256):
            acc = acc + steps[v - 1] * (xi >= v)
        return acc.astype(jnp.uint8)
    acc = jnp.zeros((*plane.shape, lut.shape[1]), jnp.float32) + lutf[0]
    ge = xi[..., None]
    for v in range(1, 256):
        acc = acc + steps[v - 1] * (ge >= v)
    return acc.astype(jnp.uint8)


def otsu_threshold(plane):
    """Otsu between-class-variance maximization (binary.zig:38-85).
    plane: u8 [H, W]. Returns the threshold as a Python int.

    The histogram reduction runs on device (exact int32 counts); the
    256-element variance sweep runs on host in float64, matching the
    reference's f64 math exactly — with x64 disabled, device f32
    cumulative moments lose integer precision past 2^24 and can flip
    the argmax between near-tie thresholds (ADVICE r1)."""
    import numpy as np

    hist = np.asarray(histogram256(jnp.asarray(plane)), dtype=np.float64)
    total = hist.sum()
    intensities = np.arange(256, dtype=np.float64)
    sum_total = (hist * intensities).sum()
    wb = hist.cumsum()
    sb = (hist * intensities).cumsum()
    wf = total - wb
    valid = (wb > 0) & (wf > 0)
    mean_b = sb / np.where(wb == 0, 1, wb)
    mean_f = (sum_total - sb) / np.where(wf == 0, 1, wf)
    variance = wb * wf * (mean_b - mean_f) ** 2
    variance = np.where(valid, variance, -1.0)
    return int(np.argmax(variance))


def threshold_apply(plane, threshold):
    return jnp.where(plane > threshold, 255, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("radius",))
def adaptive_mean_threshold(plane, radius: int, c: float):
    """out = src > window_mean - c (binary.zig:86-118). plane: u8 [H,W]."""
    from .integral import _box_sums, integral_image

    sums, area = _box_sums(integral_image(plane[..., None]), radius)
    mean = sums[..., 0] / area[..., 0]
    return jnp.where(plane.astype(jnp.float32) > mean - c, 255, 0).astype(jnp.uint8)


def _binarize(plane):
    return (plane != 0)


def _pool_pass(mask, ksize: int, is_max: bool, axis: int):
    """Separable window max/min with zero (background) padding."""
    half = ksize // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (half, half)
    padded = jnp.pad(mask, pad, constant_values=False)
    n = mask.shape[axis]
    acc = None
    for k in range(ksize):
        sl = jax.lax.slice_in_dim(padded, k, k + n, axis=axis)
        if acc is None:
            acc = sl
        elif is_max:
            acc = acc | sl
        else:
            acc = acc & sl
    return acc


@partial(jax.jit, static_argnames=("ksize", "iterations"))
def dilate(plane, ksize: int = 3, iterations: int = 1):
    m = _binarize(plane)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, True, 0), ksize, True, 1)
    return jnp.where(m, 255, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("ksize", "iterations"))
def erode(plane, ksize: int = 3, iterations: int = 1):
    m = _binarize(plane)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, False, 0), ksize, False, 1)
    return jnp.where(m, 255, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("ksize", "iterations"))
def open_morph(plane, ksize: int = 3, iterations: int = 1):
    m = _binarize(plane)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, False, 0), ksize, False, 1)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, True, 0), ksize, True, 1)
    return jnp.where(m, 255, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("ksize", "iterations"))
def close_morph(plane, ksize: int = 3, iterations: int = 1):
    m = _binarize(plane)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, True, 0), ksize, True, 1)
    for _ in range(iterations):
        m = _pool_pass(_pool_pass(m, ksize, False, 0), ksize, False, 1)
    return jnp.where(m, 255, 0).astype(jnp.uint8)
