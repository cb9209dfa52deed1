"""Convolution kernels (reference: src/image/convolution.zig).

u8 path replicates the reference's 8.8 fixed-point arithmetic: 1-D kernel
weights are ``round(k * 256)`` int32; the horizontal pass accumulates into
int32 "temp" planes, the vertical pass accumulates temp*weight and divides
by 256² with symmetric rounding (divClampU8, convolution.zig:18-38).
Accumulators stay within int32 for any kernel with
``sum|kx| * sum|ky| * 255 < 2^31`` — true for all normalized kernels.

Tap indices are resolved at trace time (static shapes/border), so the
device program is unrolled gathers + integer MACs that XLA fuses into one
VPU kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import BorderMode
from .interpolation import resolve_index_np

__all__ = [
    "convolve_separable", "convolve2d", "gaussian_kernel", "gaussian_blur",
    "sobel_magnitude",
]

_SCALE = 256


def _kernel_to_int(kernel) -> np.ndarray:
    k = np.asarray(kernel, dtype=np.float32)
    return np.round(k * np.float32(_SCALE)).astype(np.int32)


def _div_clamp_u8(accum, scale: int):
    """Symmetric-rounding divide + clamp (reference: convolution.zig:18-23).

    Works for int32 accumulators and for f32 accumulators holding exact
    integer values (|accum| + scale/2 < 2^24): / by a power of two and
    trunc are exact in f32, so both dtypes produce identical u8.
    """
    half = scale // 2
    rounded = jnp.where(accum >= 0, accum + half, accum - half)
    if jnp.issubdtype(accum.dtype, jnp.floating):
        q = jnp.trunc(jnp.abs(rounded) * (1.0 / scale))
    else:
        q = jnp.abs(rounded) // scale
    q = jnp.where(rounded < 0, -q, q)
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


def _axis_taps(n: int, ksize: int, border: BorderMode):
    """[n, ksize] resolved tap indices + validity mask (for ZERO border)."""
    half = ksize // 2
    base = np.arange(n, dtype=np.int64)[:, None] + np.arange(ksize)[None, :] - half
    idx = resolve_index_np(base, n, border)
    mask = idx >= 0
    return np.where(mask, idx, 0).astype(np.int32), mask


_PAD_MODE = {
    BorderMode.ZERO: "constant",
    BorderMode.REPLICATE: "edge",
    BorderMode.MIRROR: "reflect",   # reflect-without-edge = resolveIndex mirror
    BorderMode.WRAP: "wrap",
}


def _sep_pass(arr, n: int, ksize: int, border: BorderMode, weights, axis):
    """One separable pass: pad + static shifted slices (cheap on TPU —
    gathers would serialize; slices fuse) accumulated with the weights."""
    half = ksize // 2
    if 0 < half < n:  # pad modes need pad width < axis length
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (half, half)
        padded = jnp.pad(arr, pad, mode=_PAD_MODE[border])
        total = None
        for k in range(ksize):
            w = weights[k]
            if float(w) == 0.0:
                continue
            part = jax.lax.slice_in_dim(padded, k, k + n, axis=axis)
            term = part * w
            total = term if total is None else total + term
        return total
    # tiny-axis mirror fallback: explicit resolved-index gathers
    taps, mask = _axis_taps(n, ksize, border)
    total = None
    for k in range(ksize):
        part = jnp.take(arr, taps[:, k], axis=axis)
        term = part * weights[k]
        total = term if total is None else total + term
    return total


@partial(jax.jit, static_argnames=("kernel_x", "kernel_y", "border"))
def convolve_separable(arr, kernel_x: tuple, kernel_y: tuple,
                       border: BorderMode = BorderMode.MIRROR):
    """Separable convolution of [H, W, C]; kernels are 1-D float tuples.

    uint8 input -> bit-exact fixed-point path; float input -> float path.
    """
    border = BorderMode(border)
    h, w = arr.shape[-3], arr.shape[-2]
    ax_w = arr.ndim - 2
    ax_h = arr.ndim - 3

    if arr.dtype == jnp.uint8:
        kx = _kernel_to_int(kernel_x)
        ky = _kernel_to_int(kernel_y)
        # Preferred lowering: each separable pass is a banded matmul with
        # borders folded into the matrix — exact base-256 digit arithmetic
        # on the MXU (see ops/mxu_resample.py).
        from .mxu_resample import build_tap_matrix, exact_axis_apply, mxu_ok

        if mxu_ok(w, w, kx) and mxu_ok(h, h, ky):
            def _band(n, kint):
                ksz = len(kint)
                base = (np.arange(n, dtype=np.int64)[:, None]
                        + np.arange(ksz)[None, :] - ksz // 2)
                idx = resolve_index_np(base, n, border)
                return build_tap_matrix(idx, kint, n, n)

            temp, tb = exact_axis_apply(arr, _band(w, kx), 255, axis=ax_w)
            accum, ab = exact_axis_apply(temp, _band(h, ky), tb, axis=ax_h)
            if (accum.dtype == jnp.float32
                    and ab + (_SCALE * _SCALE) // 2 >= 2 ** 24):
                accum = accum.astype(jnp.int32)
            return _div_clamp_u8(accum, _SCALE * _SCALE)

        # f32 arithmetic on integer values is exact while every partial
        # sum stays below 2^24 — and int32 multiplies are emulated on the
        # TPU VPU, so the f32 route is both bit-exact and much faster.
        # Pass 2 may exceed 2^24 (e.g. a Gaussian whose int weights sum
        # to 257); then taps are partitioned into chunks whose partial
        # sums each stay exact, combined with cheap int32 adds.
        limit = 2 ** 24
        half_bias = (_SCALE * _SCALE) // 2
        t_bound = 255 * int(np.abs(kx).sum())  # max |temp| after pass 1
        ky_abs = [int(v) for v in np.abs(ky)]
        if t_bound < limit and max(ky_abs, default=0) * t_bound < limit:
            temp = _sep_pass(arr.astype(jnp.float32), w, len(kernel_x),
                             border, kx.astype(np.float32), axis=ax_w)
            kyf = ky.astype(np.float32)
            if sum(ky_abs) * t_bound + half_bias < limit:
                accum = _sep_pass(temp, h, len(kernel_y), border, kyf,
                                  axis=ax_h)
            else:
                chunks, cur, cur_sum = [], [], 0
                for i, wv in enumerate(ky_abs):
                    if cur and (cur_sum + wv) * t_bound >= limit:
                        chunks.append(cur)
                        cur, cur_sum = [], 0
                    cur.append(i)
                    cur_sum += wv
                chunks.append(cur)
                accum = None
                for chunk in chunks:
                    wsub = np.zeros_like(kyf)
                    wsub[chunk] = kyf[chunk]  # _sep_pass skips zero taps
                    part = _sep_pass(temp, h, len(kernel_y), border, wsub,
                                     axis=ax_h).astype(jnp.int32)
                    accum = part if accum is None else accum + part
        else:
            temp = _sep_pass(arr.astype(jnp.int32), w, len(kernel_x), border,
                             kx, axis=ax_w)
            accum = _sep_pass(temp, h, len(kernel_y), border, ky, axis=ax_h)
        return _div_clamp_u8(accum, _SCALE * _SCALE)
    kx = np.asarray(kernel_x, dtype=np.float32)
    ky = np.asarray(kernel_y, dtype=np.float32)
    temp = _sep_pass(arr, w, len(kernel_x), border, kx, axis=ax_w)
    return _sep_pass(temp, h, len(kernel_y), border, ky, axis=ax_h)


@partial(jax.jit, static_argnames=("kernel", "border"))
def convolve2d(arr, kernel: tuple, border: BorderMode = BorderMode.MIRROR):
    """2-D convolution of [H, W, C] with a (tuple-of-tuples) kernel."""
    border = BorderMode(border)
    k = np.asarray(kernel, dtype=np.float32)
    kh, kw = k.shape
    h, w = arr.shape[0], arr.shape[1]
    y_taps, y_mask = _axis_taps(h, kh, border)
    x_taps, x_mask = _axis_taps(w, kw, border)

    is_u8 = arr.dtype == jnp.uint8
    if is_u8:
        kint = _kernel_to_int(k)
        # single 8.8 scale: accum bound 255*sum|w| + 128 < 2^24 for any
        # sane kernel -> exact in f32 (int32 multiplies are emulated on
        # the TPU VPU, f32 is native)
        if 255 * int(np.abs(kint).sum()) + _SCALE // 2 < 2 ** 24:
            kint = kint.astype(np.float32)
            a = arr.astype(jnp.float32)
        else:
            a = arr.astype(jnp.int32)
    else:
        kint = k
        a = arr

    total = None
    for ky_i in range(kh):
        rows = jnp.take(a, y_taps[:, ky_i], axis=0)
        if not y_mask[:, ky_i].all():
            rows = rows * jnp.asarray(y_mask[:, ky_i]).reshape(-1, *([1] * (a.ndim - 1)))
        for kx_i in range(kw):
            wgt = kint[ky_i, kx_i]
            if float(wgt) == 0.0:
                continue
            part = jnp.take(rows, x_taps[:, kx_i], axis=1)
            if not x_mask[:, kx_i].all():
                part = part * jnp.asarray(x_mask[:, kx_i]).reshape(
                    1, -1, *([1] * (a.ndim - 2))
                )
            term = part * wgt
            total = term if total is None else total + term
    if is_u8:
        return _div_clamp_u8(total, _SCALE)
    return total


def gaussian_kernel(sigma: float) -> tuple:
    """Normalized 1-D Gaussian, radius = ceil(3 sigma)
    (reference: src/image.zig:973-990)."""
    radius = int(np.ceil(3.0 * np.float32(sigma)))
    x = np.arange(2 * radius + 1, dtype=np.float32) - np.float32(radius)
    k = np.exp(-(x * x) / (2.0 * np.float32(sigma) * np.float32(sigma)))
    k = k / k.sum()
    return tuple(float(v) for v in k)


def gaussian_blur(arr, sigma: float, border: BorderMode = BorderMode.MIRROR):
    if sigma == 0:
        return arr
    k = gaussian_kernel(sigma)
    return convolve_separable(arr, k, k, border)


_SOBEL_X = ((-1.0, 0.0, 1.0), (-2.0, 0.0, 2.0), (-1.0, 0.0, 1.0))
_SOBEL_Y = ((-1.0, -2.0, -1.0), (0.0, 0.0, 0.0), (1.0, 2.0, 1.0))


@jax.jit
def sobel_magnitude(gray_f32):
    """Sobel gradient magnitude of a [H, W] 0-255 float plane -> u8
    (reference: src/image/edges.zig:29-73: magnitude/4, trunc, clamp)."""
    a = gray_f32[..., None]
    gx = convolve2d(a, _SOBEL_X, BorderMode.REPLICATE)[..., 0]
    gy = convolve2d(a, _SOBEL_Y, BorderMode.REPLICATE)[..., 0]
    mag = jnp.sqrt(gx * gx + gy * gy) / 4.0
    return jnp.trunc(jnp.clip(mag, 0.0, 255.0)).astype(jnp.uint8)


def sobel_gradients(gray_f32, border: BorderMode = BorderMode.REPLICATE):
    """Raw Sobel gradients (gx, gy) of a [H, W] float plane."""
    a = gray_f32[..., None]
    gx = convolve2d(a, _SOBEL_X, border)[..., 0]
    gy = convolve2d(a, _SOBEL_Y, border)[..., 0]
    return gx, gy
