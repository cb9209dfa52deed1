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

    Nibble outer product on the MXU: hist2d[hi, lo] = sum over pixels
    of onehot(hi(x)) * onehot(lo(x)), i.e. a batched [128,16]^T @
    [128,16] contraction per 128-pixel row — the same MAC count as the
    old 256-wide one-hot mat-vec but 8x less one-hot construction work
    on the VPU (~100x faster than an XLA scatter-add either way).
    Counts are exact: one-hot {0,1} products and per-row f32 partials
    (<= 128 * max weight) are integral; the cross-row reduction runs in
    int32. f32 operands are bf16-exact on TPU and keep the CPU backend
    happy (its DotThunk lacks batched bf16 support)."""
    f = plane.reshape(-1)
    pad = (-f.size) % 128
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
    rows = f.reshape(-1, 128).astype(jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((rows >> 4)[..., None] == idx).astype(jnp.float32)
    oh_lo = ((rows & 15)[..., None] == idx).astype(jnp.float32)
    if weights is not None:
        wf = weights.reshape(-1)
        if pad:
            wf = jnp.concatenate([wf, jnp.zeros((pad,), wf.dtype)])
        oh_hi = oh_hi * wf.reshape(-1, 128).astype(jnp.float32)[..., None]
    # reduce over rows INSIDE the contraction while the f32 partial sums
    # stay exact integers (counts < 2^24); chunk larger planes
    max_w = 255 if weights is not None else 1
    chunk = (1 << 24) // (128 * max_w)
    if rows.shape[0] <= chunk:
        part = jnp.einsum("rkh,rkl->hl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32)
        hist = part.astype(jnp.int32).reshape(256)
    else:
        acc = None
        for s in range(0, rows.shape[0], chunk):
            p = jnp.einsum("rkh,rkl->hl", oh_hi[s:s + chunk],
                           oh_lo[s:s + chunk],
                           preferred_element_type=jnp.float32)
            p = p.astype(jnp.int32)
            acc = p if acc is None else acc + p
        hist = acc.reshape(256)
    if pad and weights is None:
        hist = hist.at[0].add(-pad)
    return hist


def histogram256_multi(arr):
    """[..., C] u8 -> [C, 256] per-channel histograms in ONE nibble
    outer-product einsum (see histogram256; a python per-channel loop
    paid the dispatch + reduction three times over)."""
    c = arr.shape[-1]
    f = jnp.moveaxis(arr.reshape(-1, c), -1, 0).reshape(c, -1)  # [C, N]
    n = f.shape[1]
    pad = (-n) % 128
    if pad:
        f = jnp.concatenate([f, jnp.zeros((c, pad), f.dtype)], axis=1)
    rows = f.reshape(c, -1, 128).astype(jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((rows >> 4)[..., None] == idx).astype(jnp.float32)
    oh_lo = ((rows & 15)[..., None] == idx).astype(jnp.float32)
    # row reduction inside the contraction (exact: counts < 2^24);
    # chunk planes larger than that
    chunk = (1 << 24) // 128
    if rows.shape[1] <= chunk:
        part = jnp.einsum("crkh,crkl->chl", oh_hi, oh_lo,
                          preferred_element_type=jnp.float32)
        hist = part.astype(jnp.int32).reshape(c, 256)
    else:
        acc = None
        for s in range(0, rows.shape[1], chunk):
            p = jnp.einsum("crkh,crkl->chl", oh_hi[:, s:s + chunk],
                           oh_lo[:, s:s + chunk],
                           preferred_element_type=jnp.float32)
            p = p.astype(jnp.int32)
            acc = p if acc is None else acc + p
        hist = acc.reshape(c, 256)
    if pad:
        hist = hist.at[:, 0].add(-pad)
    return hist


def lut_apply_u8_per_channel(arr, luts):
    """``out[..., c] = luts[c][arr[..., c]]`` for u8 arr [..., C] and
    luts [C, 256] — the nibble decomposition of lut_apply_u8 with the
    channel as a batched contraction dim, one fused op for all
    channels. On TPU the one-hot operands are bf16 (exact for {0,1} and
    u8 table entries, halves the blown-up [..., 16] traffic); the CPU
    backend keeps f32 (its DotThunk rejects batched bf16 dots)."""
    import jax as _jax

    # honor an active jax.default_device(cpu) override (the hardware
    # audit's CPU-oracle runs): the CPU backend's DotThunk rejects
    # batched bf16 dots
    _dev = _jax.config.jax_default_device
    _plat = _dev.platform if _dev is not None else _jax.default_backend()
    dt = jnp.bfloat16 if _plat == "tpu" else jnp.float32
    xi = arr.astype(jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((xi >> 4)[..., None] == idx).astype(dt)
    mask_lo = ((xi & 15)[..., None] == idx).astype(dt)
    t = luts.astype(dt).reshape(-1, 16, 16)
    cand = jnp.einsum("...ch,chl->...cl", oh_hi, t,
                      preferred_element_type=jnp.float32)
    return jnp.sum(cand * mask_lo.astype(jnp.float32),
                   axis=-1).astype(jnp.uint8)


def lut_apply_u8(plane, lut):
    """``lut[plane]`` for a u8/int plane and a [256] or [256, C] u8 LUT
    (the LUT may be a traced device array, e.g. equalize's CDF table).

    Nibble decomposition: with x = 16*hi + lo and the LUT viewed as a
    [16, 16] table T, ``lut[x] = select_lo(onehot(hi) @ T)`` — the
    16-wide one-hot contraction rides the MXU (XLA fuses the one-hot
    into the dot operand, as in histogram256) and the final pick is a
    16-term masked sum on the VPU, ~16x less elementwise work than the
    previous 255-step staircase sum (measured 2.5x end-to-end). Exact:
    one-hot is {0,1}, T entries are u8 integers (exact in bf16), and
    every f32 partial stays an integer in [0, 255]. Per-pixel gathers
    and the full 256-wide one-hot mat-vec are both far slower on TPU
    (gathers pay ~3 ns/row; the mat-VEC cannot batch onto the MXU)."""
    xi = plane.astype(jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    # f32 operands for CPU-backend portability; bf16-exact on TPU (see
    # histogram256_multi)
    oh_hi = ((xi >> 4)[..., None] == idx).astype(jnp.float32)
    mask_lo = ((xi & 15)[..., None] == idx).astype(jnp.float32)
    if lut.ndim == 1:
        t = lut.astype(jnp.float32).reshape(16, 16)
        cand = jax.lax.dot_general(
            oh_hi, t, (((oh_hi.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [..., 16] candidates
        return jnp.sum(cand * mask_lo, axis=-1).astype(jnp.uint8)
    c = lut.shape[1]
    t = lut.astype(jnp.float32).reshape(16, 16 * c)
    cand = jax.lax.dot_general(
        oh_hi, t, (((oh_hi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cand = cand.reshape(*plane.shape, 16, c)
    return jnp.sum(cand * mask_lo[..., None], axis=-2).astype(jnp.uint8)


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
    from .integral import _box_sums_exact, _mean_parts

    sums, area = _box_sums_exact(plane[..., None], radius)
    q, frac = _mean_parts(sums, area)
    mean = q[..., 0] if frac is None else (q + frac)[..., 0]
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
