#!/usr/bin/env python
"""Stage-by-stage north-star profile on the real TPU.

Times each pipeline stage with the in-jit fori_loop differencing method
(see CLAUDE.md: per-dispatch overhead dominates single-call timings), so
the numbers are true device times. Used to target the fused-kernel work;
not part of the driver bench.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.ops.interpolation import resize
from zignal_tpu.ops.convolution import (
    convolve_separable, gaussian_kernel, _sep_pass, _div_clamp_u8)
from zignal_tpu.color._array import convert_array
from zignal_tpu.pipeline import resize_blur_oklab
from zignal_tpu.enums import BorderMode, Interpolation

B, DIM = 16, 1024
OUT = DIM // 2


def loop_timer(step_fn, x, n_small=2, n_large=12):
    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(x.dtype))
            r = step_fn(xi)
            # sum-consume: a [0] fetch lets XLA slice through
            # elementwise producers and skip nearly all the work
            return acc + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        float(looped(x, n))
        t0 = time.perf_counter()
        float(looped(x, n))
        return time.perf_counter() - t0

    t_small = min(timed(n_small) for _ in range(2))
    t_large = min(timed(n_large) for _ in range(2))
    return (t_large - t_small) / (n_large - n_small)


def mxu_bilinear(x, rows, cols):
    """The generic banded-matmul bilinear (bypasses the new fast path)."""
    from zignal_tpu.ops.interpolation import (
        _axis_coords, resolve_index_np, _SCALE)
    from zignal_tpu.ops.mxu_resample import build_tap_matrix, exact_axis_apply

    src_rows, src_cols = x.shape[-3], x.shape[-2]
    _, y0, fy = _axis_coords(src_rows, rows)
    _, x0, fx = _axis_coords(src_cols, cols)
    fy_i = np.trunc(fy * np.float32(_SCALE)).astype(np.int32)
    fx_i = np.trunc(fx * np.float32(_SCALE)).astype(np.int32)
    ya = resolve_index_np(y0, src_rows).astype(np.int32)
    yb = resolve_index_np(y0 + 1, src_rows).astype(np.int32)
    xa = resolve_index_np(x0, src_cols).astype(np.int32)
    xb = resolve_index_np(x0 + 1, src_cols).astype(np.int32)
    Wy = build_tap_matrix(np.stack([ya, yb], 1),
                          np.stack([_SCALE - fy_i, fy_i], 1), src_rows, rows)
    Wx = build_tap_matrix(np.stack([xa, xb], 1),
                          np.stack([_SCALE - fx_i, fx_i], 1), src_cols, cols)
    t, tb = exact_axis_apply(x, Wy, 255, axis=x.ndim - 3)
    r, _ = exact_axis_apply(t, Wx, tb, axis=x.ndim - 2)
    if r.dtype == jnp.float32:
        out = jnp.trunc(r * (1.0 / 65536))
    else:
        out = r >> 16
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def blur_vpu(x, sigma=2.0):
    """Shifted-slice (pad + static slices) separable u8 blur, f32 exact."""
    k = np.round(np.asarray(gaussian_kernel(sigma), np.float32) * 256)
    h, w = x.shape[-3], x.shape[-2]
    t_bound = 255 * int(np.abs(k).sum())
    temp = _sep_pass(x.astype(jnp.float32), w, len(k), BorderMode.MIRROR,
                     k.astype(np.float32), axis=x.ndim - 2)
    # chunk pass 2 so partials stay < 2^24 (mirrors convolution.py)
    limit = 2 ** 24
    chunks, cur, cur_sum = [], [], 0
    for i, wv in enumerate(np.abs(k).astype(int)):
        if cur and (cur_sum + wv) * t_bound >= limit:
            chunks.append(cur)
            cur, cur_sum = [], 0
        cur.append(i)
        cur_sum += int(wv)
    chunks.append(cur)
    accum = None
    for chunk in chunks:
        wsub = np.zeros(len(k), np.float32)
        wsub[chunk] = k[chunk]
        part = _sep_pass(temp, h, len(k), BorderMode.MIRROR, wsub,
                         axis=x.ndim - 3).astype(jnp.int32)
        accum = part if accum is None else accum + part
    return _div_clamp_u8(accum, 65536)


def main():
    rng = np.random.default_rng(0)
    big = jax.device_put(rng.integers(0, 256, (B, DIM, DIM, 3), np.uint8))
    small = jax.device_put(rng.integers(0, 256, (B, OUT, OUT, 3), np.uint8))
    in_mpix = B * DIM * DIM / 1e6

    def emit(name, t, mpix=in_mpix):
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 3),
                          "gpix_s": round(mpix / 1e3 / t, 2)}), flush=True)

    emit("noop(read 48MB u8, +1)", loop_timer(lambda x: x + 1, big))
    emit("full pipeline", loop_timer(
        lambda x: resize_blur_oklab(x, OUT, OUT, 2.0), big))
    emit("resize fast (slice avg)", loop_timer(
        lambda x: resize(x, OUT, OUT, Interpolation.BILINEAR), big))
    emit("resize mxu (banded matmul)", loop_timer(
        lambda x: mxu_bilinear(x, OUT, OUT), big))
    emit("blur mxu (banded matmul)", loop_timer(
        lambda x: convolve_separable(x, gaussian_kernel(2.0),
                                     gaussian_kernel(2.0)), small),
         B * OUT * OUT / 1e6)
    emit("blur vpu (shifted slices)", loop_timer(
        lambda x: blur_vpu(x), small), B * OUT * OUT / 1e6)
    emit("u8->oklab (pow gamma)", loop_timer(
        lambda x: convert_array(x.astype(jnp.float32) / 255.0, "rgb",
                                "oklab"), small), B * OUT * OUT / 1e6)


if __name__ == "__main__":
    main()
