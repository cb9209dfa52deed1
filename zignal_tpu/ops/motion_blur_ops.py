"""Motion blur kernels (reference: src/image/motion_blur.zig).

All three modes are gather-accumulate over a static set of sample
offsets with in-bounds masking and clamped bilinear taps — one fused
device program per configuration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import BorderMode
from .convolution import convolve_separable

__all__ = ["linear_motion_blur", "radial_blur"]


def _bilinear_clamped(a, xs, ys, h, w):
    """Reference's clamped bilinear tap (motion_blur.zig:140-157):
    x1 = min(x0+1, w-1), x0 from floor (assumed in-bounds by mask)."""
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    # one fused linear-index take instead of four 2-D gathers (see
    # warp._gather2d: ~20% faster, and one dispatch instead of four)
    flat = a.reshape(-1, a.shape[-1])
    lin = jnp.stack([
        (y0i * w + x0i).reshape(-1), (y0i * w + x1i).reshape(-1),
        (y1i * w + x0i).reshape(-1), (y1i * w + x1i).reshape(-1),
    ])
    g = jnp.take(flat, lin.reshape(-1), axis=0).reshape(4, *x0.shape,
                                                        a.shape[-1])
    v00, v10, v01, v11 = g[0], g[1], g[2], g[3]
    v0 = v00 * (1 - fx) + v10 * fx
    v1 = v01 * (1 - fx) + v11 * fx
    return v0 * (1 - fy) + v1 * fy


def _accumulate(arr, sample_fn, n_samples):
    """Average in-bounds samples; fall back to the source pixel."""
    h, w = arr.shape[0], arr.shape[1]
    a = arr.astype(jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    total = jnp.zeros_like(a)
    count = jnp.zeros((h, w, 1), jnp.float32)
    for s in range(n_samples):
        sx, sy = sample_fn(s, xs, ys)
        inside = ((sx >= 0) & (sx < w) & (sy >= 0) & (sy < h))[..., None]
        val = _bilinear_clamped(a, sx, sy, h, w)
        total = total + jnp.where(inside, val, 0.0)
        count = count + inside
    result = jnp.where(count > 0, total / jnp.maximum(count, 1), a)
    if arr.dtype == jnp.uint8:
        return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)), 0, 255).astype(jnp.uint8)
    return result.astype(arr.dtype)


@partial(jax.jit, static_argnames=("angle", "distance"))
def linear_motion_blur(arr, angle: float, distance: int):
    """Average along a motion line (motion_blur.zig:65-175)."""
    if distance == 0:
        return arr
    cos_a = float(np.cos(np.float32(angle)))
    sin_a = float(np.sin(np.float32(angle)))
    eps = 0.001
    if abs(sin_a) < eps or abs(cos_a) < eps:
        # separable uniform kernel fast path (replicate border)
        kern = tuple([1.0 / distance] * distance)
        ident = (1.0,)
        kx, ky = (kern, ident) if abs(sin_a) < eps else (ident, kern)
        return convolve_separable(arr, kx, ky, BorderMode.REPLICATE)
    half = distance / 2.0
    # t walks -half, -half+1, ... while t <= half
    ts = [-half + i for i in range(distance + 2) if -half + i <= half]

    # Constant-shift taps: the per-pixel f32 coordinate math is replicated
    # at trace time in numpy (bit-identical to the jnp elementwise ops),
    # so every corner index vector is an exact arithmetic sequence and
    # each tap becomes 4 contiguous slices of an edge-padded array — no
    # gathers. Outside-of-image taps are zeroed by the static mask, so
    # unclamped indices are safe inside the padding.
    h, w = arr.shape[0], arr.shape[1]
    a = arr.astype(jnp.float32)
    m = int(np.ceil(half * max(abs(cos_a), abs(sin_a)))) + 2
    padded = jnp.pad(a, ((m, m), (m, m), (0, 0)), mode="edge")
    f32 = np.float32
    total = jnp.zeros_like(a)
    count = jnp.zeros((h, w, 1), jnp.float32)
    for t in ts:
        xs = np.arange(w, dtype=f32) + f32(t * cos_a)
        ys = np.arange(h, dtype=f32) + f32(t * sin_a)
        x0 = np.floor(xs)
        y0 = np.floor(ys)
        fx = jnp.asarray((xs - x0).astype(f32))[None, :, None]
        fy = jnp.asarray((ys - y0).astype(f32))[:, None, None]
        from .interpolation import _take_axis

        xiv = x0.astype(np.int64) + m   # arithmetic step 1 (f32 rounding
        yiv = y0.astype(np.int64) + m   # deviations handled by _take_axis)

        def corner(dy, dx):
            return _take_axis(_take_axis(padded, yiv + dy, 0), xiv + dx, 1)

        v00, v10 = corner(0, 0), corner(0, 1)
        v01, v11 = corner(1, 0), corner(1, 1)
        v0 = v00 * (1 - fx) + v10 * fx
        v1 = v01 * (1 - fx) + v11 * fx
        val = v0 * (1 - fy) + v1 * fy
        inside = jnp.asarray(
            (((xs >= 0) & (xs < w))[None, :]
             & ((ys >= 0) & (ys < h))[:, None])[..., None])
        total = total + jnp.where(inside, val, 0.0)
        count = count + inside
    result = jnp.where(count > 0, total / jnp.maximum(count, 1), a)
    if arr.dtype == jnp.uint8:
        return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)), 0, 255).astype(jnp.uint8)
    return result.astype(arr.dtype)


@partial(jax.jit, static_argnames=("center_x", "center_y", "strength", "zoom"))
def radial_blur(arr, center_x: float, center_y: float, strength: float,
                zoom: bool):
    """Radial zoom/spin blur (motion_blur.zig radial:240+)."""
    if strength == 0:
        return arr
    h, w = arr.shape[0], arr.shape[1]
    cx = center_x * (w - 1)
    cy = center_y * (h - 1)
    s_cl = min(max(strength, 0.0), 1.0)
    n_samples = 8 + int(np.trunc(s_cl * 24))
    max_distance = float(np.sqrt(cx * cx + cy * cy))

    def sample_fn(s, xs, ys):
        t = (s - (n_samples - 1) / 2.0) / (n_samples - 1)
        dx = xs - cx
        dy = ys - cy
        dist = jnp.sqrt(dx * dx + dy * dy)
        if zoom:
            blur_amount = (dist / max(max_distance, 1e-6)) * s_cl * 20.0
            scale = 1.0 + t * blur_amount * 0.1
            return cx + dx * scale, cy + dy * scale
        blur_amount = s_cl * 0.5
        angle = jnp.arctan2(dy, dx)
        new_angle = angle + t * blur_amount
        return cx + dist * jnp.cos(new_angle), cy + dist * jnp.sin(new_angle)

    def sample_fn_np(s, xs, ys):
        """numpy mirror used ONLY to bound per-tile source boxes (a few
        px of transcendental mismatch is swallowed by the margin)."""
        t = (s - (n_samples - 1) / 2.0) / (n_samples - 1)
        dx = xs - cx
        dy = ys - cy
        dist = np.sqrt(dx * dx + dy * dy)
        if zoom:
            blur_amount = (dist / max(max_distance, 1e-6)) * s_cl * 20.0
            scale = 1.0 + t * blur_amount * 0.1
            return cx + dx * scale, cy + dy * scale
        blur_amount = s_cl * 0.5
        new_angle = np.arctan2(dy, dx) + t * blur_amount
        return cx + dist * np.cos(new_angle), cy + dist * np.sin(new_angle)

    # NOTE: _accumulate_tiled(arr, sample_fn, sample_fn_np, n_samples)
    # cuts the gather cost ~8x, but XLA's FMA contraction makes the
    # recomputed f32 coords differ by ulps between graphs, flipping
    # floor()/inside at a handful of boundary taps — outputs deviate at
    # scattered pixels. Until that's bounded (e.g. coords computed once
    # and reused), radial stays on the whole-image gather path.
    _ = sample_fn_np
    return _accumulate(arr, sample_fn, n_samples)


def _accumulate_tiled(arr, sample_fn, sample_fn_np, n_samples,
                      tile: int = 256):
    """_accumulate with per-tile gathers from statically-bounded source
    boxes: the coords are still computed ON DEVICE (bit-identical output)
    but each tile's gather operand is a small slice sized from the numpy
    coordinate mirror plus a safety margin — VMEM-resident gathers are
    ~8x faster than whole-image HBM gathers."""
    h, w = arr.shape[0], arr.shape[1]
    if h * w > (1 << 22):  # keep trace-time numpy work bounded
        return _accumulate(arr, sample_fn, n_samples)
    a = arr.astype(jnp.float32)
    c = arr.shape[2]
    margin = 4
    ys_full, xs_full = np.meshgrid(np.arange(h, dtype=np.float32),
                                   np.arange(w, dtype=np.float32),
                                   indexing="ij")
    out_rows = []
    for i0 in range(0, h, tile):
        row = []
        for j0 in range(0, w, tile):
            th = min(tile, h - i0)
            tw = min(tile, w - j0)
            ys_t, xs_t = (jnp.meshgrid(
                jnp.arange(i0, i0 + th, dtype=jnp.float32),
                jnp.arange(j0, j0 + tw, dtype=jnp.float32),
                indexing="ij"))
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            for s in range(n_samples):
                ax, ay = sample_fn_np(s, xs_full[i0:i0 + th, j0:j0 + tw],
                                      ys_full[i0:i0 + th, j0:j0 + tw])
                bx0 = int(np.clip(np.floor(ax.min()) - margin, 0, w - 1))
                bx1 = int(np.clip(np.ceil(ax.max()) + margin, bx0 + 1, w))
                by0 = int(np.clip(np.floor(ay.min()) - margin, 0, h - 1))
                by1 = int(np.clip(np.ceil(ay.max()) + margin, by0 + 1, h))
                box = jax.lax.slice(a, (by0, bx0, 0), (by1, bx1, c))
                bw = bx1 - bx0
                bh = by1 - by0
                sx, sy = sample_fn(s, xs_t, ys_t)
                inside = ((sx >= 0) & (sx < w) & (sy >= 0) & (sy < h))[..., None]
                x0 = jnp.floor(sx)
                y0 = jnp.floor(sy)
                fx = (sx - x0)[..., None]
                fy = (sy - y0)[..., None]
                # clamp against FULL image bounds (reference semantics),
                # then shift into the box; masked samples may clamp to
                # the box edge — their values are zeroed by `inside`
                x0i = jnp.clip(jnp.clip(x0.astype(jnp.int32), 0, w - 1) - bx0,
                               0, bw - 1)
                y0i = jnp.clip(jnp.clip(y0.astype(jnp.int32), 0, h - 1) - by0,
                               0, bh - 1)
                x1i = jnp.clip(x0i + 1, 0, bw - 1)
                y1i = jnp.clip(y0i + 1, 0, bh - 1)
                # NB: x1i must replicate min(x0_full + 1, w - 1) - bx0;
                # since bx1 <= w, clipping inside the box is equivalent
                flat = box.reshape(-1, c)
                lin = jnp.stack([
                    (y0i * bw + x0i).reshape(-1), (y0i * bw + x1i).reshape(-1),
                    (y1i * bw + x0i).reshape(-1), (y1i * bw + x1i).reshape(-1),
                ])
                g = jnp.take(flat, lin.reshape(-1), axis=0).reshape(
                    4, th, tw, c)
                v0 = g[0] * (1 - fx) + g[1] * fx
                v1 = g[2] * (1 - fx) + g[3] * fx
                val = v0 * (1 - fy) + v1 * fy
                total = total + jnp.where(inside, val, 0.0)
                count = count + inside
            orig = jax.lax.slice(a, (i0, j0, 0), (i0 + th, j0 + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1), orig)
            row.append(res)
        out_rows.append(row[0] if len(row) == 1
                        else jnp.concatenate(row, axis=1))
    result = out_rows[0] if len(out_rows) == 1 \
        else jnp.concatenate(out_rows, axis=0)
    if arr.dtype == jnp.uint8:
        return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)), 0, 255).astype(jnp.uint8)
    return result.astype(arr.dtype)
