"""Resize / interpolation kernels (reference: src/image/interpolation.zig,
per-plane kernels src/image/channel_ops.zig:144-560).

TPU-native design: output coordinates and filter weights are computed at
**trace time** (static shapes) with numpy float32 that replicates the
reference's f32 coordinate math exactly; the device program is then pure
gathers + integer multiply-accumulates (VPU int32), which XLA fuses into a
single kernel. u8 outputs are bit-exact with the reference's fixed-point
paths (scale 256, truncating division, clamp).

Coordinate mapping is align-centers: ``src = (dst + 0.5) * src/dst - 0.5``
with mirror borders for filter taps (channel_ops.zig:161-174).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import BorderMode, Interpolation

__all__ = ["resize", "resize_plane_f32"]

_SCALE = 256


def resolve_index_np(idx, length, mode=BorderMode.MIRROR):
    """Vectorized reference border.resolveIndex (border.zig:46-67).

    Returns resolved indices; positions mapping to zero (ZERO mode OOB)
    are returned as -1 (caller must mask).
    """
    idx = np.asarray(idx, dtype=np.int64)
    inside = (idx >= 0) & (idx < length)
    if mode == BorderMode.ZERO:
        return np.where(inside, idx, -1)
    if mode == BorderMode.REPLICATE:
        return np.clip(idx, 0, length - 1)
    if mode == BorderMode.MIRROR:
        if length == 1:
            return np.zeros_like(idx)
        period = 2 * (length - 1)
        m = np.mod(idx, period)  # numpy mod is already non-negative
        return np.where(m >= length, period - m, m)
    if mode == BorderMode.WRAP:
        return np.mod(idx, length)
    raise ValueError(f"unknown border mode {mode!r}")


def _axis_coords(src_n: int, dst_n: int):
    """Reference f32 coordinate math: (dst+0.5)*ratio-0.5, floor + frac."""
    f32 = np.float32
    ratio = f32(src_n) / f32(dst_n)
    dst = np.arange(dst_n, dtype=f32)
    src_f = (dst + f32(0.5)) * ratio - f32(0.5)
    i0 = np.floor(src_f).astype(np.int64)
    frac = src_f - np.floor(src_f)  # f32 in [0,1)
    return src_f, i0, frac


def _take_axis(arr, idx, axis):
    """take() specialized for resize index vectors (known at trace time).

    Gathers are ~25x off the HBM roofline on TPU; strided slices are
    near it. Two lowerings avoid the gather:
    - exact arithmetic sequence -> one strided slice
    - near-arithmetic (idx = start + s*i + d(i), d in a small set, the
      common fractional-downscale case) -> one strided slice per distinct
      residual, combined with trace-time-masked selects
    """
    idx = np.asarray(idx)
    n = len(idx)
    if n == 1:
        return jax.lax.slice_in_dim(arr, int(idx[0]), int(idx[0]) + 1,
                                    axis=axis)
    step = int(idx[1]) - int(idx[0])
    if step > 0 and np.all(np.diff(idx) == step):
        start = int(idx[0])
        limit = start + step * (n - 1) + 1
        if limit <= arr.shape[axis]:
            return jax.lax.slice_in_dim(arr, start, limit, stride=step,
                                        axis=axis)
    # near-arithmetic: fit s = round(mean step), residuals d(i) >= 0
    s = max(1, int(round((int(idx[-1]) - int(idx[0])) / (n - 1))))
    base = int(idx[0]) + s * np.arange(n, dtype=np.int64)
    d = idx.astype(np.int64) - base
    d -= d.min()
    base = idx.astype(np.int64) - d
    deltas = np.unique(d)
    if len(deltas) <= 4:
        start0 = int(base[0])
        limit0 = start0 + s * (n - 1) + 1
        ok = all(0 <= start0 + int(dv) and limit0 + int(dv) <= arr.shape[axis]
                 for dv in deltas)
        if ok:
            out = None
            shape = [1] * arr.ndim
            shape[axis] = n
            for dv in deltas:
                part = jax.lax.slice_in_dim(
                    arr, start0 + int(dv), limit0 + int(dv), stride=s,
                    axis=axis)
                if out is None:
                    out = part
                else:
                    mask = jnp.asarray((d == dv).reshape(shape))
                    out = jnp.where(mask, part, out)
            return out
    return jnp.take(arr, idx, axis=axis)


def _cubic_kernel_i32(t):
    """Bicubic a=-0.5 kernel in 8.8 fixed point (channel_ops.zig:228-244)."""
    at = np.abs(t).astype(np.int64)
    t2 = (at * at) // _SCALE
    t3 = (t2 * at) // _SCALE
    w_near = _SCALE - 2 * t2 + t3
    w_far = 4 * _SCALE - 8 * at + 5 * t2 - t3
    return np.where(at <= _SCALE, w_near, np.where(at <= 2 * _SCALE, w_far, 0))


def _catmull_kernel_i32(t):
    """Catmull-Rom kernel in 8.8 fixed point (channel_ops.zig:304-320)."""
    at = np.abs(t).astype(np.int64)
    t2 = (at * at) // _SCALE
    t3 = (t2 * at) // _SCALE
    w_near = _SCALE - (5 * t2) // 2 + (3 * t3) // 2
    w_far = 2 * _SCALE - 4 * at + (5 * t2) // 2 - _trunc_div_np(t3, 2)
    return np.where(at <= _SCALE, w_near, np.where(at <= 2 * _SCALE, w_far, 0))


def _mitchell_kernel_i32(t):
    """Mitchell-Netravali b=c=1/3 kernel (channel_ops.zig:378-394)."""
    s = _SCALE
    at = np.abs(t).astype(np.int64)
    at2 = at * at
    at3 = at2 * at
    w_near = _trunc_div_np(21 * at3 - 36 * at2 * s + 16 * s**3, 18 * s * s)
    w_far = _trunc_div_np(-7 * at3 + 36 * at2 * s - 60 * at * s * s + 32 * s**3, 18 * s * s)
    return np.where(at < s, w_near, np.where(at < 2 * s, w_far, 0))


def _trunc_div_np(a, b):
    return (np.sign(a) * (np.abs(a) // np.abs(b))).astype(np.int64)


def _lanczos_kernel_f32(x):
    """Lanczos3 (channel_ops.zig:449-457), computed in f32."""
    x = np.asarray(x, dtype=np.float32)
    a = np.float32(3.0)
    pi_x = np.float32(np.pi) * x
    with np.errstate(divide="ignore", invalid="ignore"):
        val = (a * np.sin(pi_x) * np.sin(pi_x / a)) / (pi_x * pi_x)
    val = np.where(x == 0, np.float32(1.0), val)
    return np.where(np.abs(x) >= a, np.float32(0.0), val).astype(np.float32)


def _divtrunc(a, b):
    """Truncating integer division on device (Zig @divTrunc)."""
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.where((a < 0) ^ (b < 0), -q, q)


# ---------------------------------------------------------------------------
# Per-method weight/index tables (trace time)
# ---------------------------------------------------------------------------


def _cubic_axis_table(src_n, dst_n, kernel):
    """Indices [dst,4] (mirror-resolved) and i32 weights [dst,4]."""
    _, i0, frac = _axis_coords(src_n, dst_n)
    f_fix = np.trunc(frac * np.float32(_SCALE)).astype(np.int64)  # 0..255
    ks = np.arange(4, dtype=np.int64)
    idx = resolve_index_np(i0[:, None] + ks[None, :] - 1, src_n)
    w = kernel(ks[None, :] * _SCALE - _SCALE - f_fix[:, None])
    return idx.astype(np.int32), w.astype(np.int32)


def _lanczos_axis_table(src_n, dst_n):
    _, i0, frac = _axis_coords(src_n, dst_n)
    ks = np.arange(6, dtype=np.int64)
    idx = resolve_index_np(i0[:, None] + ks[None, :] - 2, src_n)
    w = _lanczos_kernel_f32((ks[None, :] - 2).astype(np.float32) - frac[:, None])
    return idx.astype(np.int32), w.astype(np.float32)


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def _hw_axes(arr):
    """Row/col axes for [..., H, W, C] arrays (leading dims = batch)."""
    return arr.ndim - 3, arr.ndim - 2


def _onehot(idx, src_n: int):
    """[len(idx), src_n] 0/1 selector matrix — a gather expressed as an
    exact MXU matmul (ops/mxu_resample.py)."""
    from .mxu_resample import build_tap_matrix

    return build_tap_matrix(np.asarray(idx)[:, None], np.ones(1, np.int64),
                            src_n, len(idx))


def _resize_nearest(arr, rows, cols):
    ay, ax = _hw_axes(arr)
    src_rows, src_cols = arr.shape[ay], arr.shape[ax]
    src_y, _, _ = _axis_coords(src_rows, rows)
    src_x, _, _ = _axis_coords(src_cols, cols)
    # Zig @round = half away from zero; inputs are > -0.5 so floor(x+0.5)
    y = np.clip(np.floor(src_y + np.float32(0.5)), 0, src_rows - 1).astype(np.int32)
    x = np.clip(np.floor(src_x + np.float32(0.5)), 0, src_cols - 1).astype(np.int32)
    if arr.dtype == jnp.uint8:
        from .mxu_resample import exact_axis_apply, mxu_ok

        if mxu_ok(rows, src_rows, (0, 1)) and mxu_ok(cols, src_cols, (0, 1)):
            t, _ = exact_axis_apply(arr, _onehot(y, src_rows), 255, axis=ay)
            r, _ = exact_axis_apply(t, _onehot(x, src_cols), 255, axis=ax)
            return r.astype(jnp.uint8)
    return _take_axis(_take_axis(arr, y, axis=ay), x, axis=ax)


def _resize_bilinear_u8(arr, rows, cols):
    """8-bit fixed-point bilinear (channel_ops.zig:144-191), bit-exact."""
    ay, ax = _hw_axes(arr)
    src_rows, src_cols = arr.shape[ay], arr.shape[ax]
    _, y0, fy = _axis_coords(src_rows, rows)
    _, x0, fx = _axis_coords(src_cols, cols)
    fy_i = np.trunc(fy * np.float32(_SCALE)).astype(np.int32)[:, None, None]
    fx_i = np.trunc(fx * np.float32(_SCALE)).astype(np.int32)[None, :, None]
    ya = resolve_index_np(y0, src_rows).astype(np.int32)
    yb = resolve_index_np(y0 + 1, src_rows).astype(np.int32)
    xa = resolve_index_np(x0, src_cols).astype(np.int32)
    xb = resolve_index_np(x0 + 1, src_cols).astype(np.int32)

    # Preferred lowering: the separable weighted sum IS a banded matmul —
    # run it on the MXU with exact base-256 digit arithmetic (bit-exact,
    # ~2 orders of magnitude faster than gather/slice lowerings on TPU).
    from .mxu_resample import build_tap_matrix, exact_axis_apply, mxu_ok

    fy_flat = fy_i.reshape(-1)
    fx_flat = fx_i.reshape(-1)
    if mxu_ok(rows, src_rows, (0, 256)) and mxu_ok(cols, src_cols, (0, 256)):
        Wy = build_tap_matrix(
            np.stack([ya, yb], axis=1),
            np.stack([_SCALE - fy_flat, fy_flat], axis=1), src_rows, rows)
        Wx = build_tap_matrix(
            np.stack([xa, xb], axis=1),
            np.stack([_SCALE - fx_flat, fx_flat], axis=1), src_cols, cols)
        temp, tb = exact_axis_apply(arr, Wy, 255, axis=ay)
        res, _ = exact_axis_apply(temp, Wx, tb, axis=ax)
        if res.dtype == jnp.float32:
            out = jnp.trunc(res * (1.0 / (_SCALE * _SCALE)))
        else:
            out = res >> 16  # non-negative int32: shift == trunc-div
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    # Fallback (huge axes): gather + f32 fixed point. Slice the u8 source
    # first, then f32 math: all values are non-negative integers
    # <= 255*256*256 < 2^24, so multiply/add and trunc-divide by 2^16 are
    # exact (int32 multiplies are emulated on the TPU VPU).
    top_rows = _take_axis(arr, ya, axis=ay)
    bot_rows = _take_axis(arr, yb, axis=ay)
    tl = _take_axis(top_rows, xa, axis=ax).astype(jnp.float32)
    tr = _take_axis(top_rows, xb, axis=ax).astype(jnp.float32)
    bl = _take_axis(bot_rows, xa, axis=ax).astype(jnp.float32)
    br = _take_axis(bot_rows, xb, axis=ax).astype(jnp.float32)

    fx_f = fx_i.astype(np.float32)
    fy_f = fy_i.astype(np.float32)
    top = tl * (_SCALE - fx_f) + tr * fx_f
    bottom = bl * (_SCALE - fx_f) + br * fx_f
    result = jnp.trunc(
        (top * (_SCALE - fy_f) + bottom * fy_f) * (1.0 / (_SCALE * _SCALE))
    )
    return jnp.clip(result, 0, 255).astype(jnp.uint8)


def _resize_cubic_family_u8(arr, rows, cols, kernel):
    """4x4 integer-weight resampling (bicubic/catmull-rom/mitchell),
    bit-exact with the reference's fixed-point planes."""
    ay, ax = _hw_axes(arr)
    src_rows, src_cols = arr.shape[ay], arr.shape[ax]
    y_idx, wy = _cubic_axis_table(src_rows, rows, kernel)
    x_idx, wx = _cubic_axis_table(src_cols, cols, kernel)

    # All arithmetic in f32 holding exact integers (int32 multiplies are
    # emulated on the TPU VPU): per-tap weights |wy*wx/256| <= 2^10 and
    # totals <= 16*255*2^10 < 2^24 are exact; the final trunc-division is
    # safe because wsum <= 2^14 keeps 1/wsum above ulp(|quotient|).
    from .mxu_resample import exact_axis_apply, mxu_ok

    use_mxu = mxu_ok(rows, src_rows, (0, 1)) and mxu_ok(cols, src_cols, (0, 1))
    total = jnp.zeros((rows, cols, arr.shape[-1]), dtype=jnp.float32)
    wsum = jnp.zeros((rows, cols), dtype=jnp.float32)
    for ky in range(4):
        # one-hot MXU gather of the tap rows (exact); VPU gather fallback
        if use_mxu:
            row_gather, _ = exact_axis_apply(
                arr, _onehot(y_idx[:, ky], src_rows), 255, axis=ay)
        else:
            row_gather = _take_axis(arr, y_idx[:, ky], axis=ay)
        for kx in range(4):
            if use_mxu:
                px, _ = exact_axis_apply(
                    row_gather, _onehot(x_idx[:, kx], src_cols), 255, axis=ax)
            else:
                px = _take_axis(row_gather, x_idx[:, kx],
                                axis=ax).astype(jnp.float32)
            w_np = _trunc_div_np(
                wy[:, ky, None].astype(np.int64) * wx[None, :, kx], _SCALE
            ).astype(np.float32)  # [rows, cols], exact at trace time
            w = jnp.asarray(w_np)
            total = total + px * w[..., None]
            wsum = wsum + w
    result = jnp.where(wsum[..., None] != 0, _divtrunc(total, wsum[..., None]), 0)
    return jnp.clip(result, 0, 255).astype(jnp.uint8)


def _resize_lanczos_u8(arr, rows, cols):
    """6x6 Lanczos3 with f32 weights (channel_ops.zig:438-494)."""
    ay, ax = _hw_axes(arr)
    src_rows, src_cols = arr.shape[ay], arr.shape[ax]
    y_idx, wy = _lanczos_axis_table(src_rows, rows)
    x_idx, wx = _lanczos_axis_table(src_cols, cols)

    from .mxu_resample import exact_axis_apply, mxu_ok

    use_mxu = mxu_ok(rows, src_rows, (0, 1)) and mxu_ok(cols, src_cols, (0, 1))
    total = jnp.zeros((rows, cols, arr.shape[-1]), dtype=jnp.float32)
    wsum = jnp.zeros((rows, cols), dtype=jnp.float32)
    for ky in range(6):
        if use_mxu:
            row_gather, _ = exact_axis_apply(
                arr, _onehot(y_idx[:, ky], src_rows), 255, axis=ay)
        else:
            row_gather = _take_axis(arr, y_idx[:, ky], axis=ay)
        for kx in range(6):
            if use_mxu:
                px, _ = exact_axis_apply(
                    row_gather, _onehot(x_idx[:, kx], src_cols), 255, axis=ax)
            else:
                px = _take_axis(row_gather, x_idx[:, kx],
                                axis=ax).astype(jnp.float32)
            w = jnp.asarray(wy[:, ky, None]) * jnp.asarray(wx[None, :, kx])
            total = total + px * w[..., None]
            wsum = wsum + w
    result = jnp.where(wsum[..., None] != 0, total / wsum[..., None], 0.0)
    # meta.clamp(u8, f32): round half away from zero, clamp
    return jnp.clip(jnp.floor(result + 0.5), 0, 255).astype(jnp.uint8)


def _resize_float(arr, rows, cols, method):
    """Float-plane resize with normalized float weights
    (channel_ops.zig resizePlaneF32)."""
    ay, ax = _hw_axes(arr)
    src_rows, src_cols = arr.shape[ay], arr.shape[ax]
    if method == Interpolation.NEAREST:
        return _resize_nearest(arr, rows, cols)
    if method == Interpolation.BILINEAR:
        _, y0, fy = _axis_coords(src_rows, rows)
        _, x0, fx = _axis_coords(src_cols, cols)
        ya = resolve_index_np(y0, src_rows)
        yb = resolve_index_np(y0 + 1, src_rows)
        xa = resolve_index_np(x0, src_cols)
        xb = resolve_index_np(x0 + 1, src_cols)
        top_rows = _take_axis(arr, ya, axis=ay)
        bot_rows = _take_axis(arr, yb, axis=ay)
        tl = _take_axis(top_rows, xa, axis=ax)
        tr = _take_axis(top_rows, xb, axis=ax)
        bl = _take_axis(bot_rows, xa, axis=ax)
        br = _take_axis(bot_rows, xb, axis=ax)
        fyv = fy[:, None, None]
        fxv = fx[None, :, None]
        top = tl * (1 - fxv) + tr * fxv
        bot = bl * (1 - fxv) + br * fxv
        return top * (1 - fyv) + bot * fyv
    # cubic family / lanczos: float weights
    if method == Interpolation.LANCZOS:
        y_idx, wy = _lanczos_axis_table(src_rows, rows)
        x_idx, wx = _lanczos_axis_table(src_cols, cols)
        k = 6
    else:
        kern = {
            Interpolation.BICUBIC: _cubic_kernel_i32,
            Interpolation.CATMULL_ROM: _catmull_kernel_i32,
            Interpolation.MITCHELL: _mitchell_kernel_i32,
        }[method]
        y_idx, wy_i = _cubic_axis_table(src_rows, rows, kern)
        x_idx, wx_i = _cubic_axis_table(src_cols, cols, kern)
        wy = wy_i.astype(np.float32) / _SCALE
        wx = wx_i.astype(np.float32) / _SCALE
        k = 4
    total = jnp.zeros((rows, cols, arr.shape[-1]), dtype=arr.dtype)
    wsum = jnp.zeros((rows, cols), dtype=arr.dtype)
    for ky in range(k):
        row_gather = _take_axis(arr, y_idx[:, ky], axis=ay)
        for kx in range(k):
            px = _take_axis(row_gather, x_idx[:, kx], axis=ax)
            w = jnp.asarray(wy[:, ky, None] * wx[None, :, kx])
            total = total + px * w[..., None]
            wsum = wsum + w
    return jnp.where(wsum[..., None] != 0, total / wsum[..., None], 0.0)


@partial(jax.jit, static_argnames=("rows", "cols", "method"))
def resize(arr, rows: int, cols: int, method=Interpolation.BILINEAR):
    """Resize a [..., H, W, C] array to [..., rows, cols, C] (leading
    dims are batch; indexing the batched array directly lowers far
    better on TPU than vmapping a per-image kernel).

    uint8 inputs use the reference's fixed-point paths (bit-exact);
    float inputs use normalized float weights.
    """
    method = Interpolation(method)
    if arr.shape[-3] == rows and arr.shape[-2] == cols:
        return arr
    if arr.dtype != jnp.uint8:
        return _resize_float(arr, rows, cols, method)
    if method == Interpolation.NEAREST:
        return _resize_nearest(arr, rows, cols)
    if method == Interpolation.BILINEAR:
        if (arr.shape[-1] in (1, 3, 4) and arr.ndim in (3, 4)
                and jax.default_backend() == "tpu"):
            # fused Pallas lowering (bit-identical; skips the NHWC
            # relayouts around the banded matmuls — ~2x on chip)
            from .pallas_pipeline import fused_ok, fused_resize_blur_oklab

            shape4 = arr.shape if arr.ndim == 4 else (1, *arr.shape)
            if fused_ok(shape4, rows, cols, oklab=False):
                out = fused_resize_blur_oklab(
                    arr.reshape(shape4), rows, cols, 0.0, oklab=False)
                return out if arr.ndim == 4 else out[0]
        return _resize_bilinear_u8(arr, rows, cols)
    if method == Interpolation.BICUBIC:
        return _resize_cubic_family_u8(arr, rows, cols, _cubic_kernel_i32)
    if method == Interpolation.CATMULL_ROM:
        return _resize_cubic_family_u8(arr, rows, cols, _catmull_kernel_i32)
    if method == Interpolation.MITCHELL:
        return _resize_cubic_family_u8(arr, rows, cols, _mitchell_kernel_i32)
    if method == Interpolation.LANCZOS:
        return _resize_lanczos_u8(arr, rows, cols)
    raise ValueError(f"unknown interpolation {method!r}")


def resize_plane_f32(arr, rows, cols, method=Interpolation.BILINEAR):
    """Resize a float [H, W] plane (adds/removes the channel axis)."""
    return _resize_float(arr[..., None], rows, cols, Interpolation(method))[..., 0]
