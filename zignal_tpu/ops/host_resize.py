"""Host-side u8 resize, bit-identical to the device lowerings.

Part of the transfer-aware placement layer (zignal_tpu/placement.py): when
pixel data is host-resident and the device link is a slow remote tunnel, a
one-shot CLI resize is orders of magnitude cheaper on the host than paying
the round-trip (measured: ~5-38 MB/s aggregate through the axon tunnel vs
~300+ MPix/s for the native loop below). The math replicates
ops/interpolation.py exactly — same f32 align-centers coordinates
(channel_ops.zig:144-191 semantics), 8.8 fixed-point weights with
truncation, mirror borders, >>16 truncating divide — so placement is
invisible in the output bytes for the integer-exact methods (nearest,
bilinear, and the cubic family). Lanczos uses float weights; the host
paths emulate an fma-contracted accumulate (native via
__builtin_fmaf, numpy via exact f64 emulation), which matches the CPU
XLA backend and SOME TPU shapes — but XLA's fma contraction on TPU is
SHAPE-DEPENDENT (audit r5: exact at 222x257->111x128, +-1 on isolated
pixels at 623x881->400x560 and ->450x520). The cross-backend Lanczos
contract is therefore +-1 with <1e-3 mismatch rate, and Image.resize
auto placement EXCLUDES Lanczos (host only under an explicit
ZT_PLACEMENT=host) so placement never changes output bytes.
"""

from __future__ import annotations

import numpy as np

from ..enums import Interpolation
from .interpolation import _axis_coords, resolve_index_np

__all__ = ["host_resize_u8", "host_resize_available",
           "HOST_METHODS", "HOST_COST"]

HOST_METHODS = (Interpolation.NEAREST, Interpolation.BILINEAR,
                Interpolation.BICUBIC, Interpolation.CATMULL_ROM,
                Interpolation.MITCHELL, Interpolation.LANCZOS)

# per-pixel work multiplier vs bilinear for the placement model
# (measured native-loop ratios; 1.92->0.48 MPix: bilinear 1.4 ms,
# cubic 21 ms, lanczos 36 ms)
HOST_COST = {
    Interpolation.NEAREST: 0.5,
    Interpolation.BILINEAR: 1.0,
    Interpolation.BICUBIC: 15.0,
    Interpolation.CATMULL_ROM: 15.0,
    Interpolation.MITCHELL: 15.0,
    Interpolation.LANCZOS: 25.0,
}


def host_resize_available(method) -> bool:
    """True when a host path worth dispatching to exists: bilinear and
    nearest always (vectorized numpy fallback is fast); the 16/36-tap
    methods only with the native library (the numpy mirrors are
    correctness oracles, ~40x slower than the C++ loops)."""
    method = Interpolation(method)
    if method not in HOST_METHODS:
        return False
    if method in (Interpolation.NEAREST, Interpolation.BILINEAR):
        return True
    from ..native import get_lib

    return get_lib() is not None


def _bilinear_numpy(src: np.ndarray, rows: int, cols: int) -> np.ndarray:
    sh, sw = src.shape[0], src.shape[1]
    _, y0, fy = _axis_coords(sh, rows)
    _, x0, fx = _axis_coords(sw, cols)
    fy_i = np.trunc(fy * np.float32(256)).astype(np.int32)[:, None, None]
    fx_i = np.trunc(fx * np.float32(256)).astype(np.int32)[None, :, None]
    ya = resolve_index_np(y0, sh)
    yb = resolve_index_np(y0 + 1, sh)
    xa = resolve_index_np(x0, sw)
    xb = resolve_index_np(x0 + 1, sw)
    t = (src[ya].astype(np.int32) * (256 - fy_i)
         + src[yb].astype(np.int32) * fy_i)
    out = (t[:, xa] * (256 - fx_i) + t[:, xb] * fx_i) >> 16
    return out.astype(np.uint8)


def _nearest_numpy(src: np.ndarray, rows: int, cols: int) -> np.ndarray:
    sh, sw = src.shape[0], src.shape[1]
    sy, _, _ = _axis_coords(sh, rows)
    sx, _, _ = _axis_coords(sw, cols)
    y = np.clip(np.floor(sy + np.float32(0.5)), 0, sh - 1).astype(np.int64)
    x = np.clip(np.floor(sx + np.float32(0.5)), 0, sw - 1).astype(np.int64)
    return src[y][:, x]


def _cubic_family_numpy(src: np.ndarray, rows: int, cols: int,
                        kernel) -> np.ndarray:
    """Exact-integer mirror of ops.interpolation._resize_cubic_family_u8
    (same tables, int64 instead of exact-int f32)."""
    from .interpolation import _SCALE, _cubic_axis_table, _trunc_div_np

    sh, sw = src.shape[0], src.shape[1]
    y_idx, wy = _cubic_axis_table(sh, rows, kernel)
    x_idx, wx = _cubic_axis_table(sw, cols, kernel)
    total = np.zeros((rows, cols, src.shape[2]), np.int64)
    wsum = np.zeros((rows, cols), np.int64)
    s64 = src.astype(np.int64)
    for ky in range(4):
        rowg = s64[y_idx[:, ky]]
        for kx in range(4):
            px = rowg[:, x_idx[:, kx]]
            w = _trunc_div_np(
                wy[:, ky, None].astype(np.int64) * wx[None, :, kx], _SCALE)
            total += px * w[..., None]
            wsum += w
    q = _trunc_div_np(total, np.where(wsum == 0, 1, wsum)[..., None])
    out = np.where(wsum[..., None] != 0, q, 0)
    return np.clip(out, 0, 255).astype(np.uint8)


def _lanczos_numpy(src: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Mirror of ops.interpolation._resize_lanczos_u8 reproducing XLA's
    lowering exactly: the weight product is a single-rounded f32 mul,
    and the accumulate is an fma (XLA contracts ``total + px * w``).
    numpy has no vectorized fmaf, so the fma is emulated through f64 —
    the f64 product of two f32 is exact and the add rounds once, which
    equals fmaf except for double-rounding ties (~2^-29 per op,
    never observed in the parity sweep)."""
    from .interpolation import _lanczos_axis_table

    sh, sw = src.shape[0], src.shape[1]
    y_idx, wy = _lanczos_axis_table(sh, rows)
    x_idx, wx = _lanczos_axis_table(sw, cols)
    total = np.zeros((rows, cols, src.shape[2]), np.float64)
    wsum = np.zeros((rows, cols), np.float32)
    sf = src.astype(np.float64)
    for ky in range(6):
        rowg = sf[y_idx[:, ky]]
        for kx in range(6):
            px = rowg[:, x_idx[:, kx]]
            w = wy[:, ky, None] * wx[None, :, kx]  # f32 rounded mul
            # fmaf(px, w, total): f64 product is exact; round once
            total = (px * w[..., None].astype(np.float64)
                     + total).astype(np.float32).astype(np.float64)
            wsum = wsum + w
    total = total.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(wsum[..., None] != 0, total / wsum[..., None],
                       np.float32(0.0))
    return np.clip(np.floor(out + np.float32(0.5)), 0, 255).astype(np.uint8)


def host_resize_u8(src: np.ndarray, rows: int, cols: int,
                   method=Interpolation.BILINEAR) -> np.ndarray:
    """Resize a [H, W, C] uint8 array on the host; bit-identical to
    ops.interpolation.resize for the supported methods."""
    method = Interpolation(method)
    if method not in HOST_METHODS:
        raise ValueError(f"host resize does not support {method!r}")
    src = np.ascontiguousarray(src)
    if src.dtype != np.uint8 or src.ndim != 3:
        raise ValueError("host_resize_u8 expects a uint8 [H, W, C] array")
    h, w, c = src.shape
    from ..native import get_lib

    lib = get_lib()
    if lib is not None and 1 <= c <= 4:
        import ctypes

        dst = np.empty((rows, cols, c), dtype=np.uint8)
        if method in (Interpolation.BILINEAR, Interpolation.NEAREST):
            fn = (lib.zt_resize_bilinear_u8
                  if method == Interpolation.BILINEAR
                  else lib.zt_resize_nearest_u8)
            rc = fn(src.ctypes.data_as(ctypes.c_char_p), h, w, c,
                    dst.ctypes.data_as(ctypes.c_char_p), rows, cols)
            if rc == 0:
                return dst
        elif method == Interpolation.LANCZOS:
            from .interpolation import _lanczos_axis_table

            y_idx, wy = _lanczos_axis_table(h, rows)
            x_idx, wx = _lanczos_axis_table(w, cols)
            y_idx = np.ascontiguousarray(y_idx, np.int32)
            x_idx = np.ascontiguousarray(x_idx, np.int32)
            wy = np.ascontiguousarray(wy, np.float32)
            wx = np.ascontiguousarray(wx, np.float32)
            rc = lib.zt_resize_lanczos_u8(
                src.ctypes.data_as(ctypes.c_char_p), h, w, c,
                dst.ctypes.data_as(ctypes.c_char_p), rows, cols,
                y_idx.ctypes.data, wy.ctypes.data,
                x_idx.ctypes.data, wx.ctypes.data)
            if rc == 0:
                return dst
        else:
            from .interpolation import (_catmull_kernel_i32,
                                        _cubic_axis_table,
                                        _cubic_kernel_i32,
                                        _mitchell_kernel_i32)

            kern = {Interpolation.BICUBIC: _cubic_kernel_i32,
                    Interpolation.CATMULL_ROM: _catmull_kernel_i32,
                    Interpolation.MITCHELL: _mitchell_kernel_i32}[method]
            y_idx, wy = _cubic_axis_table(h, rows, kern)
            x_idx, wx = _cubic_axis_table(w, cols, kern)
            y_idx = np.ascontiguousarray(y_idx, np.int32)
            x_idx = np.ascontiguousarray(x_idx, np.int32)
            wy = np.ascontiguousarray(wy, np.int32)
            wx = np.ascontiguousarray(wx, np.int32)
            rc = lib.zt_resize_cubic_u8(
                src.ctypes.data_as(ctypes.c_char_p), h, w, c,
                dst.ctypes.data_as(ctypes.c_char_p), rows, cols,
                y_idx.ctypes.data, wy.ctypes.data,
                x_idx.ctypes.data, wx.ctypes.data)
            if rc == 0:
                return dst
    if method == Interpolation.BILINEAR:
        return _bilinear_numpy(src, rows, cols)
    if method == Interpolation.NEAREST:
        return _nearest_numpy(src, rows, cols)
    if method == Interpolation.LANCZOS:
        return _lanczos_numpy(src, rows, cols)
    from .interpolation import (_catmull_kernel_i32, _cubic_kernel_i32,
                                _mitchell_kernel_i32)

    kern = {Interpolation.BICUBIC: _cubic_kernel_i32,
            Interpolation.CATMULL_ROM: _catmull_kernel_i32,
            Interpolation.MITCHELL: _mitchell_kernel_i32}[method]
    return _cubic_family_numpy(src, rows, cols, kern)
