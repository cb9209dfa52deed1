"""Host-side u8 resize, bit-identical to the device lowerings.

Part of the transfer-aware placement layer (zignal_tpu/placement.py): when
pixel data is host-resident and the device link is a slow remote tunnel, a
one-shot CLI resize is orders of magnitude cheaper on the host than paying
the round-trip (measured: ~5-38 MB/s aggregate through the axon tunnel vs
~300+ MPix/s for the native loop below). The math replicates
ops/interpolation.py exactly — same f32 align-centers coordinates
(channel_ops.zig:144-191 semantics), 8.8 fixed-point weights with
truncation, mirror borders, >>16 truncating divide — so placement is
invisible in the output bytes.
"""

from __future__ import annotations

import numpy as np

from ..enums import Interpolation
from .interpolation import _axis_coords, resolve_index_np

__all__ = ["host_resize_u8", "HOST_METHODS"]

HOST_METHODS = (Interpolation.NEAREST, Interpolation.BILINEAR)


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
        fn = (lib.zt_resize_bilinear_u8 if method == Interpolation.BILINEAR
              else lib.zt_resize_nearest_u8)
        rc = fn(src.ctypes.data_as(ctypes.c_char_p), h, w, c,
                dst.ctypes.data_as(ctypes.c_char_p), rows, cols)
        if rc == 0:
            return dst
    if method == Interpolation.BILINEAR:
        return _bilinear_numpy(src, rows, cols)
    return _nearest_numpy(src, rows, cols)
