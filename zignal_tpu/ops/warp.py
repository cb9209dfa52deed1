"""Runtime-coordinate sampling and geometric warps.

One device kernel — inverse-map + interpolate — serves rotate, extract,
insert, and warp (SURVEY.md L4 "Geometric transforms"; reference:
src/image/transforms.zig, src/image/interpolation.zig:306-430).

Unlike resize (whose coordinates are trace-time constants), these sample
at coordinates computed on device from a transform matrix, so border
resolution and filter weights are computed on device too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import BorderMode, Interpolation

__all__ = ["sample", "rotate", "rotate_bounds", "extract", "insert_region", "warp"]


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _resolve_dev(idx, length: int, border: BorderMode):
    """Device version of border.resolveIndex. Returns (index, valid)."""
    inside = (idx >= 0) & (idx < length)
    if border == BorderMode.ZERO:
        return jnp.clip(idx, 0, length - 1), inside
    if border == BorderMode.REPLICATE:
        return jnp.clip(idx, 0, length - 1), jnp.ones_like(inside)
    if border == BorderMode.MIRROR:
        if length == 1:
            return jnp.zeros_like(idx), jnp.ones_like(inside)
        period = 2 * (length - 1)
        m = jnp.remainder(idx, period)
        return jnp.where(m >= length, period - m, m), jnp.ones_like(inside)
    if border == BorderMode.WRAP:
        return jnp.remainder(idx, length), jnp.ones_like(inside)
    raise ValueError(f"unknown border mode {border!r}")


def _gather2d(arr, ry, cx):
    """arr [H,W,C]; ry/cx int32 of shape S -> [*S, C].

    Linearized take — measurably faster than 2-D advanced indexing on
    TPU (11.8 vs 14.6 ms per 1 Mpix gather); true random access has no
    faster lowering on this hardware."""
    w = arr.shape[1]
    flat = arr.reshape(-1, arr.shape[-1])
    lin = (ry * w + cx).reshape(-1)
    return jnp.take(flat, lin, axis=0).reshape(*ry.shape, arr.shape[-1])


def _gather2d_4(arr, rys, cxs):
    """Four corner gathers fused into one take (one gather dispatch
    instead of four). rys/cxs: 4-tuples of index arrays of shape S.
    Returns a list of four [*S, C] arrays."""
    w = arr.shape[1]
    flat = arr.reshape(-1, arr.shape[-1])
    lin = jnp.stack([(ry * w + cx).reshape(-1)
                     for ry, cx in zip(rys, cxs)])
    out = jnp.take(flat, lin.reshape(-1), axis=0)
    out = out.reshape(4, -1, arr.shape[-1])
    shape = (*rys[0].shape, arr.shape[-1])
    return [out[i].reshape(shape) for i in range(4)]


def _cubic_kernel_f32(t):
    """a=-1 bicubic (interpolation.zig:221-229)."""
    at = jnp.abs(t)
    w1 = 1 - 2 * at * at + at * at * at
    w2 = 4 - 8 * at + 5 * at * at - at * at * at
    return jnp.where(at <= 1, w1, jnp.where(at <= 2, w2, 0.0))


def _catmull_kernel_f32(t):
    at = jnp.abs(t)
    w1 = 1.5 * at**3 - 2.5 * at**2 + 1
    w2 = -0.5 * at**3 + 2.5 * at**2 - 4 * at + 2
    return jnp.where(at <= 1, w1, jnp.where(at <= 2, w2, 0.0))


def _mitchell_kernel_f32(t, b=1.0 / 3.0, c=1.0 / 3.0):
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = ((12 - 9 * b - 6 * c) * at3 + (-18 + 12 * b + 6 * c) * at2
          + (6 - 2 * b)) / 6.0
    w2 = ((-b - 6 * c) * at3 + (6 * b + 30 * c) * at2
          + (-12 * b - 48 * c) * at + (8 * b + 24 * c)) / 6.0
    return jnp.where(at < 1, w1, jnp.where(at < 2, w2, 0.0))


def _build_lanczos3_lut() -> np.ndarray:
    """The reference's comptime 1025-entry Lanczos3 table
    (interpolation.zig:256-267), replicated in numpy f32."""
    step = np.float32(1024.0) / np.float32(3.0)
    x = np.arange(1025, dtype=np.float32) / step
    pi_x = np.float32(np.pi) * x
    with np.errstate(invalid="ignore", divide="ignore"):
        val = (np.float32(3.0) * np.sin(pi_x) * np.sin(pi_x / np.float32(3.0))
               / (pi_x * pi_x))
    val = np.where(x == 0, np.float32(1.0), val)
    return np.where(np.abs(x) >= 3.0, np.float32(0.0), val).astype(np.float32)


_LANCZOS3_LUT = _build_lanczos3_lut()


def _lanczos3_kernel_f32(t):
    """LUT + linear interpolation, matching the reference's
    lanczos3KernelLut (interpolation.zig:270-281) — per-pixel sampling in
    the reference reads the table rather than evaluating the sinc
    directly, and the two differ by up to ~3e-4, enough to flip u8
    rounding. (Resize is unaffected: the reference's resize builds its
    weights from the direct kernel, as does ops/interpolation.py.)
    Table values may differ from Zig's comptime sin by float ulps."""
    at = jnp.abs(t)
    step = np.float32(1024.0 / 3.0)
    pos = at * step
    idx = jnp.clip(jnp.trunc(pos), 0, 1023).astype(jnp.int32)
    frac = pos - idx.astype(jnp.float32)
    lut = jnp.asarray(_LANCZOS3_LUT)
    v0 = jnp.take(lut, idx)
    v1 = jnp.take(lut, idx + 1)
    val = v0 * (1.0 - frac) + v1 * frac
    return jnp.where(at >= 3.0, 0.0, val)


_KERNELS = {
    Interpolation.BICUBIC: (_cubic_kernel_f32, 2),
    Interpolation.CATMULL_ROM: (_catmull_kernel_f32, 2),
    Interpolation.MITCHELL: (_mitchell_kernel_f32, 2),
    Interpolation.LANCZOS: (_lanczos3_kernel_f32, 3),
}


def _bilinear_blend(tl, tr, bl, br, fx, fy, dtype, valid=None):
    """The shared bilinear blend, expression-identical to the original
    4-tap formulation so every lowering of the tap gather stays
    bit-compatible. u8 rides exact fixed-point in f32: all terms are
    non-negative integers and acc <= 255*2^16 + 2^15 < 2^24, so f32
    mul/add and the trunc-divide by 2^16 are exact (int32 muls are
    emulated on the TPU VPU); bit-identical to the int32 formulation."""
    if dtype == jnp.uint8:
        fxi = jnp.trunc(_round_half_away(fx * 256.0))[..., None]
        fyi = jnp.trunc(_round_half_away(fy * 256.0))[..., None]
        topv = tl.astype(jnp.float32) * (256 - fxi) \
            + tr.astype(jnp.float32) * fxi
        botv = bl.astype(jnp.float32) * (256 - fxi) \
            + br.astype(jnp.float32) * fxi
        acc = topv * (256 - fyi) + botv * fyi + (256 * 256 // 2)
        q = jnp.clip(jnp.trunc(acc * (1.0 / (256 * 256))),
                     0, 255).astype(jnp.uint8)
        return q if valid is None else jnp.where(valid[..., None], q, 0)
    fxv = fx[..., None]
    fyv = fy[..., None]
    out = ((1 - fyv) * ((1 - fxv) * tl + fxv * tr)
           + fyv * ((1 - fxv) * bl + fxv * br)).astype(dtype)
    return out if valid is None else jnp.where(valid[..., None], out, 0)


def _bilinear_generic_rt(arr, xs, ys, border: BorderMode):
    """Original runtime bilinear: four per-tap resolved gathers fused
    into one 4N-row take, each tap masked by its own validity."""
    h, w = arr.shape[0], arr.shape[1]
    left = jnp.floor(xs)
    top = jnp.floor(ys)
    fx = xs - left
    fy = ys - top
    l_i = left.astype(jnp.int32)
    t_i = top.astype(jnp.int32)
    c0, vc0 = _resolve_dev(l_i, w, border)
    c1, vc1 = _resolve_dev(l_i + 1, w, border)
    r0, vr0 = _resolve_dev(t_i, h, border)
    r1, vr1 = _resolve_dev(t_i + 1, h, border)
    g = _gather2d_4(arr, (r0, r0, r1, r1), (c0, c1, c0, c1))
    if arr.dtype == jnp.uint8:
        tl = g[0].astype(jnp.float32) * (vr0 & vc0)[..., None]
        tr = g[1].astype(jnp.float32) * (vr0 & vc1)[..., None]
        bl = g[2].astype(jnp.float32) * (vr1 & vc0)[..., None]
        br = g[3].astype(jnp.float32) * (vr1 & vc1)[..., None]
    else:
        tl = g[0] * (vr0 & vc0)[..., None]
        tr = g[1] * (vr0 & vc1)[..., None]
        bl = g[2] * (vr1 & vc0)[..., None]
        br = g[3] * (vr1 & vc1)[..., None]
    return _bilinear_blend(tl, tr, bl, br, fx, fy, arr.dtype)


def _bilinear_patch_rt(arr, xs, ys, border: BorderMode):
    """Runtime bilinear with ONE gathered [*, 4C] patch row per output
    pixel — 4x fewer gather rows than _bilinear_generic_rt, same trick
    as the static-warp packed-patch path but for data-dependent coords.

    ZERO/REPLICATE: anchors clamp to [-1, n-1] and index a border-
    pre-resolved +1-pad patch (clamping is exact: under ZERO anything
    further out is fully invalid and masked to 0; under REPLICATE both
    taps of any out-of-range anchor resolve to the same edge pixel the
    clamped anchor's pad/edge pair holds). WRAP: anchors remap by
    modulo, the pad column/row holding resolve(n) = 0. MIRROR
    (reflect-101) cannot remap — reflection flips tap adjacency — but
    its two resolved taps are ALWAYS adjacent (ascending or
    descending), so min-anchor + per-axis swap selects pick the four
    taps out of one unpadded patch row. Tap values are exact u8/f32
    pixels feeding _bilinear_blend's unchanged expressions, so every
    border mode stays bit-identical to the generic path (oracle test
    in tests/test_transforms.py)."""
    h, w = arr.shape[0], arr.shape[1]
    c = arr.shape[2]
    left = jnp.floor(xs)
    top = jnp.floor(ys)
    fx = xs - left
    fy = ys - top
    l_i = left.astype(jnp.int32)
    t_i = top.astype(jnp.int32)

    if border == BorderMode.MIRROR:
        c0, _ = _resolve_dev(l_i, w, border)
        c1, _ = _resolve_dev(l_i + 1, w, border)
        r0, _ = _resolve_dev(t_i, h, border)
        r1, _ = _resolve_dev(t_i + 1, h, border)
        ax = jnp.minimum(c0, c1)
        ay = jnp.minimum(r0, r1)
        patch = jnp.concatenate([arr[:-1, :-1], arr[:-1, 1:],
                                 arr[1:, :-1], arr[1:, 1:]], axis=-1)
        lin = (ay * (w - 1) + ax).reshape(-1)
        g = jnp.take(patch.reshape(-1, 4 * c), lin, axis=0)
        g = g.reshape(*l_i.shape, 2, 2, c)
        swx = (c0 > c1)[..., None]
        swy = (r0 > r1)[..., None]
        row0 = jnp.where(swy[..., None], g[..., 1, :, :], g[..., 0, :, :])
        row1 = jnp.where(swy[..., None], g[..., 0, :, :], g[..., 1, :, :])
        tl = jnp.where(swx, row0[..., 1, :], row0[..., 0, :])
        tr = jnp.where(swx, row0[..., 0, :], row0[..., 1, :])
        bl = jnp.where(swx, row1[..., 1, :], row1[..., 0, :])
        br = jnp.where(swx, row1[..., 0, :], row1[..., 1, :])
        return _bilinear_blend(tl, tr, bl, br, fx, fy, arr.dtype)

    a_pad = _pad1(arr, border)
    patch = jnp.concatenate([a_pad[:-1, :-1], a_pad[:-1, 1:],
                             a_pad[1:, :-1], a_pad[1:, 1:]], axis=-1)
    if border == BorderMode.WRAP:
        pl = jnp.remainder(l_i, w) + 1
        pt = jnp.remainder(t_i, h) + 1
        valid = None
    else:
        pl = jnp.clip(l_i, -1, w - 1) + 1
        pt = jnp.clip(t_i, -1, h - 1) + 1
        valid = ((l_i >= -1) & (l_i <= w - 1) & (t_i >= -1) & (t_i <= h - 1)
                 if border == BorderMode.ZERO else None)
    lin = (pt * (w + 1) + pl).reshape(-1)
    g = jnp.take(patch.reshape(-1, 4 * c), lin, axis=0)
    g = g.reshape(*l_i.shape, 4, c)
    return _bilinear_blend(g[..., 0, :], g[..., 1, :], g[..., 2, :],
                           g[..., 3, :], fx, fy, arr.dtype, valid)


@partial(jax.jit, static_argnames=("method", "border"))
def sample(arr, xs, ys, method=Interpolation.BILINEAR,
           border: BorderMode = BorderMode.ZERO):
    """Point-sample [H, W, C] at runtime float coords; OOB yields zeros
    under ZERO border (reference: interpolation.zig interpolate*)."""
    method = Interpolation(method)
    border = BorderMode(border)
    h, w = arr.shape[0], arr.shape[1]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    if method == Interpolation.NEAREST:
        cx = _round_half_away(xs).astype(jnp.int32)
        ry = _round_half_away(ys).astype(jnp.int32)
        cxr, vx = _resolve_dev(cx, w, border)
        ryr, vy = _resolve_dev(ry, h, border)
        out = _gather2d(arr, ryr, cxr)
        valid = (vx & vy)[..., None]
        return jnp.where(valid, out, 0).astype(arr.dtype)

    if method == Interpolation.BILINEAR:
        import os

        # packed-patch runtime path: one gathered [*, 4C] row per output
        # pixel instead of four rows (gather cost is per ROW — CLAUDE.md
        # gather roofline). Worth the 4x-image-bytes patch build only
        # when the sample set is a sizable fraction of the image.
        if (os.environ.get("ZT_WARP_PATCH_RT", "1") != "0"
                and arr.shape[2] <= 8 and h >= 2 and w >= 2
                and int(np.prod(xs.shape)) * 8 >= h * w):
            return _bilinear_patch_rt(arr, xs, ys, border)
        return _bilinear_generic_rt(arr, xs, ys, border)

    # kernel-based: f32 weights normalized by the sum of in-bounds weights
    kernel_fn, radius = _KERNELS[method]
    ix = jnp.floor(xs)
    iy = jnp.floor(ys)
    fx = xs - ix
    fy = ys - iy
    ix_i = ix.astype(jnp.int32)
    iy_i = iy.astype(jnp.int32)
    win = radius * 2
    a = arr.astype(jnp.float32)

    total = 0.0
    wsum = 0.0
    for j in range(win):
        off_j = j - (radius - 1)
        ry, vy = _resolve_dev(iy_i + off_j, h, border)
        wy = kernel_fn(off_j - fy)
        for i in range(win):
            off_i = i - (radius - 1)
            cx, vx = _resolve_dev(ix_i + off_i, w, border)
            wx = kernel_fn(off_i - fx)
            wgt = wx * wy * (vx & vy)
            px = _gather2d(a, ry, cx)
            total = total + px * wgt[..., None]
            wsum = wsum + wgt
    val = jnp.where(wsum[..., None] != 0, total / wsum[..., None], 0.0)
    if arr.dtype == jnp.uint8:
        return jnp.clip(_round_half_away(val), 0, 255).astype(jnp.uint8)
    return val.astype(arr.dtype)


def _res_np(idx, n: int, border: BorderMode):
    """numpy replica of _resolve_dev: (in-range index, valid mask)."""
    from .interpolation import resolve_index_np

    r = resolve_index_np(idx, n, border)
    if border == BorderMode.ZERO:
        return np.clip(idx, 0, n - 1).astype(np.int64), r >= 0
    return r.astype(np.int64), np.ones(r.shape, bool)


def _rha_np(x):
    """numpy replica of _round_half_away (f32)."""
    return (np.sign(x) * np.floor(np.abs(x) + np.float32(0.5))).astype(np.float32)


def _pad1(arr, border: BorderMode):
    """arr [H, W, C] extended by ONE border-resolved pixel per side:
    a_pad[i+1, j+1] = arr[i, j]; the frame rows/cols hold the resolved
    values of index -1 and n (zeros under ZERO). Any bilinear anchor
    with raw index in [-1, n-1] then has its 2x2 neighborhood at
    CONSECUTIVE physical positions of a_pad, which is what lets
    _sample_tile_patch pack all four taps into one gathered row."""
    from .interpolation import resolve_index_np

    h, w = arr.shape[0], arr.shape[1]
    if border == BorderMode.ZERO:
        return jnp.pad(arr, ((1, 1), (1, 1), (0, 0)))
    lw = int(resolve_index_np(np.int64(-1), w, border))
    rw = int(resolve_index_np(np.int64(w), w, border))
    cols = jnp.concatenate(
        [arr[:, lw:lw + 1], arr, arr[:, rw:rw + 1]], axis=1)
    lh = int(resolve_index_np(np.int64(-1), h, border))
    rh = int(resolve_index_np(np.int64(h), h, border))
    return jnp.concatenate(
        [cols[lh:lh + 1], cols, cols[rh:rh + 1]], axis=0)


def _sample_tile_patch(a_pad, l_i, t_i, fx, fy, dtype, c):
    """Bilinear tile whose raw anchors all sit in [-1, n-1]: the four
    taps of anchor (t, l) live at (t+1..t+2, l+1..l+2) of the
    pre-resolved a_pad, so they pack into ONE [*, 4C] patch row — 4x
    fewer gather rows than the generic 4-tap path, and gather cost is
    per ROW (CLAUDE.md gather roofline / radial-blur playbook). Blend
    math is expression-identical to _sample_tile, so outputs match it
    bit-for-bit (ZERO-border OOB taps read literal zeros from the pad,
    which equals the generic path's mask-multiply)."""
    th, tw = l_i.shape
    pt = t_i + 1
    pl = l_i + 1
    by0, by1 = int(pt.min()), int(pt.max()) + 2
    bx0, bx1 = int(pl.min()), int(pl.max()) + 2
    box = jax.lax.slice(a_pad, (by0, bx0, 0), (by1, bx1, c))
    patch = jnp.concatenate([box[:-1, :-1], box[:-1, 1:],
                             box[1:, :-1], box[1:, 1:]], axis=-1)
    bw = bx1 - bx0 - 1
    lin = (pt - by0) * bw + (pl - bx0)
    g = jnp.take(patch.reshape(-1, 4 * c), jnp.asarray(lin.reshape(-1)),
                 axis=0).reshape(th, tw, 4, c)
    if dtype == jnp.uint8:
        fxi = jnp.asarray(np.trunc(_rha_np(fx * np.float32(256.0))))[..., None]
        fyi = jnp.asarray(np.trunc(_rha_np(fy * np.float32(256.0))))[..., None]
        gf = g.astype(jnp.float32)
        topv = gf[..., 0, :] * (256 - fxi) + gf[..., 1, :] * fxi
        botv = gf[..., 2, :] * (256 - fxi) + gf[..., 3, :] * fxi
        acc = topv * (256 - fyi) + botv * fyi + (256 * 256 // 2)
        return jnp.clip(jnp.trunc(acc * (1.0 / (256 * 256))),
                        0, 255).astype(jnp.uint8)
    fxv = jnp.asarray(fx)[..., None]
    fyv = jnp.asarray(fy)[..., None]
    return ((1 - fyv) * ((1 - fxv) * g[..., 0, :] + fxv * g[..., 1, :])
            + fyv * ((1 - fxv) * g[..., 2, :] + fxv * g[..., 3, :])
            ).astype(dtype)


def _sample_tile(arr, xs, ys, method, border, a_pad=None):
    """One output tile sampled from its (static) source bounding box via
    a single fused take — the box fits VMEM, where random access is ~8x
    faster than HBM gathers. Bit-identical to sample()."""
    h, w = arr.shape[0], arr.shape[1]
    c = arr.shape[2]
    th, tw = xs.shape

    if method == Interpolation.NEAREST:
        cx = _rha_np(xs).astype(np.int64)
        ry = _rha_np(ys).astype(np.int64)
        cxr, vx = _res_np(cx, w, border)
        ryr, vy = _res_np(ry, h, border)
        rows_idx, cols_idx = (ryr, cxr)
        by0, by1 = int(rows_idx.min()), int(rows_idx.max()) + 1
        bx0, bx1 = int(cols_idx.min()), int(cols_idx.max()) + 1
        box = jax.lax.slice(arr, (by0, bx0, 0), (by1, bx1, c))
        lin = (rows_idx - by0) * (bx1 - bx0) + (cols_idx - bx0)
        out = jnp.take(box.reshape(-1, c), jnp.asarray(lin.reshape(-1)),
                       axis=0).reshape(th, tw, c)
        valid = jnp.asarray((vx & vy)[..., None])
        return jnp.where(valid, out, 0).astype(arr.dtype)

    # bilinear
    left = np.floor(xs.astype(np.float32))
    top = np.floor(ys.astype(np.float32))
    fx = (xs - left).astype(np.float32)
    fy = (ys - top).astype(np.float32)
    l_i = left.astype(np.int64)
    t_i = top.astype(np.int64)
    if (a_pad is not None and l_i.min() >= -1 and l_i.max() <= w - 1
            and t_i.min() >= -1 and t_i.max() <= h - 1):
        # all anchors within one step of the frame: packed-patch path
        return _sample_tile_patch(a_pad, l_i, t_i, fx, fy, arr.dtype, c)
    c0, vc0 = _res_np(l_i, w, border)
    c1, vc1 = _res_np(l_i + 1, w, border)
    r0, vr0 = _res_np(t_i, h, border)
    r1, vr1 = _res_np(t_i + 1, h, border)
    by0 = int(min(r0.min(), r1.min()))
    by1 = int(max(r0.max(), r1.max())) + 1
    bx0 = int(min(c0.min(), c1.min()))
    bx1 = int(max(c0.max(), c1.max())) + 1
    bw = bx1 - bx0
    box = jax.lax.slice(arr, (by0, bx0, 0), (by1, bx1, c))
    lin = np.stack([
        (r0 - by0) * bw + (c0 - bx0), (r0 - by0) * bw + (c1 - bx0),
        (r1 - by0) * bw + (c0 - bx0), (r1 - by0) * bw + (c1 - bx0),
    ])
    g = jnp.take(box.reshape(-1, c), jnp.asarray(lin.reshape(-1)),
                 axis=0).reshape(4, th, tw, c)
    m00 = jnp.asarray((vr0 & vc0)[..., None])
    m01 = jnp.asarray((vr0 & vc1)[..., None])
    m10 = jnp.asarray((vr1 & vc0)[..., None])
    m11 = jnp.asarray((vr1 & vc1)[..., None])
    if arr.dtype == jnp.uint8:
        fxi = jnp.asarray(np.trunc(_rha_np(fx * np.float32(256.0))))[..., None]
        fyi = jnp.asarray(np.trunc(_rha_np(fy * np.float32(256.0))))[..., None]
        tl = g[0].astype(jnp.float32) * m00
        tr = g[1].astype(jnp.float32) * m01
        bl = g[2].astype(jnp.float32) * m10
        br = g[3].astype(jnp.float32) * m11
        topv = tl * (256 - fxi) + tr * fxi
        botv = bl * (256 - fxi) + br * fxi
        acc = topv * (256 - fyi) + botv * fyi + (256 * 256 // 2)
        return jnp.clip(jnp.trunc(acc * (1.0 / (256 * 256))),
                        0, 255).astype(jnp.uint8)
    tl = g[0] * m00
    tr = g[1] * m01
    bl = g[2] * m10
    br = g[3] * m11
    fxv = jnp.asarray(fx)[..., None]
    fyv = jnp.asarray(fy)[..., None]
    return ((1 - fyv) * ((1 - fxv) * tl + fxv * tr)
            + fyv * ((1 - fxv) * bl + fxv * br)).astype(arr.dtype)


def _sample_static(arr, xs, ys, method, border, tile: int = 256):
    """sample() for trace-time numpy f32 coordinates, tile-decomposed so
    each tile's gather operand is its small source bounding box."""
    method = Interpolation(method)
    border = BorderMode(border)
    oh, ow = xs.shape
    if (method not in (Interpolation.NEAREST, Interpolation.BILINEAR)
            or oh * ow > (1 << 22)):
        return sample(arr, jnp.asarray(xs), jnp.asarray(ys), method, border)
    import os

    a_pad = (_pad1(arr, border)
             if method == Interpolation.BILINEAR
             and os.environ.get("ZT_WARP_PATCH", "1") != "0" else None)
    out_rows = []
    for i0 in range(0, oh, tile):
        row = []
        for j0 in range(0, ow, tile):
            row.append(_sample_tile(
                arr, xs[i0:i0 + tile, j0:j0 + tile],
                ys[i0:i0 + tile, j0:j0 + tile], method, border, a_pad))
        out_rows.append(row[0] if len(row) == 1
                        else jnp.concatenate(row, axis=1))
    return out_rows[0] if len(out_rows) == 1 \
        else jnp.concatenate(out_rows, axis=0)


def rotate_bounds(rows: int, cols: int, angle: float):
    """Output size for auto-sized rotation (transforms.zig:112-149)."""
    f32 = np.float32
    tau = 2 * np.pi
    na = float(np.mod(angle, tau))
    eps = 1e-6
    if abs(na) < eps or abs(na - tau) < eps or abs(na - np.pi) < eps:
        return rows, cols
    if abs(na - np.pi / 2) < eps or abs(na - 3 * np.pi / 2) < eps:
        return cols, rows
    cos_abs = abs(float(np.cos(f32(angle))))
    sin_abs = abs(float(np.sin(f32(angle))))
    new_w = cols * cos_abs + rows * sin_abs
    new_h = rows * cos_abs + cols * sin_abs
    return int(np.ceil(f32(new_h))), int(np.ceil(f32(new_w)))


@partial(jax.jit, static_argnames=("angle", "method", "border", "out_rows", "out_cols"))
def rotate(arr, angle: float, out_rows: int, out_cols: int,
           method=Interpolation.BILINEAR, border=BorderMode.ZERO):
    """Rotate around center into an (out_rows, out_cols) canvas
    (reference: transforms.zig:163-213)."""
    h, w = arr.shape[0], arr.shape[1]
    tau = 2 * np.pi
    na = float(np.mod(angle, tau))
    eps = 1e-6
    if abs(na) < eps or abs(na - tau) < eps:
        return arr
    if abs(na - np.pi / 2) < eps:
        return jnp.rot90(arr, k=1, axes=(0, 1))
    if abs(na - np.pi) < eps:
        return arr[::-1, ::-1]
    if abs(na - 3 * np.pi / 2) < eps:
        return jnp.rot90(arr, k=-1, axes=(0, 1))

    # angle is static, so the coordinates are trace-time numpy f32
    # (bit-identical elementwise ops) -> tile-decomposed sampling
    cx = np.float32(w) / 2.0
    cy = np.float32(h) / 2.0
    off_x = (np.float32(out_cols) - np.float32(w)) / 2.0
    off_y = (np.float32(out_rows) - np.float32(h)) / 2.0
    cos = np.float32(np.cos(np.float32(angle)))
    sin = np.float32(np.sin(np.float32(angle)))
    ys, xs = np.meshgrid(
        np.arange(out_rows, dtype=np.float32),
        np.arange(out_cols, dtype=np.float32),
        indexing="ij",
    )
    dx = (xs - np.float32(cx + off_x)).astype(np.float32)
    dy = (ys - np.float32(cy + off_y)).astype(np.float32)
    src_x = (cos * dx - sin * dy + cx).astype(np.float32)
    src_y = (sin * dx + cos * dy + cy).astype(np.float32)
    return _sample_static(arr, src_x, src_y, method, border)


@partial(jax.jit, static_argnames=("method", "border", "out_rows", "out_cols",
                                   "rect", "angle"))
def extract(arr, rect: tuple, angle: float, out_rows: int, out_cols: int,
            method=Interpolation.BILINEAR, border=BorderMode.ZERO):
    """Sample a rotated rect (l,t,r,b) into [out_rows, out_cols]
    (reference: transforms.zig:231-283)."""
    l, t, r, b = (np.float32(v) for v in rect)
    width = r - l
    height = b - t
    cx = (l + r) * np.float32(0.5)
    cy = (t + b) * np.float32(0.5)
    cos = np.float32(np.cos(np.float32(angle)))
    sin = np.float32(np.sin(np.float32(angle)))

    # rect/angle are static -> trace-time numpy f32 coords, tiled sampling
    ty = (np.arange(out_rows, dtype=np.float32) / np.float32(out_rows - 1)
          if out_rows > 1 else np.full((1,), 0.5, np.float32))
    tx = (np.arange(out_cols, dtype=np.float32) / np.float32(out_cols - 1)
          if out_cols > 1 else np.full((1,), 0.5, np.float32))
    y_rect = (t + ty * height).astype(np.float32)
    x_rect = (l + tx * width).astype(np.float32)
    yg, xg = np.meshgrid(y_rect, x_rect, indexing="ij")
    dx = (xg - cx).astype(np.float32)
    dy = (yg - cy).astype(np.float32)
    src_x = (cx + cos * dx - sin * dy).astype(np.float32)
    src_y = (cy + sin * dx + cos * dy).astype(np.float32)
    return _sample_static(arr, src_x, src_y, method, border)


@partial(jax.jit, static_argnames=("method", "out_rows", "out_cols"))
def warp(arr, matrix, out_rows: int, out_cols: int,
         method=Interpolation.BILINEAR):
    """Backward-map through a 3x3 homogeneous transform (x, y, 1) order
    with MIRROR sampling (reference: transforms.zig:522-533)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(out_rows, dtype=jnp.float32),
        jnp.arange(out_cols, dtype=jnp.float32),
        indexing="ij",
    )
    m = jnp.asarray(matrix, dtype=jnp.float32)
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    sw = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    sw = jnp.where(sw == 0, 1.0, sw)
    return sample(arr, sx / sw, sy / sw, method, BorderMode.MIRROR)


@partial(jax.jit, static_argnames=("matrix", "out_rows", "out_cols",
                                   "method"))
def warp_static(arr, matrix, out_rows: int, out_cols: int,
                method=Interpolation.BILINEAR):
    """warp() for a trace-time matrix (hashable tuple-of-tuples of
    floats, e.g. from Transform.homogeneous().tolist()).

    The backward-mapped coordinates are computed in numpy f32 — the
    bit-faithful twin of the reference's scalar f32 loop
    (transforms.zig:522-533; numpy never fma-contracts, unlike the
    device coord math, which can flip floor() at rare pixels) — and
    sampled on the tiled static path with packed-patch gathers
    (~4-15x the runtime-gather warp; CLAUDE.md gather roofline).
    Image.warp / ImageBatch.warp route here because transform objects
    are always host data; the runtime warp() above remains for traced
    matrices and for kernel interpolation methods (whose coords would
    otherwise embed as megapixel HLO constants)."""
    ys, xs = np.meshgrid(np.arange(out_rows, dtype=np.float32),
                         np.arange(out_cols, dtype=np.float32),
                         indexing="ij")
    m = np.asarray(matrix, dtype=np.float32)
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    sw = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    sw = np.where(sw == 0, np.float32(1.0), sw)
    return _sample_static(arr, (sx / sw).astype(np.float32),
                          (sy / sw).astype(np.float32), method,
                          BorderMode.MIRROR)


def insert_region(arr, source, rect: tuple, angle: float,
                  method=Interpolation.BILINEAR, blend_mode=0):
    """Insert `source` into `arr` at a rotated rect; returns new array
    (reference: transforms.zig:293-380). Both channel-last uint8 with the
    same channel count (dtype conversion happens in the Image layer)."""
    import jax.numpy as jnp

    h, w = arr.shape[0], arr.shape[1]
    sh, sw = source.shape[0], source.shape[1]
    l, t, r, b = (float(v) for v in rect)
    width = r - l
    height = b - t
    cx = (l + r) * 0.5
    cy = (t + b) * 0.5
    cos = float(np.cos(np.float32(angle)))
    sin = float(np.sin(np.float32(angle)))

    # static rect/angle -> trace-time numpy f32 coords (python-float
    # scalars cast to f32 first, matching jnp's weak-type promotion),
    # tile-decomposed sampling of the source
    f32 = np.float32
    ys, xs = np.meshgrid(np.arange(h, dtype=f32), np.arange(w, dtype=f32),
                         indexing="ij")
    dx = (xs - f32(cx)).astype(f32)
    dy = (ys - f32(cy)).astype(f32)
    rect_x = (f32(cos) * dx + f32(sin) * dy).astype(f32)
    rect_y = (f32(-sin) * dx + f32(cos) * dy).astype(f32)
    inside = jnp.asarray((np.abs(rect_x) <= f32(width * 0.5))
                         & (np.abs(rect_y) <= f32(height * 0.5)))
    norm_x = ((rect_x + f32(width * 0.5)) / f32(width)).astype(f32)
    norm_y = ((rect_y + f32(height * 0.5)) / f32(height)).astype(f32)
    src_x = np.zeros_like(norm_x) if sw == 1 else (norm_x * f32(sw - 1)).astype(f32)
    src_y = np.zeros_like(norm_y) if sh == 1 else (norm_y * f32(sh - 1)).astype(f32)
    sampled = _sample_static(source, src_x, src_y, method, BorderMode.MIRROR)

    if blend_mode and arr.shape[2] >= 3 and source.shape[2] == 4:
        from ..blending import blend_arrays

        base = arr.astype(jnp.float32) / 255.0
        over = sampled.astype(jnp.float32) / 255.0
        if base.shape[2] == 3:
            base = jnp.concatenate([base, jnp.ones_like(base[..., :1])], axis=-1)
        blended = blend_arrays(base, over, blend_mode)
        out_px = jnp.clip(jnp.floor(blended[..., : arr.shape[2]] * 255.0 + 0.5),
                          0, 255).astype(jnp.uint8)
    else:
        out_px = sampled[..., : arr.shape[2]]
    return jnp.where(inside[..., None], out_px, arr)
