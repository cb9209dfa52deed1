"""Motion blur kernels (reference: src/image/motion_blur.zig).

All three modes are gather-accumulate over a static set of sample
offsets with in-bounds masking and clamped bilinear taps — one fused
device program per configuration.
"""

from __future__ import annotations

import os
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


def radial_blur(arr, center_x: float, center_y: float, strength: float,
                zoom: bool):
    """Radial zoom/spin blur (motion_blur.zig radial:240+). Plain
    function (not jitted): the fast path stages trace-time coordinate
    tables onto the device; under an outer jit it falls back to the
    all-device gather path."""
    if strength == 0:
        return arr
    h, w = arr.shape[0], arr.shape[1]
    s_cl = min(max(strength, 0.0), 1.0)
    n_samples = 8 + int(np.trunc(s_cl * 24))

    def sample_fn_np(s, xs, ys):
        """Strict-f32 numpy replica of the reference's per-pixel loop
        (motion_blur.zig:269-309): every intermediate is f32, matching
        the Zig code's f32 arithmetic step for step. Zoom uses only
        +-*/ and sqrt (IEEE-exact, bit-identical); spin's
        sin/cos/atan2 come from the host libm and may differ from
        Zig's by float ulps (documented tolerance)."""
        f32 = np.float32
        cxf = f32(center_x) * f32(w - 1)
        cyf = f32(center_y) * f32(h - 1)
        sclf = f32(min(max(strength, 0.0), 1.0))
        maxdf = np.sqrt(cxf * cxf + cyf * cyf)
        t = (f32(s) - f32(n_samples - 1) / f32(2.0)) / f32(n_samples - 1)
        dx = xs - cxf
        dy = ys - cyf
        dist = np.sqrt(dx * dx + dy * dy)
        if zoom:
            blur_amount = dist / max(maxdf, f32(1e-6)) * sclf * f32(20.0)
            scale = f32(1.0) + t * blur_amount * f32(0.1)
            return cxf + dx * scale, cyf + dy * scale
        blur_amount = sclf * f32(0.5)
        new_angle = np.arctan2(dy, dx) + t * blur_amount
        return (cxf + dist * np.cos(new_angle),
                cyf + dist * np.sin(new_angle))

    # Static-coordinate fast path: center/strength are trace-time, so the
    # per-pixel coordinate math runs ONCE in numpy f32 (zoom uses only
    # +-*/ and sqrt, all IEEE-exact — bit-identical to the reference's
    # f32 loop; spin's sin/cos/atan2 use the host libm, which may differ
    # from Zig's by float ulps). Round-1's blocker — device-recomputed
    # coords drifting by FMA ulps — is gone because nothing recomputes
    # coords on device; everything derived from the coords (floor,
    # fractions, masks, tap indices) is exact on device. The coord
    # fields ship as cached DEVICE ARGUMENTS, not HLO constants — a
    # megapixel program with hundreds of MB of embedded constants blows
    # the compile-request size limit. Each tile gathers from its small
    # statically-bounded source box (VMEM-resident, ~8x faster than
    # whole-image HBM gathers; same trick as warp._sample_static).
    if (not isinstance(arr, jax.core.Tracer)) and h * w <= (1 << 22):
        return _accumulate_static(arr, sample_fn_np, n_samples,
                                  key=("radial", h, w, arr.shape[2],
                                       center_x, center_y, strength, zoom,
                                       str(arr.dtype)))
    return _radial_device(arr, center_x, center_y, strength, zoom)


@partial(jax.jit, static_argnames=("center_x", "center_y", "strength",
                                   "zoom"))
def _radial_device(arr, center_x: float, center_y: float, strength: float,
                   zoom: bool):
    """All-device fallback (outer-jit contexts and >4 Mpix images):
    whole-image gathers with device-computed coordinates — may deviate
    from the reference's f32 loop by FMA-contraction ulps."""
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

    return _accumulate(arr, sample_fn, n_samples)


# (coord-table device buffers + compiled apply fn) per configuration
_STATIC_CACHE: dict = {}
_STATIC_CACHE_MAX = 8


def _group_shape_menu(c: int):
    """Window shapes (K rows x W cols) for the grouped gather, smallest
    area first. K*W*c <= 256 keeps the gathered row within 256 physical
    u8 lanes — measured (tools/probe_gather_width.py, r5) to gather at
    the SAME ~1.5-2.3 ns/row as a 128-lane row (512+ lanes are 6-8x
    worse), so a row serving G output pixels cuts gather cost ~G-fold."""
    cands = [(3, 8), (3, 12), (4, 10), (4, 16), (6, 14), (8, 10),
             (6, 20), (8, 16), (10, 24), (12, 20), (16, 16)]
    if _g16_enabled():
        # shallow-wide shapes for G=16 groups (x-span <= 16+2)
        cands += [(3, 18), (3, 20), (4, 18), (3, 28), (4, 24)]
    menu = [(k, w_) for (k, w_) in cands if k * w_ * c <= 256]
    return sorted(menu, key=lambda s: s[0] * s[1])


def _g16_enabled() -> bool:
    """G=16 grouping (halves gather rows again for samples whose 16-px
    x-span fits a window) is bit-exact (pure data movement, CPU oracle
    tests) but MEASURED SLOWER on chip (tools/ab_grouped.py, r5,
    interleaved minima over 4 rounds at 512^2 @ 24 samples): zoom 42.4
    vs 35.1 ms/MPix, spin 38.9 vs 25.4 for plain grouped — the wider-W
    rows' extra log2(W) shift-select levels cost more than the halved
    gather rows save, the same failure mode as the packed layout (r4).
    Kept off; the knob exists so the A/B stays reproducible."""
    return os.environ.get("ZT_RADIAL_G16", "0") == "1"


def _pick_group_plan(y0i, x0i, tw, menu):
    """Choose (G, K, W) so every G-pixel group's clamped 2x2 anchors fit
    a K x W window: y-span <= K-2 and x-span <= W-2 (the +2 covers the
    bilinear x0+1/y0+1 taps). Spans are exact trace-time numpy over the
    same clipped floors the device recomputes, so the device-side
    anchor mins can never escape the window. None = keep the per-pixel
    path for this (tile, sample)."""
    th = y0i.shape[0]
    for g in ((16, 8, 4, 2) if _g16_enabled() else (8, 4, 2)):
        pad = (-tw) % g
        yp = np.pad(y0i, ((0, 0), (0, pad)), mode="edge")
        xp = np.pad(x0i, ((0, 0), (0, pad)), mode="edge")
        yp = yp.reshape(th, -1, g)
        xp = xp.reshape(th, -1, g)
        need_k = int((yp.max(2) - yp.min(2)).max()) + 2
        need_w = int((xp.max(2) - xp.min(2)).max()) + 2
        for kk, ww in menu:
            if kk >= need_k and ww >= need_w:
                return (g, kk, ww)
    return None


def _accumulate_static(arr, sample_fn_np, n_samples, key, tile: int = 256):
    """_accumulate for trace-time numpy f32 coordinates.

    The per-sample coordinate fields sx/sy are computed ONCE in numpy
    and staged onto the device as runtime arguments (NOT HLO constants:
    at megapixel scale embedded coord constants are 100s of MB and
    exceed the compile-request size limit). Everything derived from
    them on device — floor, fractions, in-bounds masks, clamped tap
    indices — is exact integer/f32 manipulation, so the result is
    bit-identical to evaluating the reference loop with these coords.
    Each tile's taps gather from the tile×sample's exact source
    bounding box (static bounds, VMEM-resident — ~8x faster than
    whole-image HBM gathers; same trick as warp._sample_static)."""
    h, w = arr.shape[0], arr.shape[1]
    c = arr.shape[2]

    # Packed gather layout (r4): `pack` consecutive x-positions share
    # one gather row via a FREE reshape of the patch ([H, W/pack,
    # pack*4c]), because u8 [N, 4c] operands are physically padded to
    # 128 lanes — a 2^18-row union box is ~33 MB, far past the
    # VMEM-resident regime where the measured gather rate is ~0.84
    # ns/row (vs 2.4 beyond it; tools/profile_radial2.py attribution:
    # the gather is ~95% of radial cost). Row count per (pixel,
    # sample) is unchanged; the x0%pack block pick is a log2(pack)-
    # level mask select of u8 values — pure data movement, bit-exact
    # (tools/ab_packed.py verifies on chip, tests on CPU).
    #
    # MEASURED ON CHIP (r5, tools/ab_packed.py, interleaved minima over
    # 4 rounds): packed LOSES ~10-20% — zoom 17.7 vs 16.0 ms/512^2@24,
    # spin 17.2 vs 16.2, at every cap 2^16/18/20 (bit-exact each run).
    # The 8x-smaller physical operand does NOT lower the per-row gather
    # rate: XLA's dynamic-gather issue rate, not operand residency,
    # sets the 2.4 ns/row cost, and the log2(pack) select levels only
    # add VPU work. Default stays off; the ~60 ms/MPix measured zoom
    # wall is the XLA gather floor on this chip (row count is immovable
    # — sample dedup measured dead r4 — and Mosaic cannot express the
    # 2-D runtime gather that a fused kernel would need; r2/r3 probes).
    pack = 1
    if os.environ.get("ZT_RADIAL_PACKED", "0") == "1":
        while pack * 2 * 4 * c <= 128:
            pack *= 2
    cap = int(os.environ.get("ZT_RADIAL_GROUP_ROWS", str(1 << 18)))
    # Grouped-window gather (r5): u8 only (the 256-lane row budget is a
    # byte budget; f32 rows would fit just 64 taps) and off under an
    # explicit opt-out. Read per call, like the other knobs.
    grouped_env = (os.environ.get("ZT_RADIAL_GROUPED", "1") == "1"
                   and arr.dtype == jnp.uint8 and pack == 1)
    menu = _group_shape_menu(c) if grouped_env else None
    key = key + (pack, cap, grouped_env, grouped_env and _g16_enabled())

    cached = _STATIC_CACHE.get(key)
    if cached is None:
        ys_full, xs_full = np.meshgrid(np.arange(h, dtype=np.float32),
                                       np.arange(w, dtype=np.float32),
                                       indexing="ij")
        coords = []   # per tile: [n_samples, th, tw] f32 sx / sy stacks
        layout = []   # per tile: (i0, j0, th, tw, per-sample box/flags)
        for i0 in range(0, h, tile):
            for j0 in range(0, w, tile):
                th = min(tile, h - i0)
                tw = min(tile, w - j0)
                sxs = np.empty((n_samples, th, tw), np.float32)
                sys_ = np.empty((n_samples, th, tw), np.float32)
                samples = []
                for s in range(n_samples):
                    sx, sy = sample_fn_np(s, xs_full[i0:i0 + th, j0:j0 + tw],
                                          ys_full[i0:i0 + th, j0:j0 + tw])
                    sxs[s] = sx
                    sys_[s] = sy
                    ins = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
                    # the patch row at (y0, x0) carries all four corners,
                    # so the box only needs to span the (y0, x0) taps
                    x0i = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
                    y0i = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
                    samples.append((int(y0i.min()), int(y0i.max()) + 1,
                                    int(x0i.min()), int(x0i.max()) + 1,
                                    bool(ins.all()), bool(ins.any())))
                coords.append(jax.device_put(sxs))
                coords.append(jax.device_put(sys_))
                # Batched gathers amortize the ~0.03 ms fixed cost per
                # take (r2: per-(tile, sample) takes cost ~10 ms of pure
                # dispatch), but ONE union box over all samples grows
                # far beyond the tile for strong zooms — and gather row
                # cost jumps ~4x once the operand leaves VMEM scale
                # (CLAUDE.md gather roofline). Per-tile sample
                # SCHEDULING (VERDICT r3 item 5): consecutive samples
                # have heavily-overlapping boxes, so group them
                # greedily until the group's union area exceeds
                # ZT_RADIAL_GROUP_ROWS (default 512^2 rows) — one
                # gather per GROUP from a near-minimal box. Indices and
                # weights are untouched, so bit-exactness is preserved.
                active = [s for s in range(n_samples) if samples[s][5]]
                # Grouped-window routing (r5): one gathered K*W*c row
                # serves G consecutive output pixels — G-fold fewer
                # gather rows at an unchanged per-row cost (see
                # _group_shape_menu). Pure data movement: the window
                # bytes a pixel extracts are exactly the clamped 2x2
                # taps the per-pixel path gathers, so output bytes are
                # identical (tests sweep grouped vs ungrouped).
                # Each (plan, sample) gets trace-time GROUP-ANCHOR
                # bounds (mins of the same clipped floors the device
                # recomputes), and same-plan samples are greedily
                # union-boxed under a per-shape physical-row cap: the
                # gather rate CLIFFS ~4x once the operand leaves the
                # fast-residency regime (probe at 2^20 rows: ~10 ns/row
                # vs 2.4-3.6 at 2^16), so boxed VMEM-scale operands —
                # not one whole-image operand — are what keep the
                # grouped win at megapixel sizes.
                gplans: list = []
                if grouped_env:
                    ungrouped = []
                    bucket: dict = {}
                    for s in active:
                        sx = sxs[s]
                        sy = sys_[s]
                        x0i = np.clip(np.floor(sx).astype(np.int64),
                                      0, w - 1)
                        y0i = np.clip(np.floor(sy).astype(np.int64),
                                      0, h - 1)
                        plan = _pick_group_plan(y0i, x0i, tw, menu)
                        if plan is None:
                            ungrouped.append(s)
                            continue
                        g, _kk, _ww = plan
                        padg = (-tw) % g
                        ayn = np.pad(y0i, ((0, 0), (0, padg)),
                                     mode="edge").reshape(th, -1, g).min(2)
                        axn = np.pad(x0i, ((0, 0), (0, padg)),
                                     mode="edge").reshape(th, -1, g).min(2)
                        bucket.setdefault(plan, []).append(
                            (s, (int(ayn.min()), int(ayn.max()),
                                 int(axn.min()), int(axn.max()))))
                    active = ungrouped
                    for plan in sorted(bucket):
                        _g, kk, ww = plan
                        phys = 128 * (-(-(kk * ww * c) // 128))
                        cap_g = max(1, cap * 128 // phys)
                        cur = None
                        for s, (ay0, ay1, ax0, ax1) in bucket[plan]:
                            if cur is not None:
                                sel, (by0, by1, bx0, bx1) = cur
                                ny0 = min(by0, ay0)
                                ny1 = max(by1, ay1)
                                nx0 = min(bx0, ax0)
                                nx1 = max(bx1, ax1)
                                if ((ny1 - ny0 + 1) * (nx1 - nx0 + 1)
                                        <= cap_g):
                                    sel.append(s)
                                    cur = (sel, (ny0, ny1, nx0, nx1))
                                    continue
                                gplans.append((plan,) + cur)
                            cur = ([s], (ay0, ay1, ax0, ax1))
                        if cur is not None:
                            gplans.append((plan,) + cur)
                groups = []
                for s in active:
                    b = samples[s][:4]
                    if groups:
                        sel, (y0u, y1u, x0u, x1u) = groups[-1]
                        ny0, ny1 = min(y0u, b[0]), max(y1u, b[1])
                        nx0, nx1 = min(x0u, b[2]), max(x1u, b[3])
                        # cap compares PHYSICAL gather rows: the packed
                        # layout folds `pack` x-positions into one row,
                        # so its operand is ~pack× smaller per logical
                        # area — measure ceil(width/pack) (r4 advisor)
                        if (ny1 - ny0) * (-(-(nx1 - nx0) // pack)) <= cap:
                            sel.append(s)
                            groups[-1] = (sel, (ny0, ny1, nx0, nx1))
                            continue
                    groups.append(([s], b))
                layout.append((i0, j0, th, tw, samples, groups, gplans))

        u8_in = arr.dtype == jnp.uint8

        @jax.jit
        def apply(a_in, coord_args):
            # patch operand: row (y, x) = the 2x2 clamped neighborhood
            # (v00, v10, v01, v11) — ONE gathered row per tap instead of
            # four (gathers cost ~per-row; u8 rows gather ~2.6x faster
            # than f32 on top). Edge replication reproduces the
            # reference's min(x0 + 1, w - 1) clamp.
            ap = a_in
            p10 = jnp.pad(ap, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
            p01 = jnp.pad(ap, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
            p11 = jnp.pad(p01, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
            patch = jnp.concatenate([ap, p10, p01, p11], axis=-1)
            lanes = pack * 4 * c
            if pack > 1:
                wp = -(-w // pack)
                patch = jnp.pad(patch, ((0, 0), (0, wp * pack - w),
                                        (0, 0))).reshape(h, wp, lanes)
            a = a_in.astype(jnp.float32)

            # Grouped-window operands (r5): row (y - by0, x - bx0) of a
            # group's boxed operand holds the K x W u8 window anchored
            # at image position (y, x) — built per union-box group as
            # K*W fused static slices of one shared edge-padded image.
            # One gathered row serves a whole G-pixel group (G-fold
            # fewer gather rows; per-row cost is flat to 256 lanes),
            # and the union boxes keep every operand under the cap so
            # the gather rate stays in the fast-residency regime
            # (tools/probe_gather_width.py: ~10 ns/row at 2^20 operand
            # rows vs 2.4-3.6 at 2^16 — a whole-image operand at 1 MPix
            # forfeits most of the grouped win).
            kmax = max((pl[1] for t in layout for (pl, _, _) in t[6]),
                       default=0)
            wmax = max((pl[2] for t in layout for (pl, _, _) in t[6]),
                       default=0)
            pwin = (jnp.pad(a_in, ((0, kmax - 1), (0, wmax - 1), (0, 0)),
                            mode="edge") if kmax else None)

            def window_operand(kk, ww, by0, bx0, bh, bw_):
                sl = jax.lax.slice(
                    pwin, (by0, bx0, 0),
                    (by0 + bh + kk - 1, bx0 + bw_ + ww - 1, c))
                cols = [jax.lax.slice(sl, (k, j, 0), (k + bh, j + bw_, c))
                        for k in range(kk) for j in range(ww)]
                return jnp.concatenate(
                    cols, axis=-1).reshape(bh * bw_, kk * ww * c)

            out_rows = []
            row = []
            for ti, (i0, j0, th, tw, samples, groups, gplans) in \
                    enumerate(layout):
                sxs = coord_args[2 * ti]
                sys_ = coord_args[2 * ti + 1]
                total = jnp.zeros((th, tw, c), jnp.float32)
                count = jnp.zeros((th, tw, 1), jnp.float32)
                n_always = 0
                # sample -> (val, all_in, sx, sy); accumulation happens
                # in ascending sample order below so the f32 sum order
                # matches the reference's sequential per-sample loop
                # exactly, whichever path produced each sample's taps.
                vals = {}
                for (gsz, kk, ww), sel_s, (by0, by1, bx0, bx1) in gplans:
                    lanes_g = kk * ww * c
                    bh = by1 - by0 + 1
                    bw_ = bx1 - bx0 + 1
                    sel = np.asarray(sel_s)
                    sxa = sxs[sel]
                    sya = sys_[sel]
                    x0 = jnp.floor(sxa)
                    y0 = jnp.floor(sya)
                    fxs = (sxa - x0)[..., None]
                    fys = (sya - y0)[..., None]
                    x0g = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
                    y0g = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
                    padx = (-tw) % gsz
                    x0p = jnp.pad(x0g, ((0, 0), (0, 0), (0, padx)),
                                  mode="edge").reshape(
                                      len(sel_s), th, -1, gsz)
                    y0p = jnp.pad(y0g, ((0, 0), (0, 0), (0, padx)),
                                  mode="edge").reshape(
                                      len(sel_s), th, -1, gsz)
                    # device group anchors = mins over the SAME clipped
                    # floors the host span/box check used, so dy <= K-2,
                    # dx <= W-2, and box membership hold by construction
                    ax = x0p.min(axis=-1)
                    ay = y0p.min(axis=-1)
                    lin = (ay - by0) * bw_ + (ax - bx0)
                    rows = jnp.take(window_operand(kk, ww, by0, bx0,
                                                   bh, bw_),
                                    lin.reshape(-1), axis=0).reshape(
                                        len(sel_s), th, -1, lanes_g)
                    dxs = x0p - ax[..., None]
                    dys = y0p - ay[..., None]
                    bits_x = (ww - 2).bit_length()
                    ln_fin = (ww + 2) * c
                    ln_top = ln_fin + c * ((1 << bits_x) - 1)
                    for si, s in enumerate(sel_s):
                        r = rows[si][..., None, :]
                        dyi = dys[si][..., None]
                        dxi = dxs[si][..., None]
                        # per-pixel extraction: pick the dy'th 2-row
                        # strip, then binary-shift by dx. The where
                        # chains fuse per OUTPUT byte (depth ~K+log2 W
                        # selects per byte), never materializing the
                        # broadcast window.
                        ln_y = 2 * ww * c
                        g = r[..., 0:ln_y]
                        for k in range(1, kk - 1):
                            g = jnp.where(
                                dyi == k,
                                r[..., k * ww * c:k * ww * c + ln_y], g)
                        if ln_top > ln_y:
                            g = jnp.pad(
                                g, ((0, 0), (0, 0), (0, 0),
                                    (0, ln_top - ln_y)))
                        for b in reversed(range(bits_x)):
                            ln_next = ln_fin + c * ((1 << b) - 1)
                            sh = c * (1 << b)
                            m = ((dxi >> b) & 1).astype(bool)
                            g = jnp.where(m, g[..., sh:sh + ln_next],
                                          g[..., :ln_next])
                        g12 = jnp.concatenate(
                            [g[..., :2 * c],
                             g[..., ww * c:ww * c + 2 * c]], axis=-1)
                        g12 = g12.reshape(th, tw + padx, 4 * c)[:, :tw]
                        gf = g12.astype(jnp.float32)
                        fx = fxs[si]
                        fy = fys[si]
                        v0 = (gf[..., 0:c] * (1 - fx)
                              + gf[..., c:2 * c] * fx)
                        v1 = (gf[..., 2 * c:3 * c] * (1 - fx)
                              + gf[..., 3 * c:4 * c] * fx)
                        vals[s] = (v0 * (1 - fy) + v1 * fy,
                                   samples[s][4], sxa[si], sya[si])
                for sel_s, (uby0, uby1, ubx0, ubx1) in groups:
                    # one batched gather from the group's union box
                    # (indices/weights identical to per-sample takes —
                    # pure data movement, so bit-exactness is untouched)
                    sel = np.asarray(sel_s)
                    sxa = sxs[sel]
                    sya = sys_[sel]
                    x0 = jnp.floor(sxa)
                    y0 = jnp.floor(sya)
                    fxs = (sxa - x0)[..., None]
                    fys = (sya - y0)[..., None]
                    x0g = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
                    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1) - uby0
                    if pack == 1:
                        ubw = ubx1 - ubx0
                        box = jax.lax.slice(
                            patch, (uby0, ubx0, 0), (uby1, ubx1, lanes))
                        lin = y0i * ubw + (x0g - ubx0)
                        kbits = None
                    else:
                        # x-block index + in-block position (exact int
                        # ops on the same clipped x0 — data movement
                        # only, so output bytes are unchanged)
                        ubx0p = ubx0 // pack
                        ubx1p = -(-ubx1 // pack)
                        ubwp = ubx1p - ubx0p
                        box = jax.lax.slice(
                            patch, (uby0, ubx0p, 0), (uby1, ubx1p, lanes))
                        lin = y0i * ubwp + (x0g // pack - ubx0p)
                        kbits = x0g % pack
                    g_all = jnp.take(box.reshape(-1, lanes),
                                     lin.reshape(-1),
                                     axis=0).reshape(len(sel_s), th, tw,
                                                     lanes)
                    nlvl = pack.bit_length() - 1
                    for si, s in enumerate(sel_s):
                        all_in = samples[s][4]
                        fx = fxs[si]
                        fy = fys[si]
                        g = g_all[si]
                        if kbits is not None:
                            half = lanes
                            k = kbits[si]
                            for lvl in range(nlvl):
                                half //= 2
                                m = (((k >> (nlvl - 1 - lvl)) & 1)
                                     .astype(bool)[..., None])
                                g = jnp.where(m, g[..., half:],
                                              g[..., :half])
                        g = g.astype(jnp.float32)
                        v0 = (g[..., 0:c] * (1 - fx)
                              + g[..., c:2 * c] * fx)
                        v1 = (g[..., 2 * c:3 * c] * (1 - fx)
                              + g[..., 3 * c:4 * c] * fx)
                        vals[s] = (v0 * (1 - fy) + v1 * fy,
                                   all_in, sxa[si], sya[si])
                for s in sorted(vals):
                    val, all_in, sx, sy = vals[s]
                    if all_in:
                        total = total + val
                        n_always += 1
                    else:
                        inside = ((sx >= 0) & (sx < w)
                                  & (sy >= 0) & (sy < h))[..., None]
                        total = total + jnp.where(inside, val, 0.0)
                        count = count + inside
                count = count + jnp.float32(n_always)
                orig = jax.lax.slice(a, (i0, j0, 0), (i0 + th, j0 + tw, c))
                res = jnp.where(count > 0,
                                total / jnp.maximum(count, 1.0), orig)
                row.append(res)
                if j0 + tw >= w:
                    out_rows.append(row[0] if len(row) == 1
                                    else jnp.concatenate(row, axis=1))
                    row = []
            result = out_rows[0] if len(out_rows) == 1 \
                else jnp.concatenate(out_rows, axis=0)
            if u8_in:
                return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)),
                                0, 255).astype(jnp.uint8)
            return result.astype(a_in.dtype)

        if len(_STATIC_CACHE) >= _STATIC_CACHE_MAX:
            _STATIC_CACHE.pop(next(iter(_STATIC_CACHE)))
        cached = (apply, coords)
        _STATIC_CACHE[key] = cached

    apply, coords = cached
    return apply(jnp.asarray(arr), coords)
