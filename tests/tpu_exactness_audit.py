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

    print("TOTAL FAILS:", fails, flush=True)

if __name__ == "__main__":
    main()
