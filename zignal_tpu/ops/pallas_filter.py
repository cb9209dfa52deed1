"""Fused filter chain (Gaussian blur -> unsharp mask -> threshold ->
dilate -> erode) as one Pallas TPU kernel for a single-plane image —
the BASELINE config-3 pipeline held fully VMEM-resident.

Same design facts as ops/pallas_pipeline.py (the north-star kernel):
banded block dots on the MXU with base-256 digit exactness for the
integer stages, zero transposes, boundary-masked lane/sublane rolls for
the 3x3 morphology. Bit-identical to the XLA chain
``erode(dilate(threshold(sharpen(gaussian_blur(x)))))``:

- blur: 8.8 fixed-point separable conv (convolution.zig:12-38) — digit
  splits keep every MXU partial an exact integer, divClampU8 rounding;
- sharpen: exact clamped-window box sums (integral.zig semantics); the
  f32 epilogue (division, 2x - mean, floor) is a chain of individually
  IEEE-deterministic ops, so it reproduces the XLA path exactly;
- threshold/morphology: elementwise + separable 3-tap max/min with
  zero padding (binary.zig), exact trivially.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_pipeline import (_pack_col_blocks, _pack_row_blocks,
                              _pad_dst_rows, _pad_to, _LANE_BLOCK,
                              _ROW_BLOCK)

__all__ = ["fused_filter_ok", "fused_blur_sharpen_morph"]


def fused_filter_ok(shape, morph_ksize: int = 3) -> bool:
    """Gate: 2-D u8 planes that fit VMEM after tile padding (arbitrary
    sizes — blocks pad to 64x128 and the halo is sliced off)."""
    if len(shape) != 2:
        return False
    h, w = shape
    if h < 16 or w < 16:
        return False
    if morph_ksize != 3:
        return False
    hp = _pad_to(h, _ROW_BLOCK)
    wp = _pad_to(w, _LANE_BLOCK)
    # u8 input + ~6 f32/bf16 scratch planes
    return hp * wp * 26 <= 80 * 1024 * 1024


def _gauss_band(n: int, sigma: float) -> np.ndarray:
    from ..enums import BorderMode
    from .convolution import _kernel_to_int, gaussian_kernel
    from .interpolation import resolve_index_np
    from .mxu_resample import build_tap_matrix

    kint = _kernel_to_int(gaussian_kernel(sigma)).astype(np.int64)
    ksz = len(kint)
    base = (np.arange(n, dtype=np.int64)[:, None]
            + np.arange(ksz)[None, :] - ksz // 2)
    idx = resolve_index_np(base, n, BorderMode.MIRROR)
    return build_tap_matrix(idx, kint, n, n)


def _clamped_ones_band(n: int, radius: int) -> np.ndarray:
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return (np.abs(i - j) <= radius).astype(np.int64)


def _extents(n: int, radius: int) -> np.ndarray:
    i = np.arange(n)
    r1 = np.clip(i - radius, 0, None)
    r2 = np.clip(i + radius, None, n - 1)
    return (r2 - r1 + 1).astype(np.float32)


def _embed(m: np.ndarray, n_p: int) -> np.ndarray:
    """Embed a real [n, n] band into [n_p, n_p]: padded rows replicate
    the last real row's taps (sliced off after the kernel); padded cols
    are zero (the padded input region contributes nothing)."""
    m = _pad_dst_rows(m, n_p)
    if m.shape[1] < n_p:
        m = np.hstack([m, np.zeros((n_p, n_p - m.shape[1]), m.dtype)])
    return m


def _build_kernel(plan, thr: float):
    (h, w, hr, wr, by_offs, by_k, bx_offs, bx_k, sy_offs, sy_k, sx_offs,
     sx_k) = plan
    rpb = _ROW_BLOCK
    cpb = _LANE_BLOCK

    def kernel(x_ref, by_ref, bxt_ref, sy_ref, sxt_ref, arow_ref,
               acol_ref, o_ref, s_lo, s_hi, s_blur, s_box, s_m1):
        # x_ref/o_ref blocks are [1, h, w] (grid over the batch)
        f32 = jnp.float32
        inv256 = f32(1.0 / 256.0)
        from jax.experimental.pallas import tpu as pltpu

        # ---- stage 1: row blur (contract H), digits out --------------
        for i in range(len(by_offs)):
            xb = x_ref[0, by_offs[i]:by_offs[i] + by_k[i], :]
            xb16 = xb.astype(jnp.int32).astype(f32).astype(jnp.bfloat16)
            t = jnp.dot(by_ref[i, :, :by_k[i]], xb16,
                        preferred_element_type=f32)
            hi = jnp.floor(t * inv256)
            s_lo[i * rpb:(i + 1) * rpb, :] = (t - 256.0 * hi) \
                .astype(jnp.bfloat16)
            s_hi[i * rpb:(i + 1) * rpb, :] = hi.astype(jnp.bfloat16)

        # ---- stage 2: lane blur (contract W), divClampU8 -------------
        for j in range(len(bx_offs)):
            lo = s_lo[:, bx_offs[j]:bx_offs[j] + bx_k[j]]
            hi = s_hi[:, bx_offs[j]:bx_offs[j] + bx_k[j]]
            wt = bxt_ref[j, :bx_k[j], :]
            a_lo = jnp.dot(lo, wt, preferred_element_type=f32)
            a_hi = jnp.dot(hi, wt, preferred_element_type=f32)
            acc = a_lo.astype(jnp.int32) + (a_hi.astype(jnp.int32) << 8)
            q = jnp.clip((acc + 32768) >> 16, 0, 255)
            s_blur[:, j * cpb:(j + 1) * cpb] = q.astype(f32) \
                .astype(jnp.bfloat16)

        # ---- stage 3: row box sums (contract H) ----------------------
        # blurred values <= 255 (bf16-exact); 5-tap sums <= 1275 stay
        # f32-exact through both passes (25 * 255 < 2^24)
        for i in range(len(sy_offs)):
            xb = s_blur[sy_offs[i]:sy_offs[i] + sy_k[i], :]
            t = jnp.dot(sy_ref[i, :, :sy_k[i]], xb,
                        preferred_element_type=f32)
            hi = jnp.floor(t * inv256)
            s_lo[i * rpb:(i + 1) * rpb, :] = (t - 256.0 * hi) \
                .astype(jnp.bfloat16)
            s_hi[i * rpb:(i + 1) * rpb, :] = hi.astype(jnp.bfloat16)

        # ---- stage 4: lane box sums + sharpen + threshold ------------
        for j in range(len(sx_offs)):
            lo = s_lo[:, sx_offs[j]:sx_offs[j] + sx_k[j]]
            hi = s_hi[:, sx_offs[j]:sx_offs[j] + sx_k[j]]
            wt = sxt_ref[j, :sx_k[j], :]
            sums = (jnp.dot(lo, wt, preferred_element_type=f32)
                    + 256.0 * jnp.dot(hi, wt, preferred_element_type=f32))
            area = arow_ref[:, 0:1] * acol_ref[0:1,
                                               j * cpb:(j + 1) * cpb]
            blur = s_blur[:, j * cpb:(j + 1) * cpb].astype(f32)
            vals = 2.0 * blur - sums / area
            sh = jnp.clip(jnp.floor(vals + 0.5), 0.0, 255.0)
            s_m1[:, j * cpb:(j + 1) * cpb] = jnp.where(
                sh > thr, f32(255.0), f32(0.0))

        # ---- stage 5: 3x3 dilate then erode (zero padding) -----------
        lanes2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

        def shift(v, dy, dx, fill):
            out = v
            if dx:  # lane axis: supported roll + boundary mask at the
                # REAL image edge (the padded region is already zero)
                out = pltpu.roll(out, (-dx) % w, 1)
                edge = (lanes2 >= wr - dx) if dx > 0 else (lanes2 < -dx)
                out = jnp.where(edge, fill, out)
            if dy:  # sublane axis: Mosaic rejects dynamic_rotate on
                # dimension 0 — slice + concat a fill row instead
                fill_row = jnp.full((1, w), fill, out.dtype)
                if dy < 0:
                    out = jnp.concatenate([fill_row, out[:-1]], axis=0)
                else:
                    out = jnp.concatenate([out[1:], fill_row], axis=0)
            return out

        def pool(v, is_max):
            fill = f32(0.0)
            op = jnp.maximum if is_max else jnp.minimum
            # separable 3-tap, rows then lanes (matches _pool_pass)
            t1 = op(op(shift(v, -1, 0, fill), v), shift(v, 1, 0, fill))
            return op(op(shift(t1, 0, -1, fill), t1), shift(t1, 0, 1, fill))

        m = s_m1[:, :]
        if h > hr or w > wr:
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            real = (rows2 < hr) & (lanes2 < wr)
            # zero the padded halo (background) before EACH pool — the
            # dilate writes into the halo, which the erode must see as
            # zeros exactly like the true-boundary padding
            m = jnp.where(real, m, f32(0.0))
            m = jnp.where(real, pool(m, True), f32(0.0))
            m = pool(m, False)
        else:
            m = pool(pool(m, True), False)
        # Mosaic only lowers int32 -> u8 casts
        o_ref[0, :, :] = m.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@partial(jax.jit, static_argnames=("sigma", "sharpen_radius", "thr",
                                   "interpret"))
def fused_blur_sharpen_morph(x, sigma: float = 2.0, sharpen_radius: int = 2,
                             thr: float = 128.0, interpret: bool = False):
    """[H, W] or [B, H, W] u8 -> gaussian blur -> sharpen ->
    threshold(>thr) -> dilate3 -> erode3 -> u8 mask, one Pallas program
    (grid over the batch). Caller must check fused_filter_ok() on the
    trailing [H, W] first."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, hr, wr = x.shape
    assert fused_filter_ok((hr, wr))
    h = _pad_to(hr, _ROW_BLOCK)
    w = _pad_to(wr, _LANE_BLOCK)
    if (h, w) != (hr, wr):
        x = jnp.pad(x, ((0, 0), (0, h - hr), (0, w - wr)))

    by = _embed(_gauss_band(hr, sigma), h)
    bx = _embed(_gauss_band(wr, sigma), w)
    sy = _embed(_clamped_ones_band(hr, sharpen_radius), h)
    sx = _embed(_clamped_ones_band(wr, sharpen_radius), w)
    for m, bound in ((by, 255), (bx, 65535)):
        s = int(np.abs(m).sum(axis=1).max())
        assert s * 255 < (1 << 24) and s * bound + 32768 < (1 << 31)

    by_p, by_offs, by_k = _pack_row_blocks(by, _ROW_BLOCK)
    bxt_p, bx_offs, bx_k = _pack_col_blocks(bx, _LANE_BLOCK)
    sy_p, sy_offs, sy_k = _pack_row_blocks(sy, _ROW_BLOCK)
    sxt_p, sx_offs, sx_k = _pack_col_blocks(sx, _LANE_BLOCK)
    arow = np.ones((h, 1), np.float32)
    arow[:hr, 0] = _extents(hr, sharpen_radius)
    acol = np.ones((1, w), np.float32)
    acol[0, :wr] = _extents(wr, sharpen_radius)

    plan = (h, w, hr, wr, tuple(by_offs), tuple(by_k), tuple(bx_offs),
            tuple(bx_k), tuple(sy_offs), tuple(sy_k), tuple(sx_offs),
            tuple(sx_k))
    kernel = _build_kernel(plan, float(thr))

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec(by_p.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(bxt_p.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(sy_p.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(sxt_p.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(arow.shape, lambda i: (0, 0)),
            pl.BlockSpec(acol.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.bfloat16),   # s_lo
            pltpu.VMEM((h, w), jnp.bfloat16),   # s_hi
            pltpu.VMEM((h, w), jnp.bfloat16),   # s_blur
            pltpu.VMEM((h, w), jnp.bfloat16),   # s_box (unused spare)
            pltpu.VMEM((h, w), jnp.float32),    # s_m1 (rotates need f32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(by_p).astype(jnp.bfloat16),
      jnp.asarray(bxt_p).astype(jnp.bfloat16),
      jnp.asarray(sy_p).astype(jnp.bfloat16),
      jnp.asarray(sxt_p).astype(jnp.bfloat16),
      jnp.asarray(arow), jnp.asarray(acol))
    out = out[:, :hr, :wr]
    return out[0] if squeeze else out
