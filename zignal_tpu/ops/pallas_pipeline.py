"""Fused north-star pipeline (resize -> Gaussian blur [-> Oklab]) as one
Pallas TPU kernel.

Why a kernel: the XLA lowering is a chain of banded matmuls whose
integer-valued f32 intermediates round-trip HBM between every stage
(~360 MB of traffic for 16x1024^2 -> 512^2), and the NHWC layout forces
relayouts around each contraction. This kernel holds one image's whole
pipeline in VMEM: the only HBM traffic is the u8 input and the final
output.

Layout trick: everything stays in the native channel-interleaved layout
``[H, W*3]`` (a free reshape of ``[H, W, 3]``) — no transposes anywhere.
Row passes contract the sublane (H) axis directly; column passes use
*interleaved* banded matrices ``kron(M, I_3)`` so the contraction runs
over the merged ``W*3`` lane axis. Even the 3x3 Oklab channel mixes stay
in this layout, as five static lane-rolls with per-lane coefficient
masks (zero where a roll would cross a pixel boundary).

Exactness (same scheme as ops/mxu_resample.py): bf16 holds every
integer in [0, 256]; MXU products accumulate in f32; values above 2^24
are split into base-256 digits at stage boundaries and recombined with
int32 shifts. The u8 stages are therefore bit-identical to the XLA path
(and to the reference's fixed-point kernels,
/root/reference/src/image/convolution.zig:12-38 and
channel_ops.zig:144-191); the Oklab epilogue is float (exp/log-based
pow/cbrt differ from XLA's by a few ulp).

Banded blocking: each pass is a python-unrolled loop of small dots
whose source span hugs the band (dst-row blocks of 64 for row passes,
128-lane blocks for column passes), so FLOPs track the band width —
the dense [512,512] blur matmul would waste 4-8x.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_resize_blur_oklab", "fused_ok"]

_ROW_BLOCK = 64
_LANE_BLOCK = 128
_VMEM_BUDGET = 80 * 1024 * 1024  # leave headroom under the 100 MB limit


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _vmem_estimate(h, wl, ohp, owlp, oklab):
    """Bytes of VMEM the kernel needs: u8 input + bf16 scratch planes +
    the output block (weights are comparatively tiny)."""
    est = h * wl                      # input u8
    est += 2 * 2 * ohp * wl           # s_lo / s_hi bf16
    est += 3 * 2 * ohp * owlp         # s_res / s_dlo / s_dhi bf16
    est += (4 if oklab else 1) * ohp * owlp   # output block
    return est


def fused_ok(shape, out_rows: int, out_cols: int, oklab: bool = True) -> bool:
    """Gate: 4-D u8 batches (1/3/4 channels) whose working set fits the
    VMEM budget; arbitrary output sizes (blocks are padded and the halo
    sliced off) and upscales are supported. Callers fall back to the XLA
    path otherwise."""
    if len(shape) != 4 or shape[3] not in (1, 3, 4):
        return False
    _, h, w, c = shape
    if out_rows < 1 or out_cols < 1:
        return False
    wl, owl = w * c, out_cols * c
    if h < 2 * _ROW_BLOCK or wl < 2 * _LANE_BLOCK:
        return False
    ohp = _pad_to(out_rows, _ROW_BLOCK)
    owlp = _pad_to(owl, _LANE_BLOCK)
    return _vmem_estimate(h, wl, ohp, owlp, oklab) <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# Trace-time band packing
# ---------------------------------------------------------------------------


def _band_spans(M: np.ndarray, dst_pb: int):
    dst, src = M.shape
    assert dst % dst_pb == 0
    spans = []
    for b in range(dst // dst_pb):
        sub = M[b * dst_pb:(b + 1) * dst_pb]
        nz = np.nonzero(sub.any(axis=0))[0]
        spans.append((int(nz.min()), int(nz.max()) + 1) if len(nz)
                     else (0, 1))
    return spans


def _block_plan(M: np.ndarray, dst_pb: int, align: int):
    """Aligned source offsets + per-block spans for per-dst-block dots.
    Offsets land on `align` boundaries (VMEM tile-aligned slices); each
    block keeps its own aligned span (a single uniform K would let one
    worst-case block inflate every dot's contraction)."""
    dst, src = M.shape
    spans = _band_spans(M, dst_pb)
    assert src % align == 0 or src >= align
    offs, ks = [], []
    for c0, c1 in spans:
        off = (c0 // align) * align
        k = min(_pad_to(c1 - off, align), src)
        off = min(off, src - k)
        offs.append(off)
        ks.append(k)
    return offs, ks


def _pack_row_blocks(M: np.ndarray, rows_pb: int, align: int = 32):
    """Pack [dst, src] band matrix into per-dst-row-block slabs for
    ``dot(W_blk[:, :k], src[off:off+k, :])``: (W [nb, rows_pb, maxK],
    offsets, per-block ks)."""
    offs, ks = _block_plan(M, rows_pb, align)
    nb = M.shape[0] // rows_pb
    packs = np.zeros((nb, rows_pb, max(ks)), np.float32)
    for b, (off, k) in enumerate(zip(offs, ks)):
        packs[b, :, :k] = M[b * rows_pb:(b + 1) * rows_pb, off:off + k]
    return packs, offs, ks


def _pack_col_blocks(M: np.ndarray, cols_pb: int, align: int = 128):
    """Pack [dst, src] band matrix into per-dst-lane-block slabs for
    ``dot(src[:, off:off+k], Wt_blk[:k, :])``: (Wt [nb, maxK, cols_pb],
    offsets, per-block ks)."""
    offs, ks = _block_plan(M, cols_pb, align)
    nb = M.shape[0] // cols_pb
    packs = np.zeros((nb, max(ks), cols_pb), np.float32)
    for b, (off, k) in enumerate(zip(offs, ks)):
        packs[b, :k] = M[b * cols_pb:(b + 1) * cols_pb, off:off + k].T
    return packs, offs, ks


def _interleave3(M: np.ndarray, c: int = 3) -> np.ndarray:
    """kron(M, I_c): the [dst, src] band acting per-channel on the
    channel-interleaved lane axis [dst*c, src*c]."""
    if c == 1:
        return M
    return np.kron(M, np.eye(c, dtype=M.dtype))


def _pad_dst_rows(M: np.ndarray, dst_p: int) -> np.ndarray:
    """Pad a [dst, src] band matrix to dst_p rows by replicating the last
    real row's taps — padded output rows duplicate the last real row and
    are sliced off after the kernel."""
    if M.shape[0] == dst_p:
        return M
    return np.vstack([M, np.repeat(M[-1:], dst_p - M.shape[0], axis=0)])


def _bilinear_matrix(src_n: int, dst_n: int) -> np.ndarray:
    from .interpolation import _axis_coords, resolve_index_np, _SCALE
    from .mxu_resample import build_tap_matrix

    _, i0, frac = _axis_coords(src_n, dst_n)
    f_i = np.trunc(frac * np.float32(_SCALE)).astype(np.int64)
    a = resolve_index_np(i0, src_n)
    b = resolve_index_np(i0 + 1, src_n)
    return build_tap_matrix(np.stack([a, b], 1),
                            np.stack([_SCALE - f_i, f_i], 1), src_n, dst_n)


def _blur_matrix(n: int, sigma: float) -> np.ndarray:
    from ..enums import BorderMode
    from .convolution import gaussian_kernel, _kernel_to_int
    from .interpolation import resolve_index_np
    from .mxu_resample import build_tap_matrix

    kint = _kernel_to_int(gaussian_kernel(sigma)).astype(np.int64)
    ksz = len(kint)
    base = (np.arange(n, dtype=np.int64)[:, None]
            + np.arange(ksz)[None, :] - ksz // 2)
    idx = resolve_index_np(base, n, BorderMode.MIRROR)
    return build_tap_matrix(idx, kint, n, n)


def _mix_roll_coefs(m_t, lanes: int):
    """Lane-roll coefficients for the 3x3 channel mix on an interleaved
    [.., lanes] tile: out[l] = sum_d coef[d][l] * in[l - d], with
    m_t[(l-d) % 3][l % 3] the (in, out) matrix entry (matching _mix3's
    transposed-tuple convention) and zeros where l-d leaves l's pixel."""
    coefs = []
    for d in (-2, -1, 0, 1, 2):
        c = np.zeros((lanes,), np.float32)
        for l in range(lanes):
            src = l - d
            if 0 <= src < lanes and src // 3 == l // 3:
                c[l] = np.float32(m_t[src % 3][l % 3])
        coefs.append(c)
    return np.stack(coefs)  # [5, lanes]


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _build_kernel(plan, oklab: bool, has_blur: bool):
    (h, wl, oh, owl, ry_offs, ry_k, rx_offs, rx_k, bx_offs, bx_k,
     by_offs, by_k) = plan
    n_ry = len(ry_offs)
    n_rx = len(rx_offs)
    n_bx = len(bx_offs)
    n_by = len(by_offs)
    rpb = _ROW_BLOCK
    cpb = _LANE_BLOCK

    from ..color._array import (
        SRGB_GAMMA_EXPONENT, SRGB_GAMMA_OFFSET, SRGB_GAMMA_SCALE,
        SRGB_GAMMA_THRESHOLD, SRGB_LINEAR_SLOPE)

    def kernel(x_ref, wy_ref, wxt_ref, bxt_ref, by_ref, mix1_ref, mix2_ref,
               o_ref, s_lo, s_hi, s_res, s_dlo, s_dhi):
        f32 = jnp.float32
        inv256 = f32(1.0 / 256.0)
        from jax.experimental.pallas import tpu as pltpu

        def oklab_rows(i, qf):
            """sRGB gamma -> linear on the integer-valued rows qf (the
            /255 and /1.055 normalizations fold into the log argument;
            the linear branch folds into one multiply), then the two 3x3
            mixes as lane-rolls with cbrt between. A degree-10
            polynomial + Newton-cbrt variant measured SLOWER than
            exp/log on v5e — the VPU's transcendentals are fast."""
            a = f32(1.0 / (255.0 * SRGB_GAMMA_SCALE))
            bconst = f32(SRGB_GAMMA_OFFSET / SRGB_GAMMA_SCALE)
            big = jnp.exp(f32(SRGB_GAMMA_EXPONENT)
                          * jnp.log(qf * a + bconst))
            lin = jnp.where(qf > f32(255.0 * SRGB_GAMMA_THRESHOLD), big,
                            qf * f32(1.0 / (255.0 * SRGB_LINEAR_SLOPE)))

            def mix(val, coef_ref):
                out = None
                for di, d in enumerate((-2, -1, 0, 1, 2)):
                    # circular roll; coefs zero the wrapped lanes
                    term = (coef_ref[di:di + 1, :]
                            * pltpu.roll(val, d % owl, 1))
                    out = term if out is None else out + term
                return out

            lms = mix(lin, mix1_ref)
            # lms >= 0 (positive mix of non-negative linear values):
            # cbrt(x) = exp(log(x) / 3), with exp(log 0) -> 0
            cb = jnp.exp(jnp.log(lms) * f32(1 / 3))
            o_ref[0, i * rpb:(i + 1) * rpb, :] = mix(cb, mix2_ref)

        # ---- stage 1: row resize (contract H), digits out -------------
        for i in range(n_ry):
            xb = x_ref[0, ry_offs[i]:ry_offs[i] + ry_k[i], :]
            xb16 = xb.astype(jnp.int32).astype(f32).astype(jnp.bfloat16)
            t = jnp.dot(wy_ref[i, :, :ry_k[i]], xb16,
                        preferred_element_type=f32)
            hi = jnp.floor(t * inv256)
            lo = t - 256.0 * hi
            s_lo[i * rpb:(i + 1) * rpb, :] = lo.astype(jnp.bfloat16)
            s_hi[i * rpb:(i + 1) * rpb, :] = hi.astype(jnp.bfloat16)

        # ---- stage 2: lane resize (contract W*3), divClampU8 ----------
        for j in range(n_rx):
            lo = s_lo[:, rx_offs[j]:rx_offs[j] + rx_k[j]]
            hi = s_hi[:, rx_offs[j]:rx_offs[j] + rx_k[j]]
            wt = wxt_ref[j, :rx_k[j], :]
            a_lo = jnp.dot(lo, wt, preferred_element_type=f32)
            a_hi = jnp.dot(hi, wt, preferred_element_type=f32)
            acc = a_lo.astype(jnp.int32) + (a_hi.astype(jnp.int32) << 8)
            # resize truncates (channel_ops.zig:186: // 256*256) — only
            # the blur's divClampU8 adds the +half rounding bias
            q = jnp.clip(acc >> 16, 0, 255)
            if not has_blur and not oklab:
                o_ref[0, :, j * cpb:(j + 1) * cpb] = q.astype(jnp.uint8)
            else:
                s_res[:, j * cpb:(j + 1) * cpb] = (
                    q.astype(f32).astype(jnp.bfloat16))

        if not has_blur:
            if oklab:
                for i in range(oh // rpb):
                    qf = s_res[i * rpb:(i + 1) * rpb, :].astype(f32)
                    oklab_rows(i, qf)
            return

        # ---- stage 3: lane blur (contract W*3), digits out ------------
        for j in range(n_bx):
            r = s_res[:, bx_offs[j]:bx_offs[j] + bx_k[j]]
            t = jnp.dot(r, bxt_ref[j, :bx_k[j], :],
                        preferred_element_type=f32)
            hi = jnp.floor(t * inv256)
            lo = t - 256.0 * hi
            s_dlo[:, j * cpb:(j + 1) * cpb] = lo.astype(jnp.bfloat16)
            s_dhi[:, j * cpb:(j + 1) * cpb] = hi.astype(jnp.bfloat16)

        # ---- stage 4: row blur (contract OH), divClampU8 [+ oklab] ----
        for i in range(n_by):
            lo = s_dlo[by_offs[i]:by_offs[i] + by_k[i], :]
            hi = s_dhi[by_offs[i]:by_offs[i] + by_k[i], :]
            wt = by_ref[i, :, :by_k[i]]
            a_lo = jnp.dot(wt, lo, preferred_element_type=f32)
            a_hi = jnp.dot(wt, hi, preferred_element_type=f32)
            acc = a_lo.astype(jnp.int32) + (a_hi.astype(jnp.int32) << 8)
            q = jnp.clip((acc + 32768) >> 16, 0, 255)
            if not oklab:
                o_ref[0, i * rpb:(i + 1) * rpb, :] = q.astype(jnp.uint8)
                continue
            oklab_rows(i, q.astype(f32))

    return kernel


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("out_rows", "out_cols", "sigma", "oklab",
                                   "interpret"))
def fused_resize_blur_oklab(batch, out_rows: int, out_cols: int,
                            sigma: float, oklab: bool = True,
                            interpret: bool = False):
    """[B, H, W, 3] u8 -> bilinear resize -> Gaussian blur -> u8
    ([B, oh, ow, 3]) or Oklab f32 when ``oklab``. ``sigma=0`` skips the
    blur stages (fused resize / resize->oklab). One Pallas program per
    image; see module docstring. Caller must check fused_ok() first."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = batch.shape
    assert fused_ok(batch.shape, out_rows, out_cols, oklab)
    assert c == 3 or not oklab, "oklab epilogue needs RGB"
    wl, owl = w * c, out_cols * c
    ohp = _pad_to(out_rows, _ROW_BLOCK)
    owlp = _pad_to(owl, _LANE_BLOCK)
    has_blur = sigma > 0

    wy = _pad_dst_rows(_bilinear_matrix(h, out_rows), ohp)       # [OHp, H]
    wx = _pad_dst_rows(
        _interleave3(_bilinear_matrix(w, out_cols), c), owlp)    # [OWLp, WL]
    checks = [(wy, 255), (wx, 65535)]
    if has_blur:
        by = _pad_dst_rows(_blur_matrix(out_rows, sigma), ohp)
        by = np.hstack([by, np.zeros((ohp, ohp - out_rows), by.dtype)])
        bx = _pad_dst_rows(_interleave3(_blur_matrix(out_cols, sigma), c),
                           owlp)
        bx = np.hstack([bx, np.zeros((owlp, owlp - owl), bx.dtype)])
        checks += [(bx, 255), (by, 65535)]

    # exactness preconditions (mirrors mxu_resample digit bounds)
    for m, bound in checks:
        s = int(np.abs(m).sum(axis=1).max())
        assert s * 255 < (1 << 24), "weight digit bound"
        assert s * bound + 32768 < (1 << 31), "int32 combine bound"

    wy_p, ry_offs, ry_k = _pack_row_blocks(wy, _ROW_BLOCK)
    wxt_p, rx_offs, rx_k = _pack_col_blocks(wx, _LANE_BLOCK)
    if has_blur:
        bxt_p, bx_offs, bx_k = _pack_col_blocks(bx, _LANE_BLOCK)
        by_p, by_offs, by_k = _pack_row_blocks(by, _ROW_BLOCK)
    else:  # unused dummy operands (the kernel never reads them)
        bxt_p = np.zeros((1, 8, 128), np.float32)
        by_p = np.zeros((1, 8, 8), np.float32)
        bx_offs, bx_k, by_offs, by_k = [0], [8], [0], [8]

    if oklab:
        from ..color._array import _RGB2OKLMS, _OKLMS2LAB
        mix1 = _mix_roll_coefs(_RGB2OKLMS, owlp)
        mix2 = _mix_roll_coefs(_OKLMS2LAB, owlp)
    else:  # dummies (the kernel never reads them)
        mix1 = np.zeros((5, owlp), np.float32)
        mix2 = np.zeros((5, owlp), np.float32)

    plan = (h, wl, ohp, owlp, tuple(ry_offs), tuple(ry_k),
            tuple(rx_offs), tuple(rx_k), tuple(bx_offs), tuple(bx_k),
            tuple(by_offs), tuple(by_k))
    kernel = _build_kernel(plan, oklab, has_blur)

    x = batch.reshape(b, h, wl)
    out_dtype = jnp.float32 if oklab else jnp.uint8
    bcast = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wl), lambda i: (i, 0, 0)),
            pl.BlockSpec(wy_p.shape, bcast),
            pl.BlockSpec(wxt_p.shape, bcast),
            pl.BlockSpec(bxt_p.shape, bcast),
            pl.BlockSpec(by_p.shape, bcast),
            pl.BlockSpec(mix1.shape, lambda i: (0, 0)),
            pl.BlockSpec(mix2.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ohp, owlp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ohp, owlp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ohp, wl), jnp.bfloat16),   # s_lo
            pltpu.VMEM((ohp, wl), jnp.bfloat16),   # s_hi
            pltpu.VMEM((ohp, owlp) if has_blur or oklab else (8, 128),
                       jnp.bfloat16),                   # s_res
            pltpu.VMEM((ohp, owlp) if has_blur else (8, 128),
                       jnp.bfloat16),                   # s_dlo
            pltpu.VMEM((ohp, owlp) if has_blur else (8, 128),
                       jnp.bfloat16),                   # s_dhi
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # images are independent:
            # lets Mosaic overlap the next image's DMA with compute
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(wy_p).astype(jnp.bfloat16),
      jnp.asarray(wxt_p).astype(jnp.bfloat16),
      jnp.asarray(bxt_p).astype(jnp.bfloat16),
      jnp.asarray(by_p).astype(jnp.bfloat16),
      jnp.asarray(mix1), jnp.asarray(mix2))
    out = out[:, :out_rows, :owl]
    return out.reshape(b, out_rows, out_cols, c)
