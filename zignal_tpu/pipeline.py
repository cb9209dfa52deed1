"""Fused batched pipelines — the TPU-native execution model.

Where the reference processes one image per call with per-pixel loops,
the TPU framework's unit of work is a **batch**: ``[B, H, W, C]`` uint8
arrays in HBM, with whole op chains traced into a single fused XLA
program (resize -> blur -> color transform), optionally sharded over a
device mesh (zignal_tpu.parallel). This module holds the canonical
pipelines used by the CLI, the benchmarks, and the driver entry.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .color._array import convert_array
from .enums import Interpolation
from .ops.convolution import gaussian_kernel, convolve_separable
from .ops.interpolation import resize as resize_op

__all__ = ["resize_blur_oklab", "batched_resize",
           "batched_gaussian_blur", "filter_chain", "color_chain_u8"]


def color_chain_u8(batch, spaces):
    """[B, H, W, 3] u8 through ``color.convert_chain(spaces)`` and back
    to u8 via clip(round(f * 255)) — the BASELINE config-2 quantized
    chain. The default lowering is the fused XLA convert_chain: the
    chain is transcendental-compute-bound and XLA's native pow/cbrt
    beat Mosaic's exp/log + Newton refinement ~2x on chip (r4 A/B,
    tools/ab_color.py — 0.63 vs 1.29 ms per 4 MPix), so the Pallas
    kernel (ops/pallas_color.py, u8-identical on chip) is opt-in via
    ZT_COLOR_PALLAS=1 and kept as the audit's Mosaic-exactness probe."""
    spaces = tuple(spaces)
    if (os.environ.get("ZT_COLOR_PALLAS") == "1"
            and jax.default_backend() == "tpu"
            and batch.dtype == jnp.uint8 and batch.ndim == 4):
        from .ops.pallas_color import (fused_chain_ok,
                                       fused_color_chain_u8,
                                       mosaic_transcendentals_ok)

        if fused_chain_ok(batch.shape, spaces) \
                and mosaic_transcendentals_ok():
            return fused_color_chain_u8(batch, spaces)
    from .color import convert_chain

    f = convert_chain(batch.astype(jnp.float32) / 255.0, spaces)
    return jnp.clip(jnp.round(f * 255.0), 0, 255).astype(jnp.uint8)


def batched_resize(batch, rows: int, cols: int,
                   method: Interpolation = Interpolation.BILINEAR):
    """Resize [B, H, W, C] -> [B, rows, cols, C]. The resize kernel is
    batch-aware — direct indexing of the batched array lowers ~3x faster
    on TPU than a vmapped per-image kernel."""
    return resize_op(batch, rows, cols, method)


def batched_gaussian_blur(batch, sigma: float):
    if sigma == 0:
        return batch
    k = gaussian_kernel(sigma)
    return convolve_separable(batch, k, k)  # kernels broadcast over batch dims


@partial(jax.jit, static_argnames=("out_rows", "out_cols", "sigma", "method"))
def resize_blur_oklab(batch, out_rows: int, out_cols: int, sigma: float = 2.0,
                      method: Interpolation = Interpolation.BILINEAR):
    """The north-star pipeline (BASELINE.md): batched resize -> Gaussian
    blur -> sRGB->Oklab, one fused XLA program.

    batch: [B, H, W, 3] uint8 sRGB. Returns [B, out_rows, out_cols, 3]
    float32 Oklab. uint8 stages are bit-exact with the reference's
    fixed-point kernels; the Oklab conversion is float32 (±1/255).
    """
    if (method == Interpolation.BILINEAR and batch.dtype == jnp.uint8
            and jax.default_backend() == "tpu"):
        from .ops.pallas_pipeline import fused_ok, fused_resize_blur_oklab

        if fused_ok(batch.shape, out_rows, out_cols):
            # single Pallas kernel, whole pipeline VMEM-resident
            # (~1.35x the fastest XLA lowering on v5e); u8 stages bit
            # -identical, Oklab within ~1e-4 of the XLA float path
            return fused_resize_blur_oklab(batch, out_rows, out_cols,
                                           float(sigma))
    small = batched_resize(batch, out_rows, out_cols, method)
    blurred = batched_gaussian_blur(small, sigma)
    rgb = blurred.astype(jnp.float32) / 255.0
    return convert_array(rgb, "rgb", "oklab")


@partial(jax.jit, static_argnames=("sigma", "sharpen_radius", "thr"))
def _filter_chain_xla(plane, sigma, sharpen_radius, thr):
    from .ops.binary import dilate, erode, threshold_apply
    from .ops.convolution import gaussian_blur
    from .ops.integral import sharpen as sharpen_op

    b = gaussian_blur(plane[..., None], sigma)
    s = sharpen_op(b, sharpen_radius)
    t = threshold_apply(s[..., 0], thr)
    return erode(dilate(t, 3), 3)


def filter_chain(plane, sigma: float = 2.0, sharpen_radius: int = 2,
                 thr: float = 128.0):
    """Gaussian blur -> unsharp mask -> threshold -> dilate3 -> erode3 on
    a [H, W] or [B, H, W] u8 plane (the BASELINE config-3 chain). On TPU
    this runs as ONE VMEM-resident Pallas kernel per image
    (ops/pallas_filter.py, bit-identical to the XLA chain; arbitrary
    sizes via pad+slice); other backends take the fused XLA lowering."""
    if (jax.default_backend() == "tpu" and plane.dtype == jnp.uint8
            and plane.ndim in (2, 3)):
        from .ops.pallas_filter import fused_blur_sharpen_morph, \
            fused_filter_ok

        if fused_filter_ok(plane.shape[-2:]):
            return fused_blur_sharpen_morph(plane, float(sigma),
                                            int(sharpen_radius), float(thr))
    xla = partial(_filter_chain_xla, sigma=float(sigma),
                  sharpen_radius=int(sharpen_radius), thr=float(thr))
    if plane.ndim == 3:
        return jax.vmap(xla)(plane)
    return xla(plane)
