"""Histogram-based enhancement (reference: src/image/enhancement.zig).

autocontrast: per-channel cutoff-percentile stretch; equalize:
per-channel CDF remap. Histograms are scatter-adds; the LUT apply is a
gather — both fuse on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["autocontrast", "autocontrast_from_hists",
           "equalize", "equalize_from_hists"]


def _cutoff_min(hist, cutoff_pixels):
    """First intensity whose cumulative count exceeds the cutoff
    (histogram.zig:123-140); first non-zero bin when cutoff is 0."""
    cum = jnp.cumsum(hist)
    if_zero = jnp.argmax(hist > 0)
    over = cum > cutoff_pixels
    idx = jnp.where(jnp.any(over), jnp.argmax(over), 255)
    return jnp.where(cutoff_pixels == 0, if_zero, idx)


def _cutoff_max(hist, cutoff_pixels):
    rev = hist[::-1]
    cum = jnp.cumsum(rev)
    if_zero = 255 - jnp.argmax(rev > 0)
    over = cum > cutoff_pixels
    idx = jnp.where(jnp.any(over), 255 - jnp.argmax(over), 0)
    return jnp.where(cutoff_pixels == 0, if_zero, idx)


def autocontrast_from_hists(arr, hists, cutoff_pixels, skip_alpha=True):
    """Autocontrast of u8 [H, W, C] given its per-channel histograms
    [C, 256] — the histogram may come from a psum over a sharded image
    (parallel/ + batch.py), in which case cutoff_pixels must be computed
    from the GLOBAL pixel count."""
    ch = arr.shape[-1]
    chans = []
    for i in range(ch):
        if skip_alpha and ch == 4 and i == 3:
            chans.append(arr[..., i])
            continue
        plane = arr[..., i]
        hist = hists[i]
        lo = _cutoff_min(hist, cutoff_pixels).astype(jnp.float32)
        hi = _cutoff_max(hist, cutoff_pixels).astype(jnp.float32)
        rng = jnp.where(hi > lo, hi - lo, 1.0)
        clamped = jnp.clip(plane.astype(jnp.float32), lo, hi)
        normalized = (clamped - lo) / rng
        out = jnp.floor(normalized * 255.0 + 0.5)
        chans.append(jnp.clip(out, 0, 255).astype(jnp.uint8))
    return jnp.stack(chans, axis=-1)


@partial(jax.jit, static_argnames=("skip_alpha",))
def autocontrast(arr, cutoff: float = 0.0, skip_alpha: bool = True):
    """Stretch each channel's [cutoff_min, cutoff_max] to [0, 255].
    arr: u8 [H, W, C]."""
    from .binary import histogram256_multi

    h, w, _ = arr.shape
    total = h * w
    cutoff_pixels = jnp.int32(jnp.trunc(jnp.float32(total) * cutoff))
    return autocontrast_from_hists(arr, histogram256_multi(arr),
                                   cutoff_pixels, skip_alpha)


def equalize_from_hists(arr, hists, total: int, skip_alpha: bool = True):
    """Equalize u8 [H, W, C] given per-channel histograms [C, 256] and
    the GLOBAL pixel count (sharded callers psum partial histograms and
    pass total = H_global * W)."""
    from .binary import lut_apply_u8_per_channel

    ch = arr.shape[-1]
    cdf = jnp.cumsum(hists, axis=1)
    nonzero = cdf > 0
    cdf_min = jnp.where(
        jnp.any(nonzero, axis=1),
        jnp.take_along_axis(cdf, jnp.argmax(nonzero, axis=1)[:, None],
                            axis=1)[:, 0], 0)           # [C]
    denom = total - cdf_min
    ident = jnp.arange(256, dtype=jnp.uint8)
    # u32 arithmetic per the reference (enhancement.zig uses u32):
    # int32 would wrap for (cdf - cdf_min) > 2^31/255 ~ 8.4 Mpix.
    num = (cdf - cdf_min[:, None]).astype(jnp.uint32) * jnp.uint32(255)
    den = jnp.maximum(denom, 1).astype(jnp.uint32)[:, None]
    luts = jnp.where(cdf >= cdf_min[:, None],
                     (num // den).astype(jnp.uint8), 0)
    luts = jnp.where((denom == 0)[:, None], ident[None, :], luts)
    if skip_alpha and ch == 4:
        luts = luts.at[3].set(ident)  # alpha passes through
    return lut_apply_u8_per_channel(arr, luts)


@partial(jax.jit, static_argnames=("skip_alpha",))
def equalize(arr, skip_alpha: bool = True):
    """Per-channel histogram equalization via integer CDF LUT
    (enhancement.zig:84-150). arr: u8 [H, W, C]. All channels ride one
    batched histogram einsum and one batched LUT apply (the former
    per-channel loop tripled the MXU dispatches)."""
    from .binary import histogram256_multi

    h, w, _ = arr.shape
    return equalize_from_hists(arr, histogram256_multi(arr), h * w,
                               skip_alpha)
