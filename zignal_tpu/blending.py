"""Blend modes (reference: src/blending.zig:8-160).

Two implementations share the same math:

- ``blend_colors``: scalar path on color objects, computed in float32 to
  match the reference's u8 path (``F = f32`` when ``T == u8``,
  blending.zig:44).
- ``blend_arrays``: batched jnp path on channel-last arrays, used by
  rasterization and compositing kernels on device.
"""

from __future__ import annotations

import enum

import numpy as np


class Blending(enum.IntEnum):
    """Blend modes (reference: src/blending.zig:8-22)."""

    NONE = 0
    NORMAL = 1
    MULTIPLY = 2
    SCREEN = 3
    OVERLAY = 4
    SOFT_LIGHT = 5
    HARD_LIGHT = 6
    COLOR_DODGE = 7
    COLOR_BURN = 8
    DARKEN = 9
    LIGHTEN = 10
    DIFFERENCE = 11
    EXCLUSION = 12


def _blend_rgb_np(base_v, overlay_v, mode, xp):
    """Blend the rgb triples (already in [0,1] float). Shared between the
    numpy scalar path and the jnp batched path; `xp` is numpy or jax.numpy.
    Channel-last arrays [..., 3]."""
    one = base_v.dtype.type(1.0) if hasattr(base_v.dtype, "type") else 1.0
    if mode == Blending.NORMAL or mode == Blending.NONE:
        return overlay_v
    if mode == Blending.MULTIPLY:
        return base_v * overlay_v
    if mode == Blending.SCREEN:
        return 1.0 - (1.0 - base_v) * (1.0 - overlay_v)
    if mode == Blending.OVERLAY:
        return xp.where(
            base_v < 0.5,
            2.0 * base_v * overlay_v,
            1.0 - 2.0 * (1.0 - base_v) * (1.0 - overlay_v),
        )
    if mode == Blending.SOFT_LIGHT:
        return xp.where(
            overlay_v <= 0.5,
            base_v - (1.0 - 2.0 * overlay_v) * base_v * (1.0 - base_v),
            base_v + (2.0 * overlay_v - 1.0) * (xp.sqrt(base_v) - base_v),
        )
    if mode == Blending.HARD_LIGHT:
        return xp.where(
            overlay_v < 0.5,
            2.0 * overlay_v * base_v,
            1.0 - 2.0 * (1.0 - overlay_v) * (1.0 - base_v),
        )
    if mode == Blending.COLOR_DODGE:
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = base_v / xp.maximum(1.0 - overlay_v, 1e-30)
        val = xp.where(overlay_v >= 1.0, 1.0, xp.minimum(1.0, ratio))
        return xp.where(base_v == 0.0, 0.0, val)
    if mode == Blending.COLOR_BURN:
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = (1.0 - base_v) / xp.maximum(overlay_v, 1e-30)
        val = xp.where(overlay_v <= 0.0, 0.0, xp.maximum(0.0, 1.0 - ratio))
        return xp.where(base_v >= 1.0, 1.0, val)
    if mode == Blending.DARKEN:
        return xp.minimum(base_v, overlay_v)
    if mode == Blending.LIGHTEN:
        return xp.maximum(base_v, overlay_v)
    if mode == Blending.DIFFERENCE:
        return xp.abs(base_v - overlay_v)
    if mode == Blending.EXCLUSION:
        return base_v + overlay_v - 2.0 * base_v * overlay_v
    raise ValueError(f"unknown blend mode {mode!r}")


def blend_colors(base, overlay, mode):
    """Blend two Rgba colors; u8 math in f32 (reference: blending.zig:27-160)."""
    from .color._classes import Rgba

    mode = Blending(mode)
    if mode == Blending.NONE:
        return Rgba._new_unchecked(list(overlay._v))
    if overlay._v[3] == 0:
        return Rgba._new_unchecked(list(base._v))
    if base._v[3] == 0:
        return Rgba._new_unchecked(list(overlay._v))
    if mode == Blending.NORMAL and overlay._v[3] == 255:
        return Rgba._new_unchecked(list(overlay._v))

    f32 = np.float32
    base_f = np.array(base._v, dtype=f32) / f32(255.0)
    over_f = np.array(overlay._v, dtype=f32) / f32(255.0)
    blended = _blend_rgb_np(base_f[:3], over_f[:3], mode, np)

    if overlay._v[3] == 255:
        out = np.append(blended, f32(1.0))
    else:
        oa, ba = over_f[3], base_f[3]
        result_a = oa + ba * (f32(1.0) - oa)
        if result_a <= 0:
            return Rgba._new_unchecked([0, 0, 0, 0])
        base_weight = ba * (f32(1.0) - oa)
        inv = f32(1.0) / result_a
        out_rgb = (blended * oa + base_f[:3] * base_weight) * inv
        out = np.append(out_rgb, result_a)
    u8 = np.floor(255.0 * np.clip(out.astype(np.float64), 0.0, 1.0) + 0.5).astype(int)
    return Rgba._new_unchecked(list(u8))


def blend_arrays(base, overlay, mode, xp=None):
    """Batched alpha-compositing blend on channel-last float arrays in [0,1].

    ``base``/``overlay``: [..., 4] RGBA float arrays. Returns [..., 4].
    Vectorized form of reference blendColors for whole-image compositing.
    """
    if xp is None:
        import jax.numpy as xp  # noqa: PLC0415

    mode = Blending(mode)
    if mode == Blending.NONE:
        return overlay
    base_rgb, base_a = base[..., :3], base[..., 3:4]
    over_rgb, over_a = overlay[..., :3], overlay[..., 3:4]
    blended = _blend_rgb_np(base_rgb, over_rgb, mode, xp)
    result_a = over_a + base_a * (1.0 - over_a)
    base_weight = base_a * (1.0 - over_a)
    safe_a = xp.maximum(result_a, 1e-30)
    out_rgb = (blended * over_a + base_rgb * base_weight) / safe_a
    out = xp.concatenate([out_rgb, result_a], axis=-1)
    # fully transparent overlay keeps base; hidden base takes overlay
    out = xp.where(over_a <= 0.0, base, out)
    out = xp.where((base_a <= 0.0) & (over_a > 0.0), overlay, out)
    return out
