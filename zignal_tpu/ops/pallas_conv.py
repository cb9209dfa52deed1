"""Fused separable u8 convolution as a Pallas TPU kernel.

The XLA lowering (ops/convolution.py) is already MXU-based and
bit-exact, but consecutive matmuls round-trip their intermediate through
HBM (XLA fuses elementwise epilogues, not dot->dot chains). This kernel
keeps the whole pass-1 result, its base-256 digit split, and the pass-2
accumulation in VMEM: one image in, one image out, ~4x less HBM traffic.

Exactness is identical to ops/mxu_resample.py: bf16 holds every integer
in [0, 256], MXU products accumulate in f32, digits keep partial sums
below 2^24, and the final combine uses int32 adds when the total could
exceed 2^24. Border modes are folded into the banded matrices at trace
time.

Gated to [B, H, W, C] u8 with H, W <= 1024 (whole image + weights must
fit VMEM); callers fall back to the XLA path otherwise.

Status: validated bit-exact on a real v5e chip, but measured SLOWER
than the XLA lowering for the 16x512^2 config (0.36 vs 0.25 ms) — the
channel-major transposes and per-channel 2-D dots cost more than the
HBM round-trip they remove. Kept as the reference Pallas lowering and
the starting point for per-tile fusions XLA cannot express; not wired
as the default path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_separable_u8", "pallas_ok"]

_MAX_SIDE = 1024


def pallas_ok(shape, dtype) -> bool:
    if dtype != jnp.uint8 or len(shape) != 4:
        return False
    _, h, w, c = shape
    return h <= _MAX_SIDE and w <= _MAX_SIDE and c <= 4 and h > 1 and w > 1


def _combine_plan(Mx: np.ndarray, My: np.ndarray):
    """Trace-time digit/bound plan (mirrors mxu_resample._exact_core for
    the u8 -> pass1 <= 65535 -> pass2 case)."""
    sx = int(np.abs(Mx).sum(axis=1).max())
    t_bound = 255 * sx                       # pass-1 values (int, >= 0)
    assert t_bound < (1 << 24), "pass-1 exceeds f32 exactness"
    two_digit = t_bound > 256
    sy = int(np.abs(My).sum(axis=1).max())
    hi_max = min(255, t_bound >> 8) if two_digit else 0
    lo_max = 255 if two_digit else min(256, t_bound)
    b_lo = sy * lo_max
    b_hi = sy * hi_max
    assert b_lo < (1 << 24) and b_hi < (1 << 24)
    total = b_lo + 256 * b_hi
    f32_ok = total + (1 << 15) < (1 << 24)
    return two_digit, f32_ok


def _build_kernel(two_digit: bool, f32_ok: bool, c: int, scale_sq: int):
    half = scale_sq // 2

    def kernel(x_ref, wx_ref, wy_ref, o_ref):
        # channel-major refs: x_ref [1, C, H, W], o_ref [1, C, OH, OW] —
        # per-channel slabs are contiguous 2-D tiles (Mosaic rejects
        # strided u8 stores through a channel-last layout)
        wx_t = wx_ref[:]                      # [W, OW] bf16 (transposed)
        wy = wy_ref[:]                        # [OH, H] bf16
        for ch in range(c):
            # Mosaic lacks a direct u8->bf16 cast; go through i32/f32
            xc = (x_ref[0, ch].astype(jnp.int32)
                  .astype(jnp.float32).astype(jnp.bfloat16))
            t = jnp.dot(xc, wx_t, preferred_element_type=jnp.float32)
            if two_digit:
                hi = jnp.floor(t * (1.0 / 256.0))
                lo = t - 256.0 * hi
                a_lo = jnp.dot(wy, lo.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                a_hi = jnp.dot(wy, hi.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                if f32_ok:
                    acc = a_lo + 256.0 * a_hi
                else:
                    acc = (a_lo.astype(jnp.int32)
                           + (a_hi.astype(jnp.int32) << 8)).astype(jnp.float32)
            else:
                acc = jnp.dot(wy, t.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            # divClampU8 (convolution.zig:18-23); acc is integer-valued
            rounded = jnp.where(acc >= 0, acc + half, acc - half)
            if f32_ok:
                q = jnp.trunc(jnp.abs(rounded) * (1.0 / scale_sq))
            else:
                # int32 trunc-div by 2^16 == shift for non-negative |.|
                q = (jnp.abs(rounded).astype(jnp.int32) >> 16).astype(jnp.float32)
            q = jnp.where(rounded < 0, -q, q)
            # f32->u8 also needs an i32 hop in Mosaic
            o_ref[0, ch] = jnp.clip(q, 0, 255).astype(jnp.int32).astype(jnp.uint8)

    return kernel


@partial(jax.jit, static_argnames=("mx_bytes", "my_bytes", "shape", "interpret"))
def _run(x, mx_bytes: bytes, my_bytes: bytes, shape, interpret: bool = False):
    from jax.experimental import pallas as pl

    b, h, w, c = x.shape
    oh, ow = shape
    Mx = np.frombuffer(mx_bytes, np.int64).reshape(ow, w)
    My = np.frombuffer(my_bytes, np.int64).reshape(oh, h)
    two_digit, f32_ok = _combine_plan(Mx, My)
    wx_t = jnp.asarray(Mx.T.astype(np.float32)).astype(jnp.bfloat16)
    wy = jnp.asarray(My.astype(np.float32)).astype(jnp.bfloat16)
    kernel = _build_kernel(two_digit, f32_ok, c, 256 * 256)
    x_cm = jnp.transpose(x, (0, 3, 1, 2))  # channel-major for clean slabs
    out_cm = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((w, ow), lambda i: (0, 0)),
            pl.BlockSpec((oh, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, oh, ow), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, oh, ow), jnp.uint8),
        interpret=interpret,
    )(x_cm, wx_t, wy)
    return jnp.transpose(out_cm, (0, 2, 3, 1))


def pallas_separable_u8(x, Mx: np.ndarray, My: np.ndarray,
                        interpret: bool = False):
    """Apply banded int matrices Mx [OW, W] (columns pass) and My [OH, H]
    (rows pass) to a [B, H, W, C] u8 array with the 8.8^2 divClampU8
    epilogue — the fused-VMEM equivalent of two exact_axis_apply calls
    plus _div_clamp_u8."""
    return _run(x, np.ascontiguousarray(Mx, np.int64).tobytes(),
                np.ascontiguousarray(My, np.int64).tobytes(),
                (My.shape[0], Mx.shape[0]), interpret)
