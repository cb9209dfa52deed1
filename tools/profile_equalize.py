#!/usr/bin/env python
"""Attribute equalize's 0.41 ms/MPix to histogram vs LUT-apply and try
cheaper LUT-apply lowerings. Round-robin minima in one process."""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.ops.binary import histogram256_multi, lut_apply_u8_per_channel
from zignal_tpu.ops.enhancement import equalize


def loop_timer(step_fn, args, n_small=2, n_large=18, reps=2):
    @partial(jax.jit, static_argnames=("n",))
    def looped(x, rest, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(x.dtype))
            r = step_fn(xi, *rest)
            return acc + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    x, rest = args[0], tuple(args[1:])

    def timed(n):
        float(looped(x, rest, n))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(looped(x, rest, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_large) - timed(n_small)) / (n_large - n_small)


def lut_bf16_acc(arr, luts):
    """Variant: keep the 16-candidate intermediate in bf16 end to end
    (halves the [..., 16] HBM traffic; exact for u8 table values)."""
    xi = arr.astype(jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((xi >> 4)[..., None] == idx).astype(jnp.bfloat16)
    mask_lo = ((xi & 15)[..., None] == idx).astype(jnp.bfloat16)
    t = luts.astype(jnp.bfloat16).reshape(-1, 16, 16)
    cand = jnp.einsum("...ch,chl->...cl", oh_hi, t,
                      preferred_element_type=jnp.bfloat16)
    return jnp.sum((cand * mask_lo).astype(jnp.float32),
                   axis=-1).astype(jnp.uint8)


def lut_staircase16(arr, luts):
    """Variant: no one-hot/matmul at all — 16 select terms per nibble
    pair via dynamic-slice-free arithmetic on the VPU."""
    xi = arr.astype(jnp.int32)
    hi = xi >> 4
    lo = xi & 15
    t = luts.astype(jnp.float32).reshape(-1, 16, 16)  # [C,16,16]
    out = jnp.zeros(arr.shape, jnp.float32)
    for h in range(16):
        # row h of each channel's table, picked by lo
        row = t[:, h, :]  # [C, 16]
        v = jnp.zeros(arr.shape, jnp.float32)
        for l in range(16):
            v = v + jnp.where(lo == l, row[None, None, :, l], 0.0)
        out = out + jnp.where(hi == h, v, 0.0)
    return out.astype(jnp.uint8)


def main():
    rng = np.random.default_rng(3)
    x = jax.device_put(rng.integers(0, 256, (1024, 1024, 3), np.uint8))
    luts = jax.device_put(
        rng.integers(0, 256, (3, 256), np.uint8))
    variants = [
        ("equalize_full", lambda a: equalize(a), (x,)),
        ("hist_multi", lambda a: histogram256_multi(a).astype(jnp.float32),
         (x,)),
        ("lut_per_channel", lut_apply_u8_per_channel, (x, luts)),
        ("lut_bf16_acc", lut_bf16_acc, (x, luts)),
    ]
    best = {name: 1e9 for name, _, _ in variants}
    for rnd in range(4):
        for name, fn, args in variants:
            t = loop_timer(fn, args)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 3)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name, "best_ms": round(t * 1e3, 3)}),
              flush=True)
    # correctness of the variants
    ref = np.asarray(lut_apply_u8_per_channel(x, luts))
    for name, fn in (("lut_bf16_acc", lut_bf16_acc),):
        got = np.asarray(fn(x, luts))
        print(name, "exact:", bool(np.array_equal(got, ref)), flush=True)


if __name__ == "__main__":
    main()
