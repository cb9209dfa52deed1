#!/usr/bin/env python
"""On-chip A/B of the fused Pallas color-chain kernel (ops/pallas_color)
vs the fused XLA convert_chain lowering, plus the Mosaic transcendental
probe verdict and a u8 mismatch audit. Round-robin with per-variant
minima (tunnel contention makes sequential comparisons meaningless —
CLAUDE.md).

Usage: PYTHONPATH=.:/root/.axon_site python tools/ab_color.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

SPACES = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")


def loop_timer(step_fn, x, n_small=2, n_large=14, reps=2):
    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(x.dtype))
            r = step_fn(xi)
            return acc + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        float(looped(x, n))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(looped(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_large) - timed(n_small)) / (n_large - n_small)


def xla_chain(x):
    from zignal_tpu.color import convert_chain

    f = convert_chain(x.astype(jnp.float32) / 255.0, SPACES)
    return jnp.clip(jnp.round(f * 255.0), 0, 255).astype(jnp.uint8)


def main():
    from zignal_tpu.ops.pallas_color import (
        fused_chain_ok, fused_color_chain_u8, mosaic_transcendentals_ok)

    print(json.dumps({"mosaic_transcendentals_ok":
                      mosaic_transcendentals_ok()}), flush=True)

    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, (4, 1024, 1024, 3), dtype=np.uint8)
    x = jax.device_put(host)
    assert fused_chain_ok(x.shape, SPACES)

    if mosaic_transcendentals_ok():
        # full-kernel compile + correctness before timing
        got = np.asarray(fused_color_chain_u8(x, SPACES))
        ref = np.asarray(xla_chain(x))
        mism = float((got != ref).mean())
        maxd = int(np.abs(got.astype(int) - ref.astype(int)).max())
        print(json.dumps({"u8_mismatch_rate": mism, "max_u8_diff": maxd}),
              flush=True)
        variants = [("pallas", lambda y: fused_color_chain_u8(y, SPACES)),
                    ("xla", xla_chain)]
    else:
        variants = [("xla", xla_chain)]

    best = {name: 1e9 for name, _ in variants}
    for rnd in range(4):
        for name, fn in variants:
            t = loop_timer(fn, x)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 3)}), flush=True)
    mpix = x.shape[0] * x.shape[1] * x.shape[2] / 1e6
    for name, t in best.items():
        print(json.dumps({"variant": name, "best_ms": round(t * 1e3, 3),
                          "gpix_s": round(mpix / 1e3 / t, 3)}), flush=True)


if __name__ == "__main__":
    main()
