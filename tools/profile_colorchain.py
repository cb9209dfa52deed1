#!/usr/bin/env python
"""Attribute bench config #2 (colorspace chain + equalize + autocontrast)
to its stages on the chip. Round-robin per-variant minima in ONE process
(tunnel contention discipline, see CLAUDE.md)."""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.color import convert_chain
from zignal_tpu.ops.enhancement import autocontrast, equalize

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


def full(x):
    f = x.astype(jnp.float32) / 255.0
    f = convert_chain(f, SPACES)
    u8 = jnp.clip(jnp.round(f * 255.0), 0, 255).astype(jnp.uint8)
    eq = equalize(u8[0])
    ac = autocontrast(u8[1])
    return eq.astype(jnp.float32) + ac.astype(jnp.float32)


def chain_only(x):
    f = x.astype(jnp.float32) / 255.0
    f = convert_chain(f, SPACES)
    return jnp.clip(jnp.round(f * 255.0), 0, 255).astype(jnp.uint8)


def eq_ac_only(x):
    eq = equalize(x[0])
    ac = autocontrast(x[1])
    return eq.astype(jnp.float32) + ac.astype(jnp.float32)


def main():
    rng = np.random.default_rng(1)
    x = jax.device_put(rng.integers(0, 256, (4, 1024, 1024, 3), np.uint8))
    variants = [
        ("full", full, x),
        ("chain_only", chain_only, x),
        ("eq_ac_only", eq_ac_only, x),
        ("equalize_1mpix", lambda y: equalize(y[0]), x),
        ("autocontrast_1mpix", lambda y: autocontrast(y[1]), x),
    ]
    best = {name: 1e9 for name, _, _ in variants}
    for rnd in range(4):
        for name, fn, arg in variants:
            t = loop_timer(fn, arg)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 3)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name, "best_ms": round(t * 1e3, 3),
                          "gpix_s_4mpix": round(4 * 1024 * 1024 / t / 1e9, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
