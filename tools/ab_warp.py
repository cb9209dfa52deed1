#!/usr/bin/env python
"""Round-robin A/B of warp lowerings on the chip: runtime device-coord
gathers (ops/warp.warp) vs the static tiled path with 4-tap gathers
(ZT_WARP_PATCH=0) vs the packed-patch path (default). Interleaved
per-variant minima over >=3 rounds (r2 contention rule). Also times
rotate (same _sample_tile machinery) with the patch path on/off."""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.ops import warp as W
from zignal_tpu.enums import Interpolation


def loop_timer(step_fn, x, n_small=2, n_large=12, reps=2):
    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(x.dtype))
            return acc + jnp.sum(step_fn(xi).astype(jnp.float32))
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


def main():
    rng = np.random.default_rng(3)
    n = 1024
    a = rng.integers(0, 256, (n, n, 3), np.uint8)
    ad = jax.device_put(a)
    c, s = np.cos(0.3), np.sin(0.3)
    aff = np.array([[c * 1.1, -s, 30.0], [s, c * 1.1, -20.0],
                    [0, 0, 1]], np.float32)
    proj = aff.copy()
    proj[2] = [2e-5, -1e-5, 1.0]
    mats = {"aff": aff, "proj": proj}

    def static_fn(mname, patch):
        key = tuple(map(tuple, mats[mname].tolist()))

        def run(x):
            os.environ["ZT_WARP_PATCH"] = "1" if patch else "0"
            try:
                # distinct out_cols-equivalent jit keys come from the
                # closure identity: each variant gets its own jit cache
                # via loop_timer's fresh wrapper, and ZT_WARP_PATCH is
                # read at trace time inside _sample_static.
                return W.warp_static.__wrapped__(x, key, n, n,
                                                 Interpolation.BILINEAR)
            finally:
                os.environ.pop("ZT_WARP_PATCH", None)
        return run

    variants = []
    for mname in ("aff", "proj"):
        md = jnp.asarray(mats[mname])
        variants += [
            (f"{mname} runtime", lambda x, md=md: W.warp(x, md, n, n)),
            (f"{mname} static 4-tap", static_fn(mname, False)),
            (f"{mname} static patch", static_fn(mname, True)),
        ]
    variants += [
        ("rotate 4-tap", None),
        ("rotate patch", None),
    ]

    def rotate_fn(patch):
        def run(x):
            os.environ["ZT_WARP_PATCH"] = "1" if patch else "0"
            try:
                return W.rotate.__wrapped__(x, 0.3, n, n)
            finally:
                os.environ.pop("ZT_WARP_PATCH", None)
        return run

    variants[-2] = ("rotate 4-tap", rotate_fn(False))
    variants[-1] = ("rotate patch", rotate_fn(True))

    best = {name: 1e9 for name, _ in variants}
    for rnd in range(3):
        for name, fn in variants:
            t = loop_timer(fn, ad)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms_per_mpix": round(t * 1e3, 2)}),
                  flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name,
                          "best_ms_per_mpix": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
