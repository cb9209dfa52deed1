#!/usr/bin/env python
"""On-chip A/B: packed-patch runtime bilinear sample vs the generic
4-tap gather (ops/warp.py _bilinear_patch_rt vs _bilinear_generic_rt).

Both variants jitted fresh here (the library's `sample` routes by env
at trace time; calling the helpers directly keeps both programs
coexisting). Round-robin interleaved minima over >= 4 rounds (tunnel
contention); xor-chained calls force execution and chain-differencing
cancels fixed fetch latency. MIRROR is the warp() production border.

Usage: timeout 580 python -u tools/ab_warp_rt.py [size] [rounds]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zignal_tpu.enums import BorderMode
    from zignal_tpu.ops import warp as W

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, 256, (size, size, 3), np.uint8))
    m = np.array([[0.93, -0.25, 40.0], [0.25, 0.93, -30.0],
                  [0.0, 0.0, 1.0]], np.float32)

    def coords(arr):
        ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                              jnp.arange(size, dtype=jnp.float32),
                              indexing="ij")
        mm = jnp.asarray(m)
        sx = mm[0, 0] * xs + mm[0, 1] * ys + mm[0, 2]
        sy = mm[1, 0] * xs + mm[1, 1] * ys + mm[1, 2]
        return sx, sy

    @partial(jax.jit, static_argnames=("which", "border"))
    def run(arr, which, border):
        sx, sy = coords(arr)
        fn = (W._bilinear_patch_rt if which == "patch"
              else W._bilinear_generic_rt)
        return fn(arr, sx, sy, border)

    variants = [(which, border)
                for border in (BorderMode.MIRROR, BorderMode.ZERO)
                for which in ("patch", "generic")]

    def timed(which, border, k):
        t0 = time.perf_counter()
        r = run(a, which, border)
        for _ in range(k - 1):
            r = run(jnp.bitwise_xor(a, r), which, border)
        int(r[0, 0, 0])
        return time.perf_counter() - t0

    # warm compiles + correctness
    for which, border in variants:
        r = run(a, which, border)
        r.block_until_ready()
    for border in (BorderMode.MIRROR, BorderMode.ZERO):
        got = np.asarray(run(a, "patch", border))
        want = np.asarray(run(a, "generic", border))
        print(f"bit-exact ({border.name}): {np.array_equal(got, want)}",
              flush=True)

    k_small, k_large = 2, 8
    best = {v: float("inf") for v in variants}
    for rd in range(rounds):
        for which, border in variants:
            ts = timed(which, border, k_small)
            tl = timed(which, border, k_large)
            per = (tl - ts) / (k_large - k_small)
            best[(which, border)] = min(best[(which, border)], per)
            print(f"r{rd} {which}/{border.name}: {per * 1e3:.2f} ms",
                  flush=True)

    mpix = size * size / 1e6
    out = {}
    for (which, border), t in best.items():
        out[f"{which}_{border.name.lower()}_ms_per_mpix"] = \
            round(t * 1e3 / mpix, 3)
    for border in (BorderMode.MIRROR, BorderMode.ZERO):
        g = best[("generic", border)]
        p = best[("patch", border)]
        out[f"speedup_{border.name.lower()}"] = round(g / p, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
