#!/usr/bin/env python
"""Benchmark driver: the north-star resize+blur+Oklab pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GPix/s", "vs_baseline": N}

Timing methodology (see CLAUDE.md "axon tunnel"): per-call dispatch
through the axon tunnel costs ~6 ms — far more than the pipeline itself —
and execution is deferred past block_until_ready, so the pipeline is
repeated INSIDE one jitted lax.fori_loop (input perturbed per iteration
so nothing hoists, one scalar consumed per iteration so iterations
chain), a single scalar is fetched at the end, and two loop lengths are
differenced to cancel the remaining fixed costs.

vs_baseline compares against the reference's only published resize number
(bilinear ~100 Mpix/s single CPU core, BASELINE.md).
"""

import json
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zignal_tpu.pipeline import resize_blur_oklab

    B, H, W = 16, 1024, 1024
    out = 512
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))

    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(jnp.uint8))
            r = resize_blur_oklab(xi, out, out, 2.0)
            return acc + r.ravel()[0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        float(looped(batch, n))  # compile + run once
        t0 = time.perf_counter()
        float(looped(batch, n))
        return time.perf_counter() - t0

    n_small, n_large = 2, 22
    t_small = min(timed(n_small) for _ in range(2))
    t_large = min(timed(n_large) for _ in range(2))
    per_iter = (t_large - t_small) / (n_large - n_small)

    gpix = B * H * W / per_iter / 1e9
    baseline_gpix = 0.1  # reference bilinear resize (100 Mpix/s)
    print(json.dumps({
        "metric": "resize+blur+oklab pipeline throughput (single chip)",
        "value": round(gpix, 3),
        "unit": "GPix/s",
        "vs_baseline": round(gpix / baseline_gpix, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
