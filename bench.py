#!/usr/bin/env python
"""Benchmark driver: the north-star resize+blur+Oklab pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GPix/s", "vs_baseline": N}

Timing methodology: on the axon-tunneled TPU, `block_until_ready` does not
force execution — only a host fetch does, and a fetch carries ~30 ms fixed
RPC latency. So we chain N pipeline invocations into one device-side
dependency chain, fetch a single scalar at the end, and difference two N
values to cancel the fixed latency.

vs_baseline compares against the reference's only published resize number
(bilinear ~100 Mpix/s single CPU core, BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def _timed_chain(pipeline_fn, batch, n_iter):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(n_iter):
        r = pipeline_fn(batch)
        acc = acc + r.ravel()[0]
    float(acc)  # host fetch forces the whole chain
    return time.perf_counter() - t0


def main():
    import jax

    from zignal_tpu.pipeline import resize_blur_oklab

    B, H, W = 16, 1024, 1024
    out = 512
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))

    def fn(b):
        return resize_blur_oklab(b, out, out, 2.0)

    # warmup / compile
    _timed_chain(fn, batch, 1)

    n_small, n_large = 2, 22
    t_small = min(_timed_chain(fn, batch, n_small) for _ in range(2))
    t_large = min(_timed_chain(fn, batch, n_large) for _ in range(2))
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
