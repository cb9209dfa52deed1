#!/usr/bin/env python
"""Round-robin A/B of north-star variants on the chip; per-variant MIN
across rounds (the tunnel chip shows multi-x contention spikes, so
sequential one-shot comparisons are meaningless)."""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.ops.pallas_pipeline import fused_resize_blur_oklab
from zignal_tpu.pipeline import resize_blur_oklab


def loop_timer(step_fn, x, n_small=2, n_large=18, reps=2):
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


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (16, 1024, 1024, 3), np.uint8))
    variants = [
        ("fused", lambda y: fused_resize_blur_oklab(y, 512, 512, 2.0)),
        ("fused u8", lambda y: fused_resize_blur_oklab(y, 512, 512, 2.0,
                                                       oklab=False)),
        ("pipeline (auto)", lambda y: resize_blur_oklab(y, 512, 512, 2.0)),
    ]
    best = {name: 1e9 for name, _ in variants}
    for rnd in range(6):
        for name, fn in variants:
            t = loop_timer(fn, x)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 3)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name, "best_ms": round(t * 1e3, 3),
                          "gpix_s": round(16 * 1024 * 1024 / t / 1e9, 2)}),
              flush=True)


def main_shapes():
    """A/B fused vs XLA per widened shape class (r3 gate: arbitrary
    outputs, rgba/gray, upscale). Same round-robin/min discipline."""
    from zignal_tpu.enums import Interpolation
    from zignal_tpu.ops.convolution import gaussian_blur
    from zignal_tpu.ops.interpolation import _resize_bilinear_u8

    rng = np.random.default_rng(0)
    cases = [  # loop counts scaled so the differenced signal is >= ~20 ms
        ("1080p->640x360", (4, 1080, 1920, 3), 360, 640, (2, 26)),
        ("512->300 odd", (8, 512, 512, 3), 300, 300, (4, 64)),
        ("rgba 256->100", (16, 256, 256, 4), 100, 100, (4, 84)),
        ("gray 512->200", (16, 512, 512, 1), 200, 200, (4, 84)),
        ("upscale 256->320", (8, 256, 256, 3), 320, 288, (4, 84)),
    ]
    for name, shape, oh, ow, (ns, nl) in cases:
        x = jax.device_put(rng.integers(0, 256, shape, np.uint8))
        mpix = shape[0] * shape[1] * shape[2] / 1e6
        variants = [
            ("fused", lambda y: fused_resize_blur_oklab(
                y, oh, ow, 1.5, oklab=False)),
            ("xla", lambda y: gaussian_blur(
                _resize_bilinear_u8(y, oh, ow), 1.5)),
        ]
        best = {vn: 1e9 for vn, _ in variants}
        for rnd in range(3):
            for vn, fn in variants:
                best[vn] = min(best[vn], loop_timer(fn, x, ns, nl, reps=1))
        for vn, t in best.items():
            print(json.dumps({
                "case": name, "variant": vn, "best_ms": round(t * 1e3, 3),
                "gpix_s": round(mpix / 1e3 / t, 2)}), flush=True)


if __name__ == "__main__":
    if "--shapes" in sys.argv:
        main_shapes()
    else:
        main()
