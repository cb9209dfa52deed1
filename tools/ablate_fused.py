#!/usr/bin/env python
"""Stage-budget ablation of the fused north-star kernel on chip:
resize-only (sigma=0), resize+blur (oklab off), full. Differences give
the per-stage cost so optimization effort lands on the dominant stage.
Interleaved per-variant minima (r2 contention rule)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from ab_fused import loop_timer
from zignal_tpu.ops.pallas_pipeline import fused_resize_blur_oklab


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (16, 1024, 1024, 3), np.uint8))
    variants = [
        ("resize only (stages 1-2)",
         lambda y: fused_resize_blur_oklab(y, 512, 512, 0.0, oklab=False)),
        ("resize+blur (stages 1-4)",
         lambda y: fused_resize_blur_oklab(y, 512, 512, 2.0, oklab=False)),
        ("resize+oklab (no blur)",
         lambda y: fused_resize_blur_oklab(y, 512, 512, 0.0, oklab=True)),
        ("full (resize+blur+oklab)",
         lambda y: fused_resize_blur_oklab(y, 512, 512, 2.0, oklab=True)),
    ]
    best = {name: 1e9 for name, _ in variants}
    for rnd in range(5):
        for name, fn in variants:
            t = loop_timer(fn, x)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 3)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name, "best_ms": round(t * 1e3, 3),
                          "gpix_s": round(16 * 1024 * 1024 / t / 1e9, 2)}),
              flush=True)
    r, rb, ro, full = [best[n] for n, _ in variants]
    print(json.dumps({"stage_ms": {
        "resize_1_2": round(r * 1e3, 3),
        "blur_3_4": round((rb - r) * 1e3, 3),
        "oklab_epilogue": round((full - rb) * 1e3, 3),
        "oklab_no_blur_delta": round((ro - r) * 1e3, 3)}}), flush=True)


if __name__ == "__main__":
    main()
