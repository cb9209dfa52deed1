#!/usr/bin/env python
"""On-chip ZT_RADIAL_GROUP_ROWS sweep for the GROUPED radial path.

The grouped gather merges (tile, plan, sample)-group window operands
greedily under a physical-row cap derived from ZT_RADIAL_GROUP_ROWS.
Bigger cap = fewer gather dispatches but larger operands (the per-row
gather rate cliffs ~4x around 2^20 operand rows — probe_gather_width);
smaller cap = more dispatches at ~0.03 ms fixed cost each. The knob is
read per call and keyed into the static cache, so every cap's compiled
program coexists; round-robin interleaved minima over >=4 rounds.

Usage: timeout 580 python -u tools/tune_grouped.py [zoom|spin] [size]
Env:   ZT_SWEEP_CAPS=65536,131072,262144,524288 (default)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CAPS = [int(c) for c in os.environ.get(
    "ZT_SWEEP_CAPS", "65536,131072,262144,524288").split(",")]


def time_variant(call, arr, k_small=1, k_large=5):
    import jax.numpy as jnp
    ts = {}
    for k in (k_small, k_large):
        t0 = time.perf_counter()
        r = call(arr)
        for _ in range(k - 1):
            r = call(jnp.bitwise_xor(arr, r))
        int(r[0, 0, 0])
        ts[k] = time.perf_counter() - t0
    return (ts[k_large] - ts[k_small]) / (k_large - k_small)


def main():
    import jax
    import jax.numpy as jnp
    from zignal_tpu.ops import motion_blur_ops as mb

    zoom = (sys.argv[1] if len(sys.argv) > 1 else "zoom") == "zoom"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    strength = float(os.environ.get("ZT_AB_STRENGTH", "0.7"))
    scale = 1e6 / (size * size)
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    int(jnp.sum(arr.astype(jnp.int32)))
    print(json.dumps({"probe_s": round(time.perf_counter() - t0, 1),
                      "size": size, "strength": strength,
                      "mode": "zoom" if zoom else "spin"}), flush=True)

    os.environ["ZT_RADIAL_GROUPED"] = "1"
    calls = {}
    ref = None
    for cap in CAPS:
        def call(a, cap=cap):
            os.environ["ZT_RADIAL_GROUP_ROWS"] = str(cap)
            return mb.radial_blur(a, 0.5, 0.5, strength, zoom)

        t0 = time.perf_counter()
        out = np.asarray(call(arr))
        line = {"cap": cap, "warm_s": round(time.perf_counter() - t0, 1)}
        if ref is None:
            ref = out
        else:
            line["exact"] = bool((out == ref).all())
        print(json.dumps(line), flush=True)
        calls[cap] = call

    best = {c: 1e9 for c in calls}
    for rnd in range(4):
        for cap, call in calls.items():
            t = time_variant(call, arr)
            best[cap] = min(best[cap], t)
            print(json.dumps({"round": rnd, "cap": cap,
                              "ms": round(t * 1e3, 2)}), flush=True)
    for cap, t in best.items():
        print(json.dumps({"cap": cap, "best_ms": round(t * 1e3, 2),
                          "best_ms_per_mpix":
                          round(t * 1e3 * scale, 2)}), flush=True)
    os.environ.pop("ZT_RADIAL_GROUP_ROWS", None)
    os.environ.pop("ZT_RADIAL_GROUPED", None)


if __name__ == "__main__":
    main()
