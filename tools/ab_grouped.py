#!/usr/bin/env python
"""On-chip A/B: grouped-window radial gather vs the per-pixel path.

Calls the real library (zignal_tpu.ops.motion_blur_ops.radial_blur)
with ZT_RADIAL_GROUPED toggled per variant (the knob is read per call
and keyed into the static cache, so both compiled programs coexist).
Round-robin interleaved minima over >=4 rounds (tunnel contention);
xor-chained calls force execution, and the chain-differenced time
cancels the fixed fetch latency (per-call ~6 ms dispatch remains in
both variants equally).

Usage: timeout 580 python -u tools/ab_grouped.py [zoom|spin|both] [size]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


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

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    strength = float(os.environ.get("ZT_AB_STRENGTH", "0.7"))
    modes = {"zoom": [True], "spin": [False],
             "both": [True, False]}[which]
    scale = 1e6 / (size * size)
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    int(jnp.sum(arr.astype(jnp.int32)))
    print(json.dumps({"probe_s": round(time.perf_counter() - t0, 1),
                      "size": size, "strength": strength}), flush=True)

    for zoom in modes:
        mode = "zoom" if zoom else "spin"
        calls = {}
        ref = None
        for name, env, g16 in (("perpix", "0", "0"), ("grouped", "1", "0"),
                               ("g16", "1", "1")):
            os.environ["ZT_RADIAL_GROUPED"] = env
            os.environ["ZT_RADIAL_G16"] = g16

            def call(a, env=env, g16=g16):
                os.environ["ZT_RADIAL_GROUPED"] = env
                os.environ["ZT_RADIAL_G16"] = g16
                return mb.radial_blur(a, 0.5, 0.5, strength, zoom)

            t0 = time.perf_counter()
            out = np.asarray(call(arr))
            line = {"mode": mode, "cfg": name,
                    "warm_s": round(time.perf_counter() - t0, 1)}
            if ref is None:
                ref = out
            else:
                line["exact"] = bool((out == ref).all())
            print(json.dumps(line), flush=True)
            calls[name] = call

        best = {n: 1e9 for n in calls}
        for rnd in range(4):
            for name, call in calls.items():
                t = time_variant(call, arr)
                best[name] = min(best[name], t)
                print(json.dumps({"mode": mode, "round": rnd,
                                  "cfg": name,
                                  "ms": round(t * 1e3, 2)}), flush=True)
        for name, t in best.items():
            print(json.dumps({"mode": mode, "cfg": name,
                              "best_ms": round(t * 1e3, 2),
                              "best_ms_per_mpix":
                              round(t * 1e3 * scale, 2)}), flush=True)
    os.environ.pop("ZT_RADIAL_GROUPED", None)
    os.environ.pop("ZT_RADIAL_G16", None)


if __name__ == "__main__":
    main()
