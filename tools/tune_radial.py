#!/usr/bin/env python
"""On-chip sweep of ZT_RADIAL_GROUP_ROWS (radial-blur gather grouping).

Round-robin over cap values in ONE process with per-variant minima
(tunnel contention spikes make sequential comparisons meaningless —
CLAUDE.md). Each cap's coordinate tables + compiled apply stay cached
by embedding the cap in the _STATIC_CACHE key, so rounds after the
first are dispatch-only. Timing: difference K=5 vs K=1 dispatch CHAINS
(each link xors the previous output into the input — axon executes
lazily per host fetch, so independent dispatches would never run) and
force with a one-element fetch; the fixed fetch latency cancels in the
difference.

Usage: PYTHONPATH=.:/root/.axon_site python tools/tune_radial.py [zoom|spin|both]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from zignal_tpu.ops import motion_blur_ops as mb

CAPS = [1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20]
STRENGTH = 0.7          # 8 + trunc(0.7*24) = 24 samples (VERDICT r3 #5)


def build(arr, zoom, cap):
    h, w = arr.shape[0], arr.shape[1]
    n_samples = 8 + int(np.trunc(STRENGTH * 24))

    # same sample_fn_np as radial_blur builds; key carries the cap so
    # each variant keeps its own tables + compiled apply
    import zignal_tpu.ops.motion_blur_ops as m

    def sample_fn_np(s, xs, ys):
        f32 = np.float32
        cxf = f32(0.5) * f32(w - 1)
        cyf = f32(0.5) * f32(h - 1)
        sclf = f32(STRENGTH)
        maxdf = np.sqrt(cxf * cxf + cyf * cyf)
        t = (f32(s) - f32(n_samples - 1) / f32(2.0)) / f32(n_samples - 1)
        dx = xs - cxf
        dy = ys - cyf
        dist = np.sqrt(dx * dx + dy * dy)
        if zoom:
            blur_amount = dist / max(maxdf, f32(1e-6)) * sclf * f32(20.0)
            scale = f32(1.0) + t * blur_amount * f32(0.1)
            return cxf + dx * scale, cyf + dy * scale
        blur_amount = sclf * f32(0.5)
        new_angle = np.arctan2(dy, dx) + t * blur_amount
        return (cxf + dist * np.cos(new_angle),
                cyf + dist * np.sin(new_angle))

    import jax.numpy as jnp

    def run(prev=None):
        # env read happens at table-build time (first call per key), so
        # it must be set per-CALL, not at build() time — the builds for
        # every cap run before any table is built
        os.environ["ZT_RADIAL_GROUP_ROWS"] = str(cap)
        x = arr if prev is None else jnp.bitwise_xor(arr, prev)
        return m._accumulate_static(
            x, sample_fn_np, n_samples,
            key=("tune-radial", h, w, arr.shape[2], zoom, cap))

    return run


def time_variant(run, k_small=1, k_large=5, reps=2):
    """Difference K=5 vs K=1 dispatch CHAINS. Two axon gotchas
    (CLAUDE.md): block_until_ready does NOT force execution (only a
    host fetch does), and independent dispatches are lazy per-fetch —
    so each iteration's input must depend on the previous output
    (bitwise_xor) and the chain end is forced with a one-element fetch.
    The xor adds one small elementwise dispatch per link, identical
    across cap variants."""
    import jax.numpy as jnp

    best = 1e9
    for _ in range(reps):
        ts = {}
        for k in (k_small, k_large):
            t0 = time.perf_counter()
            r = run(None)
            for _ in range(k - 1):
                r = run(r)
            int(r[0, 0, 0])          # host fetch forces the whole chain
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[k_large] - ts[k_small]) / (k_large - k_small))
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (1024, 1024, 3), dtype=np.uint8))
    jax.block_until_ready(arr)
    modes = {"zoom": [True], "spin": [False],
             "both": [True, False]}[which]
    for zoom in modes:
        mb._STATIC_CACHE.clear()
        runs = {cap: build(arr, zoom, cap) for cap in CAPS}
        for cap, run in runs.items():     # warm: tables + compile + exec
            t0 = time.perf_counter()
            int(run()[0, 0, 0])           # fetch: block_until_ready is lazy
            print(json.dumps({"mode": "zoom" if zoom else "spin",
                              "cap": cap,
                              "warm_s": round(time.perf_counter() - t0, 2)}),
                  flush=True)
        best = {cap: 1e9 for cap in CAPS}
        for rnd in range(4):
            for cap, run in runs.items():
                t = time_variant(run)
                best[cap] = min(best[cap], t)
                print(json.dumps({"round": rnd, "cap": cap,
                                  "ms": round(t * 1e3, 2)}), flush=True)
        for cap, t in best.items():
            print(json.dumps({"mode": "zoom" if zoom else "spin",
                              "cap": cap,
                              "best_ms_per_mpix": round(t * 1e3, 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
