#!/usr/bin/env python
"""Small-cap sweep for the radial-blur gather grouping.

Hypothesis (r4): u8 [N, 12] gather operands are physically padded to
128 lanes on TPU (tiled layout), so a 2^18-row union box is ~33 MB —
way past VMEM scale, which is where the gather rate degrades from
~0.84 ns/row (r2 measurement, small operand) to the ~2.4 ns/row the
stage attribution shows (tools/profile_radial2.py). The r4 session-1
sweep only tested caps >= 2^16 (>= 8 MB padded) — all in the slow
regime, hence "flat". The cap list comes from ZT_SWEEP_CAPS
(comma-separated row counts; default "32768" = 2^15 for a quick single
point — set e.g. ZT_SWEEP_CAPS=4096,16384,65536,262144 for the full
2^12..2^18 sweep).

Uses profile_radial2's table build + full variant. 512^2 by default
(fast compiles); pass a size to confirm at 1024.

Usage: python tools/tune_radial2.py [zoom|spin] [size]
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import tools.profile_radial2 as p2

CAPS = [int(c) for c in __import__("os").environ.get(
    "ZT_SWEEP_CAPS", "32768").split(",")]


def main():
    zoom = (sys.argv[1] if len(sys.argv) > 1 else "zoom") == "zoom"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    p2.H = p2.W = size
    scale = 1e6 / (size * size)
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (size, size, p2.C), dtype=np.uint8))
    int(jnp.sum(arr.astype(jnp.int32)))
    n_samples = 8 + int(np.trunc(p2.STRENGTH * 24))
    fns = {}
    for cap in CAPS:
        p2.CAP = cap
        t0 = time.perf_counter()
        tiles, coords = p2.build_tables(size, size, zoom, n_samples)
        ngroups = sum(len(t["groups"]) for t in tiles)
        print(json.dumps({"cap": cap, "ngroups": ngroups, "tables_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)
        t0 = time.perf_counter()
        fns[cap] = (p2.build_full(tiles, size, size, p2.C), coords)
        out = np.asarray(fns[cap][0](arr, coords))  # warm
        print(json.dumps({"cap": cap,
                          "warm_s": round(time.perf_counter() - t0, 1),
                          "checksum": int(out.astype(np.int64).sum())}),
              flush=True)
    best = {cap: 1e9 for cap in CAPS}
    for rnd in range(4):
        for cap, (fn, coords) in fns.items():
            t = p2.time_variant(fn, arr, coords)
            best[cap] = min(best[cap], t)
            print(json.dumps({"round": rnd, "cap": cap,
                              "ms": round(t * 1e3, 2)}), flush=True)
    for cap, t in best.items():
        print(json.dumps({"cap": cap, "best_ms_per_mpix":
                          round(t * 1e3 * scale, 2)}), flush=True)


if __name__ == "__main__":
    main()
