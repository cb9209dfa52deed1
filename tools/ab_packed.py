#!/usr/bin/env python
"""On-chip A/B: packed radial gather vs the shipping layout, per cap.

Round-robin interleaved minima (tunnel contention). Configs:
  full@2^18      - shipping path baseline
  packed@2^16/18/20 - 8-wide x-packed patch rows (96 useful lanes of
                   128), physical box = logical_rows x 16 B

Usage: timeout 580 python -u tools/ab_packed.py [zoom|spin] [size]
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


def main():
    zoom = (sys.argv[1] if len(sys.argv) > 1 else "zoom") == "zoom"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    p2.H = p2.W = size
    scale = 1e6 / (size * size)
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (size, size, p2.C), dtype=np.uint8))
    t0 = time.perf_counter()
    int(jnp.sum(arr.astype(jnp.int32)))
    print(json.dumps({"probe_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    n_samples = 8 + int(np.trunc(p2.STRENGTH * 24))

    configs = [("full", 1 << 18), ("packed", 1 << 16),
               ("packed", 1 << 18), ("packed", 1 << 20)]
    fns = {}
    ref = None
    for kind, cap in configs:
        name = f"{kind}@2^{cap.bit_length() - 1}"
        p2.CAP = cap
        t0 = time.perf_counter()
        tiles, coords = p2.build_tables(size, size, zoom, n_samples)
        ngroups = sum(len(t["groups"]) for t in tiles)
        print(json.dumps({"cfg": name, "ngroups": ngroups, "tables_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)
        t0 = time.perf_counter()
        if kind == "full":
            fn = p2.build_full(tiles, size, size, p2.C)
        else:
            packsel = p2.build_packsel(tiles, coords, size, size, pack=8)
            pk = p2.build_packed(tiles, size, size, p2.C, pack=8)
            fn = (lambda pk=pk, packsel=packsel:
                  lambda a, c_: pk(a, c_, packsel))()
        fns[name] = (fn, coords)
        out = np.asarray(fn(arr, coords))
        line = {"cfg": name, "warm_s": round(time.perf_counter() - t0, 1)}
        if ref is None:
            ref = out
        else:
            line["exact"] = bool((out == ref).all())
        print(json.dumps(line), flush=True)

    best = {n: 1e9 for n in fns}
    for rnd in range(4):
        for name, (fn, coords) in fns.items():
            t = p2.time_variant(fn, arr, coords)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "cfg": name,
                              "ms": round(t * 1e3, 2)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"cfg": name, "best_ms_per_mpix":
                          round(t * 1e3 * scale, 2)}), flush=True)


if __name__ == "__main__":
    main()
