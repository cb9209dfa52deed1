#!/usr/bin/env python
"""On-chip probe: XLA dynamic-gather cost vs gathered ROW WIDTH.

The radial-blur floor is set by per-row gather cost (~2.4 ns/row for
128-lane u8 rows, r4 attribution; packing x-positions to shrink the
OPERAND did not change it — r5 ab_packed). The remaining lever is
fewer, WIDER rows: one row serving 8 consecutive output pixels needs
~240 u8 lanes (2 y x 10 x-positions x 12 B). Whether that costs 1 row
or ~2 row-units decides if the scheme wins 8x or 4x on the gather.

Measures jnp.take(operand, idx, axis=0) for u8 operands [M, L] with
L in {16, 64, 128, 256, 512, 1024}, runtime idx, N = 2^20 rows, via
the in-jit fori_loop xor-perturbed timer (CLAUDE.md timing rules).

Usage: timeout 580 python -u tools/probe_gather_width.py [M_log2]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    m_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    M = 1 << m_log2
    N = 1 << 20
    rng = np.random.default_rng(11)
    idx_np = rng.integers(0, M, N, dtype=np.int32)

    t0 = time.perf_counter()
    probe = jax.device_put(jnp.ones((8, 8), jnp.float32))
    float(jnp.sum(probe))
    print(json.dumps({"probe_s": round(time.perf_counter() - t0, 1),
                      "M": M, "N": N}), flush=True)

    @partial(jax.jit, static_argnames=("iters", "gather"))
    def timed(op, idx, big, iters, gather):
        def body(i, carry):
            s, idx = carry
            if gather:
                # perturb indices per iteration so XLA cannot hoist
                # the gather; xor of the low bit stays in [0, M)
                g = jnp.take(op, idx ^ (i & 1), axis=0)
            else:
                # consumption-only baseline: same [N, L] sum, no
                # gather (xor-perturbed so it can't be hoisted)
                g = big ^ i.astype(jnp.uint8)
            return s + jnp.sum(g.astype(jnp.int32)), idx

        s, _ = jax.lax.fori_loop(0, iters, body,
                                 (jnp.int32(0), idx))
        return s

    def per_iter(op, idx, big, gather):
        small, large = 2, 10
        int(timed(op, idx, big, small, gather))
        int(timed(op, idx, big, large, gather))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(timed(op, idx, big, small, gather))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(timed(op, idx, big, large, gather))
            t_large = time.perf_counter() - t0
            best = min(best, (t_large - t_small) / (large - small))
        return best

    results = {}
    for L in (16, 64, 128, 256, 512, 1024):
        op = jax.device_put(
            rng.integers(0, 256, (M, L), dtype=np.uint8))
        big = jax.device_put(
            rng.integers(0, 256, (N, L), dtype=np.uint8))
        idx = jax.device_put(idx_np)
        t_g = per_iter(op, idx, big, True)
        t_s = per_iter(op, idx, big, False)
        ns_row = max(0.0, t_g - t_s) / N * 1e9
        results[L] = ns_row
        print(json.dumps({"lanes": L,
                          "ns_per_row": round(ns_row, 3),
                          "ns_per_row_raw": round(t_g / N * 1e9, 3),
                          "sum_baseline_ns": round(t_s / N * 1e9, 3),
                          "ns_per_row_per_128l":
                          round(ns_row / max(1, L / 128), 3)}),
              flush=True)
    base = results.get(128)
    if base:
        print(json.dumps({"width_scaling": {
            str(L): round(v / base, 2) for L, v in results.items()}}),
            flush=True)


if __name__ == "__main__":
    main()
