#!/usr/bin/env python
"""Attribute radial-blur time: gathers vs blend vs fixed overhead.

Variants (round-robin, per-variant minima — CLAUDE.md):
  full      — the real _accumulate_static apply
  gather    — same takes, blend replaced by summing raw gathered rows
  blend     — same blend math, takes replaced by a static slice
              (upper-left corner of each union box, broadcast)
plus a sample-count scaling sweep (4/8/16/24) of the full variant to
split per-sample marginal cost from fixed cost.

Timing: K=5 vs K=1 xor-linked dispatch chains forced by a one-element
fetch (axon executes lazily per fetch; block_until_ready is a no-op).

Usage: PYTHONPATH=.:/root/.axon_site python tools/profile_radial.py [zoom|spin]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from zignal_tpu.ops import motion_blur_ops as mb

STRENGTH = 0.7
TILE = 256


def make_sample_fn(h, w, zoom, n_samples):
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

    return sample_fn_np


def build_layout(h, w, zoom, n_samples):
    """The same trace-time planning _accumulate_static does."""
    sample_fn_np = make_sample_fn(h, w, zoom, n_samples)
    ys_full, xs_full = np.meshgrid(np.arange(h, dtype=np.float32),
                                   np.arange(w, dtype=np.float32),
                                   indexing="ij")
    cap = int(os.environ.get("ZT_RADIAL_GROUP_ROWS", str(1 << 18)))
    coords, layout = [], []
    for i0 in range(0, h, TILE):
        for j0 in range(0, w, TILE):
            th = min(TILE, h - i0)
            tw = min(TILE, w - j0)
            sxs = np.empty((n_samples, th, tw), np.float32)
            sys_ = np.empty((n_samples, th, tw), np.float32)
            samples = []
            for s in range(n_samples):
                sx, sy = sample_fn_np(s, xs_full[i0:i0 + th, j0:j0 + tw],
                                      ys_full[i0:i0 + th, j0:j0 + tw])
                sxs[s] = sx
                sys_[s] = sy
                ins = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
                x0i = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
                y0i = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
                samples.append((int(y0i.min()), int(y0i.max()) + 1,
                                int(x0i.min()), int(x0i.max()) + 1,
                                bool(ins.all()), bool(ins.any())))
            coords.append(jax.device_put(sxs))
            coords.append(jax.device_put(sys_))
            active = [s for s in range(n_samples) if samples[s][5]]
            groups = []
            for s in active:
                b = samples[s][:4]
                if groups:
                    sel, (y0u, y1u, x0u, x1u) = groups[-1]
                    ny0, ny1 = min(y0u, b[0]), max(y1u, b[1])
                    nx0, nx1 = min(x0u, b[2]), max(x1u, b[3])
                    if (ny1 - ny0) * (nx1 - nx0) <= cap:
                        sel.append(s)
                        groups[-1] = (sel, (ny0, ny1, nx0, nx1))
                        continue
                groups.append(([s], b))
            layout.append((i0, j0, th, tw, samples, groups))
    return coords, layout


def build_variant(arr, layout, variant):
    h, w, c = arr.shape

    @jax.jit
    def apply(a_in, coord_args):
        ap = a_in
        p10 = jnp.pad(ap, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
        p01 = jnp.pad(ap, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
        p11 = jnp.pad(p01, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
        patch = jnp.concatenate([ap, p10, p01, p11], axis=-1)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, (i0, j0, th, tw, samples, groups) in enumerate(layout):
            sxs = coord_args[2 * ti]
            sys_ = coord_args[2 * ti + 1]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for sel_s, (uby0, uby1, ubx0, ubx1) in groups:
                ubw = ubx1 - ubx0
                sel = np.asarray(sel_s)
                sxa = sxs[sel]
                sya = sys_[sel]
                x0 = jnp.floor(sxa)
                y0 = jnp.floor(sya)
                fxs = (sxa - x0)[..., None]
                fys = (sya - y0)[..., None]
                x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1) - ubx0
                y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1) - uby0
                box = jax.lax.slice(
                    patch, (uby0, ubx0, 0), (uby1, ubx1, 4 * c))
                if variant == "blend":
                    # fake gather: broadcast one static row per sample
                    g_all = jnp.broadcast_to(
                        box[0, 0][None, None, None, :],
                        (len(sel_s), th, tw, 4 * c))
                else:
                    g_all = jnp.take(box.reshape(-1, 4 * c),
                                     (y0i * ubw + x0i).reshape(-1),
                                     axis=0).reshape(len(sel_s), th, tw,
                                                     4 * c)
                if variant == "gather":
                    total = total + jnp.sum(
                        g_all.astype(jnp.float32), axis=0)[..., :c]
                    n_always += len(sel_s)
                    continue
                for si, s in enumerate(sel_s):
                    all_in = samples[s][4]
                    fx = fxs[si]
                    fy = fys[si]
                    g = g_all[si].astype(jnp.float32)
                    v0 = g[..., 0:c] * (1 - fx) + g[..., c:2 * c] * fx
                    v1 = (g[..., 2 * c:3 * c] * (1 - fx)
                          + g[..., 3 * c:4 * c] * fx)
                    val = v0 * (1 - fy) + v1 * fy
                    if all_in:
                        total = total + val
                        n_always += 1
                    else:
                        sx = sxa[si]
                        sy = sya[si]
                        inside = ((sx >= 0) & (sx < w)
                                  & (sy >= 0) & (sy < h))[..., None]
                        total = total + jnp.where(inside, val, 0.0)
                        count = count + inside
            count = count + jnp.float32(n_always)
            orig = jax.lax.slice(a, (i0, j0, 0), (i0 + th, j0 + tw, c))
            res = jnp.where(count > 0,
                            total / jnp.maximum(count, 1.0), orig)
            row.append(res)
            if j0 + tw >= w:
                out_rows.append(row[0] if len(row) == 1
                                else jnp.concatenate(row, axis=1))
                row = []
        result = out_rows[0] if len(out_rows) == 1 \
            else jnp.concatenate(out_rows, axis=0)
        return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)),
                        0, 255).astype(jnp.uint8)

    return apply


def time_chain(run, k_small=1, k_large=5, reps=2):
    best = 1e9
    for _ in range(reps):
        ts = {}
        for k in (k_small, k_large):
            t0 = time.perf_counter()
            r = run(None)
            for _ in range(k - 1):
                r = run(r)
            int(r[0, 0, 0])
            ts[k] = time.perf_counter() - t0
        best = min(best, (ts[k_large] - ts[k_small]) / (k_large - k_small))
    return best


def main():
    zoom = (sys.argv[1] if len(sys.argv) > 1 else "zoom") == "zoom"
    rng = np.random.default_rng(7)
    arr = jax.device_put(
        rng.integers(0, 256, (1024, 1024, 3), dtype=np.uint8))
    h, w = 1024, 1024

    n24 = 8 + int(np.trunc(STRENGTH * 24))
    coords, layout = build_layout(h, w, zoom, n24)
    variants = {v: build_variant(arr, layout, v)
                for v in ("full", "gather", "blend")}
    runs = {}
    for name, ap in variants.items():
        def run(prev=None, _ap=ap):
            x = arr if prev is None else jnp.bitwise_xor(arr, prev)
            return _ap(x, coords)
        runs[name] = run
        t0 = time.perf_counter()
        int(run()[0, 0, 0])
        print(json.dumps({"variant": name,
                          "warm_s": round(time.perf_counter() - t0, 2)}),
              flush=True)

    best = {name: 1e9 for name in runs}
    for rnd in range(4):
        for name, run in runs.items():
            t = time_chain(run)
            best[name] = min(best[name], t)
            print(json.dumps({"round": rnd, "variant": name,
                              "ms": round(t * 1e3, 2)}), flush=True)
    for name, t in best.items():
        print(json.dumps({"variant": name,
                          "best_ms_per_mpix": round(t * 1e3, 2)}),
              flush=True)

    # sample-count scaling of the full variant
    scale_runs = {}
    for ns in (4, 8, 16):
        cs, lay = build_layout(h, w, zoom, ns)
        ap = build_variant(arr, lay, "full")

        def run(prev=None, _ap=ap, _cs=cs):
            x = arr if prev is None else jnp.bitwise_xor(arr, prev)
            return _ap(x, _cs)
        scale_runs[ns] = run
        t0 = time.perf_counter()
        int(run()[0, 0, 0])
        print(json.dumps({"n_samples": ns,
                          "warm_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
    bests = {ns: 1e9 for ns in scale_runs}
    for rnd in range(3):
        for ns, run in scale_runs.items():
            t = time_chain(run)
            bests[ns] = min(bests[ns], t)
    for ns, t in bests.items():
        print(json.dumps({"n_samples": ns,
                          "best_ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
