#!/usr/bin/env python
"""Radial-blur stage attribution + candidate variants, on chip.

Round-robin interleaved timing (per-variant minima over rounds) of:
  full        - mirror of the shipping _accumulate_static apply fn
  gather_only - same patch build + gathers, blend skipped (i32 sums)
  blend_only  - same blend math, gathers replaced by a broadcast row
  precomp     - floor/clip/linear-index/fractions precomputed in host
                numpy and shipped as device args; device = take + lerp
  wide        - precomp + whole-group vectorized blend ([sel,th,tw,c]
                ops + masked sum over the sample axis)

All coordinate fields ship as JIT ARGUMENTS (closed-over device arrays
re-materialize as embedded HLO constants and blow the axon
compile-request limit at megapixel scale — HTTP 413, relearned here).

precomp is bit-identical by construction (numpy floor/clip/int32
replicate the device elementwise ops; blend order unchanged). wide
changes the accumulation ORDER of samples within a group (sum over the
sel axis), which for f32 adds is NOT identical in general -> checked
explicitly on chip before timing.

Uses a 512^2 image (compile for the 1024^2 unrolled program is ~200 s
through the tunnel); ms/MPix = 4x the measured per-call time.

Usage: python tools/profile_radial2.py [zoom|spin|both] [strength]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import jax.numpy as jnp


def use_cpu():
    """Reroute to the CPU backend (the axon sitecustomize ignores
    JAX_PLATFORMS; only jax.config works). Importers call this instead
    of relying on argv side effects."""
    jax.config.update("jax_platforms", "cpu")


EXACT_ONLY = False
# argv is only OURS when run as a script: importers (tune_radial2,
# ab_packed) have their own argv — parsing it here at import time once
# produced STRENGTH=512 -> n_samples=12296 and "hung" sweeps (r4), and
# --cpu/--exact flags silently rerouted importers' platforms. Every
# argv touch is therefore guarded by __name__ == "__main__".
if __name__ == "__main__":
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        use_cpu()
    if "--exact" in sys.argv:
        sys.argv.remove("--exact")
        EXACT_ONLY = True
STRENGTH = (float(sys.argv[2])
            if __name__ == "__main__" and len(sys.argv) > 2 else 0.7)
H = W = int(os.environ.get("ZT_PROF_SIZE", "512"))
C = 3
TILE = 256
CAP = 1 << 18


def sample_fn_np(s, xs, ys, zoom, n_samples, h, w):
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


def build_tables(h, w, zoom, n_samples):
    """Replicates _accumulate_static's table build (+extra host-side
    precomputed fields for the candidate variants). Returns (static
    layout, device-arg pytree)."""
    ys_full, xs_full = np.meshgrid(np.arange(h, dtype=np.float32),
                                   np.arange(w, dtype=np.float32),
                                   indexing="ij")
    tiles, coords = [], []
    for i0 in range(0, h, TILE):
        for j0 in range(0, w, TILE):
            th = min(TILE, h - i0)
            tw = min(TILE, w - j0)
            sxs = np.empty((n_samples, th, tw), np.float32)
            sys_ = np.empty((n_samples, th, tw), np.float32)
            samples = []
            for s in range(n_samples):
                sx, sy = sample_fn_np(s, xs_full[i0:i0 + th, j0:j0 + tw],
                                      ys_full[i0:i0 + th, j0:j0 + tw],
                                      zoom, n_samples, h, w)
                sxs[s] = sx
                sys_[s] = sy
                ins = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
                x0i = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
                y0i = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
                samples.append((int(y0i.min()), int(y0i.max()) + 1,
                                int(x0i.min()), int(x0i.max()) + 1,
                                bool(ins.all()), bool(ins.any())))
            active = [s for s in range(n_samples) if samples[s][5]]
            groups = []
            for s in active:
                b = samples[s][:4]
                if groups:
                    sel, (y0u, y1u, x0u, x1u) = groups[-1]
                    ny0, ny1 = min(y0u, b[0]), max(y1u, b[1])
                    nx0, nx1 = min(x0u, b[2]), max(x1u, b[3])
                    if (ny1 - ny0) * (nx1 - nx0) <= CAP:
                        sel.append(s)
                        groups[-1] = (sel, (ny0, ny1, nx0, nx1))
                        continue
                groups.append(([s], b))
            pre = []
            for sel_s, (uby0, uby1, ubx0, ubx1) in groups:
                ubw = ubx1 - ubx0
                sxa = sxs[sel_s]
                sya = sys_[sel_s]
                x0 = np.floor(sxa)
                y0 = np.floor(sya)
                fx = (sxa - x0).astype(np.float32)
                fy = (sya - y0).astype(np.float32)
                x0i = np.clip(x0.astype(np.int32), 0, w - 1) - ubx0
                y0i = np.clip(y0.astype(np.int32), 0, h - 1) - uby0
                lin = (y0i * ubw + x0i).astype(np.int32)
                ins = ((sxa >= 0) & (sxa < w) & (sya >= 0)
                       & (sya < h)).astype(np.float32)
                pre.append(dict(lin=jax.device_put(lin),
                                fx=jax.device_put(fx),
                                fy=jax.device_put(fy),
                                ins=jax.device_put(ins)))
            tiles.append(dict(i0=i0, j0=j0, th=th, tw=tw,
                              samples=samples, groups=groups))
            coords.append(dict(sxs=jax.device_put(sxs),
                               sys=jax.device_put(sys_), pre=pre))
    return tiles, coords


def make_patch(a_in, c):
    ap = a_in
    p10 = jnp.pad(ap, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    p01 = jnp.pad(ap, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    p11 = jnp.pad(p01, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    return jnp.concatenate([ap, p10, p01, p11], axis=-1)


def finish_u8(result):
    return jnp.clip(jnp.trunc(jnp.floor(result + 0.5)), 0, 255
                    ).astype(jnp.uint8)


def assemble(tiles, w, row, out_rows, t, res):
    row.append(res)
    if t["j0"] + t["tw"] >= w:
        out_rows.append(row[0] if len(row) == 1
                        else jnp.concatenate(row, axis=1))
        row.clear()


def build_full(tiles, h, w, c):
    """Mirror of the shipping apply fn (per-sample blend loop; device
    computes floor/frac/index from the shipped sx/sy fields)."""
    @jax.jit
    def apply(a_in, coords):
        patch = make_patch(a_in, c)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, t in enumerate(tiles):
            th, tw = t["th"], t["tw"]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for (sel_s, (uby0, uby1, ubx0, ubx1)) in t["groups"]:
                ubw = ubx1 - ubx0
                sel = np.asarray(sel_s)
                sxa = coords[ti]["sxs"][sel]
                sya = coords[ti]["sys"][sel]
                x0 = jnp.floor(sxa)
                y0 = jnp.floor(sya)
                fxs = (sxa - x0)[..., None]
                fys = (sya - y0)[..., None]
                x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1) - ubx0
                y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1) - uby0
                box = jax.lax.slice(patch, (uby0, ubx0, 0),
                                    (uby1, ubx1, 4 * c))
                g_all = jnp.take(box.reshape(-1, 4 * c),
                                 (y0i * ubw + x0i).reshape(-1),
                                 axis=0).reshape(len(sel_s), th, tw, 4 * c)
                for si, s in enumerate(sel_s):
                    all_in = t["samples"][s][4]
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
            orig = jax.lax.slice(a, (t["i0"], t["j0"], 0),
                                 (t["i0"] + th, t["j0"] + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1.0),
                            orig)
            assemble(tiles, w, row, out_rows, t, res)
        return finish_u8(out_rows[0] if len(out_rows) == 1
                         else jnp.concatenate(out_rows, axis=0))
    return apply


def build_gather_only(tiles, h, w, c):
    """Patch build + the exact same takes; consume with i32 sums."""
    @jax.jit
    def apply(a_in, coords):
        patch = make_patch(a_in, c)
        acc = jnp.zeros((), jnp.int32)
        for ti, t in enumerate(tiles):
            for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                    enumerate(t["groups"]):
                lin = coords[ti]["pre"][gi]["lin"]
                box = jax.lax.slice(patch, (uby0, ubx0, 0),
                                    (uby1, ubx1, 4 * c))
                g_all = jnp.take(box.reshape(-1, 4 * c),
                                 lin.reshape(-1), axis=0)
                acc = acc + jnp.sum(g_all.astype(jnp.int32))
        return jnp.broadcast_to(acc.astype(jnp.uint8), (h, w, c))
    return apply


def build_blend_only(tiles, h, w, c):
    """Same blend math; the gather is replaced by broadcasting row 0 of
    each box (the take disappears, every downstream op remains)."""
    @jax.jit
    def apply(a_in, coords):
        patch = make_patch(a_in, c)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, t in enumerate(tiles):
            th, tw = t["th"], t["tw"]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                    enumerate(t["groups"]):
                pre = coords[ti]["pre"][gi]
                fxs = pre["fx"][..., None]
                fys = pre["fy"][..., None]
                ins = pre["ins"]
                box = jax.lax.slice(patch, (uby0, ubx0, 0),
                                    (uby1, ubx1, 4 * c))
                g_all = jnp.broadcast_to(
                    box.reshape(-1, 4 * c)[0],
                    (len(sel_s), th, tw, 4 * c))
                for si, s in enumerate(sel_s):
                    all_in = t["samples"][s][4]
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
                        inside = ins[si][..., None] > 0
                        total = total + jnp.where(inside, val, 0.0)
                        count = count + ins[si][..., None]
            count = count + jnp.float32(n_always)
            orig = jax.lax.slice(a, (t["i0"], t["j0"], 0),
                                 (t["i0"] + th, t["j0"] + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1.0),
                            orig)
            assemble(tiles, w, row, out_rows, t, res)
        return finish_u8(out_rows[0] if len(out_rows) == 1
                         else jnp.concatenate(out_rows, axis=0))
    return apply


def build_precomp(tiles, h, w, c):
    """Device work = take + per-sample lerp only; floor/clip/index/frac
    shipped from host numpy. Blend order identical to full."""
    @jax.jit
    def apply(a_in, coords):
        patch = make_patch(a_in, c)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, t in enumerate(tiles):
            th, tw = t["th"], t["tw"]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                    enumerate(t["groups"]):
                pre = coords[ti]["pre"][gi]
                box = jax.lax.slice(patch, (uby0, ubx0, 0),
                                    (uby1, ubx1, 4 * c))
                g_all = jnp.take(box.reshape(-1, 4 * c),
                                 pre["lin"].reshape(-1),
                                 axis=0).reshape(len(sel_s), th, tw, 4 * c)
                for si, s in enumerate(sel_s):
                    all_in = t["samples"][s][4]
                    fx = pre["fx"][si][..., None]
                    fy = pre["fy"][si][..., None]
                    g = g_all[si].astype(jnp.float32)
                    v0 = g[..., 0:c] * (1 - fx) + g[..., c:2 * c] * fx
                    v1 = (g[..., 2 * c:3 * c] * (1 - fx)
                          + g[..., 3 * c:4 * c] * fx)
                    val = v0 * (1 - fy) + v1 * fy
                    if all_in:
                        total = total + val
                        n_always += 1
                    else:
                        inside = pre["ins"][si][..., None] > 0
                        total = total + jnp.where(inside, val, 0.0)
                        count = count + pre["ins"][si][..., None]
            count = count + jnp.float32(n_always)
            orig = jax.lax.slice(a, (t["i0"], t["j0"], 0),
                                 (t["i0"] + th, t["j0"] + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1.0),
                            orig)
            assemble(tiles, w, row, out_rows, t, res)
        return finish_u8(out_rows[0] if len(out_rows) == 1
                         else jnp.concatenate(out_rows, axis=0))
    return apply


def build_wide(tiles, h, w, c):
    """precomp + whole-group vectorized blend ([sel,th,tw,c] ops +
    masked sum over the sample axis). Different f32 add ORDER for the
    samples within a group -> exactness checked, not assumed."""
    @jax.jit
    def apply(a_in, coords):
        patch = make_patch(a_in, c)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, t in enumerate(tiles):
            th, tw = t["th"], t["tw"]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                    enumerate(t["groups"]):
                pre = coords[ti]["pre"][gi]
                box = jax.lax.slice(patch, (uby0, ubx0, 0),
                                    (uby1, ubx1, 4 * c))
                g = jnp.take(box.reshape(-1, 4 * c),
                             pre["lin"].reshape(-1),
                             axis=0).reshape(len(sel_s), th, tw, 4 * c
                                             ).astype(jnp.float32)
                fx = pre["fx"][..., None]
                fy = pre["fy"][..., None]
                v0 = g[..., 0:c] * (1 - fx) + g[..., c:2 * c] * fx
                v1 = (g[..., 2 * c:3 * c] * (1 - fx)
                      + g[..., 3 * c:4 * c] * fx)
                val = v0 * (1 - fy) + v1 * fy
                allmask = np.asarray([t["samples"][s][4] for s in sel_s])
                if allmask.all():
                    total = total + jnp.sum(val, axis=0)
                else:
                    m = pre["ins"][..., None]
                    total = total + jnp.sum(val * m, axis=0)
                    count = count + jnp.sum(
                        m * jnp.asarray((~allmask).astype(np.float32)
                                        )[:, None, None, None], axis=0)
                n_always += int(allmask.sum())
            count = count + jnp.float32(n_always)
            orig = jax.lax.slice(a, (t["i0"], t["j0"], 0),
                                 (t["i0"] + th, t["j0"] + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1.0),
                            orig)
            assemble(tiles, w, row, out_rows, t, res)
        return finish_u8(out_rows[0] if len(out_rows) == 1
                         else jnp.concatenate(out_rows, axis=0))
    return apply


def build_packed(tiles, h, w, c, pack=8):
    """precomp + PACKED patch: `pack` consecutive x-positions share one
    gather row ([H, ceil(W/pack), pack*4c] via a free reshape), so the
    physical 128-lane-padded operand shrinks pack-x and the union box
    stays VMEM-scale at any cap. Row count per (pixel, sample) is
    unchanged; the x0%pack lane pick is a log2(pack)-level static-mask
    select of u8 values — pure data movement, bit-exact."""
    lanes = pack * 4 * c
    assert lanes <= 128
    nlvl = int(np.log2(pack))

    @jax.jit
    def apply(a_in, coords, packsel):
        patch = make_patch(a_in, c)
        wp = -(-(w + 0) // pack)  # padded-to-pack column blocks
        patch_p = jnp.pad(patch, ((0, 0), (0, wp * pack - w), (0, 0))
                          ).reshape(patch.shape[0], wp, lanes)
        a = a_in.astype(jnp.float32)
        out_rows, row = [], []
        for ti, t in enumerate(tiles):
            th, tw = t["th"], t["tw"]
            total = jnp.zeros((th, tw, c), jnp.float32)
            count = jnp.zeros((th, tw, 1), jnp.float32)
            n_always = 0
            for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                    enumerate(t["groups"]):
                pre = coords[ti]["pre"][gi]
                ps = packsel[ti][gi]
                ubx0p = ubx0 // pack
                ubx1p = -(-ubx1 // pack)
                ubwp = ubx1p - ubx0p
                box = jax.lax.slice(patch_p, (uby0, ubx0p, 0),
                                    (uby1, ubx1p, lanes))
                g_all = jnp.take(box.reshape(-1, lanes),
                                 ps["lin"].reshape(-1),
                                 axis=0).reshape(len(sel_s), th, tw, lanes)
                for si, s in enumerate(sel_s):
                    all_in = t["samples"][s][4]
                    fx = pre["fx"][si][..., None]
                    fy = pre["fy"][si][..., None]
                    g = g_all[si]
                    half = lanes
                    for lvl in range(nlvl):
                        half //= 2
                        m = ps["bits"][lvl][si][..., None]
                        g = jnp.where(m, g[..., half:2 * half],
                                      g[..., 0:half])
                    g = g.astype(jnp.float32)
                    v0 = g[..., 0:c] * (1 - fx) + g[..., c:2 * c] * fx
                    v1 = (g[..., 2 * c:3 * c] * (1 - fx)
                          + g[..., 3 * c:4 * c] * fx)
                    val = v0 * (1 - fy) + v1 * fy
                    if all_in:
                        total = total + val
                        n_always += 1
                    else:
                        inside = pre["ins"][si][..., None] > 0
                        total = total + jnp.where(inside, val, 0.0)
                        count = count + pre["ins"][si][..., None]
            count = count + jnp.float32(n_always)
            orig = jax.lax.slice(a, (t["i0"], t["j0"], 0),
                                 (t["i0"] + th, t["j0"] + tw, c))
            res = jnp.where(count > 0, total / jnp.maximum(count, 1.0),
                            orig)
            assemble(tiles, w, row, out_rows, t, res)
        return finish_u8(out_rows[0] if len(out_rows) == 1
                         else jnp.concatenate(out_rows, axis=0))
    return apply


def build_packsel(tiles, coords, h, w, pack=8):
    """Host-side packed linear indices + per-level select masks.
    Recomputes x0i/y0i exactly as build_tables' pre step."""
    nlvl = int(np.log2(pack))
    out = []
    for ti, t in enumerate(tiles):
        per_tile = []
        for gi, (sel_s, (uby0, uby1, ubx0, ubx1)) in \
                enumerate(t["groups"]):
            sxa = np.asarray(coords[ti]["sxs"])[sel_s]
            sya = np.asarray(coords[ti]["sys"])[sel_s]
            x0i = np.clip(np.floor(sxa).astype(np.int32), 0, w - 1)
            y0i = np.clip(np.floor(sya).astype(np.int32), 0, h - 1)
            ubx0p = ubx0 // pack
            ubx1p = -(-ubx1 // pack)
            ubwp = ubx1p - ubx0p
            xb = x0i // pack - ubx0p
            k = x0i % pack
            lin = ((y0i - uby0) * ubwp + xb).astype(np.int32)
            bits = [jax.device_put(
                ((k >> (nlvl - 1 - lvl)) & 1).astype(bool))
                for lvl in range(nlvl)]
            per_tile.append(dict(lin=jax.device_put(lin), bits=bits))
        out.append(per_tile)
    return out


def time_variant(apply, arr, coords, k_small=1, k_large=5):
    ts = {}
    for k in (k_small, k_large):
        t0 = time.perf_counter()
        r = apply(arr, coords)
        for _ in range(k - 1):
            r = apply(jnp.bitwise_xor(arr, r), coords)
        int(r[0, 0, 0])
        ts[k] = time.perf_counter() - t0
    return (ts[k_large] - ts[k_small]) / (k_large - k_small)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "zoom"
    modes = {"zoom": [True], "spin": [False], "both": [True, False]}[which]
    rng = np.random.default_rng(7)
    arr = jax.device_put(rng.integers(0, 256, (H, W, C), dtype=np.uint8))
    int(jnp.sum(arr.astype(jnp.int32)))  # force upload
    n_samples = 8 + int(np.trunc(min(max(STRENGTH, 0.0), 1.0) * 24))
    scale = 1e6 / (H * W)
    print(json.dumps({"n_samples": n_samples, "hw": [H, W]}), flush=True)
    for zoom in modes:
        mode = "zoom" if zoom else "spin"
        t0 = time.perf_counter()
        tiles, coords = build_tables(H, W, zoom, n_samples)
        print(json.dumps({"mode": mode, "tables_s":
                          round(time.perf_counter() - t0, 2)}), flush=True)
        variants = {
            "full": build_full(tiles, H, W, C),
            "gather_only": build_gather_only(tiles, H, W, C),
            "blend_only": build_blend_only(tiles, H, W, C),
            "precomp": build_precomp(tiles, H, W, C),
            "wide": build_wide(tiles, H, W, C),
        }
        packsel = build_packsel(tiles, coords, H, W, pack=8)
        pk = build_packed(tiles, H, W, C, pack=8)
        variants["packed"] = lambda a, c_: pk(a, c_, packsel)
        ref = None
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = np.asarray(fn(arr, coords))
            dt = time.perf_counter() - t0
            line = {"mode": mode, "variant": name, "warm_s": round(dt, 2)}
            if name == "full":
                ref = out
            elif name in ("precomp", "wide", "packed"):
                line["exact"] = bool((out == ref).all())
                line["maxdiff"] = int(
                    np.abs(out.astype(int) - ref.astype(int)).max())
            print(json.dumps(line), flush=True)
        if EXACT_ONLY:
            continue
        best = {n: 1e9 for n in variants}
        for rnd in range(4):
            for name, fn in variants.items():
                t = time_variant(fn, arr, coords)
                best[name] = min(best[name], t)
                print(json.dumps({"round": rnd, "variant": name,
                                  "ms": round(t * 1e3, 2)}), flush=True)
        for name, t in best.items():
            print(json.dumps({"mode": mode, "variant": name,
                              "best_ms_per_mpix":
                              round(t * 1e3 * scale, 2)}), flush=True)


if __name__ == "__main__":
    main()
