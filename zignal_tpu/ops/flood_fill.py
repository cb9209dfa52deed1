"""Device flood fill (reference: src/image/flood_fill.zig:5-131).

The reference's stack DFS computes an order-independent fixed point:

- SEED mode: the connected component (4/8-connectivity) of the seed
  inside the candidate mask ``dist(pixel, seed) <= threshold`` — the
  mask is computable in one vectorized pass.
- NEIGHBOR mode: the transitive closure of the seed over the symmetric
  edge relation ``dist(pixel, neighbor) <= threshold`` — the 4/8
  per-direction edge masks are computable in one pass each.

Both become a ``lax.while_loop`` over a boolean region mask. Each
iteration combines unbounded row/column *run propagation* (an
associative scan of the boolean recurrence s[j] = a[j] | (b[j] &
s[j-1]), which crosses an entire row in one step) with a single-hop
dilate for the remaining directions (incl. diagonals), so convergence
takes O(number of turns in the region geometry) iterations, not
O(region diameter).

Distances: the reference compares f64 Euclidean distance; pixel values
are u8 so the squared distance is a small exact integer. The threshold
is converted ON HOST to the largest int N with sqrt(N) <= threshold,
and the device compares integer squared distances against N — exactly
equivalent to the reference's f64 compare, with no device f64 needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["flood_region", "threshold_sq_int"]

_OFFSETS4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_OFFSETS8 = _OFFSETS4 + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def threshold_sq_int(threshold: float) -> int:
    """Largest integer N with sqrt(N) <= threshold (f64 math), so the
    reference's ``dist <= threshold`` becomes ``sq_dist <= N``."""
    thr = float(threshold)
    if thr < 0:
        return -1
    n = int(np.floor(thr * thr))
    while n > 0 and np.sqrt(n) > thr:
        n -= 1
    while np.sqrt(n + 1.0) <= thr:
        n += 1
    return n


def _shift(m, dr: int, dc: int):
    """out[r, c] = m[r + dr, c + dc]; zeros/False outside. m: [H, W, ...]."""
    pad = [(max(-dr, 0), max(dr, 0)), (max(-dc, 0), max(dc, 0))]
    pad += [(0, 0)] * (m.ndim - 2)
    p = jnp.pad(m, pad)
    start = [max(dr, 0), max(dc, 0)] + [0] * (m.ndim - 2)
    limit = [start[0] + m.shape[0], start[1] + m.shape[1]]
    limit += list(m.shape[2:])
    return jax.lax.slice(p, start, limit)


def _run_scan(region, b, axis: int, reverse: bool):
    """Fixed point of s[j] = region[j] | (b[j] & s[j-1]) along `axis`
    (j+1 when reverse). b[j] gates propagation INTO j from j-1 (j+1)."""

    def comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 | (b2 & a1), b2 & b1

    if reverse:
        region = jnp.flip(region, axis)
        b = jnp.flip(b, axis)
    s, _ = jax.lax.associative_scan(comb, (region, b), axis=axis)
    return jnp.flip(s, axis) if reverse else s


def _edge_mask(img_i32, dr: int, dc: int, thr_sq):
    """dist(img[p], img[p + (dr, dc)])^2 <= thr_sq, False out of bounds."""
    nb = _shift(img_i32, dr, dc)
    d = img_i32 - nb
    sq = (d * d).sum(axis=-1)
    inb = _shift(jnp.ones(img_i32.shape[:2], bool), dr, dc)
    return (sq <= thr_sq) & inb


@partial(jax.jit, static_argnames=("connectivity", "neighbor_mode"))
def flood_region(img_u8, row, col, thr_sq, connectivity: int = 4,
                 neighbor_mode: bool = False):
    """Region mask of a flood fill from (row, col). img_u8: [H, W, C]
    uint8; row/col/thr_sq may be traced (no recompile per seed)."""
    img = img_u8.astype(jnp.int32)
    h, w = img.shape[0], img.shape[1]
    offsets = _OFFSETS8 if connectivity == 8 else _OFFSETS4
    seed = jnp.zeros((h, w), bool).at[row, col].set(True)

    if neighbor_mode:
        gates = {d: _edge_mask(img, d[0], d[1], thr_sq) for d in offsets}
    else:
        seed_val = jax.lax.dynamic_slice(
            img, (row, col, 0), (1, 1, img.shape[2]))
        d = img - seed_val
        cand = ((d * d).sum(axis=-1) <= thr_sq) | seed
        gates = {d: cand for d in offsets}

    # run-propagation gates: b[j] must gate entry INTO j from j-1 (fwd)
    # or j+1 (rev) — exactly the (0,-1)/(0,1)/(-1,0)/(1,0) edge masks
    bx_f = gates[(0, -1)]
    bx_r = gates[(0, 1)]
    by_f = gates[(-1, 0)]
    by_r = gates[(1, 0)]

    def body(carry):
        region, _ = carry
        new = region
        new = new | _run_scan(new, bx_f, axis=1, reverse=False)
        new = new | _run_scan(new, bx_r, axis=1, reverse=True)
        new = new | _run_scan(new, by_f, axis=0, reverse=False)
        new = new | _run_scan(new, by_r, axis=0, reverse=True)
        for d in offsets:
            new = new | (_shift(new, d[0], d[1]) & gates[d])
        return new, jnp.any(new != region)

    region, _ = jax.lax.while_loop(lambda c: c[1], body, (seed, True))
    return region
