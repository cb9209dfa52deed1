"""Exact integer resampling on the MXU (bit-exact fixed point as matmuls).

Separable resampling ops (resize, separable convolution) apply a per-axis
weighted sum with trace-time weights — i.e. a banded matrix multiply.
On TPU the MXU is ~2 orders of magnitude faster than gather/strided-slice
lowerings of the same op, and it can be EXACT:

- bf16 represents every integer in [0, 256]; the MXU multiplies bf16
  exactly and accumulates in f32, so products of base-256 digits
  (<= 255 * 255) and their row sums stay exact while partial sums are
  below 2^24.
- weights and inputs are therefore decomposed into base-256 digits,
  one matmul per digit pair, recombined with power-of-256 shifts
  (in f32 when the bound allows, else int32 adds — never int32
  multiplies, which are emulated on the VPU).

Border modes are folded into the matrix at trace time (mirror/replicate/
wrap taps scatter-add onto the same source row), reproducing
`resolveIndex` semantics exactly (reference: src/image/border.zig:46).
"""

from __future__ import annotations

import os
import string

import jax
import jax.numpy as jnp
import numpy as np

# layout strategy for the digit einsums (A/B-able at trace time):
#   "sub"  — einsum on the array in place (XLA chooses transposes)
#   "last" — move the contracted axis minor-most first (explicit
#             transpose so the MXU sees K in the lane dimension)
_LAYOUT = os.environ.get("ZT_MXU_LAYOUT", "sub")

__all__ = ["build_tap_matrix", "exact_axis_apply", "mxu_ok"]

_F32_EXACT = 1 << 24
_MAX_MATRIX_ELEMS = 1 << 22  # gate: dense [dst, src] weight matrix size


def mxu_ok(dst_n: int, src_n: int, weights) -> bool:
    """MXU path applies for non-negative integer weights (negatives would
    need a signed split). Arbitrarily large axes are handled by blocking
    the dense matrix over dst rows (exact_axis_apply)."""
    w = np.asarray(weights)
    return bool(w.min() >= 0 and np.all(w == np.round(w)))


def build_tap_matrix(idx, weights, src_n: int, dst_n: int) -> np.ndarray:
    """Scatter-add tap (index, weight) tables into a dense [dst, src]
    int64 matrix. idx: [dst, k] resolved source indices (-1 = ZERO-mode
    out-of-bounds, skipped); weights: [k] or [dst, k] integer weights."""
    idx = np.asarray(idx, dtype=np.int64)
    w = np.asarray(weights, dtype=np.int64)
    if w.ndim == 1:
        w = np.broadcast_to(w[None, :], idx.shape)
    M = np.zeros((dst_n, src_n), dtype=np.int64)
    rows = np.repeat(np.arange(dst_n), idx.shape[1])
    cols = idx.ravel()
    vals = w.ravel()
    keep = cols >= 0
    np.add.at(M, (rows[keep], cols[keep]), vals[keep])
    return M


def _digits(M: np.ndarray):
    """Base-256 digits of a non-negative integer matrix, least first.
    Every digit is <= 255 except a value of exactly 256 is kept as a
    single digit (bf16-exact) to avoid an extra matmul in the common
    normalized-kernel case."""
    out = []
    M = M.astype(np.int64)
    if M.max() <= 256:
        return [M]
    while M.any():
        out.append(M % 256)
        M = M // 256
    return out


def _einsum_sub(ndim: int, axis: int):
    letters = string.ascii_lowercase[:ndim]
    out = letters[:axis] + "z" + letters[axis + 1:]
    return f"z{letters[axis]},{letters}->{out}"


def _pad128(w: int) -> int:
    return max(128, -(-w // 128) * 128)


def _row_blocks(M: np.ndarray, target_w: int):
    """Greedy partition of M's dst rows into chunks whose union source
    span is <= target_w (and whose submatrix stays under the memory
    gate). Returns [(r0, r1, c0, c1)]; all-zero chunks carry c0 == -1."""
    rows, src = M.shape
    nzmask = M != 0
    has = nzmask.any(axis=1)
    first = np.where(has, nzmask.argmax(axis=1), 0)
    last = np.where(has, src - 1 - nzmask[:, ::-1].argmax(axis=1), -1)
    blocks = []
    r0, lo, hi = 0, None, None
    for r in range(rows):
        if not has[r]:
            continue
        if lo is None:
            lo, hi = int(first[r]), int(last[r])
            continue
        nlo, nhi = min(lo, int(first[r])), max(hi, int(last[r]))
        span = nhi - nlo + 1
        if (span > target_w or (r - r0) * span > _MAX_MATRIX_ELEMS) and r > r0:
            blocks.append((r0, r, lo, hi))
            r0, lo, hi = r, int(first[r]), int(last[r])
        else:
            lo, hi = nlo, nhi
    blocks.append((r0, rows, -1 if lo is None else lo,
                   -1 if lo is None else hi))
    return blocks


def _plan_blocks(M: np.ndarray):
    """Decide a dst-row blocking of the banded matrix that minimizes MXU
    work: a dense [dst, src] matmul costs dst*src MACs regardless of the
    band, while row blocks only contract their own source span (padded to
    the 128-lane tile). Returns None when dense is (near-)optimal."""
    rows, src = M.shape
    if rows < 128 or src <= 256:
        return None if M.size <= _MAX_MATRIX_ELEMS else _row_blocks(M, src)
    dense_cost = rows * _pad128(src)
    best, best_cost = None, dense_cost
    for target in (128, 256, 384, 512):
        if target >= src:
            break
        blocks = _row_blocks(M, target)
        if len(blocks) > 64:
            continue
        # per-block fixed overhead (slice + concat + launch) modeled as
        # 32 extra output rows of padded-width work
        cost = sum((r1 - r0 + 32) * _pad128(c1 - c0 + 1)
                   for r0, r1, c0, c1 in blocks if c0 >= 0)
        if cost < best_cost:
            best, best_cost = blocks, cost
    if best is not None and (best_cost < 0.75 * dense_cost
                             or M.size > _MAX_MATRIX_ELEMS):
        return best
    if M.size > _MAX_MATRIX_ELEMS:
        return _row_blocks(M, src)
    return None


def exact_axis_apply(x, M: np.ndarray, x_bound: int, axis: int):
    """Contract integer-valued `x` (f32/u8, values in [0, x_bound]) with
    the non-negative integer matrix M [dst, src] along `axis`.

    Returns (result, bound): result is exact and integer-valued, f32 if
    every partial stays < 2^24, else int32.
    """
    M = np.asarray(M)
    blocks = _plan_blocks(M) if M.shape[0] > 1 else None
    if blocks is not None and len(blocks) > 1:
        # block over dst rows: resampling bands are localized, so each
        # block only reads (and contracts over) a narrow source range —
        # FLOPs track the band width, not the axis length
        outs = []
        bounds = []
        for r0, r1, c0, c1 in blocks:
            if c0 < 0:
                shape = list(x.shape)
                shape[axis] = r1 - r0
                outs.append(jnp.zeros(shape, jnp.float32))
                bounds.append(0)
                continue
            xs = jax.lax.slice_in_dim(x, c0, c1 + 1, axis=axis)
            out, b = _apply_dense(xs, M[r0:r1, c0:c1 + 1], x_bound, axis)
            outs.append(out)
            bounds.append(b)
        if any(o.dtype == jnp.int32 for o in outs):
            outs = [o.astype(jnp.int32) for o in outs]
        return jnp.concatenate(outs, axis=axis), max(bounds)
    return _apply_dense(x, M, x_bound, axis)


def _apply_dense(x, M: np.ndarray, x_bound: int, axis: int):
    if _LAYOUT == "last":
        y = jnp.moveaxis(x, axis, -1)
        sub = "zw,...w->...z"
        contract = lambda wj, xd: jnp.einsum(
            sub, wj, xd, preferred_element_type=jnp.float32)
        out, bound = _exact_core(y, M, x_bound, contract)
        return jnp.moveaxis(out, -1, axis), bound
    sub = _einsum_sub(x.ndim, axis)
    contract = lambda wj, xd: jnp.einsum(
        sub, wj, xd, preferred_element_type=jnp.float32)
    return _exact_core(x, M, x_bound, contract)


def _exact_core(x, M, x_bound, contract):
    w_digits = _digits(M)
    # input digits (base 256, least significant first)
    n_digits = 1
    b = x_bound
    while b > 256:
        b //= 256
        n_digits += 1
    if n_digits == 1:
        x_digits = [x.astype(jnp.bfloat16)]
        xd_max = [min(256, x_bound)]
    else:
        xf = x.astype(jnp.float32)
        x_digits = []
        for k in range(n_digits):
            if k == n_digits - 1:
                x_digits.append(xf.astype(jnp.bfloat16))
            else:
                hi = jnp.floor(xf * (1.0 / 256.0))
                x_digits.append((xf - 256.0 * hi).astype(jnp.bfloat16))
                xf = hi
        xd_max = [min(255, x_bound // (256 ** j)) for j in range(n_digits)]

    row_sums = [int(d.sum(axis=1).max()) for d in w_digits]

    # per-term and total bounds decide the combine dtype
    terms = []
    total_bound = 0
    f32_ok = True
    for i, wd in enumerate(w_digits):
        if not np.any(wd):
            continue
        wj = jnp.asarray(wd.astype(np.float32)).astype(jnp.bfloat16)
        for j, xd in enumerate(x_digits):
            term_bound = row_sums[i] * xd_max[j]
            if term_bound >= _F32_EXACT:
                raise ValueError("digit matmul bound exceeds f32 exactness")
            shift = 256 ** (i + j)
            terms.append((wj, xd, shift))
            total_bound += term_bound * shift
            if term_bound * shift >= _F32_EXACT:
                f32_ok = False
    if total_bound >= _F32_EXACT:
        f32_ok = False
    if not f32_ok and total_bound >= 2 ** 31:
        # the int32 combine path would silently wrap (ADVICE r1): callers
        # with larger weight row-sums must split the work further.
        raise ValueError(
            f"combined digit-matmul bound {total_bound} exceeds int32"
        )

    acc = None
    for wj, xd, shift in terms:
        part = contract(wj, xd)
        if f32_ok:
            term = part * np.float32(shift) if shift != 1 else part
        else:
            term = part.astype(jnp.int32)
            if shift != 1:
                term = term << int(np.log2(shift))
        acc = term if acc is None else acc + term
    return acc, total_bound
