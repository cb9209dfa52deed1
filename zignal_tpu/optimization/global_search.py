"""Global optimizer: MaxLIPO-style surrogate exploration alternating with
trust-region quadratic exploitation (reference:
src/optimization/global_search.zig, lipschitz.zig, trust_region.zig —
a port of dlib's find_global_* strategy).

The surrogate search is fully vectorized: the Lipschitz upper bound over
all evaluated points is computed for `num_random_samples` candidates at
once. Objectives are plain Python callables (the reference evaluates
objectives in parallel via async groups; batched/vmapped objectives can
exploit the same vectorized candidate set).
"""

from __future__ import annotations

import numpy as np

from .assignment import OptimizationPolicy

__all__ = ["optimize"]


def _validate_bounds(bounds, is_integer):
    if not bounds:
        raise ValueError("bounds must not be empty")
    lo = []
    hi = []
    for b in bounds:
        if len(b) != 2:
            raise ValueError("each bound must be a (lower, upper) pair")
        low, high = float(b[0]), float(b[1])
        if not low < high:
            raise ValueError("each bound needs lower < upper")
        lo.append(low)
        hi.append(high)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    if is_integer is not None:
        if len(is_integer) != len(bounds):
            raise ValueError("is_integer length must match bounds")
        for i, flag in enumerate(is_integer):
            if flag and (lo[i] != int(lo[i]) or hi[i] != int(hi[i])):
                raise ValueError("integer variables need integral bounds")
    return lo, hi


def optimize(objective, bounds, max_evals=100, policy=OptimizationPolicy.MIN,
             is_integer=None, seed=None, target=None, patience=None,
             pure_random_probability=0.02, num_random_samples=5000,
             trust_region_eps=0.0, relative_noise_magnitude=0.001,
             solver_eps=1e-4):
    """Find the global optimum of `objective` within box `bounds`
    (reference: global_search.zig:624 findGlobalOptimum).

    Returns (best_x: list[float], best_y: float).
    """
    if not callable(objective):
        raise TypeError("objective must be callable")
    max_evals = int(max_evals)
    if max_evals < 1:
        raise ValueError("max_evals must be positive")
    policy = OptimizationPolicy(policy)
    lo, hi = _validate_bounds(bounds, is_integer)
    dim = len(bounds)
    int_mask = np.array([bool(v) for v in (is_integer or [False] * dim)])
    rng = np.random.default_rng(seed)
    span = hi - lo

    def snap(x):
        x = np.clip(x, lo, hi)
        if int_mask.any():
            x = np.where(int_mask, np.round(x), x)
        return x

    def evaluate(x):
        val = objective([float(v) for v in x])
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            raise TypeError("objective must return a number")
        return float(val)

    maximize = policy == OptimizationPolicy.MAX

    xs = []
    ys = []

    def better(a, b):
        return a > b if maximize else a < b

    def record(x, y):
        xs.append(np.asarray(x, dtype=np.float64))
        ys.append(y)

    # initial sample: center + random
    first = snap((lo + hi) / 2.0)
    record(first, evaluate(first))
    n_init = min(max(2 * dim, 3), max(1, max_evals - 1))
    for _ in range(n_init):
        if len(ys) >= max_evals:
            break
        x = snap(lo + rng.random(dim) * span)
        record(x, evaluate(x))

    stall = 0
    while len(ys) < max_evals:
        best_i = int(np.argmax(ys) if maximize else np.argmin(ys))
        if target is not None and (
            ys[best_i] >= target if maximize else ys[best_i] <= target
        ):
            break
        if patience is not None and stall >= patience:
            break

        explore = (len(ys) % 2 == 0)
        if rng.random() < pure_random_probability:
            cand = snap(lo + rng.random(dim) * span)
        elif explore:
            cand = _surrogate_candidate(np.stack(xs), np.asarray(ys), lo, hi,
                                        span, maximize, rng,
                                        int(num_random_samples), snap)
        else:
            cand = _trust_region_candidate(np.stack(xs), np.asarray(ys),
                                           best_i, lo, hi, maximize, rng,
                                           snap, trust_region_eps)
            if cand is None:
                cand = snap(lo + rng.random(dim) * span)
        y = evaluate(cand)
        prev_best = ys[best_i]
        record(cand, y)
        stall = 0 if better(y, prev_best) else stall + 1

    best_i = int(np.argmax(ys) if maximize else np.argmin(ys))
    return [float(v) for v in xs[best_i]], float(ys[best_i])


def _surrogate_candidate(X, Y, lo, hi, span, maximize, rng, n_samples, snap):
    """MaxLIPO step: pick the candidate with the best Lipschitz bound
    (reference: lipschitz.zig upper-bound surrogate)."""
    n_samples = max(64, n_samples)
    cand = lo + rng.random((n_samples, len(lo))) * span
    # Lipschitz constant estimate from observed pairwise slopes
    scale = np.maximum(span, 1e-12)
    Xn = X / scale
    d2 = ((Xn[:, None, :] - Xn[None, :, :]) ** 2).sum(-1)
    dy = np.abs(Y[:, None] - Y[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        slopes = dy / np.sqrt(np.maximum(d2, 1e-18))
    np.fill_diagonal(slopes, 0.0)
    k = float(np.nanmax(slopes)) * 1.1 + 1e-9

    Cn = cand / scale
    dist = np.sqrt(((Cn[:, None, :] - Xn[None, :, :]) ** 2).sum(-1))
    if maximize:
        bound = (Y[None, :] + k * dist).min(axis=1)
        idx = int(np.argmax(bound))
    else:
        bound = (Y[None, :] - k * dist).max(axis=1)
        idx = int(np.argmin(bound))
    return snap(cand[idx])


def _trust_region_candidate(X, Y, best_i, lo, hi, maximize, rng, snap, tr_eps):
    """Quadratic-model step around the incumbent (reference:
    trust_region.zig Nocedal-Wright subproblem via least-squares fit)."""
    dim = X.shape[1]
    n_needed = (dim + 1) * (dim + 2) // 2
    if len(Y) < n_needed:
        return None
    best = X[best_i]
    # fit on the nearest points
    d = ((X - best) ** 2).sum(-1)
    order = np.argsort(d)[: max(n_needed + 2, 2 * dim + 3)]
    P = X[order] - best
    t = Y[order]
    cols = [np.ones(len(P))]
    for i in range(dim):
        cols.append(P[:, i])
    for i in range(dim):
        for j in range(i, dim):
            cols.append(P[:, i] * P[:, j])
    A = np.stack(cols, axis=1)
    coef, *_ = np.linalg.lstsq(A, t, rcond=None)
    g = coef[1:1 + dim]
    H = np.zeros((dim, dim))
    k = 1 + dim
    for i in range(dim):
        for j in range(i, dim):
            H[i, j] += coef[k] / (1 if i == j else 2)
            H[j, i] = H[i, j]
            k += 1
    H = H + H.T
    # solve model stationary point; fall back to a gradient step
    radius = max(np.sqrt(d[order[-1]]), 1e-6)
    try:
        step = np.linalg.solve(H + 1e-9 * np.eye(dim), -g)
    except np.linalg.LinAlgError:
        step = -g
    # check curvature direction for min/max
    model_second = float(step @ H @ step)
    wrong_curvature = (model_second < 0) if not maximize else (model_second > 0)
    if wrong_curvature or not np.all(np.isfinite(step)):
        step = (g if maximize else -g)
        norm = np.linalg.norm(step)
        if norm > 0:
            step = step / norm * radius * 0.5
    nstep = np.linalg.norm(step)
    if nstep > radius:
        step = step / nstep * radius
    cand = snap(best + step)
    if np.linalg.norm(cand - best) <= max(tr_eps, 1e-12):
        cand = snap(best + rng.normal(0, radius * 0.1, dim))
    return cand
