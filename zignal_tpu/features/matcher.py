"""Brute-force Hamming matcher (reference: src/features/matcher.zig).

All-pairs Hamming distances run on device as a batched XOR + popcount
over [N, 32] x [M, 32] u8 descriptor matrices (SURVEY: "XOR+popcount
matmul-style batch"), then argmin/thresholding on the result.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .descriptor import stack_descriptors

__all__ = ["Match", "BruteForceMatcher", "MatchStats"]


@dataclasses.dataclass
class Match:
    query_idx: int
    train_idx: int
    distance: float


@dataclasses.dataclass
class MatchStats:
    count: int
    min_distance: float
    max_distance: float
    mean_distance: float


_DIST_JIT = None


def _bucket(n: int) -> int:
    """Next power of two (min 32): descriptor counts vary per image, so
    padding to buckets keeps the jitted program's shapes recurring — an
    unpadded shape recompiles ~3 s of tiny programs per new (N, M)."""
    b = 32
    while b < n:
        b *= 2
    return b


def _distance_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, M] Hamming distances on device (one jitted program per
    bucketed shape; pad rows are sliced away after the fetch)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), dtype=np.int32)
    global _DIST_JIT
    if _DIST_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def impl(xa, xb):
            xor = jnp.bitwise_xor(xa[:, None, :], xb[None, :, :])
            pop = jnp.zeros(xor.shape[:2], jnp.int32)
            for i in range(8):  # fused popcount, no 8x bit expansion
                pop = pop + ((xor >> i) & 1).sum(axis=-1).astype(jnp.int32)
            return pop

        _DIST_JIT = impl
    pa = np.zeros((_bucket(len(a)), a.shape[1]), np.uint8)
    pa[: len(a)] = a
    pb = np.zeros((_bucket(len(b)), b.shape[1]), np.uint8)
    pb[: len(b)] = b
    d = np.asarray(_DIST_JIT(pa, pb))
    return d[: len(a), : len(b)]


class BruteForceMatcher:
    """match / knn_match / radius_match with optional cross-check
    (reference: matcher.zig:33-260)."""

    def __init__(self, cross_check: bool = False, max_distance: int | None = None):
        self.cross_check = cross_check
        self.max_distance = max_distance

    def _dists(self, query, train):
        return _distance_matrix(stack_descriptors(query), stack_descriptors(train))

    def match(self, query, train) -> list:
        d = self._dists(query, train)
        if d.size == 0:
            return []
        best = d.argmin(axis=1)
        matches = []
        rev_best = d.argmin(axis=0) if self.cross_check else None
        for qi, ti in enumerate(best):
            dist = int(d[qi, ti])
            if self.max_distance is not None and dist > self.max_distance:
                continue
            if self.cross_check and rev_best[ti] != qi:
                continue
            matches.append(Match(qi, int(ti), float(dist)))
        return matches

    def knn_match(self, query, train, k: int = 2) -> list:
        d = self._dists(query, train)
        out = []
        for qi in range(d.shape[0]):
            order = np.argsort(d[qi], kind="stable")[:k]
            out.append([Match(qi, int(ti), float(d[qi, ti])) for ti in order])
        return out

    def radius_match(self, query, train, max_distance: float) -> list:
        d = self._dists(query, train)
        out = []
        for qi in range(d.shape[0]):
            hits = np.nonzero(d[qi] <= max_distance)[0]
            order = hits[np.argsort(d[qi][hits], kind="stable")]
            out.append([Match(qi, int(ti), float(d[qi, ti])) for ti in order])
        return out

    @staticmethod
    def stats(matches) -> MatchStats:
        if not matches:
            return MatchStats(0, 0.0, 0.0, 0.0)
        ds = [m.distance for m in matches]
        return MatchStats(len(ds), min(ds), max(ds), sum(ds) / len(ds))
