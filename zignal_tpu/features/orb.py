"""ORB: FAST on an image pyramid + intensity-centroid orientation +
rotated BRIEF descriptors from the learned pattern
(reference: src/features/orb.zig)."""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.pyramid import ImagePyramid
from ._orb_pattern import ORB_PATTERN
from .descriptor import BinaryDescriptor
from .fast import Fast, KeyPoint

__all__ = ["Orb"]

PATCH_SIZE = 31
_HALF = PATCH_SIZE // 2

# circular orientation mask (orb.zig orientation_weights)
_YY, _XX = np.mgrid[-_HALF:_HALF + 1, -_HALF:_HALF + 1]
_CIRC = (_XX**2 + _YY**2 <= _HALF * _HALF).astype(np.float32)

_PAT = np.asarray(ORB_PATTERN, dtype=np.float32)  # [256, 4]


@dataclasses.dataclass
class Orb:
    """ORB detector/descriptor (reference: orb.zig:85-110 options)."""

    n_features: int = 500
    scale_factor: float = 1.2
    n_levels: int = 8
    edge_threshold: int = _HALF
    first_level: int = 0
    fast_threshold: int = 20
    score_type: str = "harris_score"

    def _pyramid(self, plane):
        return ImagePyramid.build(plane, self.n_levels, self.scale_factor, 1.6)

    def _level_shapes(self, h, w):
        """Trace-time replica of ImagePyramid.build's level sizing."""
        shapes = [(h, w)]
        for i in range(1, self.n_levels):
            scale = self.scale_factor ** i
            shapes.append((max(1, int(np.trunc(h / scale))),
                           max(1, int(np.trunc(w / scale)))))
        return shapes

    def _analyze(self, plane):
        """One fused device program for the whole pyramid + FAST + NMS,
        fetched in two host round-trips (the tunnel costs ~6 ms per
        dispatch and ~30 ms per fetch; the per-level loop paid ~16 of
        each, ~0.75 s/image of pure latency)."""
        h, w = plane.shape
        shapes = self._level_shapes(h, w)
        packed = np.asarray(_orb_device_maps(
            plane, self.n_levels, self.scale_factor, self.fast_threshold))
        total = sum(lh * lw for lh, lw in shapes)
        flat_l = packed[:total]
        flat_s = packed[total:].view(np.int16)
        levels, scores = [], []
        off = 0
        for (lh, lw) in shapes:
            levels.append(flat_l[off:off + lh * lw].reshape(lh, lw))
            scores.append(flat_s[off:off + lh * lw].reshape(lh, lw))
            off += lh * lw
        return levels, scores

    def _features_per_level(self):
        """Geometric distribution of the feature budget (orb.zig)."""
        factor = 1.0 / self.scale_factor
        n_desired = []
        total = self.n_features * (1 - factor) / (1 - factor**self.n_levels)
        for lvl in range(self.n_levels):
            n_desired.append(int(round(total * factor**lvl)))
        return n_desired

    def detect(self, image) -> list:
        levels, scores = self._analyze(self._plane(image))
        return self._detect_host(levels, scores)

    def compute(self, image, keypoints) -> list:
        levels, _ = self._analyze(self._plane(image))
        return self._compute_host(levels, keypoints)

    def detect_and_compute(self, image):
        levels, scores = self._analyze(self._plane(image))
        kps = self._detect_host(levels, scores)
        return kps, self._compute_host(levels, kps)

    def _plane(self, image):
        from ..image import Image

        if isinstance(image, Image):
            return image._gray_u8_plane()
        import jax.numpy as jnp

        a = jnp.asarray(np.asarray(image))
        return a[..., 0] if a.ndim == 3 else a

    def _detect_host(self, levels, scores) -> list:
        """Per-level candidate selection, vectorized across keypoints
        (the former per-keypoint numpy loops cost ~100 us of dispatch
        overhead per corner; batched fancy-index gathers amortize it)."""
        per_level = self._features_per_level()
        out = []
        for level in range(self.first_level, self.n_levels):
            n_desired = per_level[level]
            if n_desired == 0:
                continue
            arr = levels[level]
            if min(arr.shape) < 16:
                continue
            s = scores[level]
            ys, xs = np.nonzero(s)
            if len(ys) == 0:
                continue
            if self.score_type == "harris_score":
                resp = _harris_batch(arr, xs, ys)
            else:
                resp = s[ys, xs].astype(np.float64)
            # stable argsort on -resp == the old stable python sort by
            # descending response (ties keep row-major candidate order)
            order = np.argsort(-resp, kind="stable")[:n_desired]

            scale = self.scale_factor ** level
            margin = max(3.0, self.edge_threshold / scale)
            h, w = arr.shape
            kx, ky = xs[order], ys[order]
            keep = ((kx >= margin) & (kx < w - margin)
                    & (ky >= margin) & (ky < h - margin))
            sel = order[keep]
            angles = _orientation_batch(arr, xs[sel], ys[sel])
            for i, idx in enumerate(sel):
                out.append(KeyPoint(
                    x=float(xs[idx]) * scale, y=float(ys[idx]) * scale,
                    size=7.0 * scale, angle=float(angles[i]),
                    response=float(resp[idx]), octave=level))
        return out

    def _compute_host(self, levels, keypoints) -> list:
        descs = [None] * len(keypoints)
        by_level: dict = {}
        for i, kp in enumerate(keypoints):
            level = min(max(kp.octave, 0), self.n_levels - 1)
            by_level.setdefault(level, []).append(i)
        for level, idxs in by_level.items():
            scale = self.scale_factor ** level
            kx = np.array([keypoints[i].x / scale for i in idxs])
            ky = np.array([keypoints[i].y / scale for i in idxs])
            ang = np.array([keypoints[i].angle for i in idxs])
            packed = _brief_batch(levels[level], kx, ky, ang)
            for j, i in enumerate(idxs):
                descs[i] = BinaryDescriptor(packed[j])
        return descs

    # compatibility shims for callers holding an ImagePyramid
    def _detect_with_pyramid(self, pyr: ImagePyramid) -> list:
        levels, scores = self._analyze(pyr.levels[0])
        return self._detect_host(levels, scores)

    def _compute_with_pyramid(self, pyr: ImagePyramid, keypoints) -> list:
        return self._compute_host([np.asarray(l) for l in pyr.levels],
                                  keypoints)


def _orb_device_maps(plane, n_levels: int, scale_factor: float,
                     fast_threshold: int):
    """Whole pyramid + per-level FAST response + NMS in one jitted
    program, returning (packed u8 levels, packed int32 scores) as two
    flat concatenations — two fetches total instead of ~16."""
    return _orb_device_maps_jit(plane, n_levels, scale_factor,
                                fast_threshold)


def _orb_maps_impl(plane, n_levels, scale_factor, thr0):
    import jax.numpy as jnp

    from ..features.fast import _nms_device, fast_response_map
    from ..ops.pyramid import ImagePyramid

    import jax

    pyr = ImagePyramid.build(plane, n_levels, scale_factor, 1.6)
    packed_l = []
    packed_s = []
    for level, lvl in enumerate(pyr.levels):
        packed_l.append(lvl.ravel())
        if min(lvl.shape) < 16:
            packed_s.append(jnp.zeros(lvl.size, jnp.int16))
            continue
        thr = max(5, int(thr0 * (0.9 ** level)))
        scores = fast_response_map(lvl, thr, 9)
        keep = _nms_device(scores)
        # FAST scores are <= 16*255, int16-safe; pack as bytes so the
        # whole result crosses the tunnel in ONE fetch
        packed_s.append(jnp.where(keep, scores, 0).astype(jnp.int16).ravel())
    score_bytes = jax.lax.bitcast_convert_type(
        jnp.concatenate(packed_s), jnp.uint8).ravel()
    return jnp.concatenate(packed_l + [score_bytes])


def _make_orb_maps_jit():
    import jax
    from functools import partial

    return partial(jax.jit, static_argnames=(
        "n_levels", "scale_factor", "thr0"))(_orb_maps_impl)


class _LazyJit:
    """Defer the jax.jit wrap until first call (keeps import light)."""

    _fn = None

    def __call__(self, plane, n_levels, scale_factor, thr0):
        if _LazyJit._fn is None:
            _LazyJit._fn = _make_orb_maps_jit()
        return _LazyJit._fn(plane, n_levels=n_levels,
                            scale_factor=scale_factor, thr0=thr0)


_orb_device_maps_jit = _LazyJit()


def _orientation_batch(arr: np.ndarray, xs: np.ndarray,
                       ys: np.ndarray) -> np.ndarray:
    """Intensity centroid in circular 31x31 patches (orb.zig
    computeOrientation) -> angles in degrees, for all keypoints at
    once. Out-of-bounds patch pixels read as 0 (zero padding == the
    scalar version's zero-initialized patch)."""
    if len(xs) == 0:
        return np.zeros(0, np.float64)
    a = np.pad(arr, _HALF).astype(np.float32)
    yy = ys[:, None, None] + (_YY + _HALF)[None]
    xx = xs[:, None, None] + (_XX + _HALF)[None]
    weighted = a[yy, xx] * _CIRC  # [K, 31, 31]
    m00 = weighted.sum(axis=(1, 2))
    m10 = (weighted * _XX).sum(axis=(1, 2))
    m01 = (weighted * _YY).sum(axis=(1, 2))
    safe = np.maximum(m00, np.float32(1e-6))
    ang = np.degrees(np.arctan2(m01 / safe, m10 / safe))
    return np.where(m00 < 0.001, 0.0, ang)


def _brief_batch(arr: np.ndarray, kx: np.ndarray, ky: np.ndarray,
                 angles: np.ndarray) -> np.ndarray:
    """Rotated BRIEF from the learned pattern (orb.zig
    computeBriefDescriptor) for all keypoints at once -> [K, 32] packed
    bytes; out-of-bounds points leave bits at 0."""
    h, w = arr.shape
    if len(kx) == 0:
        return np.zeros((0, 32), np.uint8)
    cos_a = np.cos(np.radians(angles))[:, None]
    sin_a = np.sin(np.radians(angles))[:, None]
    x1, y1, x2, y2 = (_PAT[:, i][None] for i in range(4))
    rx1 = np.round(kx[:, None] + cos_a * x1 - sin_a * y1).astype(int)
    ry1 = np.round(ky[:, None] + sin_a * x1 + cos_a * y1).astype(int)
    rx2 = np.round(kx[:, None] + cos_a * x2 - sin_a * y2).astype(int)
    ry2 = np.round(ky[:, None] + sin_a * x2 + cos_a * y2).astype(int)
    valid = ((rx1 >= 0) & (rx1 < w) & (ry1 >= 0) & (ry1 < h)
             & (rx2 >= 0) & (rx2 < w) & (ry2 >= 0) & (ry2 < h))
    p1 = arr[np.clip(ry1, 0, h - 1), np.clip(rx1, 0, w - 1)]
    p2 = arr[np.clip(ry2, 0, h - 1), np.clip(rx2, 0, w - 1)]
    bits = valid & (p1 < p2)
    return np.packbits(bits, axis=1, bitorder="little")


def _harris_batch(arr: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                  k: float = 0.04) -> np.ndarray:
    """Harris scores over 7x7 windows (orb.zig computeHarrisResponse)
    for all candidates at once; off-edge candidates score 0."""
    h, w = arr.shape
    half = 3
    resp = np.zeros(len(xs), np.float64)
    ok = ((xs >= half + 1) & (xs < w - half - 1)
          & (ys >= half + 1) & (ys < h - half - 1))
    if not ok.any():
        return resp
    cx, cy = xs[ok], ys[ok]
    dy, dx = np.mgrid[-half - 1:half + 2, -half - 1:half + 2]
    win = arr[cy[:, None, None] + dy, cx[:, None, None] + dx] \
        .astype(np.float32)  # [K, 9, 9]
    ix = (win[:, 1:-1, 2:] - win[:, 1:-1, :-2]) * 0.5
    iy = (win[:, 2:, 1:-1] - win[:, :-2, 1:-1]) * 0.5
    ixx = (ix * ix).sum(axis=(1, 2))
    iyy = (iy * iy).sum(axis=(1, 2))
    ixy = (ix * iy).sum(axis=(1, 2))
    det = ixx * iyy - ixy * ixy
    trace = ixx + iyy
    resp[ok] = (det - np.float32(k) * trace * trace).astype(np.float64)
    return resp
