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

    use_device: bool = True  # fused single-dispatch path (host = oracle)

    def detect(self, image) -> list:
        if self.use_device:
            kps, _ = self._device_detect_compute(self._plane(image),
                                                 want_desc=False)
            return kps
        levels, scores = self._analyze(self._plane(image))
        return self._detect_host(levels, scores)

    def compute(self, image, keypoints) -> list:
        levels, _ = self._analyze(self._plane(image))
        return self._compute_host(levels, keypoints)

    def detect_and_compute(self, image):
        if self.use_device:
            return self._device_detect_compute(self._plane(image),
                                               want_desc=True)
        levels, scores = self._analyze(self._plane(image))
        kps = self._detect_host(levels, scores)
        return kps, self._compute_host(levels, kps)

    def _fused_params(self, h, w):
        shapes = self._level_shapes(h, w)
        per_level = self._features_per_level()
        ks, margins, lv_ids = [], [], []
        for level in range(self.n_levels):
            lh, lw = shapes[level]
            skip = (level < self.first_level or per_level[level] == 0
                    or min(lh, lw) < 16)
            k = 0 if skip else per_level[level]
            scale = self.scale_factor ** level
            ks.append(k)
            margins.append(float(max(3.0, self.edge_threshold / scale)))
            if k:
                lv_ids.append(level)
        return tuple(ks), tuple(margins), lv_ids

    def _unpack_packed(self, packed, ks, lv_ids, want_desc: bool):
        """Host side: split the flat f32 vector into KeyPoints +
        descriptors. Layout per selected level: [resp f32 | x i32 |
        y i32 | valid -> one f32 slot | ang f32 | desc 32 u8-in-f32]
        rows of width 37."""
        out_kps, out_desc = [], []
        off = 0
        width = 5 + (32 if want_desc else 0)
        for level in lv_ids:
            k = ks[level]
            rows = packed[off:off + k * width].reshape(k, width)
            off += k * width
            scale = self.scale_factor ** level
            for r in rows:
                if r[3] < 0.5:  # invalid (padding of top-k / margin)
                    continue
                out_kps.append(KeyPoint(
                    x=float(r[1]) * scale, y=float(r[2]) * scale,
                    size=7.0 * scale, angle=float(r[4]),
                    response=float(r[0]), octave=level))
                if want_desc:
                    out_desc.append(BinaryDescriptor(r[5:].astype(np.uint8)))
        if want_desc:
            return out_kps, out_desc
        return out_kps, None

    def _device_detect_compute(self, plane, want_desc: bool):
        """Whole ORB pipeline (pyramid + FAST + NMS + Harris + top-k +
        orientation + rotated BRIEF) as ONE jitted device program and ONE
        packed fetch (VERDICT r2 item 4 — the former flow fetched ~0.9 MB
        of maps per image and ran orientation/BRIEF on the host)."""
        h, w = plane.shape
        ks, margins, lv_ids = self._fused_params(h, w)
        packed = np.asarray(_orb_fused_jit(
            plane, self.n_levels, self.scale_factor, self.fast_threshold,
            ks, margins, self.score_type == "harris_score", want_desc))
        return self._unpack_packed(packed, ks, lv_ids, want_desc)

    def detect_and_compute_batch(self, images):
        """Batched detect+compute over same-shape images: the fused
        device program runs vmapped in ONE dispatch and ALL packed
        results come back in ONE host fetch, amortizing the per-call
        dispatch (~6 ms) and tunnel round-trip latency across the batch
        (VERDICT r4 #5). Returns a list of (keypoints, descriptors)
        pairs identical to per-image detect_and_compute
        (reference: orb.zig:133 detectAndCompute, batched)."""
        images = list(images)
        if not images:
            return []
        if not self.use_device:
            return [self.detect_and_compute(im) for im in images]
        import jax.numpy as jnp

        host_planes = [self._plane_host_np(im) for im in images]
        if all(p is not None for p in host_planes):
            shape = host_planes[0].shape
            if any(p.shape != shape for p in host_planes):
                raise ValueError("detect_and_compute_batch requires "
                                 "same-shape images")
            # Ship u8 GRAY planes (3x fewer bytes than RGB) on parallel
            # streams: single-stream tunnel bandwidth is ~5.7 MB/s but
            # aggregates to ~27-38 MB/s across 2-8 concurrent puts (r3
            # measurement) — the upload, not the detector, dominates the
            # remote-tunnel wall time.
            import jax
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                    max_workers=min(8, len(host_planes))) as ex:
                planes = list(ex.map(jax.device_put, host_planes))
        else:
            planes = [self._plane(im) for im in images]
            shape = planes[0].shape
            if any(p.shape != shape for p in planes):
                raise ValueError("detect_and_compute_batch requires "
                                 "same-shape images")
        ks, margins, lv_ids = self._fused_params(*shape)
        packed = np.asarray(_orb_fused_batch_jit(
            jnp.stack(planes), self.n_levels, self.scale_factor,
            self.fast_threshold, ks, margins,
            self.score_type == "harris_score", True))
        return [self._unpack_packed(packed[i], ks, lv_ids, True)
                for i in range(len(planes))]

    def _plane(self, image):
        from ..image import Image

        if isinstance(image, Image):
            return image._gray_u8_plane()
        import jax.numpy as jnp

        a = jnp.asarray(np.asarray(image))
        return a[..., 0] if a.ndim == 3 else a

    def _plane_host_np(self, image):
        """Host-side gray plane: the integer BT.709 16.16 twin of
        color._array.rgb_to_gray_u8 (color.zig:1031) — pure int math,
        bit-identical to the device conversion, so the batch path can
        upload 1-channel planes instead of converting RGB on device.
        Returns None when the image has no host mirror (device-resident
        Images keep the device conversion path)."""
        from ..image import Image

        if isinstance(image, Image):
            if image._np is None:
                return None
            arr, space = image._np, image._space
        else:
            # raw arrays mirror _plane exactly: channel 0, no conversion
            arr = np.asarray(image)
            return np.ascontiguousarray(
                arr[..., 0] if arr.ndim == 3 else arr)
        if space == "gray" or arr.shape[-1] == 1:
            return np.ascontiguousarray(arr[..., 0])
        from ..color._scalar import _GRAY_FWD

        wr, wg, wb = _GRAY_FWD
        a = arr[..., :3].astype(np.int32)
        y = (a[..., 0] * wr + a[..., 1] * wg + a[..., 2] * wb
             + 32768) >> 16
        return np.clip(y, 0, 255).astype(np.uint8)

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


def _harris_map_device(lvl, k: float = 0.04):
    """Dense Harris response (7x7 gradient windows, _harris_batch
    semantics): separable 7-tap window sums of ix^2/iy^2/ix*iy; the
    4-pixel border where the host scores 0 is masked to 0."""
    import jax.numpy as jnp

    a = lvl.astype(jnp.float32)
    h, w = a.shape
    z = jnp.zeros_like(a)
    ix = 0.5 * (jnp.concatenate([a[:, 1:], z[:, :1]], 1)
                - jnp.concatenate([z[:, :1], a[:, :-1]], 1))
    iy = 0.5 * (jnp.concatenate([a[1:], z[:1]], 0)
                - jnp.concatenate([z[:1], a[:-1]], 0))

    def box7(m):
        p = jnp.pad(m, ((3, 3), (0, 0)))
        acc = None
        for dy in range(7):
            row = p[dy:dy + h]
            acc = row if acc is None else acc + row
        p2 = jnp.pad(acc, ((0, 0), (3, 3)))
        acc2 = None
        for dx in range(7):
            col = p2[:, dx:dx + w]
            acc2 = col if acc2 is None else acc2 + col
        return acc2

    ixx = box7(ix * ix)
    iyy = box7(iy * iy)
    ixy = box7(ix * iy)
    det = ixx * iyy - ixy * ixy
    trace = ixx + iyy
    resp = det - jnp.float32(k) * trace * trace
    inner = jnp.zeros((h, w), bool).at[4:h - 4, 4:w - 4].set(True)
    return jnp.where(inner, resp, 0.0)


def _orb_fused_impl(plane, n_levels, scale_factor, thr0, ks, margins,
                    harris, want_desc):
    """Device side of Orb._device_detect_compute: returns one flat f32
    vector of [resp, x, y, valid, angle, desc*32?] rows per kept level.
    Everything (coordinates, descriptor bytes) is integer-valued and
    f32-exact."""
    import jax
    import jax.numpy as jnp

    from ..features.fast import _nms_device, fast_response_map
    from ..ops.pyramid import ImagePyramid

    f32 = jnp.float32
    pyr = ImagePyramid.build(plane, n_levels, scale_factor, 1.6)
    circ = jnp.asarray(_CIRC)
    xxm = jnp.asarray(_XX.astype(np.float32))
    yym = jnp.asarray(_YY.astype(np.float32))
    pat = jnp.asarray(_PAT)  # [256, 4]
    pieces = []
    for level, lvl in enumerate(pyr.levels):
        K = ks[level]
        if K == 0:
            continue
        h, w = lvl.shape
        thr = max(5, int(thr0 * (0.9 ** level)))
        scores = fast_response_map(lvl, thr, 9)
        keep = _nms_device(scores)
        if harris:
            resp_map = _harris_map_device(lvl)
        else:
            resp_map = scores.astype(f32)
        cand = jnp.where(keep & (scores > 0), resp_map, -jnp.inf)
        top_resp, top_idx = jax.lax.top_k(cand.ravel(), K)
        ysel = (top_idx // w).astype(jnp.int32)
        xsel = (top_idx % w).astype(jnp.int32)
        m = margins[level]
        valid = (jnp.isfinite(top_resp)
                 & (xsel >= m) & (xsel < w - m)
                 & (ysel >= m) & (ysel < h - m))

        # intensity-centroid orientation on 31x31 zero-padded patches
        padded = jnp.pad(lvl, _HALF).astype(f32)

        def one_angle(y, x):
            patch = jax.lax.dynamic_slice(padded, (y, x), (31, 31))
            wp = patch * circ
            m00 = jnp.sum(wp)
            m10 = jnp.sum(wp * xxm)
            m01 = jnp.sum(wp * yym)
            safe = jnp.maximum(m00, f32(1e-6))
            ang = jnp.degrees(jnp.arctan2(m01 / safe, m10 / safe))
            return jnp.where(m00 < 0.001, f32(0.0), ang)

        angles = jax.vmap(one_angle)(ysel, xsel)

        cols = [top_resp.astype(f32), xsel.astype(f32), ysel.astype(f32),
                valid.astype(f32), angles]
        if want_desc:
            # rotated BRIEF: 512 samples per keypoint from the padded
            # level (one gather); bounds masked on the true level
            P = 32  # covers the rotated pattern excursion (<= ~22 px)
            pb = jnp.pad(lvl, P).astype(jnp.int32).ravel()
            wp_ = w + 2 * P
            cos_a = jnp.cos(jnp.radians(angles))[:, None]
            sin_a = jnp.sin(jnp.radians(angles))[:, None]
            x1, y1, x2, y2 = (pat[:, i][None, :] for i in range(4))
            kxf = xsel.astype(f32)[:, None]
            kyf = ysel.astype(f32)[:, None]
            rx1 = jnp.round(kxf + cos_a * x1 - sin_a * y1).astype(jnp.int32)
            ry1 = jnp.round(kyf + sin_a * x1 + cos_a * y1).astype(jnp.int32)
            rx2 = jnp.round(kxf + cos_a * x2 - sin_a * y2).astype(jnp.int32)
            ry2 = jnp.round(kyf + sin_a * x2 + cos_a * y2).astype(jnp.int32)
            ok = ((rx1 >= 0) & (rx1 < w) & (ry1 >= 0) & (ry1 < h)
                  & (rx2 >= 0) & (rx2 < w) & (ry2 >= 0) & (ry2 < h))
            i1 = (ry1 + P) * wp_ + rx1 + P
            i2 = (ry2 + P) * wp_ + rx2 + P
            p1 = jnp.take(pb, i1)
            p2 = jnp.take(pb, i2)
            bits = (ok & (p1 < p2)).astype(f32)        # [K, 256]
            weights = jnp.asarray((1 << np.arange(8)).astype(np.float32))
            desc = jnp.einsum("kcb,b->kc", bits.reshape(K, 32, 8), weights,
                              precision="highest")     # [K, 32] in [0,255]
            cols.append(desc)
        row = jnp.concatenate([c[:, None] if c.ndim == 1 else c
                               for c in cols], axis=1)
        pieces.append(row.ravel())
    if not pieces:
        return jnp.zeros((0,), f32)
    return jnp.concatenate(pieces)


class _LazyFusedJit:
    _fn = None

    def __call__(self, plane, n_levels, scale_factor, thr0, ks, margins,
                 harris, want_desc):
        if _LazyFusedJit._fn is None:
            import jax
            from functools import partial as _p

            _LazyFusedJit._fn = _p(jax.jit, static_argnames=(
                "n_levels", "scale_factor", "thr0", "ks", "margins",
                "harris", "want_desc"))(_orb_fused_impl)
        return _LazyFusedJit._fn(plane, n_levels=n_levels,
                                 scale_factor=scale_factor, thr0=thr0,
                                 ks=ks, margins=margins, harris=harris,
                                 want_desc=want_desc)


_orb_fused_jit = _LazyFusedJit()


class _LazyFusedBatchJit:
    """jit(vmap(_orb_fused_impl over the plane axis)) — one dispatch +
    one fetch for a whole [B, H, W] stack (detect_and_compute_batch)."""
    _fn = None

    def __call__(self, planes, n_levels, scale_factor, thr0, ks, margins,
                 harris, want_desc):
        if _LazyFusedBatchJit._fn is None:
            import jax
            from functools import partial as _p

            def batched(planes, n_levels, scale_factor, thr0, ks,
                        margins, harris, want_desc):
                return jax.vmap(lambda p: _orb_fused_impl(
                    p, n_levels, scale_factor, thr0, ks, margins,
                    harris, want_desc))(planes)

            _LazyFusedBatchJit._fn = _p(jax.jit, static_argnames=(
                "n_levels", "scale_factor", "thr0", "ks", "margins",
                "harris", "want_desc"))(batched)
        return _LazyFusedBatchJit._fn(planes, n_levels=n_levels,
                                      scale_factor=scale_factor,
                                      thr0=thr0, ks=ks, margins=margins,
                                      harris=harris, want_desc=want_desc)


_orb_fused_batch_jit = _LazyFusedBatchJit()


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
