"""Feature Distribution Matching style transfer (reference: src/fdm.zig;
paper: Abramov et al. 2020, fdm.zig:296-299).

North-star MXU configuration (BASELINE.md): channel mean/covariance via
device reductions (centered f32 einsum), the 3x3 SVD on host f64, and
the per-pixel affine map X @ W + bias as one fused device kernel.
Matches the reference pipeline: W = U_s diag(sqrt(lambda_t / lambda_s))
U_t^T in [0,1] pixel space, then round + clamp to u8.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .image import Image

__all__ = ["FeatureDistributionMatching"]


def _mean_cov_device(arr_u8):
    """Channel mean (3,) and sample covariance (3,3) of [H,W,3] u8 on
    device (f32, centered two-pass for accuracy). One jitted program and
    ONE packed host fetch — every fetch through the axon tunnel costs
    ~30 ms of RPC latency, so mean and cov ship as a single [4,3]."""
    import jax

    packed = np.asarray(_mean_cov_packed(arr_u8), dtype=np.float64)
    return packed[0], packed[1:]


def _mean_cov_packed_impl(arr_u8):
    import jax.numpy as jnp

    x = arr_u8.astype(jnp.float32).reshape(-1, 3) / 255.0
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / jnp.float32(max(n - 1, 1))
    return jnp.concatenate([mean[None, :], cov], axis=0)


def _mean_cov_packed(arr_u8):
    import jax

    global _MEAN_COV_JIT
    if _MEAN_COV_JIT is None:
        _MEAN_COV_JIT = jax.jit(_mean_cov_packed_impl)
    return _MEAN_COV_JIT(arr_u8)


_MEAN_COV_JIT = None
_GRAY_STATS_JIT = None
_APPLY_MAP_JIT = None


def _gray_stats(img: Image):
    """Luminance mean/variance in [0,1] (reference gray paths); one
    jitted program, one packed fetch."""
    import jax

    global _GRAY_STATS_JIT
    if _GRAY_STATS_JIT is None:
        import jax.numpy as jnp

        def impl(plane_u8):
            plane = plane_u8.astype(jnp.float32) / 255.0
            n = plane.size
            mean = jnp.mean(plane)
            var = jnp.sum((plane - mean) ** 2) / max(n - 1, 1)
            return jnp.stack([mean, var])
        _GRAY_STATS_JIT = jax.jit(impl)
    mv = np.asarray(_GRAY_STATS_JIT(img._gray_u8_plane()), dtype=np.float64)
    return float(mv[0]), float(mv[1])


def _apply_map(dev_u8, w, bias):
    """x @ W + bias in [0,1], round+clamp to u8 — one fused program."""
    import jax

    global _APPLY_MAP_JIT
    if _APPLY_MAP_JIT is None:
        import jax.numpy as jnp

        def impl(dev, w, bias):
            x = dev.astype(jnp.float32) / 255.0
            res = jnp.clip(
                jnp.einsum("hwc,cd->hwd", x, w, precision="highest") + bias,
                0.0, 1.0)
            return jnp.floor(res * 255.0 + 0.5).astype(jnp.uint8)
        _APPLY_MAP_JIT = jax.jit(impl)
    import jax.numpy as jnp

    return _APPLY_MAP_JIT(dev_u8, jnp.asarray(w, jnp.float32),
                          jnp.asarray(bias, jnp.float32))


def _is_grayscale(img: Image) -> bool:
    if img._space == "gray":
        return True
    a = img._host()
    return bool(np.all(a[..., 0] == a[..., 1]) and np.all(a[..., 1] == a[..., 2]))


class FeatureDistributionMatching:
    """Stateful FDM: `set_target` once, re-use across sources
    (reference: fdm.zig:19-299)."""

    __slots__ = ("_target_mean", "_target_s", "_target_u",
                 "_target_gray", "_source")

    def __init__(self):
        self._target_mean = None
        self._target_s = None
        self._target_u = None
        self._target_gray = False
        self._source = None

    def set_target(self, target: Image) -> None:
        if not isinstance(target, Image):
            raise TypeError("target must be an Image")
        if _is_grayscale(target):
            mean, var = _gray_stats(target)
            self._target_gray = True
            self._target_mean = np.array([mean, mean, mean])
            self._target_s = np.array([var, 0.0, 0.0])
            self._target_u = None
            return
        mean, cov = _mean_cov_device(target._device()[..., :3])
        u, s, _ = np.linalg.svd(cov)
        self._target_gray = False
        self._target_mean = mean
        self._target_s = s
        self._target_u = u

    def set_source(self, source: Image) -> None:
        if not isinstance(source, Image):
            raise TypeError("source must be an Image")
        self._source = source

    def match(self, source: Image, target: Image) -> None:
        """Match source's distribution to target's, in place."""
        if not isinstance(source, Image) or not isinstance(target, Image):
            raise TypeError("match expects two Images")
        self.set_target(target)
        self.set_source(source)
        self.update()

    def update(self) -> None:
        """Apply the transform to the current source, in place
        (reference: fdm.zig:141-272)."""
        if self._target_mean is None:
            raise RuntimeError("no target set")
        if self._source is None:
            raise RuntimeError("no source set")
        import jax.numpy as jnp

        src = self._source
        if src._space == "gray" or self._target_gray:
            mean_s, var_s = _gray_stats(src)
            scale = (np.sqrt(self._target_s[0] / var_s)
                     if var_s > 1e-10 else 1.0)
            offset = self._target_mean[0] - mean_s * scale
            if src._space == "gray":
                plane = src._device()[..., 0].astype(jnp.float32) / 255.0
                out = jnp.clip(plane * scale + offset, 0.0, 1.0)
                res = jnp.floor(out * 255.0 + 0.5).astype(jnp.uint8)
                src._host()[:] = np.asarray(res)[..., None]
            else:
                plane = src._gray_u8_plane().astype(jnp.float32) / 255.0
                out = jnp.clip(plane * scale + offset, 0.0, 1.0)
                res = jnp.floor(out * 255.0 + 0.5).astype(jnp.uint8)
                res3 = jnp.repeat(res[..., None], 3, axis=-1)
                host = src._host()
                host[..., :3] = np.asarray(res3)
            return

        dev = src._device()[..., :3]
        mean_s, cov_s = _mean_cov_device(dev)
        u_s, s_s, _ = np.linalg.svd(cov_s)
        sigma = np.zeros((3, 3))
        for i in range(3):
            if s_s[i] > 1e-10:
                sigma[i, i] = np.sqrt(self._target_s[i] / s_s[i])
        w = u_s @ sigma @ self._target_u.T
        bias = self._target_mean - mean_s @ w

        out = _apply_map(dev, w, bias)
        host = src._host()
        host[..., :3] = np.asarray(out)

    def match_batch(self, batch, target: Image):
        """Batched FDM: match every [H,W,3] u8 image of a [B,H,W,3]
        device/numpy batch to `target` in one device pass per stage
        (TPU-native extension of fdm.zig's single-image API: per-image
        covariances via one einsum, 3x3 SVDs on host, batched pixel
        map on the MXU). Returns a new [B,H,W,3] u8 array."""
        import jax.numpy as jnp

        self.set_target(target)
        if self._target_gray:
            raise ValueError("match_batch requires a color target")
        x = jnp.asarray(batch)
        if x.ndim != 4 or x.shape[-1] < 3:
            raise ValueError("match_batch expects [B, H, W, 3] u8")
        xf = x[..., :3].astype(jnp.float32).reshape(x.shape[0], -1, 3) / 255.0
        n = xf.shape[1]
        means = jnp.mean(xf, axis=1)                        # [B, 3]
        xc = xf - means[:, None, :]
        covs = jnp.einsum("bnc,bnd->bcd", xc, xc,
                          precision="highest") / jnp.float32(max(n - 1, 1))
        covs_np = np.asarray(covs, dtype=np.float64)
        means_np = np.asarray(means, dtype=np.float64)
        ws = np.zeros((len(covs_np), 3, 3))
        biases = np.zeros((len(covs_np), 3))
        for i, cov_s in enumerate(covs_np):
            u_s, s_s, _ = np.linalg.svd(cov_s)
            sigma = np.zeros((3, 3))
            for j in range(3):
                if s_s[j] > 1e-10:
                    sigma[j, j] = np.sqrt(self._target_s[j] / s_s[j])
            ws[i] = u_s @ sigma @ self._target_u.T
            biases[i] = self._target_mean - means_np[i] @ ws[i]
        res = jnp.clip(
            jnp.einsum("bnc,bcd->bnd", xf, jnp.asarray(ws, jnp.float32),
                       precision="highest")
            + jnp.asarray(biases, jnp.float32)[:, None, :],
            0.0, 1.0,
        )
        out = jnp.floor(res * 255.0 + 0.5).astype(jnp.uint8)
        return out.reshape(x.shape[0], x.shape[1], x.shape[2], 3)

    def match_sharded(self, source_dev, target: Image, mesh,
                      axis_name: str = "batch"):
        """FDM on a single H-sharded [H, W, 3] u8 device array: source
        statistics via psum over the mesh (parallel.spatial
        .spatial_mean_cov_image), 3x3 SVD on host, then the pixel map
        runs shard-local with no resharding. Returns a new sharded
        array; matches the single-device update() within f32
        reduction-order tolerance (reference: fdm.zig:141-272)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel.spatial import spatial_mean_cov_image

        self.set_target(target)
        if self._target_gray:
            raise ValueError("match_sharded requires a color target")
        mean_s, cov_s = spatial_mean_cov_image(mesh, axis_name)(source_dev)
        mean_s = np.asarray(mean_s, dtype=np.float64)
        cov_s = np.asarray(cov_s, dtype=np.float64)
        u_s, s_s, _ = np.linalg.svd(cov_s)
        sigma = np.zeros((3, 3))
        for i in range(3):
            if s_s[i] > 1e-10:
                sigma[i, i] = np.sqrt(self._target_s[i] / s_s[i])
        w = u_s @ sigma @ self._target_u.T
        bias = self._target_mean - mean_s @ w

        spec = NamedSharding(mesh, PartitionSpec(axis_name, None, None))

        @partial(jax.jit, in_shardings=(spec, None, None),
                 out_shardings=spec)
        def apply_map(dev, wj, bj):
            x = dev.astype(jnp.float32) / 255.0
            res = jnp.clip(
                jnp.einsum("hwc,cd->hwd", x, wj, precision="highest") + bj,
                0.0, 1.0)
            return jnp.floor(res * 255.0 + 0.5).astype(jnp.uint8)

        return apply_map(source_dev, jnp.asarray(w, jnp.float32),
                         jnp.asarray(bias, jnp.float32))

    def __repr__(self):
        return "FeatureDistributionMatching()"
