"""Flood fill tests (ported from reference test_image.py test_flood_fill)."""

import numpy as np
import pytest

import zignal_tpu as zignal


def test_flood_fill():
    img = zignal.Image(5, 5, 0, dtype=zignal.Gray)
    for r, c in ((2, 2), (2, 1), (2, 3), (1, 2), (3, 2)):
        img[r, c] = 5

    img.flood_fill(2, 2, 9, threshold=0.0)
    assert img[2, 2] == 9
    assert img[2, 1] == 9
    assert img[0, 0] == 0

    with pytest.raises(ValueError):
        img.flood_fill(5, 5, 9)

    img_rgb = zignal.Image(1, 3, dtype=zignal.Rgb)
    img_rgb[0, 0] = (100, 100, 100)
    img_rgb[0, 1] = (100, 100, 103)
    img_rgb[0, 2] = (100, 100, 107)
    img_thresh = img_rgb.copy()
    img_thresh.flood_fill(0, 0, (255, 0, 0), threshold=4.0)
    assert img_thresh[0, 1].item().r == 255
    assert img_thresh[0, 2].item().b == 107

    diag = zignal.Image(3, 3, 0, dtype=zignal.Gray)
    diag[0, 0] = 5
    diag[1, 1] = 5
    diag4 = diag.copy()
    diag4.flood_fill(1, 1, 9, connectivity=4)
    assert diag4[0, 0] == 5
    diag8 = diag.copy()
    diag8.flood_fill(1, 1, 9, connectivity=8)
    assert diag8[0, 0] == 9
    with pytest.raises(ValueError, match="connectivity must be 4 or 8"):
        diag.flood_fill(1, 1, 9, connectivity=5)

    grad = zignal.Image(1, 5, dtype=zignal.Gray)
    for col in range(5):
        grad[0, col] = col
    grad_seed = grad.copy()
    grad_seed.flood_fill(0, 0, 9, threshold=1.0, mode=zignal.ThresholdMode.SEED)
    assert grad_seed[0, 1] == 9
    assert grad_seed[0, 2] == 2
    grad_neighbor = grad.copy()
    grad_neighbor.flood_fill(0, 0, 9, threshold=1.0, mode=zignal.ThresholdMode.NEIGHBOR)
    assert grad_neighbor[0, 4] == 9


class TestDeviceFloodFill:
    """Device while_loop path must equal the host fixed-point loop
    exactly (the host loop is itself oracle-tested above)."""

    def _host_region(self, arr, row, col, threshold, connectivity, neighbor):
        img = arr.astype(np.float64)
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

        def shifted(a, dr, dc, fill=np.inf):
            out = np.full_like(a, fill)
            h, w = a.shape[:2]
            rs = slice(max(dr, 0), h + min(dr, 0))
            rd = slice(max(-dr, 0), h + min(-dr, 0))
            cs = slice(max(dc, 0), w + min(dc, 0))
            cd = slice(max(-dc, 0), w + min(-dc, 0))
            out[rd, cd] = a[rs, cs]
            return out

        region = np.zeros(arr.shape[:2], dtype=bool)
        region[row, col] = True
        if not neighbor:
            seed_val = img[row, col]
            dist = np.sqrt(((img - seed_val) ** 2).sum(axis=-1))
            candidates = dist <= threshold
            candidates[row, col] = True
            while True:
                grown = region.copy()
                for dr, dc in offsets:
                    grown |= shifted(region.astype(np.float64)[..., None],
                                     dr, dc, 0.0)[..., 0] > 0
                grown &= candidates
                if (grown == region).all():
                    break
                region = grown
        else:
            while True:
                grown = region.copy()
                for dr, dc in offsets:
                    nb_in = shifted(region.astype(np.float64)[..., None],
                                    dr, dc, 0.0)[..., 0] > 0
                    nb_val = shifted(img, dr, dc)
                    dist = np.sqrt(((img - nb_val) ** 2).sum(axis=-1))
                    grown |= nb_in & (dist <= threshold)
                if (grown == region).all():
                    break
                region = grown
        return region

    @pytest.mark.parametrize("neighbor", [False, True])
    @pytest.mark.parametrize("connectivity", [4, 8])
    def test_device_matches_host(self, neighbor, connectivity):
        import jax.numpy as jnp

        from zignal_tpu.ops.flood_fill import flood_region, threshold_sq_int

        rng = np.random.default_rng(23)
        # blobby structure: quantized smooth field + noise
        base = np.cumsum(rng.integers(-3, 4, (96, 80)), axis=0)
        base = np.cumsum(base, axis=1) % 97
        arr = np.stack([base, base // 2, base // 3], axis=-1).astype(np.uint8)
        arr += rng.integers(0, 3, arr.shape, dtype=np.uint8)
        for thr, (r, c) in [(0.0, (48, 40)), (4.0, (48, 40)), (9.5, (3, 70))]:
            got = np.asarray(flood_region(
                jnp.asarray(arr), r, c, threshold_sq_int(thr),
                connectivity=connectivity, neighbor_mode=neighbor))
            want = self._host_region(arr, r, c, thr, connectivity, neighbor)
            assert np.array_equal(got, want), (thr, r, c)

    def test_image_method_device_path(self):
        """>4096 px goes through the device path end to end."""
        rng = np.random.default_rng(24)
        arr = rng.integers(0, 2, (80, 80, 3), dtype=np.uint8) * 200
        arr[20:60, 20:60] = (10, 20, 30)
        img = zignal.Image.from_numpy(arr.copy())
        img.flood_fill(40, 40, (255, 0, 0), threshold=5.0)
        out = img.to_numpy()
        assert tuple(out[40, 40]) == (255, 0, 0)
        assert tuple(out[21, 21]) == (255, 0, 0)
        # the central block is filled, everything outside is untouched
        assert np.array_equal(out[20:60, 20:60],
                              np.broadcast_to((255, 0, 0), (40, 40, 3)))
        outside = np.ones((80, 80), bool)
        outside[20:60, 20:60] = False
        assert np.array_equal(out[outside], arr[outside])
