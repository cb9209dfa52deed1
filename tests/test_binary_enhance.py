"""Threshold / morphology / enhancement / SSIM tests
(ported from the reference's test_image.py sections + oracles)."""

import numpy as np
import pytest

import zignal_tpu as zignal

RNG = np.random.default_rng(5)


class TestThresholds:
    def test_threshold_otsu_and_rgb_autoconvert(self):
        img = zignal.Image(4, 4, dtype=zignal.Gray)
        arr = img.to_numpy()
        arr[:2, :] = 20
        arr[2:, :] = 200
        binary, threshold = img.threshold_otsu()
        assert isinstance(binary, zignal.Image)
        assert 0 <= threshold <= 255
        assert set(np.unique(binary.to_numpy())) <= {0, 255}

        rgb = zignal.Image(4, 4, dtype=zignal.Rgb)
        rgb_arr = rgb.to_numpy()
        rgb_arr[:, :2] = [30, 30, 30]
        rgb_arr[:, 2:] = [220, 220, 220]
        rgb_binary, _ = rgb.threshold_otsu()
        assert set(np.unique(rgb_binary.to_numpy())) <= {0, 255}

    def test_otsu_oracle(self):
        """Exact threshold vs direct transcription of binary.zig:38-85."""
        plane = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
        img = zignal.Image.from_numpy(plane[..., None].copy())
        _, got = img.threshold_otsu()

        hist = np.bincount(plane.ravel(), minlength=256).astype(np.float64)
        total = plane.size
        sum_total = (hist * np.arange(256)).sum()
        sum_b = wb = 0.0
        best_var, best_t = -1.0, 0
        for i in range(256):
            wb += hist[i]
            if wb == 0:
                continue
            wf = total - wb
            if wf == 0:
                break
            sum_b += hist[i] * i
            mb = sum_b / wb
            mf = (sum_total - sum_b) / wf
            var = wb * wf * (mb - mf) ** 2
            if var > best_var:
                best_var, best_t = var, i
        assert got == best_t

    def test_adaptive_threshold_and_morphology(self):
        base = zignal.Image(10, 10, dtype=zignal.Gray)
        arr = base.to_numpy()
        arr[:] = np.linspace(10, 200, arr.size, dtype=np.uint8).reshape(arr.shape)

        adaptive = base.threshold_adaptive_mean(radius=2, c=3.0)
        assert set(np.unique(adaptive.to_numpy())) <= {0, 255}

        dilated = adaptive.dilate_binary(kernel_size=5, iterations=2)
        eroded = adaptive.erode_binary()
        opened = adaptive.open_binary()
        closed = adaptive.close_binary(iterations=2)
        for result in (dilated, eroded, opened, closed):
            assert isinstance(result, zignal.Image)
            assert result.to_numpy().shape == arr.shape
            assert set(np.unique(result.to_numpy())) <= {0, 255}

        with pytest.raises(ValueError):
            adaptive.dilate_binary(kernel_size=2)

    def test_morphology_oracle(self):
        """Dilate/erode vs per-pixel spec (binary.zig applyMorph)."""
        plane = (RNG.random((12, 14)) > 0.6).astype(np.uint8) * 255
        img = zignal.Image.from_numpy(plane[..., None].copy())
        k = 3
        half = k // 2
        h, w = plane.shape
        want_d = np.zeros_like(plane)
        want_e = np.zeros_like(plane)
        for r in range(h):
            for c in range(w):
                vals = []
                for dr in range(-half, half + 1):
                    for dc in range(-half, half + 1):
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < h and 0 <= cc < w:
                            vals.append(plane[rr, cc] != 0)
                        else:
                            vals.append(None)
                want_d[r, c] = 255 if any(v for v in vals if v) else 0
                want_e[r, c] = 255 if all(v is True for v in vals) else 0
        got_d = img.dilate_binary(k).to_numpy()[..., 0]
        got_e = img.erode_binary(k).to_numpy()[..., 0]
        assert np.array_equal(got_d, want_d)
        assert np.array_equal(got_e, want_e)


class TestEnhancement:
    @pytest.mark.parametrize("dtype,color", [
        ("Gray", 128), ("Rgb", (100, 150, 200)), ("Rgba", (100, 150, 200, 255)),
    ])
    def test_autocontrast_and_equalize_api(self, dtype, color):
        img = zignal.Image(5, 5, color, dtype=getattr(zignal, dtype))
        out = img.autocontrast()
        assert (out.rows, out.cols) == (5, 5)
        out2 = img.autocontrast(cutoff=0.02)
        assert out2.dtype is img.dtype
        eq = img.equalize()
        assert (eq.rows, eq.cols) == (5, 5)
        with pytest.raises(ValueError):
            img.autocontrast(cutoff=0.5)

    def test_autocontrast_stretches(self):
        img = zignal.Image(4, 4, dtype=zignal.Gray)
        arr = img.to_numpy()
        arr[...] = np.linspace(50, 150, 16, dtype=np.uint8).reshape(4, 4, 1)
        out = img.autocontrast().to_numpy()
        assert out.min() == 0
        assert out.max() == 255

    def test_equalize_oracle(self):
        plane = RNG.integers(20, 200, (16, 16), dtype=np.uint8)
        img = zignal.Image.from_numpy(plane[..., None].copy())
        got = img.equalize().to_numpy()[..., 0]
        hist = np.bincount(plane.ravel(), minlength=256)
        cdf = hist.cumsum()
        cdf_min = cdf[cdf > 0][0]
        denom = plane.size - cdf_min
        lut = np.where(cdf >= cdf_min, (cdf - cdf_min) * 255 // max(denom, 1), 0)
        want = lut[plane].astype(np.uint8)
        assert np.array_equal(got, want)

    def test_equalize_large_image_no_int32_wrap(self):
        """(cdf - cdf_min) * 255 must use u32 like the reference
        (enhancement.zig); int32 wraps past ~8.4 Mpix (ADVICE r1 high:
        lut[255] came out 33 instead of 255 on a 3000x3000 image)."""
        from zignal_tpu.ops.enhancement import equalize

        plane = RNG.integers(0, 256, (3000, 3000), dtype=np.uint8)
        got = np.asarray(equalize(plane[..., None]))[..., 0]
        hist = np.bincount(plane.ravel(), minlength=256)
        cdf = hist.cumsum()
        cdf_min = cdf[cdf > 0][0]
        denom = plane.size - cdf_min
        lut = np.where(cdf >= cdf_min, (cdf - cdf_min) * 255 // max(denom, 1), 0)
        want = lut[plane].astype(np.uint8)
        assert got.max() == 255
        assert np.array_equal(got, want)


class TestSsim:
    def test_ssim_matches_reference_behavior(self):
        img = zignal.Image(16, 16, (10, 20, 30), dtype=zignal.Rgb)
        noisy = img.copy()
        noisy.to_numpy()[0, 0] = [12, 22, 32]
        value = img.ssim(noisy)
        assert 0.0 <= value <= 1.0
        assert img.ssim(img.copy()) == pytest.approx(1.0)

    def test_ssim_requires_minimum_size(self):
        small = zignal.Image(8, 8, dtype=zignal.Gray)
        with pytest.raises(ValueError):
            small.ssim(small.copy())

    def test_ssim_oracle(self):
        """f32 device SSIM vs direct f64 numpy transcription."""
        a = RNG.integers(0, 256, (20, 24, 1), dtype=np.uint8)
        b = np.clip(a.astype(int) + RNG.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
        ia = zignal.Image.from_numpy(a.copy())
        ib = zignal.Image.from_numpy(b.copy())
        got = ia.ssim(ib)

        x = a[..., 0].astype(np.float64)
        y = b[..., 0].astype(np.float64)
        g = np.arange(11, dtype=np.float64) - 5
        g1 = np.exp(-(g * g) / (2 * 1.5**2))
        win = np.outer(g1, g1)
        win /= win.sum()
        c1 = (0.01 * 255) ** 2
        c2 = (0.03 * 255) ** 2
        vals = []
        for r in range(5, 15):
            for c in range(5, 19):
                wx = x[r - 5:r + 6, c - 5:c + 6]
                wy = y[r - 5:r + 6, c - 5:c + 6]
                mx = (win * wx).sum()
                my = (win * wy).sum()
                sx = max(0.0, (win * wx * wx).sum() - mx * mx)
                sy = max(0.0, (win * wy * wy).sum() - my * my)
                sxy = (win * wx * wy).sum() - mx * my
                vals.append(((2 * mx * my + c1) * (2 * sxy + c2))
                            / ((mx * mx + my * my + c1) * (sx + sy + c2)))
        assert got == pytest.approx(float(np.mean(vals)), abs=1e-4)
