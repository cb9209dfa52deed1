"""Order-statistic blurs, motion blur, Canny, Shen-Castan
(ported from reference test_image.py sections + oracles)."""

import math

import numpy as np
import pytest

import zignal_tpu as zignal

RNG = np.random.default_rng(9)


class TestOrderStatBlurs:
    def test_api(self):
        img = zignal.Image(5, 5, (0, 0, 0, 255), dtype=zignal.Rgba)
        assert isinstance(img.median_blur(1), zignal.Image)
        assert isinstance(img.percentile_blur(1, 1.0), zignal.Image)
        assert isinstance(
            img.percentile_blur(1, 0.0, border=zignal.BorderMode.WRAP), zignal.Image
        )
        with pytest.raises(ValueError):
            img.percentile_blur(1, 1.5)
        for result in (img.min_blur(1), img.max_blur(1), img.midpoint_blur(1),
                       img.alpha_trimmed_mean_blur(1, 0.1)):
            assert isinstance(result, zignal.Image)
        with pytest.raises(ValueError):
            img.alpha_trimmed_mean_blur(1, 0.6)

    def test_median_oracle(self):
        plane = RNG.integers(0, 256, (9, 11), dtype=np.uint8)
        img = zignal.Image.from_numpy(plane[..., None].copy())
        got = img.median_blur(1).to_numpy()[..., 0]

        def mirror(i, n):
            if 0 <= i < n:
                return i
            period = 2 * (n - 1)
            m = i % period
            return period - m if m >= n else m

        h, w = plane.shape
        for r in range(h):
            for c in range(w):
                vals = sorted(
                    plane[mirror(r + dr, h), mirror(c + dc, w)]
                    for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                )
                assert got[r, c] == vals[4], (r, c)

    def test_min_max_equal_percentile(self):
        plane = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
        img = zignal.Image.from_numpy(plane[..., None].copy())
        assert img.min_blur(2) == img.percentile_blur(2, 0.0)
        assert img.max_blur(2) == img.percentile_blur(2, 1.0)

    def test_alpha_trimmed_oracle(self):
        plane = RNG.integers(0, 256, (6, 7), dtype=np.uint8)
        img = zignal.Image.from_numpy(plane[..., None].copy())
        got = img.alpha_trimmed_mean_blur(1, 0.2).to_numpy()[..., 0]

        def mirror(i, n):
            if 0 <= i < n:
                return i
            period = 2 * (n - 1)
            m = i % period
            return period - m if m >= n else m

        h, w = plane.shape
        trim = min(int(np.floor(0.2 * 9)), 4)
        for r in range(h):
            for c in range(w):
                vals = sorted(
                    int(plane[mirror(r + dr, h), mirror(c + dc, w)])
                    for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                )
                kept = vals[trim:9 - trim]
                want = min(255, (sum(kept) + len(kept) // 2) // len(kept))
                assert got[r, c] == want, (r, c)


class TestMotionBlur:
    def test_linear(self):
        img = zignal.Image(10, 10, (255, 0, 0), dtype=zignal.Rgb)
        cfg = zignal.MotionBlur.linear(angle=0.0, distance=3)
        out = img.motion_blur(cfg)
        assert (out.rows, out.cols) == (10, 10)

    def test_radial(self):
        img = zignal.Image(10, 10, (255, 0, 0), dtype=zignal.Rgb)
        z = img.motion_blur(zignal.MotionBlur.radial_zoom())
        assert (z.rows, z.cols) == (10, 10)
        s = img.motion_blur(
            zignal.MotionBlur.radial_spin(center=(0.3, 0.7), strength=0.8)
        )
        assert (s.rows, s.cols) == (10, 10)

    def test_diagonal_blurs_edge(self):
        img = zignal.Image(16, 16, dtype=zignal.Gray)
        img.to_numpy()[:, 8:] = 200
        out = img.motion_blur(zignal.MotionBlur.linear(math.pi / 4, 6))
        arr = out.to_numpy()[..., 0]
        # the hard edge must be smeared
        assert len(np.unique(arr[8, 6:10])) > 2

    def test_validation(self):
        with pytest.raises(ValueError):
            zignal.MotionBlur.radial_zoom(strength=2.0)
        with pytest.raises(ValueError):
            zignal.MotionBlur.radial_spin(center=(2.0, 0.5))
        img = zignal.Image(4, 4)
        with pytest.raises(TypeError):
            img.motion_blur("linear")


class TestCanny:
    def test_canny_defaults_and_params(self):
        img = zignal.Image(20, 20, dtype=zignal.Gray)
        edges = img.canny()
        assert (edges.rows, edges.cols) == (20, 20)
        assert edges.dtype is zignal.Gray
        assert img.canny(sigma=1.0, low=30, high=90) is not None
        assert img.canny(sigma=0) is not None
        with pytest.raises(ValueError):
            img.canny(sigma=-1)

    def test_canny_rejects_non_finite(self):
        img = zignal.Image(20, 20, dtype=zignal.Gray)
        for bad in (float("nan"), float("inf"), float("-inf")):
            with pytest.raises(ValueError):
                img.canny(sigma=bad)
            with pytest.raises(ValueError):
                img.canny(low=bad)
            with pytest.raises(ValueError):
                img.canny(high=bad)

    def test_canny_finds_step_edge(self):
        img = zignal.Image(32, 32, dtype=zignal.Gray)
        img.to_numpy()[:, 16:] = 255
        edges = img.canny(sigma=1.0, low=20, high=60).to_numpy()[..., 0]
        assert edges[:, 14:18].max() == 255  # edge detected near column 16
        assert edges[:, :10].max() == 0
        assert edges[:, 22:].max() == 0


class TestShenCastan:
    def test_shen_castan_api(self):
        img = zignal.Image(20, 20, (128, 128, 128), dtype=zignal.Rgb)
        edges = img.shen_castan()
        assert (edges.rows, edges.cols) == (20, 20)
        assert edges.dtype is zignal.Gray
        assert img.shen_castan(smooth=0.95, high_ratio=0.98) is not None
        assert img.shen_castan(smooth=0.7, window_size=11) is not None
        assert img.shen_castan(smooth=0.5, window_size=9, high_ratio=0.95) is not None
        assert img.shen_castan(high_ratio=0.97, low_rel=0.4) is not None
        assert img.shen_castan(use_nms=True) is not None
        assert img.shen_castan(hysteresis=False) is not None
        with pytest.raises(ValueError):
            img.shen_castan(smooth=1.5)
        with pytest.raises(ValueError):
            img.shen_castan(window_size=4)
        with pytest.raises(ValueError):
            img.shen_castan(high_ratio=0.0)

    def test_shen_castan_finds_edge(self):
        # full-contrast step: gradient bins hit 255 where the percentile
        # threshold clamps (min(idx, 255)), so the edge survives — a
        # uniform mid-contrast step is legitimately thresholded away by
        # the reference's ratio rule (edges.zig:166-178)
        img = zignal.Image(32, 32, dtype=zignal.Gray)
        img.to_numpy()[:, 16:] = 255
        edges = img.shen_castan().to_numpy()[..., 0]
        assert edges[:, 13:19].max() == 255
        assert edges[:, :8].max() == 0


def test_isef_matches_sequential():
    """Associative-scan ISEF vs direct sequential transcription."""
    from zignal_tpu.ops.edges import isef_filter

    x = RNG.random((12, 15)).astype(np.float32) * 255
    b = 0.8
    a = 1.0 - b

    def isef1d(data):
        n = len(data)
        temp = np.empty_like(data)
        temp[0] = b * data[0]
        for i in range(1, n):
            temp[i] = b * data[i] + a * temp[i - 1]
        out = np.empty_like(data)
        out[n - 1] = temp[n - 1]
        for i in range(n - 2, -1, -1):
            out[i] = b * temp[i] + a * out[i + 1]
        return out

    want = x.copy()
    for r in range(want.shape[0]):
        want[r] = isef1d(want[r])
    for c in range(want.shape[1]):
        want[:, c] = isef1d(want[:, c])
    got = np.asarray(isef_filter(x, b))
    assert np.max(np.abs(got - want)) < 1e-2


# ---------------------------------------------------------------------------
# Golden expectations from the reference's own unit tests
# (reference: src/image/tests/filters.zig)
# ---------------------------------------------------------------------------


def test_median_blur_removes_impulse_noise():
    """filters.zig:817 'medianBlur removes impulse noise'"""
    import numpy as np
    import zignal_tpu as zignal

    a = np.zeros((5, 5, 1), np.uint8)
    a[2, 2, 0] = 255
    out = zignal.Image.from_numpy(a).median_blur(1).to_numpy()[..., 0]
    assert out[2, 2] == 0 and out[2, 1] == 0 and out[1, 2] == 0


def test_percentile_blur_max_filter_golden():
    """filters.zig:833 'percentileBlur max filter': gradient 0..8,
    ZERO border, p=1.0 -> max of the window."""
    import numpy as np
    import zignal_tpu as zignal
    from zignal_tpu.enums import BorderMode

    a = np.arange(9, dtype=np.uint8).reshape(3, 3, 1)
    out = zignal.Image.from_numpy(a).percentile_blur(
        1, 1.0, border=BorderMode.ZERO).to_numpy()[..., 0]
    assert out[1, 1] == 8
    assert out[0, 0] == 4


def test_box_blur_uniform_all_borders_golden():
    """filters.zig:186 'boxBlur border area calculations': uniform stays
    uniform at every pixel including corners (per-position areas)."""
    import numpy as np
    import zignal_tpu as zignal

    a = np.full((12, 12, 1), 200, np.uint8)
    out = zignal.Image.from_numpy(a).box_blur(3).to_numpy()[..., 0]
    assert (out == 200).all()


def test_sharpen_uniform_image_golden():
    """filters.zig:327 'sharpen uniform image': 2*u - u == u."""
    import numpy as np
    import zignal_tpu as zignal

    a = np.full((10, 10, 3), 123, np.uint8)
    out = zignal.Image.from_numpy(a).sharpen(2).to_numpy()
    assert (out == 123).all()


def test_convolve_identity_kernel_golden():
    """filters.zig:370 'convolve identity kernel': output == input."""
    import numpy as np
    import jax.numpy as jnp
    from zignal_tpu.ops.convolution import convolve2d

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    ident = ((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 0.0))
    out = np.asarray(convolve2d(jnp.asarray(a), ident))
    assert np.array_equal(out, a)


def _radial_oracle(img, center, strength, zoom):
    """Scalar per-pixel transcription of the reference radial blur
    (motion_blur.zig:240-345), strict f32 at every step."""
    f32 = np.float32
    h, w, ch = img.shape
    cx = f32(center[0]) * f32(w - 1)
    cy = f32(center[1]) * f32(h - 1)
    scl = f32(min(max(strength, 0.0), 1.0))
    n = 8 + int(np.trunc(scl * f32(24)))
    maxd = np.sqrt(cx * cx + cy * cy)
    out = np.zeros_like(img)
    for r in range(h):
        for c in range(w):
            dx = f32(c) - cx
            dy = f32(r) - cy
            dist = np.sqrt(dx * dx + dy * dy)
            if zoom:
                blur = dist / max(maxd, f32(1e-6)) * scl * f32(20)
            else:
                blur = scl * f32(0.5)
                angle = np.arctan2(dy, dx)
            acc = np.zeros(ch, np.float32)
            cnt = 0
            for s in range(n):
                t = (f32(s) - f32(n - 1) / f32(2.0)) / f32(n - 1)
                if zoom:
                    scale = f32(1.0) + t * blur * f32(0.1)
                    sx = cx + dx * scale
                    sy = cy + dy * scale
                else:
                    na = angle + t * blur
                    sx = cx + dist * np.cos(na)
                    sy = cy + dist * np.sin(na)
                if 0 <= sx < w and 0 <= sy < h:
                    x0 = int(np.floor(sx))
                    x1 = min(x0 + 1, w - 1)
                    y0 = int(np.floor(sy))
                    y1 = min(y0 + 1, h - 1)
                    fxi = sx - f32(x0)
                    fyi = sy - f32(y0)
                    v00 = img[y0, x0].astype(np.float32)
                    v10 = img[y0, x1].astype(np.float32)
                    v01 = img[y1, x0].astype(np.float32)
                    v11 = img[y1, x1].astype(np.float32)
                    v0 = v00 * (f32(1) - fxi) + v10 * fxi
                    v1 = v01 * (f32(1) - fxi) + v11 * fxi
                    acc = acc + (v0 * (f32(1) - fyi) + v1 * fyi)
                    cnt += 1
            res = acc / f32(cnt) if cnt else img[r, c].astype(np.float32)
            out[r, c] = np.clip(np.trunc(np.floor(res + f32(0.5))), 0, 255)
    return out


class TestRadialOracle:
    def test_zoom_bit_exact(self):
        """Static-coordinate zoom path replicates the reference's f32
        loop exactly (coords use only +-*/ and sqrt)."""
        rng = np.random.default_rng(17)
        arr = rng.integers(0, 256, (20, 16, 3), dtype=np.uint8)
        img = zignal.Image.from_numpy(arr.copy())
        got = img.motion_blur(
            zignal.MotionBlur.radial_zoom(center=(0.4, 0.6), strength=0.7)
        ).to_numpy()
        want = _radial_oracle(arr, (0.4, 0.6), 0.7, zoom=True)
        assert np.array_equal(got, want)

    def test_packed_gather_layout_bit_exact(self):
        """ZT_RADIAL_PACKED=1 (pack-of-8 x-positions per gather row,
        motion_blur_ops._accumulate_static) is pure data movement: the
        mask-select pick of the x0%pack block must leave output bytes
        identical for every channel count and both modes."""
        import os

        import jax.numpy as jnp

        from zignal_tpu.ops import motion_blur_ops as mb

        rng = np.random.default_rng(19)
        orig = os.environ.get("ZT_RADIAL_PACKED")
        for c, zoom in ((3, True), (3, False), (1, True), (4, True)):
            arr = jnp.asarray(
                rng.integers(0, 256, (40, 36, c), dtype=np.uint8))
            try:
                os.environ["ZT_RADIAL_PACKED"] = "0"
                ref = np.asarray(mb.radial_blur(arr, 0.4, 0.6, 0.7, zoom))
                os.environ["ZT_RADIAL_PACKED"] = "1"
                got = np.asarray(mb.radial_blur(arr, 0.4, 0.6, 0.7, zoom))
            finally:
                if orig is None:
                    os.environ.pop("ZT_RADIAL_PACKED", None)
                else:
                    os.environ["ZT_RADIAL_PACKED"] = orig
            assert np.array_equal(ref, got), (c, zoom)

    def test_grouped_window_gather_bit_exact(self):
        """ZT_RADIAL_GROUPED=1 (one K*W-lane window row serving G
        consecutive output pixels, motion_blur_ops._accumulate_static)
        is pure data movement: the dy-strip + binary-dx-shift
        extraction must yield the exact clamped 2x2 taps the per-pixel
        path gathers, leaving output bytes identical for every channel
        count and both modes. (At these sizes every sample takes the
        grouped path — verified via _pick_group_plan instrumentation.)"""
        import os

        import jax.numpy as jnp

        from zignal_tpu.ops import motion_blur_ops as mb

        rng = np.random.default_rng(23)
        orig = os.environ.get("ZT_RADIAL_GROUPED")
        for c, zoom, size in ((3, True, 64), (3, False, 64),
                              (1, True, 40), (4, False, 52)):
            arr = jnp.asarray(
                rng.integers(0, 256, (size, size - 6, c), dtype=np.uint8))
            try:
                os.environ["ZT_RADIAL_GROUPED"] = "0"
                ref = np.asarray(mb.radial_blur(arr, 0.4, 0.6, 0.7, zoom))
                os.environ["ZT_RADIAL_GROUPED"] = "1"
                got = np.asarray(mb.radial_blur(arr, 0.4, 0.6, 0.7, zoom))
            finally:
                if orig is None:
                    os.environ.pop("ZT_RADIAL_GROUPED", None)
                else:
                    os.environ["ZT_RADIAL_GROUPED"] = orig
            assert np.array_equal(ref, got), (c, zoom)

    def test_spin_within_one(self):
        """Spin coords go through libm sin/cos/atan2, which may differ
        from other libms by ulps -> documented +/-1 tolerance."""
        rng = np.random.default_rng(18)
        arr = rng.integers(0, 256, (20, 16, 3), dtype=np.uint8)
        img = zignal.Image.from_numpy(arr.copy())
        got = img.motion_blur(
            zignal.MotionBlur.radial_spin(center=(0.3, 0.7), strength=0.8)
        ).to_numpy()
        want = _radial_oracle(arr, (0.3, 0.7), 0.8, zoom=False)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
