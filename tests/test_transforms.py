"""Geometric transform tests (ported from
bindings/python/tests/test_transforms.py + test_convex_hull.py)."""

import math

import pytest

import zignal_tpu as zignal


class TestTransforms:
    def test_similarity_transform(self):
        t = zignal.SimilarityTransform([(0, 0), (10, 0)], [(5, 5), (15, 5)])
        assert t.project((5, 0)) is not None
        assert t.project([(0, 0), (5, 5)]) is not None
        # pure translation recovered exactly
        out = t.project((0, 0))
        assert out[0] == pytest.approx(5) and out[1] == pytest.approx(5)

    def test_affine_transform(self):
        t = zignal.AffineTransform([(0, 0), (10, 0), (0, 10)], [(1, 1), (11, 2), (2, 11)])
        assert t.project((5, 5)) is not None
        assert t.project([(0, 0), (5, 5)]) is not None
        out = t.project((0, 0))
        assert out[0] == pytest.approx(1) and out[1] == pytest.approx(1)

    def test_projective_transform(self):
        t = zignal.ProjectiveTransform(
            [(0, 0), (10, 0), (10, 10), (0, 10)], [(1, 1), (9, 2), (8, 8), (2, 9)]
        )
        for src, want in zip([(0, 0), (10, 0), (10, 10), (0, 10)],
                             [(1, 1), (9, 2), (8, 8), (2, 9)]):
            out = t.project(src)
            assert out[0] == pytest.approx(want[0], abs=1e-9)
            assert out[1] == pytest.approx(want[1], abs=1e-9)

    @pytest.mark.parametrize("cls,f,t", [
        (zignal.SimilarityTransform, [(0, 0), (0, 0)], [(1, 1), (1, 1)]),
        (zignal.AffineTransform, [(0, 0), (1, 0), (2, 0)], [(0, 0), (1, 0), (2, 0)]),
        (zignal.ProjectiveTransform, [(0, 0), (1, 0), (2, 0), (3, 0)],
         [(0, 0), (1, 0), (2, 0), (3, 0)]),
    ])
    def test_rank_deficient(self, cls, f, t):
        with pytest.raises(ValueError, match="rank deficient"):
            cls(f, t)

    def test_transform_with_warp(self):
        img = zignal.Image(10, 10)
        sim = zignal.SimilarityTransform([(2, 2), (8, 2)], [(3, 3), (7, 3)])
        assert img.warp(sim) is not None
        aff = zignal.AffineTransform([(0, 0), (10, 0), (0, 10)], [(1, 1), (9, 1), (1, 9)])
        assert img.warp(aff) is not None
        proj = zignal.ProjectiveTransform(
            [(0, 0), (10, 0), (10, 10), (0, 10)], [(1, 1), (9, 1), (9, 9), (1, 9)]
        )
        assert img.warp(proj) is not None
        assert img.warp(sim, shape=(20, 20)).rows == 20
        assert img.warp(sim, method=zignal.Interpolation.BICUBIC) is not None
        gray = img.convert(zignal.Gray)
        assert gray.warp(sim) is not None

    def test_rotate_with_border(self):
        img = zignal.Image(10, 10, dtype=zignal.Rgb)
        img.fill(zignal.Rgb(255, 255, 255))
        rotated = img.rotate(math.radians(45))
        assert rotated.rows > 10 and rotated.cols > 10
        px = rotated[0, 0]
        assert (px.r, px.g, px.b) == (0, 0, 0)
        rr = img.rotate(math.radians(45), method=zignal.Interpolation.NEAREST,
                        border=zignal.BorderMode.REPLICATE)
        px = rr[0, 0]
        assert (px.r, px.g, px.b) == (255, 255, 255)

    def test_rotate_orthogonal_exact(self):
        import numpy as np

        img = zignal.Image(4, 6, dtype=zignal.Rgb)
        a = img.to_numpy()
        a[...] = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        r90 = img.rotate(math.pi / 2)
        assert (r90.rows, r90.cols) == (6, 4)
        r180 = img.rotate(math.pi)
        assert np.array_equal(r180.to_numpy(), a[::-1, ::-1])
        r0 = img.rotate(0.0)
        assert np.array_equal(r0.to_numpy(), a)

    def test_extract_with_border(self):
        img = zignal.Image(10, 10, dtype=zignal.Rgb)
        img.fill(zignal.Rgb(255, 255, 255))
        rect = zignal.Rectangle(-5, -5, 5, 5)
        tl = img.extract(rect)[0, 0]
        assert (tl.r, tl.g, tl.b) == (0, 0, 0)
        tl = img.extract(rect, border=zignal.BorderMode.MIRROR)[0, 0]
        assert (tl.r, tl.g, tl.b) == (255, 255, 255)
        tl = img.extract(rect, border=zignal.BorderMode.REPLICATE)[0, 0]
        assert (tl.r, tl.g, tl.b) == (255, 255, 255)

    def test_rotate_angle_validation(self):
        img = zignal.Image(10, 10, dtype=zignal.Rgb)
        for bad in (float("nan"), float("inf"), 1e39):
            with pytest.raises(ValueError, match="Angle must be a finite number"):
                img.rotate(bad)

    def test_resize_scale_validation(self):
        img = zignal.Image(10, 10, dtype=zignal.Rgb)
        for bad in (float("nan"), float("inf"), 1e39):
            with pytest.raises(ValueError, match="Scale factor must be a finite number"):
                img.resize(bad)
        with pytest.raises(ValueError, match="Scale factor must be"):
            img.resize(-1.0)

    def test_insert_and_crop(self):
        img = zignal.Image(10, 10, (0, 0, 0), dtype=zignal.Rgb)
        small = zignal.Image(4, 4, (255, 0, 0), dtype=zignal.Rgb)
        img.insert(small, zignal.Rectangle(2, 2, 6, 6))
        assert img[3, 3] == (255, 0, 0)
        assert img[0, 0] == (0, 0, 0)
        c = img.crop((2, 2, 6, 6))
        assert (c.rows, c.cols) == (4, 4)


def test_convex_hull_api_and_invalids():
    hull = zignal.ConvexHull()
    assert repr(hull) == "ConvexHull()"
    res = hull.find([(0, 0), (1, 0), (0.5, 1)])
    assert isinstance(res, list)
    assert all(isinstance(p, tuple) and len(p) == 2 for p in res)
    assert hull.find([]) is None
    assert hull.find([(0, 0)]) is None
    assert hull.find([(0, 0), (1, 1)]) is None
    assert hull.find([(0, 0), (1, 1), (2, 2)]) is None
    with pytest.raises(TypeError):
        hull.find("not a sequence")


def test_convex_hull_get_rectangle_roundtrip():
    hull = zignal.ConvexHull()
    assert hull.get_rectangle() is None
    hull.find([(0.0, 0.0), (1.0, 0.0), (0.5, 1.0)])
    rect = hull.get_rectangle()
    assert isinstance(rect, zignal.Rectangle)
    assert (rect.left, rect.top, rect.right, rect.bottom) == (0.0, 0.0, 1.0, 1.0)
    hull.find([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)])
    assert hull.get_rectangle() is None


# ---------------------------------------------------------------------------
# Golden expectations from the reference's transforms/binary unit tests
# (reference: src/image/tests/transforms.zig, binary.zig)
# ---------------------------------------------------------------------------


def test_rotate_orthogonal_fast_paths_golden():
    """transforms.zig:160: orthogonal rotations swap dimensions exactly
    and preserve content losslessly."""
    import math
    import numpy as np

    a = np.arange(1, 13, dtype=np.uint8).reshape(3, 4, 1)
    img = zignal.Image.from_numpy(a)
    r0 = img.rotate(0.0)
    assert (r0.rows, r0.cols) == (3, 4)
    assert r0.to_numpy()[0, 0, 0] == 1
    r90 = img.rotate(math.pi / 2)
    assert (r90.rows, r90.cols) == (4, 3)
    r180 = img.rotate(math.pi)
    assert (r180.rows, r180.cols) == (3, 4)
    assert np.array_equal(r180.to_numpy()[..., 0], a[::-1, ::-1, 0])
    r270 = img.rotate(3 * math.pi / 2)
    assert (r270.rows, r270.cols) == (4, 3)
    # 90 + 270 are inverse rotations
    back = r90.rotate(3 * math.pi / 2)
    assert np.array_equal(back.to_numpy(), a)


def test_rotate_arbitrary_angle_grows_canvas_golden():
    """transforms.zig:211: 45deg rotation output is larger than input."""
    import math
    import numpy as np

    a = ((np.indices((10, 10)).sum(0) % 2) * 255).astype(np.uint8)[..., None]
    r = zignal.Image.from_numpy(a).rotate(math.pi / 4)
    assert r.rows > 10 and r.cols > 10


def test_otsu_bimodal_golden():
    """binary.zig:7: Otsu separates a bimodal image."""
    import numpy as np

    a = np.full((10, 10, 1), 40, np.uint8)
    a[:, 5:] = 200
    binary, t = zignal.Image.from_numpy(a).threshold_otsu()
    b = binary.to_numpy()[..., 0]
    assert 40 <= t < 200
    assert (b[:, :5] == 0).all() and (b[:, 5:] == 255).all()


def test_dilate_expands_single_pixel_golden():
    """binary.zig:60: dilation expands an isolated pixel to its
    neighborhood."""
    import numpy as np

    a = np.zeros((7, 7, 1), np.uint8)
    a[3, 3] = 255
    d = zignal.Image.from_numpy(a).dilate_binary().to_numpy()[..., 0]
    assert (d[2:5, 2:5] == 255).all()
    assert d[0, 0] == 0


def test_open_removes_noise_close_fills_holes_golden():
    """binary.zig:91/117 — the reference's exact 5x5 fixtures and
    expected outputs (erode treats out-of-bounds as background)."""
    import numpy as np

    open_in = np.array([
        [0, 0, 0, 0, 0],
        [0, 255, 255, 255, 255],
        [0, 255, 255, 255, 0],
        [0, 255, 255, 255, 0],
        [0, 0, 0, 0, 0],
    ], np.uint8)[..., None]
    want = np.zeros((5, 5), np.uint8)
    want[1:4, 1:4] = 255
    opened = zignal.Image.from_numpy(open_in.copy()).open_binary()
    assert np.array_equal(opened.to_numpy()[..., 0], want)

    close_in = np.array([
        [0, 0, 0, 0, 0],
        [0, 255, 255, 255, 0],
        [0, 255, 0, 255, 0],
        [0, 255, 255, 255, 0],
        [0, 0, 0, 0, 0],
    ], np.uint8)[..., None]
    closed = zignal.Image.from_numpy(close_in.copy()).close_binary()
    assert np.array_equal(closed.to_numpy()[..., 0], want)

    # isolated single pixel vanishes under opening
    noise = np.zeros((9, 9, 1), np.uint8)
    noise[4, 4] = 255
    assert (zignal.Image.from_numpy(noise).open_binary().to_numpy() == 0).all()


def test_insert_extract_inverse_golden():
    """transforms.zig:317: extract then insert reconstructs the region
    within the reference's own error tolerance."""
    import math
    import numpy as np

    src = ((np.add.outer(np.arange(64), np.arange(64))) % 256).astype(
        np.uint8)[..., None]
    source = zignal.Image.from_numpy(src.copy())

    cases = [
        ((10.0, 10.0, 50.0, 50.0), 0.0, 40),
        ((15.0, 15.0, 45.0, 45.0), math.pi / 4.0, 30),
        ((20.0, 20.0, 40.0, 40.0), 0.0, 40),
    ]
    for rect_t, angle, size in cases:
        rect = zignal.Rectangle(*rect_t)
        extracted = source.extract(rect, angle=angle, size=(size, size))
        canvas = zignal.Image(64, 64, 0, dtype=zignal.Gray)
        canvas.insert(extracted, rect, angle=angle)
        l, t, r_, b = rect_t
        cx = (l + r_) * 0.5
        cy = (t + b) * 0.5
        check = min(r_ - l, b - t) * 0.6
        sr, er = int(cy - check / 2), int(cy + check / 2)
        sc, ec = int(cx - check / 2), int(cx + check / 2)
        a = src[sr:er, sc:ec, 0].astype(np.int32)
        b2 = canvas.to_numpy()[sr:er, sc:ec, 0].astype(np.int32)
        avg_err = float(np.abs(a - b2).mean())
        assert avg_err < 25, (rect_t, angle, avg_err)


def test_lanczos3_lut_matches_reference_recipe():
    """Per-pixel Lanczos sampling uses the reference's 1025-entry LUT +
    lerp (interpolation.zig:256-281), not the direct sinc (ADVICE r1)."""
    import jax.numpy as jnp
    import numpy as np

    from zignal_tpu.ops.warp import _LANCZOS3_LUT, _lanczos3_kernel_f32

    assert _LANCZOS3_LUT.shape == (1025,)
    assert _LANCZOS3_LUT[0] == 1.0
    assert _LANCZOS3_LUT[1024] == 0.0

    t = np.linspace(-2.999, 2.999, 1001, dtype=np.float32)
    got = np.asarray(_lanczos3_kernel_f32(jnp.asarray(t)))

    # numpy replica of the reference's lanczos3KernelLut
    step = np.float32(1024.0 / 3.0)
    pos = np.abs(t) * step
    idx = np.minimum(np.trunc(pos), 1023).astype(np.int64)
    frac = pos - idx.astype(np.float32)
    want = _LANCZOS3_LUT[idx] * (1 - frac) + _LANCZOS3_LUT[idx + 1] * frac
    np.testing.assert_allclose(got, want, atol=2e-7)

    # the LUT path intentionally deviates from the direct sinc by up to
    # ~4e-4 (that is the point: the reference reads the table too)
    pi_x = np.float64(np.pi) * np.abs(t).astype(np.float64)
    with np.errstate(invalid="ignore"):
        direct = 3.0 * np.sin(pi_x) * np.sin(pi_x / 3.0) / (pi_x * pi_x)
    direct = np.where(t == 0, 1.0, direct)
    assert np.abs(got - direct).max() < 5e-4
