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


class TestStaticWarp:
    """The packed-patch static warp path (ops/warp.py warp_static /
    _sample_tile_patch): gather cost is per ROW, so packing the 2x2
    bilinear neighborhood into one [*, 4C] patch row from a
    border-pre-resolved pad quarters the dominant cost. The contract is
    bit-identity with the generic 4-tap tile path (same taps, same
    blend expressions)."""

    def _coords(self, rng, lo_x, hi_x, lo_y, hi_y, shape=(20, 22)):
        import numpy as np

        xs = rng.uniform(lo_x, hi_x, shape).astype(np.float32)
        ys = rng.uniform(lo_y, hi_y, shape).astype(np.float32)
        return xs, ys

    @pytest.mark.parametrize("border_name", ["ZERO", "REPLICATE",
                                             "MIRROR", "WRAP"])
    @pytest.mark.parametrize("dtype_name", ["uint8", "float32"])
    def test_patch_path_bit_identical(self, border_name, dtype_name):
        """Eligible tiles (anchors in [-1, n-1]) through the patch path
        must equal the generic path byte-for-byte, every border mode,
        u8 and float, including the frame rows at exactly -1/n-1."""
        import numpy as np
        import jax.numpy as jnp

        from zignal_tpu.enums import BorderMode, Interpolation
        from zignal_tpu.ops import warp as W

        border = getattr(BorderMode, border_name)
        rng = np.random.default_rng(5)
        a = (rng.integers(0, 256, (37, 45, 3)).astype(np.uint8)
             if dtype_name == "uint8"
             else rng.random((37, 45, 3), np.float32))
        ad = jnp.asarray(a)
        xs, ys = self._coords(rng, -0.999, 44.999, -0.999, 36.999)
        pad = W._pad1(ad, border)
        got = np.asarray(W._sample_tile(
            ad, xs, ys, Interpolation.BILINEAR, border, pad))
        want = np.asarray(W._sample_tile(
            ad, xs, ys, Interpolation.BILINEAR, border, None))
        assert np.array_equal(got, want)

    def test_far_oob_tiles_fall_back(self):
        """Tiles with anchors beyond [-1, n-1] must take the generic
        4-tap path (the patch trick's consecutive-neighbor premise
        breaks on the descending branch of the mirror wave) and still
        match it exactly."""
        import numpy as np
        import jax.numpy as jnp

        from zignal_tpu.enums import BorderMode, Interpolation
        from zignal_tpu.ops import warp as W

        rng = np.random.default_rng(6)
        a = rng.integers(0, 256, (37, 45, 3), np.uint8)
        ad = jnp.asarray(a)
        xs, ys = self._coords(rng, -30, 80, -30, 70, (16, 16))
        for border in (BorderMode.ZERO, BorderMode.MIRROR):
            pad = W._pad1(ad, border)
            got = np.asarray(W._sample_tile(
                ad, xs, ys, Interpolation.BILINEAR, border, pad))
            want = np.asarray(W._sample_tile(
                ad, xs, ys, Interpolation.BILINEAR, border, None))
            assert np.array_equal(got, want)

    def test_warp_static_identity_and_translation(self):
        import numpy as np
        import jax.numpy as jnp

        from zignal_tpu.ops.warp import warp_static

        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, (64, 80, 3), np.uint8)
        ident = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
        got = np.asarray(warp_static(jnp.asarray(a), ident, 64, 80))
        assert np.array_equal(got, a)
        t = ((1.0, 0.0, 5.0), (0.0, 1.0, 3.0), (0.0, 0.0, 1.0))
        got = np.asarray(warp_static(jnp.asarray(a), t, 64, 80))
        assert np.array_equal(got[:61, :75], a[3:, 5:])

    def test_image_warp_static_matches_runtime(self):
        """Image.warp (static route, default) vs the runtime device
        path. Coords come from numpy f32 vs XLA f32; fma contraction
        may flip floor() at rare pixels on some backends, so allow
        max |diff| <= 1 at <1% of pixels (the static path is the
        reference-faithful one — transforms.zig computes coords in
        scalar f32 with no contraction)."""
        import os

        import numpy as np

        import zignal_tpu as zignal

        rng = np.random.default_rng(8)
        a = rng.integers(0, 256, (64, 80, 3), np.uint8)
        img = zignal.Image.from_numpy(a)
        proj = zignal.ProjectiveTransform(
            [(0, 0), (79, 0), (0, 63), (79, 63)],
            [(4, 2), (75, 5), (-3, 60), (82, 58)])
        out_s = img.warp(proj).to_numpy()
        orig = os.environ.get("ZT_WARP_STATIC")
        os.environ["ZT_WARP_STATIC"] = "0"
        try:
            out_r = img.warp(proj).to_numpy()
        finally:
            if orig is None:
                os.environ.pop("ZT_WARP_STATIC", None)
            else:
                os.environ["ZT_WARP_STATIC"] = orig
        d = np.abs(out_s.astype(int) - out_r.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.01

    def test_batch_warp_matches_per_image(self):
        import numpy as np

        import zignal_tpu as zignal

        rng = np.random.default_rng(9)
        a = rng.integers(0, 256, (2, 48, 56, 3), np.uint8)
        proj = zignal.ProjectiveTransform(
            [(0, 0), (55, 0), (0, 47), (55, 47)],
            [(2, 1), (53, 3), (-2, 45), (57, 44)])
        got = zignal.ImageBatch.from_numpy(a).warp(proj).to_numpy()
        for i in range(2):
            want = zignal.Image.from_numpy(a[i]).warp(proj).to_numpy()
            assert np.array_equal(got[i], want)


class TestRuntimePatchSample:
    """The packed-patch RUNTIME bilinear path (ops/warp.py
    _bilinear_patch_rt): one gathered [*, 4C] row per output pixel for
    data-dependent coords. ZERO/REPLICATE clamp anchors into a
    border-pre-resolved pad, WRAP remaps by modulo, MIRROR (whose
    reflection flips tap adjacency) uses min-anchor + swap selects on
    an unpadded patch. Contract: bit-identity with the generic 4-tap
    runtime path for every border mode, including far-out-of-range
    coordinates."""

    @pytest.mark.parametrize("border_name", ["ZERO", "REPLICATE",
                                             "MIRROR", "WRAP"])
    @pytest.mark.parametrize("dtype_name", ["uint8", "float32"])
    def test_patch_rt_bit_identical(self, border_name, dtype_name):
        import numpy as np
        import jax.numpy as jnp

        from zignal_tpu.enums import BorderMode
        from zignal_tpu.ops import warp as W

        border = BorderMode[border_name]
        rng = np.random.default_rng(11)
        for h, w, c in [(37, 53, 3), (2, 2, 1), (5, 129, 4)]:
            if dtype_name == "uint8":
                a = rng.integers(0, 256, (h, w, c), np.uint8)
            else:
                a = rng.normal(size=(h, w, c)).astype(np.float32)
            ad = jnp.asarray(a)
            xs = np.concatenate([
                rng.uniform(-2, w + 2, 400),
                rng.uniform(-60, w + 60, 200),
                rng.integers(-3, w + 3, 100).astype(np.float64),
            ]).astype(np.float32).reshape(70, 10)
            ys = np.concatenate([
                rng.uniform(-2, h + 2, 400),
                rng.uniform(-60, h + 60, 200),
                rng.integers(-3, h + 3, 100).astype(np.float64),
            ]).astype(np.float32).reshape(70, 10)
            got = np.asarray(W._bilinear_patch_rt(
                ad, jnp.asarray(xs), jnp.asarray(ys), border))
            want = np.asarray(W._bilinear_generic_rt(
                ad, jnp.asarray(xs), jnp.asarray(ys), border))
            assert np.array_equal(got, want), (h, w, c)

    def test_runtime_warp_traced_matrix_unchanged(self):
        """warp() with a traced matrix (the runtime path, which now
        routes bilinear through the patch gather) must still match the
        static-route Image.warp for an affine matrix (same taps, same
        blend; affine coords have no perspective divide to contract)."""
        import numpy as np
        import jax.numpy as jnp

        from zignal_tpu.ops.warp import warp, warp_static

        rng = np.random.default_rng(12)
        a = rng.integers(0, 256, (96, 112, 3), np.uint8)
        m = np.array([[0.9, -0.2, 8.0], [0.2, 0.9, -5.0],
                      [0.0, 0.0, 1.0]], np.float32)
        got = np.asarray(warp(jnp.asarray(a), jnp.asarray(m), 96, 112))
        want = np.asarray(warp_static(jnp.asarray(a),
                                      tuple(map(tuple, m.tolist())),
                                      96, 112))
        assert np.array_equal(got, want)
