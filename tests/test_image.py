"""Image container tests, ported from the reference contract
(bindings/python/tests/test_image.py)."""

import numpy as np
import pytest

import zignal_tpu as zignal


class TestImageBasics:
    def test_from_numpy_and_props(self):
        arr = np.zeros((3, 4, 4), dtype=np.uint8)
        img = zignal.Image.from_numpy(arr)
        assert (img.rows, img.cols) == (3, 4)
        assert img.is_contiguous() is True

    def test_numpy_roundtrip_and_validation(self):
        img = zignal.Image(2, 3, (1, 2, 3), dtype=zignal.Rgb)
        arr = img.to_numpy()
        img2 = zignal.Image.from_numpy(arr)
        assert img == img2
        with pytest.raises(TypeError):
            zignal.Image.from_numpy(np.zeros((2, 3, 3), dtype=np.float32))
        with pytest.raises(ValueError):
            zignal.Image.from_numpy(np.zeros((2, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            zignal.Image.from_numpy(np.zeros((2, 3, 2), dtype=np.uint8))

    def test_equality_and_copy(self):
        img1 = zignal.Image(3, 4, (1, 2, 3, 255), dtype=zignal.Rgba)
        img2 = img1.copy()
        assert img1 == img2
        a = img2.to_numpy()
        a[0, 0] = [9, 9, 9, 255]
        assert img1 != img2

    def test_indexing_and_pixel_proxy(self):
        img = zignal.Image(2, 2, (10, 20, 30), dtype=zignal.Rgb)
        px = img[0, 0]
        assert (px.r, px.g, px.b) == (10, 20, 30)
        px.g = 99
        assert img[0, 0].g == 99
        assert img[0, 0] == (10, 99, 30)
        item = img[0, 0].item()
        assert (item.r, item.g, item.b) == (10, 99, 30)

    def test_view_and_memory_sharing(self):
        img = zignal.Image(4, 4, (0, 0, 0, 0), dtype=zignal.Rgba)
        v = img.view(zignal.Rectangle(1, 1, 3, 3))
        assert (v.rows, v.cols) == (2, 2)
        v.fill((5, 6, 7, 255))
        arr = img.to_numpy()
        assert (arr[1, 1] == np.array([5, 6, 7, 255], dtype=np.uint8)).all()

    def test_view_with_tuple(self):
        img = zignal.Image(4, 4, (0, 0, 0, 0), dtype=zignal.Rgba)
        v = img.view((1, 1, 3, 3))
        assert (v.rows, v.cols) == (2, 2)

    def test_set_border(self):
        img = zignal.Image(4, 4, (10, 20, 30), dtype=zignal.Rgb)
        rect = zignal.Rectangle(1, 1, 3, 3)
        img.set_border(rect)
        arr = img.to_numpy()
        for r, c in ((0, 0), (0, 3), (3, 0), (3, 3)):
            assert (arr[r, c] == 0).all()
        assert (arr[1, 1] == np.array([10, 20, 30], dtype=np.uint8)).all()

        img.fill((10, 20, 30))
        img.set_border(rect, (255, 0, 0))
        arr = img.to_numpy()
        assert (arr[0, 0] == np.array([255, 0, 0], dtype=np.uint8)).all()
        assert (arr[1, 1] == np.array([10, 20, 30], dtype=np.uint8)).all()

    def test_set_border_no_overlap_fills_entire_image(self):
        img = zignal.Image(3, 3, (7, 8, 9), dtype=zignal.Rgb)
        img.set_border(zignal.Rectangle(10, 10, 20, 20))
        assert (img.to_numpy() == 0).all()

    def test_set_border_requires_rect(self):
        img = zignal.Image(3, 3, (1, 2, 3), dtype=zignal.Rgb)
        with pytest.raises(TypeError):
            img.set_border(None)

    def test_get_rectangle(self):
        img = zignal.Image(5, 7)
        rect = img.get_rectangle()
        assert isinstance(rect, zignal.Rectangle)
        assert (int(rect.left), int(rect.top), int(rect.right), int(rect.bottom)) == (0, 0, 7, 5)

    def test_slice_assignment_converts_between_color_spaces(self):
        rgb = zignal.Image(2, 2, dtype=zignal.Rgb)
        rgb_np = rgb.to_numpy()
        pattern = np.array(
            [[[10, 10, 10], [20, 20, 20]], [[30, 30, 30], [40, 40, 40]]],
            dtype=np.uint8,
        )
        rgb_np[:] = pattern

        gray = zignal.Image(2, 2, dtype=zignal.Gray)
        rgba = zignal.Image(2, 2, dtype=zignal.Rgba)
        gray[:] = rgb
        rgba[:] = rgb

        expected_gray = np.empty((2, 2), dtype=np.uint8)
        for r in range(2):
            for c in range(2):
                px = zignal.Rgb(*map(int, pattern[r, c]))
                expected_gray[r, c] = px.to(zignal.Gray).y
        assert np.array_equal(gray.to_numpy()[..., 0], expected_gray)
        out = rgba.to_numpy()
        assert np.array_equal(out[..., :3], pattern)
        assert (out[..., 3] == 255).all()

    def test_invert(self):
        gray = zignal.Image(2, 2, 100, dtype=zignal.Gray)
        assert gray.invert()[0, 0] == 155
        rgb = zignal.Image(1, 1, (0, 128, 255), dtype=zignal.Rgb)
        inv = rgb.invert()[0, 0].item()
        assert (inv.r, inv.g, inv.b) == (255, 127, 0)
        rgba = zignal.Image(1, 1, (0, 128, 255, 64), dtype=zignal.Rgba)
        inv = rgba.invert()[0, 0].item()
        assert (inv.r, inv.g, inv.b, inv.a) == (255, 127, 0, 64)

    def test_blend_api(self):
        base = zignal.Image(5, 5, (255, 0, 0), dtype=zignal.Rgba)
        overlay = zignal.Image(5, 5, (0, 0, 255, 128), dtype=zignal.Rgba)
        assert base.blend(overlay, zignal.Blending.NORMAL) is None
        px = base[2, 2]
        assert px.r < 255
        assert px.b > 0

        gray_base = zignal.Image(5, 5, 128, dtype=zignal.Gray)
        overlay = zignal.Image(5, 5, (255, 0, 0, 128), dtype=zignal.Rgba)
        gray_base.blend(overlay)
        gp = gray_base[2, 2]
        assert gp != 128
        assert isinstance(gp, int)

    def test_psnr_and_mean_pixel_error(self):
        ref = zignal.Image(4, 4, (10, 20, 30), dtype=zignal.Rgb)
        distorted = ref.copy()
        arr = distorted.to_numpy()
        arr[0, 0] = [12, 24, 36]
        assert ref.psnr(distorted) > 30.0
        assert ref.mean_pixel_error(distorted) > 0.0
        assert ref.mean_pixel_error(ref.copy()) == pytest.approx(0.0)

    def test_iter(self):
        img = zignal.Image(2, 2, (5, 6, 7), dtype=zignal.Rgb)
        seen = list(img)
        assert len(seen) == 4
        assert seen[0][0:2] == (0, 0)
        assert seen[3][0:2] == (1, 1)
        assert (seen[0][2].r, seen[0][2].g, seen[0][2].b) == (5, 6, 7)

    def test_dtype_autodetect(self):
        assert zignal.Image(2, 2).dtype is zignal.Rgb
        assert zignal.Image(2, 2, 7).dtype is zignal.Gray
        assert zignal.Image(2, 2, (1, 2, 3)).dtype is zignal.Rgb
        assert zignal.Image(2, 2, (1, 2, 3, 4)).dtype is zignal.Rgba
        assert zignal.Image(2, 2, 7, dtype=zignal.Rgb).dtype is zignal.Rgb


class TestResize:
    def test_resize_scale_and_dims(self):
        img = zignal.Image(10, 20, (10, 20, 30), dtype=zignal.Rgb)
        half = img.resize(0.5)
        assert (half.rows, half.cols) == (5, 10)
        fixed = img.resize((7, 9))
        assert (fixed.rows, fixed.cols) == (7, 9)
        with pytest.raises(ValueError):
            img.resize(0.0)
        with pytest.raises(ValueError):
            img.resize(float("nan"))

    def test_resize_constant_image_stays_constant(self):
        img = zignal.Image(8, 8, (100, 150, 200), dtype=zignal.Rgb)
        for method in (
            zignal.Interpolation.NEAREST,
            zignal.Interpolation.BILINEAR,
            zignal.Interpolation.BICUBIC,
            zignal.Interpolation.CATMULL_ROM,
            zignal.Interpolation.MITCHELL,
            zignal.Interpolation.LANCZOS,
        ):
            out = img.resize((16, 16), method).to_numpy()
            assert np.all(out == np.array([100, 150, 200], dtype=np.uint8)), method

    def test_letterbox(self):
        img = zignal.Image(10, 20, (50, 60, 70), dtype=zignal.Rgb)
        boxed = img.letterbox(20)
        assert (boxed.rows, boxed.cols) == (20, 20)
        arr = boxed.to_numpy()
        # top/bottom padding bands are zero
        assert (arr[0] == 0).all()
        assert (arr[-1] == 0).all()
        # center contains content
        assert (arr[10] != 0).any()

    def test_flips(self):
        img = zignal.Image(2, 3, dtype=zignal.Rgb)
        a = img.to_numpy()
        a[...] = np.arange(18, dtype=np.uint8).reshape(2, 3, 3)
        lr = img.flip_left_right().to_numpy()
        assert np.array_equal(lr, a[:, ::-1])
        tb = img.flip_top_bottom().to_numpy()
        assert np.array_equal(tb, a[::-1])


def _resize_oracle_u8(src, dst_rows, dst_cols, method):
    """Direct per-pixel transcription of the reference resize spec
    (channel_ops.zig:144-494), used as the bit-exactness oracle."""
    import math

    f32 = np.float32
    src_rows, src_cols, ch = src.shape
    out = np.zeros((dst_rows, dst_cols, ch), dtype=np.uint8)

    def mirror(i, n):
        if 0 <= i < n:
            return i
        if n == 1:
            return 0
        period = 2 * (n - 1)
        m = i % period
        return period - m if m >= n else m

    def trunc_div(a, b):
        return int(abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)

    def cubic(t):
        at = abs(t)
        if at <= 256:
            t2 = (at * at) // 256
            t3 = (t2 * at) // 256
            return 256 - 2 * t2 + t3
        if at <= 512:
            t2 = (at * at) // 256
            t3 = (t2 * at) // 256
            return 4 * 256 - 8 * at + 5 * t2 - t3
        return 0

    x_ratio = f32(src_cols) / f32(dst_cols)
    y_ratio = f32(src_rows) / f32(dst_rows)
    for r in range(dst_rows):
        sy = (f32(r) + f32(0.5)) * y_ratio - f32(0.5)
        syi = math.floor(sy)
        fy = int((sy - np.floor(sy)) * f32(256))
        for c in range(dst_cols):
            sx = (f32(c) + f32(0.5)) * x_ratio - f32(0.5)
            sxi = math.floor(sx)
            fx = int((sx - np.floor(sx)) * f32(256))
            for k in range(ch):
                if method == zignal.Interpolation.BILINEAR:
                    y0, y1 = mirror(syi, src_rows), mirror(syi + 1, src_rows)
                    x0, x1 = mirror(sxi, src_cols), mirror(sxi + 1, src_cols)
                    tl, tr = int(src[y0, x0, k]), int(src[y0, x1, k])
                    bl, br = int(src[y1, x0, k]), int(src[y1, x1, k])
                    top = tl * (256 - fx) + tr * fx
                    bot = bl * (256 - fx) + br * fx
                    val = (top * (256 - fy) + bot * fy) // (256 * 256)
                    out[r, c, k] = min(255, max(0, val))
                elif method == zignal.Interpolation.BICUBIC:
                    total = 0
                    wsum = 0
                    for ky in range(4):
                        py = mirror(syi + ky - 1, src_rows)
                        wy = cubic(ky * 256 - 256 - fy)
                        for kx in range(4):
                            px = mirror(sxi + kx - 1, src_cols)
                            wx = cubic(kx * 256 - 256 - fx)
                            w = trunc_div(wx * wy, 256)
                            total += int(src[py, px, k]) * w
                            wsum += w
                    val = trunc_div(total, wsum) if wsum != 0 else 0
                    out[r, c, k] = min(255, max(0, val))
    return out


@pytest.mark.parametrize("method", [zignal.Interpolation.BILINEAR, zignal.Interpolation.BICUBIC])
@pytest.mark.parametrize("shape", [
    ((13, 17), (7, 9)), ((8, 8), (20, 24)),
    # integer-factor shapes (even -> constant frac 0.5 pair taps,
    # odd -> single tap): degenerate weight structure worth pinning
    ((16, 16), (8, 8)), ((12, 18), (4, 6)), ((16, 12), (4, 6)),
])
def test_resize_bit_exact_vs_oracle(method, shape):
    (sr, sc), (dr, dc) = shape
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, (sr, sc, 3), dtype=np.uint8)
    img = zignal.Image.from_numpy(src)
    got = img.resize((dr, dc), method).to_numpy()
    want = _resize_oracle_u8(src, dr, dc, method)
    assert np.array_equal(got, want), (
        f"max diff {np.max(np.abs(got.astype(int) - want.astype(int)))}"
    )


def test_letterbox_golden_geometry():
    """Golden letterbox geometry from the reference's own unit tests
    (reference: src/image/tests/resize.zig "letterbox maintains aspect
    ratio with padding")."""
    import numpy as np

    # 8x4 (cols x rows 8 wide, 4 tall) gradient -> 6x6: content is 6 wide,
    # 3 tall, at t=1; padding rows are zero
    src = np.zeros((4, 8, 1), np.uint8)
    for r in range(4):
        for c in range(8):
            src[r, c, 0] = r * 20 + c * 10
    img = zignal.Image.from_numpy(src)
    out = img.letterbox((6, 6))
    a = out.to_numpy()[..., 0]
    assert a.shape == (6, 6)
    assert (a[0] == 0).all() and (a[4:] == 0).all()   # t=1, b=4
    assert a[1:4].any()                               # content present

    # 9 tall x 3 wide -> 6x6: content 2 wide at l=2, side padding zero
    src2 = np.full((9, 3, 3), 200, np.uint8)
    out2 = zignal.Image.from_numpy(src2).letterbox((6, 6))
    b = out2.to_numpy()
    assert (b[:, :2] == 0).all() and (b[:, 4:] == 0).all()
    assert (b[:, 2:4] > 0).any()
