"""Remaining reference API-contract tests, ported verbatim
(reference: bindings/python/tests/test_image.py — the cases not already
covered by tests/test_image.py)."""

import numpy as np
import pytest

import zignal_tpu as zignal


def test_pixel_proxy_methods():
    img = zignal.Image(10, 10, (255, 0, 0), dtype=zignal.Rgb)
    pixel = img[0, 0]
    assert isinstance(pixel.item(), zignal.Rgb)

    gray = pixel.to(zignal.Gray)
    assert gray.y >= 0 and gray.y <= 255

    hsl = pixel.to(zignal.Hsl)
    assert isinstance(hsl, zignal.Hsl)

    lab = pixel.to(zignal.Lab)
    assert isinstance(lab, zignal.Lab)

    blended = pixel.blend((0, 255, 0, 128))
    assert isinstance(blended, zignal.Rgb)
    assert img[0, 0].g > 0  # pixel modified in place

    repr_str = repr(pixel)
    assert "Rgb" in repr_str

    sgr_str = format(pixel, "sgr")
    assert "\x1b[" in sgr_str


def test_rgba_pixel_proxy_methods():
    img = zignal.Image(10, 10, (255, 0, 0, 200), dtype=zignal.Rgba)
    pixel = img[0, 0]
    assert isinstance(pixel.item(), zignal.Rgba)

    assert pixel.r == 255
    assert pixel.a == 200

    gray = pixel.to(zignal.Gray)
    assert isinstance(gray, zignal.Gray)

    hsl = pixel.to(zignal.Hsl)
    assert isinstance(hsl, zignal.Hsl)

    rgb = pixel.to(zignal.Rgb)
    assert isinstance(rgb, zignal.Rgb)
    assert rgb.r == 255


def test_slice_assignment_handles_strided_views():
    base_rgb = zignal.Image(4, 4, dtype=zignal.Rgb)
    base_gray = zignal.Image(4, 4, dtype=zignal.Gray)

    rgb_np = base_rgb.to_numpy()
    gray_np = base_gray.to_numpy()
    gray_np.fill(0)

    left_values = np.arange(8, dtype=np.uint8).reshape(4, 2)
    rgb_np[:, :2] = np.repeat(left_values[..., None], 3, axis=2)

    src_view = base_rgb.view((0, 0, 2, 4))
    dst_view = base_gray.view((0, 0, 2, 4))
    dst_view[:] = src_view

    expected_left = np.empty_like(left_values)
    for r in range(left_values.shape[0]):
        for c in range(left_values.shape[1]):
            value = int(left_values[r, c])
            expected_left[r, c] = zignal.Rgb(value, value, value).to(zignal.Gray).y

    gray_after = base_gray.to_numpy()[..., 0]
    assert np.array_equal(gray_after[:, :2], expected_left)
    assert np.array_equal(gray_after[:, 2:], np.zeros((4, 2), dtype=np.uint8))


def test_image_copy_from_conversion():
    src_gray = zignal.Image(10, 10, 128, dtype=zignal.Gray)
    src_rgb = zignal.Image(10, 10, (10, 20, 30), dtype=zignal.Rgb)
    src_rgba = zignal.Image(10, 10, (40, 50, 60, 128), dtype=zignal.Rgba)

    dst_rgb = zignal.Image(10, 10, dtype=zignal.Rgb)
    dst_rgb[:] = src_gray
    rgb_item = dst_rgb[0, 0].item()
    assert (rgb_item.r, rgb_item.g, rgb_item.b) == (128, 128, 128)

    dst_rgb[:] = src_rgba
    rgb_item = dst_rgb[0, 0].item()
    assert (rgb_item.r, rgb_item.g, rgb_item.b) == (40, 50, 60)

    dst_rgba = zignal.Image(10, 10, dtype=zignal.Rgba)
    dst_rgba[:] = src_gray
    assert dst_rgba[0, 0].item() == zignal.Rgba(128, 128, 128, 255)

    dst_rgba[:] = src_rgb
    assert dst_rgba[0, 0].item() == zignal.Rgba(10, 20, 30, 255)

    dst_gray = zignal.Image(10, 10, dtype=zignal.Gray)
    dst_gray[:] = src_rgb
    expected_rgb_gray = zignal.Rgb(10, 20, 30).to(zignal.Gray)
    assert dst_gray[0, 0] == expected_rgb_gray.y

    dst_gray[:] = src_rgba
    expected_rgba_gray = zignal.Rgb(40, 50, 60).to(zignal.Gray)
    assert dst_gray[0, 0] == expected_rgba_gray.y

    dst_view_img = zignal.Image(20, 20, dtype=zignal.Rgb)
    dst_view = dst_view_img.view(zignal.Rectangle(5, 5, 15, 15))
    assert not dst_view.is_contiguous()

    dst_view[:] = src_rgba
    view_item = dst_view[0, 0].item()
    assert (view_item.r, view_item.g, view_item.b) == (40, 50, 60)
    img_item = dst_view_img[5, 5].item()
    assert (img_item.r, img_item.g, img_item.b) == (40, 50, 60)
    outside_item = dst_view_img[0, 0].item()
    assert (outside_item.r, outside_item.g, outside_item.b) == (0, 0, 0)


def test_filtering_methods():
    img = zignal.Image(5, 5, (0, 0, 0, 255), dtype=zignal.Rgba)
    out = img.box_blur(1)
    assert (out.rows, out.cols) == (5, 5)
    with pytest.raises(ValueError):
        img.gaussian_blur(0.0)

    median = img.median_blur(1)
    assert isinstance(median, zignal.Image)

    percentile = img.percentile_blur(1, 1.0)
    assert isinstance(percentile, zignal.Image)

    wrapped = img.percentile_blur(1, 0.0, border=zignal.BorderMode.WRAP)
    assert isinstance(wrapped, zignal.Image)

    with pytest.raises(ValueError):
        img.percentile_blur(1, 1.5)

    min_filter = img.min_blur(1)
    max_filter = img.max_blur(1)
    midpoint = img.midpoint_blur(1)
    trimmed = img.alpha_trimmed_mean_blur(1, 0.1)

    for result in (min_filter, max_filter, midpoint, trimmed):
        assert isinstance(result, zignal.Image)

    with pytest.raises(ValueError):
        img.alpha_trimmed_mean_blur(1, 0.6)


def test_warp():
    img = zignal.Image(10, 10)

    sim = zignal.SimilarityTransform([(2, 2), (8, 2)], [(3, 3), (7, 3)])
    warped = img.warp(sim)
    assert warped is not None

    aff = zignal.AffineTransform([(2, 2), (8, 2), (5, 8)], [(3, 3), (7, 3), (5, 7)])
    warped = img.warp(aff)
    assert warped is not None

    proj = zignal.ProjectiveTransform(
        [(1, 1), (9, 1), (9, 9), (1, 9)], [(2, 2), (8, 1), (9, 8), (1, 9)]
    )
    warped = img.warp(proj)
    assert warped is not None

    warped = img.warp(sim, shape=(20, 20))
    assert warped is not None

    warped = img.warp(sim, method=zignal.Interpolation.NEAREST)
    assert warped is not None

    gray = img.convert(zignal.Gray)
    warped = gray.warp(sim)
    assert warped is not None


def test_motion_blur():
    img = zignal.Image(10, 10, (255, 0, 0), dtype=zignal.Rgb)

    linear_config = zignal.MotionBlur.linear(angle=0.0, distance=3)
    blurred = img.motion_blur(linear_config)
    assert blurred.rows == 10 and blurred.cols == 10

    zoom_config = zignal.MotionBlur.radial_zoom()
    blurred = img.motion_blur(zoom_config)
    assert blurred.rows == 10 and blurred.cols == 10

    spin_config = zignal.MotionBlur.radial_spin(center=(0.3, 0.7), strength=0.8)
    blurred = img.motion_blur(spin_config)
    assert blurred.rows == 10 and blurred.cols == 10


def test_ssim_requires_minimum_size():
    small = zignal.Image(8, 8, dtype=zignal.Gray)
    with pytest.raises(ValueError):
        small.ssim(small.copy())


def test_canny_rejects_non_finite():
    img = zignal.Image(20, 20, dtype=zignal.Gray)

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            img.canny(sigma=bad)
        with pytest.raises(ValueError):
            img.canny(low=bad)
        with pytest.raises(ValueError):
            img.canny(high=bad)
