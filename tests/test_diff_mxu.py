"""Image.diff semantics (reference: src/image/diff.zig) and the exact
MXU resampling lowering (ops/mxu_resample.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


# ---------------------------------------------------------------------------
# diff
# ---------------------------------------------------------------------------


def test_diff_scale_mode_does_not_mask_below_threshold():
    """threshold drives diff_count only; scale mode keeps small diffs
    (diff.zig:27 compute, int path)."""
    from zignal_tpu.image import Image

    a = Image.from_numpy(np.full((4, 4, 3), 100, np.uint8))
    b = Image.from_numpy(np.full((4, 4, 3), 103, np.uint8))
    vis, result = a.diff(b, threshold=5.0)
    assert result.diff_count == 0            # 3 <= 5
    assert (vis.to_numpy() == 3).all()       # but the diff is still visible


def test_diff_binary_sets_all_channels():
    from zignal_tpu.image import Image

    x = np.zeros((2, 2, 3), np.uint8)
    y = x.copy()
    y[0, 0, 1] = 200  # single channel differs
    vis, result = Image.from_numpy(x).diff(Image.from_numpy(y), binary=True)
    assert result.diff_count == 1
    assert (vis.to_numpy()[0, 0] == 255).all()
    assert (vis.to_numpy()[1, 1] == 0).all()


def test_diff_scale_and_stats():
    from zignal_tpu.image import Image

    x = np.zeros((2, 2, 3), np.uint8)
    y = np.full((2, 2, 3), 10, np.uint8)
    vis, result = Image.from_numpy(x).diff(Image.from_numpy(y), scale=30.0)
    assert (vis.to_numpy() == 255).all()  # 10*30 clamps to 255
    assert result.stats.max == 255
    assert result.diff_count == 4


def test_diff_force_opaque():
    from zignal_tpu.image import Image

    x = np.zeros((2, 2, 4), np.uint8)
    y = np.zeros((2, 2, 4), np.uint8)
    vis, _ = Image.from_numpy(x).diff(Image.from_numpy(y), force_opaque=True)
    assert (vis.to_numpy()[..., 3] == 255).all()


def test_diff_dimension_mismatch():
    from zignal_tpu.image import Image

    a = Image.from_numpy(np.zeros((2, 2, 3), np.uint8))
    b = Image.from_numpy(np.zeros((3, 3, 3), np.uint8))
    with pytest.raises(ValueError):
        a.diff(b)


# ---------------------------------------------------------------------------
# MXU exact resampling
# ---------------------------------------------------------------------------


def test_exact_axis_apply_matches_int_matmul():
    from zignal_tpu.ops.mxu_resample import build_tap_matrix, exact_axis_apply

    rng = np.random.default_rng(0)
    n, m = 64, 48
    idx = rng.integers(0, n, (m, 3))
    w = rng.integers(0, 257, (m, 3))
    M = build_tap_matrix(idx, w, n, m)
    x = rng.integers(0, 256, (5, n, 3), dtype=np.uint8)
    got, bound = exact_axis_apply(jnp.asarray(x), M, 255, axis=1)
    want = np.einsum("zh,bhc->bzc", M.astype(np.int64), x.astype(np.int64))
    assert int(want.max()) <= bound
    assert np.array_equal(np.asarray(got).astype(np.int64), want)


def test_exact_axis_apply_two_digit_input():
    from zignal_tpu.ops.mxu_resample import build_tap_matrix, exact_axis_apply

    rng = np.random.default_rng(1)
    n, m = 32, 20
    idx = rng.integers(0, n, (m, 2))
    w = rng.integers(0, 257, (m, 2))
    M = build_tap_matrix(idx, w, n, m)
    x = rng.integers(0, 65281, (n, 4)).astype(np.float32)  # two digits
    got, _ = exact_axis_apply(jnp.asarray(x), M, 65280, axis=0)
    want = np.einsum("zh,hc->zc", M.astype(np.int64), x.astype(np.int64))
    assert np.array_equal(np.asarray(got).astype(np.int64), want)


def test_zero_border_folds_to_dropped_taps():
    """ZERO border: OOB taps are dropped from the matrix, matching the
    masked-gather fallback."""
    from zignal_tpu.enums import BorderMode
    from zignal_tpu.ops.convolution import convolve_separable
    import zignal_tpu.ops.mxu_resample as MR
    import jax

    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)
    k = (0.25, 0.5, 0.25)
    got = np.asarray(convolve_separable(jnp.asarray(a), k, k, BorderMode.ZERO))
    orig = MR.mxu_ok
    MR.mxu_ok = lambda *args, **kw: False
    jax.clear_caches()
    try:
        want = np.asarray(convolve_separable(jnp.asarray(a), k, k,
                                             BorderMode.ZERO))
    finally:
        MR.mxu_ok = orig
        jax.clear_caches()
    assert np.array_equal(got, want)


def test_pallas_separable_matches_xla():
    """The Pallas fused-conv lowering is bit-identical to the XLA path
    (interpret mode on CPU; hardware-validated in tpu_exactness_audit)."""
    import jax
    import numpy as np
    from zignal_tpu.enums import BorderMode
    from zignal_tpu.ops.convolution import (
        _kernel_to_int, convolve_separable, gaussian_kernel,
    )
    from zignal_tpu.ops.interpolation import resolve_index_np
    from zignal_tpu.ops.mxu_resample import build_tap_matrix
    from zignal_tpu.ops.pallas_conv import pallas_separable_u8

    rng = np.random.default_rng(15)

    def band(n, kint, border):
        base = (np.arange(n, dtype=np.int64)[:, None]
                + np.arange(len(kint))[None, :] - len(kint) // 2)
        return build_tap_matrix(resolve_index_np(base, n, border), kint, n, n)

    x = rng.integers(0, 256, (2, 40, 56, 3), dtype=np.uint8)
    for sigma in (1.0, 2.0):
        k = gaussian_kernel(sigma)
        ki = _kernel_to_int(k)
        got = np.asarray(pallas_separable_u8(
            jnp.asarray(x), band(56, ki, BorderMode.MIRROR),
            band(40, ki, BorderMode.MIRROR), interpret=True))
        want = np.asarray(convolve_separable(jnp.asarray(x), k, k,
                                             BorderMode.MIRROR))
        assert np.array_equal(got, want), sigma
