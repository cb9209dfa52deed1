"""Fused filter-chain Pallas kernel vs the XLA chain (interpret mode —
the compiled Mosaic path is validated on hardware by
tests/tpu_exactness_audit.py check 18)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zignal_tpu.ops.binary import dilate, erode, threshold_apply
from zignal_tpu.ops.convolution import gaussian_blur
from zignal_tpu.ops.integral import sharpen
from zignal_tpu.ops.pallas_filter import (fused_blur_sharpen_morph,
                                          fused_filter_ok)

RNG = np.random.default_rng(21)


def _xla_chain(x, sigma, radius, thr):
    b = gaussian_blur(x[..., None], sigma)
    s = sharpen(b, radius)
    t = threshold_apply(s[..., 0], thr)
    return np.asarray(erode(dilate(t, 3), 3))


@pytest.mark.parametrize("shape,sigma,radius,thr", [
    ((256, 256), 2.0, 2, 128),
    ((128, 384), 1.0, 1, 90),
    ((192, 128), 3.5, 3, 200),
])
def test_fused_filter_bit_exact(shape, sigma, radius, thr):
    x = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert fused_filter_ok(shape)
    got = np.asarray(fused_blur_sharpen_morph(
        jnp.asarray(x), sigma, radius, float(thr), interpret=True))
    want = _xla_chain(x, sigma, radius, thr)
    assert np.array_equal(got, want)


def test_fused_filter_gate():
    assert fused_filter_ok((1024, 1024))
    assert fused_filter_ok((1000, 1024))       # arbitrary sizes pad
    assert fused_filter_ok((1080, 1920))
    assert not fused_filter_ok((8192, 8192))   # VMEM
    assert not fused_filter_ok((64, 128, 1))   # rank
    assert not fused_filter_ok((8, 128))       # too small


@pytest.mark.parametrize("shape", [(1000, 1000), (1080, 500), (100, 130)])
def test_fused_filter_padded_shapes_bit_exact(shape):
    x = RNG.integers(0, 256, shape, dtype=np.uint8)
    assert fused_filter_ok(shape)
    got = np.asarray(fused_blur_sharpen_morph(
        jnp.asarray(x), 2.0, 2, 128.0, interpret=True))
    want = _xla_chain(x, 2.0, 2, 128)
    assert np.array_equal(got, want)


def test_fused_filter_batched():
    x = RNG.integers(0, 256, (3, 128, 256), dtype=np.uint8)
    got = np.asarray(fused_blur_sharpen_morph(
        jnp.asarray(x), 1.5, 2, 128.0, interpret=True))
    for i in range(3):
        want = _xla_chain(x[i], 1.5, 2, 128)
        assert np.array_equal(got[i], want), i
