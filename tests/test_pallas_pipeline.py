"""Fused Pallas north-star kernel vs the XLA lowering (interpret mode —
the compiled Mosaic path is validated on hardware by
tests/tpu_exactness_audit.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zignal_tpu.enums import Interpolation
from zignal_tpu.ops.convolution import gaussian_blur
from zignal_tpu.ops.interpolation import resize
from zignal_tpu.ops.pallas_pipeline import fused_ok, fused_resize_blur_oklab
from zignal_tpu.pipeline import resize_blur_oklab

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("shape,oh,ow", [
    ((2, 256, 256, 3), 128, 128),     # the bench geometry, scaled down
    ((1, 384, 512, 3), 192, 256),     # rectangular 2:1
    ((1, 500, 400, 3), 128, 128),     # non-integer ratios (mirror taps)
])
def test_fused_u8_stages_bit_exact(shape, oh, ow):
    x = jnp.asarray(RNG.integers(0, 256, shape, dtype=np.uint8))
    assert fused_ok(shape, oh, ow)
    got = np.asarray(fused_resize_blur_oklab(x, oh, ow, 2.0, oklab=False,
                                             interpret=True))
    want = np.asarray(gaussian_blur(resize(x, oh, ow,
                                           Interpolation.BILINEAR), 2.0))
    assert np.array_equal(got, want)


def test_fused_oklab_matches_xla():
    x = jnp.asarray(RNG.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8))
    got = np.asarray(fused_resize_blur_oklab(x, 128, 128, 2.0,
                                             interpret=True))
    want = np.asarray(resize_blur_oklab(x, 128, 128, 2.0))
    # float stage: exp/log-composed pow/cbrt agree with XLA's to ~1e-6
    # (abs) interpreted; the chip-compiled path measured <= 1e-4
    assert np.max(np.abs(got - want)) < 5e-6


@pytest.mark.parametrize("sigma", [0.5, 1.0, 3.5])
def test_fused_sigma_variants_bit_exact(sigma):
    x = jnp.asarray(RNG.integers(0, 256, (1, 192, 256, 3), dtype=np.uint8))
    got = np.asarray(fused_resize_blur_oklab(x, 128, 128, sigma, oklab=False,
                                             interpret=True))
    want = np.asarray(gaussian_blur(resize(x, 128, 128,
                                           Interpolation.BILINEAR), sigma))
    assert np.array_equal(got, want)


def test_fused_ok_gate():
    # widened r3 gate: rgba/gray, arbitrary output sizes, upscales OK
    assert fused_ok((2, 256, 256, 4), 128, 128)
    assert fused_ok((2, 256, 256, 3), 100, 128)
    assert fused_ok((2, 256, 256, 3), 128, 96)
    assert fused_ok((2, 2048, 256, 3), 128, 128)
    assert fused_ok((1, 1080, 1920, 3), 360, 640)
    assert fused_ok((1, 512, 512, 3), 700, 650)       # upscale
    # still gated: tiny inputs, 2-channel, VMEM blowouts
    assert not fused_ok((1, 64, 64, 3), 32, 32)       # h < 128
    assert not fused_ok((1, 256, 30, 1), 128, 16)     # wl < 256
    assert not fused_ok((2, 256, 256, 2), 128, 128)   # channels
    assert not fused_ok((1, 4096, 4096, 3), 4096, 4096)  # VMEM


@pytest.mark.parametrize("shape,oh,ow", [
    ((1, 1080, 960, 3), 360, 640),    # arbitrary output, non-%64/%128
    ((1, 300, 512, 3), 150, 300),     # odd output cols
    ((2, 256, 256, 4), 100, 100),     # rgba
    ((2, 256, 256, 1), 100, 190),     # gray
    ((1, 256, 256, 3), 320, 288),     # upscale rows+cols
])
def test_fused_widened_shapes_bit_exact(shape, oh, ow):
    x = jnp.asarray(RNG.integers(0, 256, shape, dtype=np.uint8))
    assert fused_ok(shape, oh, ow, oklab=False)
    got = np.asarray(fused_resize_blur_oklab(x, oh, ow, 1.5, oklab=False,
                                             interpret=True))
    want = np.asarray(gaussian_blur(resize(x, oh, ow,
                                           Interpolation.BILINEAR), 1.5))
    assert np.array_equal(got, want)


def test_fused_widened_oklab_odd_output():
    x = jnp.asarray(RNG.integers(0, 256, (1, 256, 320, 3), dtype=np.uint8))
    got = np.asarray(fused_resize_blur_oklab(x, 100, 150, 2.0,
                                             interpret=True))
    want = np.asarray(resize_blur_oklab(x, 100, 150, 2.0))
    assert np.max(np.abs(got - want)) < 5e-6


def test_fused_sigma_zero_is_pure_resize():
    x = jnp.asarray(RNG.integers(0, 256, (2, 300, 400, 3), dtype=np.uint8))
    got = np.asarray(fused_resize_blur_oklab(x, 128, 128, 0.0, oklab=False,
                                             interpret=True))
    want = np.asarray(resize(x, 128, 128, Interpolation.BILINEAR))
    assert np.array_equal(got, want)
    # and the oklab epilogue still works without the blur stages
    got_l = np.asarray(fused_resize_blur_oklab(x, 128, 128, 0.0,
                                               interpret=True))
    want_l = np.asarray(resize_blur_oklab(x, 128, 128, 0.0))
    assert np.max(np.abs(got_l - want_l)) < 5e-6
