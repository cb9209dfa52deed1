"""Batched (jnp) color conversions vs the scalar f64 oracle."""

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.color import (
    convert_array, convert_float, convert_u8, convert_u8_array,
)

RNG = np.random.default_rng(42)


def _rand_rgb_float(n=257):
    return RNG.random((n, 3)).astype(np.float32)


FLOAT_TARGETS = ["hsv", "hsl", "xyz", "lab", "lch", "oklab", "oklch",
                 "xyb", "lms", "ycbcr", "gray"]


@pytest.mark.parametrize("dst", FLOAT_TARGETS)
def test_array_matches_scalar_from_rgb(dst):
    arr = _rand_rgb_float(129)
    out = np.asarray(convert_array(arr, "rgb", dst))
    for i in range(0, len(arr), 17):
        want = convert_float("rgb", dst, tuple(float(v) for v in arr[i]))
        got = out[i]
        for g, w in zip(got, want):
            # hue wrap-around: 0 == 360
            if abs(w) > 100:
                assert abs((g - w + 180) % 360 - 180) < 2e-2 or g == pytest.approx(w, rel=2e-4, abs=2e-3)
            else:
                assert g == pytest.approx(w, rel=2e-3, abs=2e-3)


@pytest.mark.parametrize("dst", ["rgb"])
@pytest.mark.parametrize("src", ["hsv", "hsl", "lab", "oklab", "xyz", "xyb"])
def test_array_roundtrip_to_rgb(src, dst):
    arr = _rand_rgb_float(65)
    fwd = convert_array(arr, "rgb", src)
    back = np.asarray(convert_array(fwd, src, "rgb"))
    assert np.max(np.abs(back - arr)) < 2e-3  # within ±1/255 roughly


def test_u8_gray_bit_exact():
    rgb = RNG.integers(0, 256, (1024, 3), dtype=np.uint8)
    got = np.asarray(convert_u8_array(rgb, "rgb", "gray"))[..., 0]
    for i in range(0, 1024, 97):
        want = convert_u8("rgb", "gray", tuple(int(v) for v in rgb[i]))[0]
        assert got[i] == want


def test_u8_ycbcr_bit_exact():
    rgb = RNG.integers(0, 256, (512, 3), dtype=np.uint8)
    fwd = np.asarray(convert_u8_array(rgb, "rgb", "ycbcr"))
    back = np.asarray(convert_u8_array(fwd, "ycbcr", "rgb"))
    for i in range(0, 512, 41):
        want_fwd = convert_u8("rgb", "ycbcr", tuple(int(v) for v in rgb[i]))
        assert tuple(fwd[i]) == want_fwd
        want_back = convert_u8("ycbcr", "rgb", want_fwd)
        assert tuple(back[i]) == want_back


def test_image_shaped_input():
    img = RNG.random((4, 32, 32, 3)).astype(np.float32)
    out = convert_array(img, "rgb", "oklab")
    assert out.shape == (4, 32, 32, 3)
    gray = convert_array(img, "rgb", "gray")
    assert gray.shape == (4, 32, 32, 1)


def test_blend_arrays_matches_scalar():
    from zignal_tpu.blending import Blending, blend_arrays, blend_colors

    base = RNG.integers(0, 256, (64, 4), dtype=np.uint8)
    over = RNG.integers(0, 256, (64, 4), dtype=np.uint8)
    for mode in (Blending.NORMAL, Blending.MULTIPLY, Blending.SCREEN,
                 Blending.OVERLAY, Blending.DARKEN, Blending.DIFFERENCE):
        out = np.asarray(
            blend_arrays(base / 255.0, over / 255.0, mode, xp=np)
        )
        for i in range(0, 64, 7):
            b = zignal.Rgba(*[int(v) for v in base[i]])
            o = zignal.Rgba(*[int(v) for v in over[i]])
            want = blend_colors(b, o, mode)
            got = np.floor(255.0 * np.clip(out[i], 0, 1) + 0.5)
            assert abs(int(got[0]) - want.r) <= 1
            assert abs(int(got[1]) - want.g) <= 1
            assert abs(int(got[2]) - want.b) <= 1


# ---------------------------------------------------------------------------
# convert_chain (color/_chain.py): fused junctions == sequential chain
# ---------------------------------------------------------------------------


def test_convert_chain_matches_sequential_u8_exact():
    """The benchmark chain through lab/oklch/xyb: fused junctions must be
    u8-identical to folding convert_array."""
    import numpy as np

    from zignal_tpu.color import convert_array, convert_chain

    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    f = x.astype(np.float32) / 255.0
    spaces = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")
    got = np.asarray(convert_chain(f, spaces))
    seq = f
    for a, b in zip(spaces, spaces[1:]):
        seq = convert_array(seq, a, b)
    seq = np.asarray(seq)
    g8 = np.clip(np.round(got * 255.0), 0, 255).astype(np.uint8)
    s8 = np.clip(np.round(seq * 255.0), 0, 255).astype(np.uint8)
    assert np.array_equal(g8, s8)
    assert float(np.max(np.abs(got - seq))) < 1e-3


def test_convert_chain_intermediate_targets_match():
    """Chains ending in a non-rgb space return that space's values."""
    import numpy as np

    from zignal_tpu.color import convert_array, convert_chain

    rng = np.random.default_rng(6)
    f = rng.random((16, 16, 3), dtype=np.float32)
    for spaces in (("rgb", "lab"), ("rgb", "oklch"), ("rgb", "xyb"),
                   ("rgb", "lab", "lch"), ("rgb", "oklab", "oklch", "oklab"),
                   ("rgb", "xyz", "lab", "rgb", "hsv")):
        got = np.asarray(convert_chain(f, spaces))
        seq = f
        for a, b in zip(spaces, spaces[1:]):
            seq = convert_array(seq, a, b)
        seq = np.asarray(seq)
        assert got.shape == seq.shape, spaces
        # hue channels live on 0-360; scale tolerance per channel range
        scale = np.maximum(1.0, np.abs(seq).max(axis=(0, 1), keepdims=True))
        assert float(np.max(np.abs(got - seq) / scale)) < 2e-3, spaces


def test_convert_chain_two_spaces_equals_convert_array():
    import numpy as np

    from zignal_tpu.color import convert_array, convert_chain

    rng = np.random.default_rng(7)
    f = rng.random((8, 8, 3), dtype=np.float32)
    got = np.asarray(convert_chain(f, ("rgb", "oklab")))
    want = np.asarray(convert_array(f, "rgb", "oklab"))
    assert np.allclose(got, want, atol=1e-6)
