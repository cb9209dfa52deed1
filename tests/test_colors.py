"""Color class tests, ported from the reference behavior
(bindings/python/tests/test_colors.py + src/color.zig test blocks)."""

import pytest

import zignal_tpu as zignal


def test_basic_types_and_properties():
    rgb = zignal.Rgb(255, 128, 0)
    rgba = zignal.Rgba(1, 2, 3, 4)
    assert (rgb.r, rgb.g, rgb.b) == (255, 128, 0)
    assert (rgba.r, rgba.g, rgba.b, rgba.a) == (1, 2, 3, 4)


def test_conversions_exist_and_run():
    c = zignal.Rgb(10, 20, 30)
    assert c.to(zignal.Rgba) is not None
    assert c.to(zignal.Hsv) is not None


def test_validation_minimal():
    zignal.Rgb(0, 0, 0)
    zignal.Rgb(255, 255, 255)
    with pytest.raises(ValueError):
        zignal.Rgb(256, 0, 0)
    with pytest.raises(TypeError):
        zignal.Hsv(None, 0.0, 0.0)


def test_equality_duck_typing():
    rgb = zignal.Rgb(1, 2, 3)
    rgb_as_rgba = rgb.to(zignal.Rgba)
    assert (rgb_as_rgba.r, rgb_as_rgba.g, rgb_as_rgba.b, rgb_as_rgba.a) == (1, 2, 3, 255)


def test_blend_mode_and_blend():
    assert hasattr(zignal, "Blending")
    base = zignal.Rgb(100, 100, 100)
    res = base.blend(zignal.Rgba(200, 50, 150, 128), zignal.Blending.NORMAL)
    assert isinstance(res, zignal.Rgb)
    res2 = base.blend((200, 50, 150, 128), zignal.Blending.MULTIPLY)
    assert isinstance(res2, zignal.Rgb)


def test_color_invert_methods():
    rgb = zignal.Rgb(0, 128, 255)
    inv = rgb.invert()
    assert (inv.r, inv.g, inv.b) == (255, 127, 0)

    rgba = zignal.Rgba(10, 20, 30, 64)
    inv2 = rgba.invert()
    assert (inv2.r, inv2.g, inv2.b, inv2.a) == (245, 235, 225, 64)


# -- golden values from the reference's own test blocks ---------------------


def test_convert_grayscale_golden():
    """reference: src/color.zig 'convert grayscale' test."""
    assert zignal.Rgb(128, 128, 128).to(zignal.Gray).y == 128
    assert zignal.Rgb(255, 0, 0).to(zignal.Gray).y == 54
    assert zignal.Hsl(0, 100, 50).to(zignal.Gray).y == 54
    assert zignal.Hsv(0, 100, 50).to(zignal.Gray).y == 27
    assert zignal.Lab(50, 0, 0).to(zignal.Gray).y == 119


def test_hex_roundtrip():
    """reference: src/color.zig 'Rgb fromHex and toHex'."""
    c = zignal.Rgb.from_hex(0x4E008E)
    assert (c.r, c.g, c.b) == (78, 0, 142)
    for h in (0x123456, 0xABCDEF, 0x987654, 0xFEDCBA, 0x111111, 0xEEEEEE):
        assert zignal.Rgb.from_hex(h).hex() == h
    for h in (0x12345678, 0xABCDEF90, 0x98765432, 0xFEDCBA01):
        assert zignal.Rgba.from_hex(h).hex() == h
    assert zignal.Rgba.transparent.hex() == 0x00000000
    assert zignal.Rgb.black.hex() == 0x000000
    assert zignal.Rgb.white.hex() == 0xFFFFFF


@pytest.mark.parametrize(
    "rgb,hsl,hsv,lab",
    [
        ((255, 0, 0), (0, 100, 50), (0, 100, 100),
         (53.23288178584245, 80.10930952982204, 67.22006831026425)),
        ((0, 255, 0), (120, 100, 50), (120, 100, 100),
         (87.73703347354422, -86.1846364976253, 83.18116474777855)),
        ((0, 0, 255), (240, 100, 50), (240, 100, 100),
         (32.302586667249486, 79.19666178930935, -107.86368104495168)),
        ((255, 136, 0), (32, 100, 50), (32, 100, 100),
         (68.65577208167872, 38.85052375564019, 74.99022544139406)),
        ((128, 0, 128), (300, 100, 25.098039215686274),
         (300, 100, 50.19607843137255),
         (29.782100092098077, 58.93983731904206, -36.49792996282386)),
        ((128, 128, 128), (0, 0, 50.19607843137255), (0, 0, 50.19607843137255),
         (53.58501345216902, 0.003155620347972121, -0.006243566036268078)),
        ((0, 0, 0), (0, 0, 0), (0, 0, 0), (0, 0, 0)),
    ],
)
def test_primary_golden(rgb, hsl, hsv, lab):
    """reference: src/color.zig 'primary/secondary/neutral colors' tests."""
    c = zignal.Rgb(*rgb)
    out_hsl = c.to(zignal.Hsl)
    out_hsv = c.to(zignal.Hsv)
    out_lab = c.to(zignal.Lab)
    for got, want in zip((out_hsl.h, out_hsl.s, out_hsl.l), hsl):
        assert got == pytest.approx(want, abs=1e-9)
    for got, want in zip((out_hsv.h, out_hsv.s, out_hsv.v), hsv):
        assert got == pytest.approx(want, abs=1e-9)
    for got, want in zip((out_lab.l, out_lab.a, out_lab.b), lab):
        assert got == pytest.approx(want, abs=1e-9)
    # round-trips recover the exact u8 rgb
    for via in (out_hsl, out_hsv, out_lab):
        back = via.to(zignal.Rgb)
        assert (back.r, back.g, back.b) == rgb


@pytest.mark.parametrize(
    "cls,args",
    [
        (zignal.Hsl, (200.0, 50.0, 40.0)),
        (zignal.Hsv, (200.0, 50.0, 40.0)),
        (zignal.Lab, (50.0, 10.0, -20.0)),
        (zignal.Lch, (60.0, 20.0, 120.0)),
        (zignal.Lms, (0.3, 0.4, 0.2)),
        (zignal.Oklab, (0.5, 0.1, -0.1)),
        (zignal.Oklch, (0.5, 0.2, 45.0)),
        (zignal.Xyb, (0.1, 0.2, 0.3)),
        (zignal.Xyz, (10.0, 20.0, 5.0)),
        (zignal.Ycbcr, (128, 140, 120)),
    ],
)
def test_float_space_roundtrip(cls, args):
    """space -> rgb -> space recovers components (float paths)."""
    c = cls(*args)
    rgb = c.to(zignal.Rgb)
    assert isinstance(rgb, zignal.Rgb)
    # to-any-space from any-space runs
    for target in (zignal.Oklab, zignal.Xyz, zignal.Hsv):
        assert c.to(target) is not None


def test_ycbcr_u8_fixed_point_roundtrip():
    """u8 rgb -> ycbcr -> rgb within ±2 per reference fixed-point paths."""
    for rgb in [(255, 0, 0), (0, 255, 0), (12, 200, 34), (128, 128, 128)]:
        c = zignal.Rgb(*rgb)
        back = c.to(zignal.Ycbcr).to(zignal.Rgb)
        for got, want in zip((back.r, back.g, back.b), rgb):
            assert abs(got - want) <= 2


@pytest.mark.parametrize(
    "factory",
    [
        lambda: zignal.Rgb(12, 34, 56),
        lambda: zignal.Rgba(12, 34, 56, 78),
        lambda: zignal.Hsl(200.0, 50.0, 40.0),
        lambda: zignal.Hsv(200.0, 50.0, 40.0),
        lambda: zignal.Lab(50.0, 10.0, -20.0),
        lambda: zignal.Lch(60.0, 20.0, 120.0),
        lambda: zignal.Lms(10.0, 20.0, 30.0),
        lambda: zignal.Oklab(0.5, 0.1, -0.1),
        lambda: zignal.Oklch(0.5, 0.2, 45.0),
        lambda: zignal.Xyb(0.1, 0.2, 0.3),
        lambda: zignal.Xyz(10.0, 20.0, 5.0),
        lambda: zignal.Ycbcr(128, 140, 120),
    ],
)
def test_color_invert_smoke(factory):
    """(reference: bindings test_colors.py test_color_invert_smoke)"""
    color = factory()
    if isinstance(color, (zignal.Rgb, zignal.Rgba, zignal.Gray)):
        inverted = color.invert()
        assert isinstance(inverted, type(color))
        original_rgb = color if isinstance(color, zignal.Rgb) else color.to(zignal.Rgb)
        inverted_rgb = inverted if isinstance(inverted, zignal.Rgb) else inverted.to(zignal.Rgb)
        expected_rgb = original_rgb.invert()
        assert (inverted_rgb.r, inverted_rgb.g, inverted_rgb.b) == (
            expected_rgb.r, expected_rgb.g, expected_rgb.b,
        )
    else:
        original_rgb = color.to(zignal.Rgb)
        inverted_rgb = original_rgb.invert()
        roundtrip_rgb = inverted_rgb.to(zignal.Rgb)
        assert isinstance(roundtrip_rgb, zignal.Rgb)
