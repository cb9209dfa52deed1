"""Batched color-space conversion on device (jnp, channel-last arrays).

Vectorized counterpart of ``_scalar.py``: identical hub-and-spoke routing
(reference: src/color.zig:192-209), float32 math on TPU VPU. Integer-backed
edges (rgb<->gray, rgb<->ycbcr) additionally have bit-exact u8 fixed-point
paths in int32 (reference: src/color.zig:987-1007,1031-1043,1057-1078).

Layout: arrays are channel-last ``[..., C]`` so whole images ``[H, W, C]``
and batches ``[B, H, W, C]`` convert with one fused XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ._scalar import (
    D65_X, D65_Y, D65_Z,
    LAB_DELTA, LAB_EPSILON, LAB_KAPPA_DIV_116,
    LUMA_B, LUMA_G, LUMA_R,
    SRGB_GAMMA_EXPONENT, SRGB_GAMMA_OFFSET, SRGB_GAMMA_SCALE,
    SRGB_GAMMA_THRESHOLD, SRGB_LINEAR_SLOPE, SRGB_LINEAR_THRESHOLD,
    XYB_BIAS, XYB_CBRT_BIAS_DECODE, XYB_CBRT_BIAS_ENCODE,
    conversion_path,
)

__all__ = ["convert_array", "convert_u8_array", "rgb_to_gray_u8", "NUM_CHANNELS"]

NUM_CHANNELS = {
    "gray": 1, "rgb": 3, "rgba": 4, "hsl": 3, "hsv": 3, "lab": 3, "lch": 3,
    "lms": 3, "oklab": 3, "oklch": 3, "xyb": 3, "xyz": 3, "ycbcr": 3,
}


def _split(a):
    return tuple(a[..., i] for i in range(a.shape[-1]))


def _join(*chans):
    return jnp.stack(chans, axis=-1)


def _cbrt(x):
    return jnp.cbrt(x)


def _mix3(a, m):
    """Per-pixel 3x3 channel mix in full f32 on the VPU.

    A tiny channel mix must NOT be lowered to the MXU (whose default f32
    matmul precision on TPU is bf16); explicit multiply-adds keep it
    elementwise and fuse with neighboring ops.
    """
    c0, c1, c2 = a[..., 0], a[..., 1], a[..., 2]
    return jnp.stack(
        [
            c0 * m[0][0] + c1 * m[1][0] + c2 * m[2][0],
            c0 * m[0][1] + c1 * m[1][1] + c2 * m[2][1],
            c0 * m[0][2] + c1 * m[1][2] + c2 * m[2][2],
        ],
        axis=-1,
    )


# -- float edges -------------------------------------------------------------


def gray_to_rgb(a):
    return jnp.repeat(a, 3, axis=-1)


def rgb_to_gray(a):
    r, g, b = _split(a)
    y = jnp.clip(LUMA_R * r + LUMA_G * g + LUMA_B * b, 0.0, 1.0)
    return y[..., None]


def rgb_to_rgba(a):
    return jnp.concatenate([a, jnp.ones_like(a[..., :1])], axis=-1)


def rgba_to_rgb(a):
    return a[..., :3]


def rgb_to_hsv(a):
    r, g, b = _split(a)
    mx = jnp.maximum(r, jnp.maximum(g, b))
    mn = jnp.minimum(r, jnp.minimum(g, b))
    delta = mx - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        mx == r,
        (g - b) / safe * 60.0,
        jnp.where(mx == g, 120.0 + (b - r) / safe * 60.0, 240.0 + (r - g) / safe * 60.0),
    )
    h = jnp.where(delta == 0, 0.0, h) % 360.0
    s = jnp.where(mx == 0, 0.0, delta / jnp.where(mx == 0, 1.0, mx)) * 100.0
    return _join(h, s, mx * 100.0)


def hsv_to_rgb(a):
    h, s, v = _split(a)
    hue = jnp.clip(h / 360.0, 0.0, 1.0)
    sat = jnp.clip(s / 100.0, 0.0, 1.0)
    val = jnp.clip(v / 100.0, 0.0, 1.0)
    sector = hue * 6.0
    index = jnp.floor(sector)
    f = sector - index
    idx = (index.astype(jnp.int32) % 6)
    p = val * (1.0 - sat)
    q = val * (1.0 - sat * f)
    t = val * (1.0 - sat * (1.0 - f))
    # table rows: (val,t,p) (q,val,p) (p,val,t) (p,q,val) (t,p,val) (val,p,q)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [val, q, p, p, t], val)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [t, val, val, q, p], p)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [p, p, t, val, val], q)
    gray = sat == 0.0
    return _join(
        jnp.where(gray, val, r), jnp.where(gray, val, g), jnp.where(gray, val, b)
    )


def rgb_to_hsl(a):
    r, g, b = _split(a)
    mx = jnp.maximum(r, jnp.maximum(g, b))
    mn = jnp.minimum(r, jnp.minimum(g, b))
    delta = mx - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    hue = jnp.where(
        mx == r,
        (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    hue = jnp.where(delta == 0, 0.0, hue)
    l = (mx + mn) / 2.0
    s = jnp.where(
        delta == 0,
        0.0,
        jnp.where(l < 0.5, delta / jnp.maximum(2.0 * l, 1e-30),
                  delta / jnp.maximum(2.0 - 2.0 * l, 1e-30)),
    )
    return _join((hue * 60.0) % 360.0, jnp.clip(s, 0.0, 1.0) * 100.0,
                 jnp.clip(l, 0.0, 1.0) * 100.0)


def hsl_to_rgb(a):
    h, s, l = _split(a)
    h = h % 360.0
    s = jnp.clip(s / 100.0, 0.0, 1.0)
    l = jnp.clip(l / 100.0, 0.0, 1.0)
    hs = h / 60.0
    sector = jnp.floor(hs)
    f = hs - sector
    idx = sector.astype(jnp.int32) % 6
    sel = [idx == 0, idx == 1, idx == 2, idx == 3, idx == 4]
    fr = jnp.select(sel, [jnp.ones_like(f), 1.0 - f, jnp.zeros_like(f),
                          jnp.zeros_like(f), f], jnp.ones_like(f))
    fg = jnp.select(sel, [f, jnp.ones_like(f), jnp.ones_like(f),
                          1.0 - f, jnp.zeros_like(f)], jnp.zeros_like(f))
    fb = jnp.select(sel, [jnp.zeros_like(f), jnp.zeros_like(f), f,
                          jnp.ones_like(f), jnp.ones_like(f)], 1.0 - f)
    r = 1.0 + (2.0 * fr - 1.0) * s
    g = 1.0 + (2.0 * fg - 1.0) * s
    b = 1.0 + (2.0 * fb - 1.0) * s
    lo = l < 0.5
    return _join(
        jnp.where(lo, r * l, r + (2.0 - r) * l - 1.0),
        jnp.where(lo, g * l, g + (2.0 - g) * l - 1.0),
        jnp.where(lo, b * l, b + (2.0 - b) * l - 1.0),
    )


def hsv_to_hsl(a):
    h, s, v = _split(a)
    s_v = s / 100.0
    v = v / 100.0
    l = v * (1.0 - s_v / 2.0)
    denom = jnp.minimum(l, 1.0 - l)
    s_l = jnp.where((l == 0) | (l == 1), 0.0, (v - l) / jnp.maximum(denom, 1e-30))
    return _join(h, s_l * 100.0, l * 100.0)


def hsl_to_hsv(a):
    h, s, l = _split(a)
    s_l = s / 100.0
    l = l / 100.0
    v = l + s_l * jnp.minimum(l, 1.0 - l)
    s_v = jnp.where(v == 0, 0.0, 2.0 * (1.0 - l / jnp.maximum(v, 1e-30)))
    return _join(h, s_v * 100.0, v * 100.0)


def rgb_to_ycbcr(a):
    r, g, b = _split(a)
    y = jnp.clip(0.299 * r + 0.587 * g + 0.114 * b, 0.0, 1.0)
    return _join(y, jnp.clip((b - y) / 1.772, -0.5, 0.5),
                 jnp.clip((r - y) / 1.402, -0.5, 0.5))


def ycbcr_to_rgb(a):
    y, cb, cr = _split(a)
    return _join(
        jnp.clip(y + 1.402 * cr, 0.0, 1.0),
        jnp.clip(y - 0.344136 * cb - 0.714136 * cr, 0.0, 1.0),
        jnp.clip(y + 1.772 * cb, 0.0, 1.0),
    )


def linear_to_gamma(c):
    c_safe = jnp.maximum(c, 0.0)
    return jnp.where(
        c > SRGB_LINEAR_THRESHOLD,
        SRGB_GAMMA_SCALE * c_safe ** (1.0 / SRGB_GAMMA_EXPONENT) - SRGB_GAMMA_OFFSET,
        c * SRGB_LINEAR_SLOPE,
    )


def gamma_to_linear(c):
    return jnp.where(
        c > SRGB_GAMMA_THRESHOLD,
        ((c + SRGB_GAMMA_OFFSET) / SRGB_GAMMA_SCALE) ** SRGB_GAMMA_EXPONENT,
        c / SRGB_LINEAR_SLOPE,
    )


def _T(m):
    return tuple(zip(*m))


# matrices written row-major (out, in); _T -> (in, out) for _mix3
_RGB2XYZ = _T([[0.4124, 0.3576, 0.1805],
               [0.2126, 0.7152, 0.0722],
               [0.0193, 0.1192, 0.9505]])

_XYZ2RGB = _T([[3.2406, -1.5372, -0.4986],
     [-0.9689, 1.8758, 0.0415],
     [0.0557, -0.2040, 1.0570]])


def rgb_to_xyz(a):
    lin = gamma_to_linear(a)
    return _mix3(lin, _RGB2XYZ) * 100.0


def xyz_to_rgb(a):
    lin = _mix3(a, _XYZ2RGB) / 100.0
    return jnp.clip(linear_to_gamma(lin), 0.0, 1.0)


def _lab_f(t):
    return jnp.where(t > LAB_EPSILON, _cbrt(t), LAB_KAPPA_DIV_116 * t + LAB_DELTA)


def xyz_to_lab(a):
    fx = _lab_f(a[..., 0] / D65_X)
    fy = _lab_f(a[..., 1] / D65_Y)
    fz = _lab_f(a[..., 2] / D65_Z)
    return _join(jnp.maximum(0.0, 116.0 * fy - 16.0), 500.0 * (fx - fy), 200.0 * (fy - fz))


def lab_to_xyz(a):
    l, aa, bb = _split(a)
    fy = (l + 16.0) / 116.0
    fx = aa / 500.0 + fy
    fz = fy - bb / 200.0

    def unf(f):
        f3 = f**3
        return jnp.where(f3 > LAB_EPSILON, f3, (f - LAB_DELTA) / LAB_KAPPA_DIV_116)

    return _join(unf(fx) * D65_X, unf(fy) * D65_Y, unf(fz) * D65_Z)


def _cart_to_cyl(l, a, b):
    c = jnp.sqrt(a * a + b * b)
    h = jnp.degrees(jnp.arctan2(b, a)) % 360.0
    return _join(l, c, h)


def _cyl_to_cart(l, c, h):
    hr = jnp.radians(h)
    return _join(l, c * jnp.cos(hr), c * jnp.sin(hr))


def lab_to_lch(a):
    return _cart_to_cyl(*_split(a))


def lch_to_lab(a):
    return _cyl_to_cart(*_split(a))


_XYZ2LMS = _T([[0.8951, 0.2664, -0.1614],
     [-0.7502, 1.7135, 0.0367],
     [0.0389, -0.0685, 1.0296]])

_LMS2XYZ = _T([[0.9869929, -0.1470543, 0.1599627],
     [0.4323053, 0.5183603, 0.0492912],
     [-0.0085287, 0.0400428, 0.9684867]])


def xyz_to_lms(a):
    return _mix3(a, _XYZ2LMS) / 100.0


def lms_to_xyz(a):
    return _mix3(a, _LMS2XYZ) * 100.0


_XYZ2OKLMS = _T([[0.8189330101, 0.3618667424, -0.1288597137],
     [0.0329845436, 0.9293118715, 0.0361456387],
     [0.0482003018, 0.2643662691, 0.6338517070]])

_OKLMS2LAB = _T([[0.2104542553, 0.7936177850, -0.0040720468],
     [1.9779984951, -2.4285922050, 0.4505937099],
     [0.0259040371, 0.7827717662, -0.8086757660]])

_OKLAB2LMS = _T([[1.0, 0.3963377774, 0.2158037573],
     [1.0, -0.1055613458, -0.0638541728],
     [1.0, -0.0894841775, -1.2914855480]])

_OKLMS2XYZ = _T([[1.2270138511, -0.5577999807, 0.2812561490],
     [-0.0405801784, 1.1122568696, -0.0716766787],
     [-0.0763812845, -0.4214819784, 1.5861632204]])


def xyz_to_oklab(a):
    lms = _mix3(a / 100.0, _XYZ2OKLMS)
    return _mix3(_cbrt(lms), _OKLMS2LAB)


def oklab_to_xyz(a):
    lms_d = _mix3(a, _OKLAB2LMS)
    return _mix3(lms_d**3, _OKLMS2XYZ) * 100.0


def oklab_to_oklch(a):
    return _cart_to_cyl(*_split(a))


# Fused rgb<->oklab edges: the xyz hop's *100 and /100 cancel, so the two
# 3x3 mixes collapse into one matrix composed in f64 at import time —
# fewer VPU ops and slightly *more* accurate than chaining f32 mixes.
def _np_compose(b_t, a_t):
    import numpy as _np

    return _T((_np.asarray(b_t, dtype=_np.float64).T
               @ _np.asarray(a_t, dtype=_np.float64).T).tolist())


_RGB2OKLMS = _np_compose(_XYZ2OKLMS, _RGB2XYZ)
_OKLMS2RGB = _np_compose(_XYZ2RGB, _OKLMS2XYZ)


def rgb_to_oklab_fused(a):
    lms = _mix3(gamma_to_linear(a), _RGB2OKLMS)
    return _mix3(_cbrt(lms), _OKLMS2LAB)


def oklab_to_rgb_fused(a):
    lms = _mix3(a, _OKLAB2LMS) ** 3
    return jnp.clip(linear_to_gamma(_mix3(lms, _OKLMS2RGB)), 0.0, 1.0)


def oklch_to_oklab(a):
    return _cyl_to_cart(*_split(a))


_LINRGB2XYBMIX = _T([[0.30, 0.622, 0.078],
     [0.23, 0.692, 0.078],
     [0.24342268924547819, 0.20476744424496821, 0.5518098665095536]])

_XYBMIX2LINRGB = _T([[11.031566901960783, -9.866943921568629, -0.16462299647058826],
     [-3.254147380392157, 4.418770392156863, -0.16462299647058826],
     [-3.6588512862745097, 2.7129230470588235, 1.9459282392156863]])


def _linrgb_to_xyb(lin):
    lms = jnp.maximum(_mix3(lin, _LINRGB2XYBMIX) + XYB_BIAS, 0.0)
    d = _cbrt(lms) - XYB_CBRT_BIAS_ENCODE
    l, m, s = _split(d)
    return _join(0.5 * (l - m), 0.5 * (l + m), s)


def _xyb_to_linrgb(a):
    x, y, b = _split(a)
    d = _join(y + x, y - x, b) + XYB_CBRT_BIAS_DECODE
    lms = d**3 - XYB_BIAS
    return _mix3(lms, _XYBMIX2LINRGB)


def rgb_to_xyb(a):
    return _linrgb_to_xyb(gamma_to_linear(a))


def xyb_to_rgb(a):
    return jnp.clip(linear_to_gamma(_xyb_to_linrgb(a)), 0.0, 1.0)


def xyz_to_xyb(a):
    return _linrgb_to_xyb(_mix3(a, _XYZ2RGB) / 100.0)


def xyb_to_xyz(a):
    return _mix3(_xyb_to_linrgb(a), _RGB2XYZ) * 100.0


_EDGES = {
    ("gray", "rgb"): gray_to_rgb,
    ("rgb", "gray"): rgb_to_gray,
    ("rgb", "hsl"): rgb_to_hsl,
    ("rgb", "hsv"): rgb_to_hsv,
    ("rgb", "rgba"): rgb_to_rgba,
    ("rgb", "xyb"): rgb_to_xyb,
    ("rgb", "xyz"): rgb_to_xyz,
    ("rgb", "ycbcr"): rgb_to_ycbcr,
    ("rgba", "rgb"): rgba_to_rgb,
    ("hsv", "hsl"): hsv_to_hsl,
    ("hsv", "rgb"): hsv_to_rgb,
    ("hsl", "hsv"): hsl_to_hsv,
    ("hsl", "rgb"): hsl_to_rgb,
    ("xyz", "lab"): xyz_to_lab,
    ("xyz", "lms"): xyz_to_lms,
    ("xyz", "oklab"): xyz_to_oklab,
    ("xyz", "rgb"): xyz_to_rgb,
    ("xyz", "xyb"): xyz_to_xyb,
    ("lab", "lch"): lab_to_lch,
    ("lab", "xyz"): lab_to_xyz,
    ("lch", "lab"): lch_to_lab,
    ("lms", "xyz"): lms_to_xyz,
    ("oklab", "oklch"): oklab_to_oklch,
    ("oklab", "xyz"): oklab_to_xyz,
    ("oklch", "oklab"): oklch_to_oklab,
    ("xyb", "rgb"): xyb_to_rgb,
    ("xyb", "xyz"): xyb_to_xyz,
    ("ycbcr", "rgb"): ycbcr_to_rgb,
}


_FUSED_EDGES = {
    ("rgb", "oklab"): rgb_to_oklab_fused,
    ("oklab", "rgb"): oklab_to_rgb_fused,
    ("rgb", "oklch"): lambda a: oklab_to_oklch(rgb_to_oklab_fused(a)),
    ("oklch", "rgb"): lambda a: oklab_to_rgb_fused(oklch_to_oklab(a)),
}


@partial(jax.jit, static_argnames=("src", "dst"))
def convert_array(arr, src: str, dst: str):
    """Convert a channel-last float array between color spaces.

    ``arr``: [..., C_src] float array in the source space's float layout
    (rgb in [0,1], hsv h/s/v in 0-360/0-100/0-100, etc.). Returns
    [..., C_dst] float32.
    """
    out = arr.astype(jnp.float32)
    fused = _FUSED_EDGES.get((src, dst))
    if fused is not None:
        return fused(out)
    for edge in conversion_path(src, dst):
        out = _EDGES[edge](out)
    return out


# -- u8 fixed-point edges (bit-exact, int32 on VPU) -------------------------

def rgb_to_gray_u8(a):
    """u8 [.,3] -> u8 [.,1], BT.709 16.16 fixed point (color.zig:1031).

    Runs in f32: products (<= 38470*255) and the accumulated sum
    (<= 65536*255 + 2^15 < 2^24) are exact integers, and floor-division
    by 2^16 is exact — int32 multiplies are emulated on the TPU VPU."""
    wr = float(round(LUMA_R * 65536))
    wg = float(round(LUMA_G * 65536))
    wb = float(round(LUMA_B * 65536))
    r, g, b = (a[..., i].astype(jnp.float32) for i in range(3))
    y = jnp.floor((r * wr + g * wg + b * wb + 32768.0) * (1.0 / 65536.0))
    return jnp.clip(y, 0, 255).astype(jnp.uint8)[..., None]


def rgb_to_ycbcr_u8(a):
    # f32-exact: per-channel |sums| <= 65536*255 + 2^15 < 2^24; int32
    # arithmetic shift == floor, replicated by jnp.floor of the /2^16
    r, g, b = (a[..., i].astype(jnp.float32) for i in range(3))

    def fix(acc, off):
        return jnp.floor((acc + 32768.0) * (1.0 / 65536.0)) + off

    y = fix(r * 19595.0 + g * 38470.0 + b * 7471.0, 0.0)
    cb = fix(r * -11059.0 + g * -21710.0 + b * 32768.0, 128.0)
    cr = fix(r * 32768.0 + g * -27439.0 + b * -5329.0, 128.0)
    out = jnp.stack([y, cb, cr], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def ycbcr_to_rgb_u8(a):
    # 65536*y + chroma can reach ~28M > 2^24, so the chroma part runs in
    # f32 (|sums| <= 15M, exact) and combines with the y<<16 luma term
    # using int32 adds/shifts only (no emulated int32 multiplies)
    y = a[..., 0].astype(jnp.int32) << 16
    cb = a[..., 1].astype(jnp.float32) - 128.0
    cr = a[..., 2].astype(jnp.float32) - 128.0
    tr = (cr * 91881.0 + 32768.0).astype(jnp.int32)
    tg = (cb * -22554.0 + cr * -46802.0 + 32768.0).astype(jnp.int32)
    tb = (cb * 116130.0 + 32768.0).astype(jnp.int32)
    r = (y + tr) >> 16
    g = (y + tg) >> 16
    b = (y + tb) >> 16
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0, 255).astype(jnp.uint8)


_U8_EDGES = {
    ("gray", "rgb"): lambda a: jnp.repeat(a, 3, axis=-1),
    ("rgb", "gray"): rgb_to_gray_u8,
    ("rgb", "ycbcr"): rgb_to_ycbcr_u8,
    ("ycbcr", "rgb"): ycbcr_to_rgb_u8,
    ("rgb", "rgba"): lambda a: jnp.concatenate(
        [a, jnp.full_like(a[..., :1], 255)], axis=-1
    ),
    ("rgba", "rgb"): lambda a: a[..., :3],
}


@partial(jax.jit, static_argnames=("src", "dst"))
def convert_u8_array(arr, src: str, dst: str):
    """Bit-exact u8 conversion among gray/rgb/rgba/ycbcr [..., C] arrays."""
    out = arr
    for edge in conversion_path(src, dst):
        out = _U8_EDGES[edge](out)
    return out
