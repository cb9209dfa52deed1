"""Fused Pallas color-chain kernel (VERDICT r3 item 4; BASELINE config 2).

MEASURED OUTCOME (r4, tools/ab_color.py on chip): the kernel is
u8-IDENTICAL to the XLA convert_chain path (Newton-refined roots) but
~2x SLOWER (1.29 vs 0.63 ms per 4 MPix) — the chain is transcendental-
compute-bound and XLA's native pow/cbrt lowerings beat Mosaic's
exp/log + Newton; fusion saves no HBM traffic that XLA wasn't already
saving. The north-star kernel's cheap in-VMEM oklab stage did not
generalize: there the color stage rode an already-resident pipeline.
pipeline.color_chain_u8 therefore defaults to XLA; this kernel is
opt-in (ZT_COLOR_PALLAS=1) and doubles as the audit's Mosaic
transcendental-exactness probe (check 19).

This module lifts the whole ``color.convert_chain`` state machine into
ONE Pallas program per row-block:

- PLANAR layout: the wrapper slices [B, H, W, 3] u8 into three [B, H, W]
  planes (one cheap XLA pass), so every 3x3 channel mix inside the
  kernel is plain register FMAs across three [bh, W] blocks — no lane
  rolls, no transposes, no stacked-axis traffic (r3: the chain is not
  layout-bound, so planar costs nothing and buys kernel simplicity).
- the state machine mirrors color/_chain.py step for step (linear-RGB
  carried across rgb junctions, cartesian shadow across cylindrical
  hops) with the SAME jnp ops in the SAME order, so interpret-mode
  outputs are bit-identical to convert_chain and chip outputs differ
  only by Mosaic-vs-XLA transcendental lowering ulps (audited).
- the final u8 quantization (clip(round(f * 255))) happens in-kernel,
  so the f32 intermediate never touches HBM.

Reference color math: /root/reference/src/color.zig:987-1533.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..color import _array as A

__all__ = ["fused_chain_ok", "fused_color_chain_u8",
           "mosaic_transcendentals_ok"]


class _Trans:
    """Transcendental profile. ``exact`` uses jnp.cbrt / non-integer
    ``**`` — bit-identical to color/_array.py, but Mosaic REJECTS both
    primitives (probed on chip, r4). ``explog`` composes them from
    exp/log exactly like the north-star kernel's oklab stage
    (pallas_pipeline.py:249): Mosaic-compilable, differs from XLA by
    lowering ulps only (audited u8 bound). All call sites feed
    non-negative arguments (_RGB2OKLMS / _LINRGB2XYBMIX are all-positive
    matrices; gamma branches clamp), so the max(x, 0) guard changes
    nothing on the exact-domain side while keeping log() out of NaN;
    exp(log(0) * p) = 0 matches 0 ** p and cbrt(0)."""

    __slots__ = ("explog",)

    def __init__(self, explog: bool):
        self.explog = explog

    def cbrt(self, x):
        if not self.explog:
            return jnp.cbrt(x)
        xs = jnp.maximum(x, 0.0)
        y = jnp.exp(jnp.log(xs) * jnp.float32(1 / 3))
        # two Newton steps: quadratic convergence scrubs the exp/log
        # seed error down to f32 rounding, so kernel accuracy does not
        # ride on Mosaic's exp/log lowering (raw explog measured
        # max u8 diff 4 through the 7-hop bench chain on chip, r4).
        # x = 0: seed is exp(-inf) = 0 and 0 / max(0, tiny) = 0 keeps
        # every iterate at the exact 0.
        for _ in range(2):
            y = (2.0 * y + xs / jnp.maximum(y * y, jnp.float32(1e-30))) \
                * jnp.float32(1 / 3)
        return y

    def powf(self, x, p):
        if not self.explog:
            return x ** p
        xs = jnp.maximum(x, 0.0)
        if p == 1.0 / A.SRGB_GAMMA_EXPONENT:
            # x^(1/2.4) = x^(5/12) = cbrt(x) * cbrt(x)^(1/4): a refined
            # cbrt and two (correctly-rounded) sqrts — no raw exp/log
            c = self.cbrt(xs)
            return c * jnp.sqrt(jnp.sqrt(c))
        if p == A.SRGB_GAMMA_EXPONENT:
            # x^2.4 = (x^(1/5))^12 with the fifth root Newton-refined
            y = jnp.exp(jnp.log(xs) * jnp.float32(0.2))
            for _ in range(2):
                y4 = (y * y) * (y * y)
                y = (4.0 * y
                     + xs / jnp.maximum(y4, jnp.float32(1e-30))) \
                    * jnp.float32(0.2)
            t = y * y * y
            t2 = t * t
            return t2 * t2
        return jnp.exp(jnp.log(xs) * jnp.float32(p))


_EXACT = _Trans(False)
_EXPLOG = _Trans(True)

# one-time Mosaic capability probe result (None = not probed yet)
_MOSAIC_OK: list = [None]


def mosaic_transcendentals_ok() -> bool:
    """True when Mosaic compiles the chip kernel's op set (jnp.where
    branches, exp/log-composed pow/cbrt, integer_pow) on the current TPU
    backend — probed ONCE with a tiny kernel so a Mosaic regression
    degrades color_chain_u8 to the XLA path instead of erroring the
    caller. Only call on a TPU backend (CPU pallas needs interpret)."""
    if _MOSAIC_OK[0] is None:
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            x = x_ref[...]
            o_ref[...] = jnp.where(
                x > 0.5,
                _EXPLOG.cbrt(x) + _EXPLOG.powf(x, A.SRGB_GAMMA_EXPONENT),
                _EXPLOG.powf(x, 1.0 / A.SRGB_GAMMA_EXPONENT) + x ** 3)

        try:
            fn = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
            jax.jit(fn).lower(
                jax.ShapeDtypeStruct((8, 128), jnp.float32)).compile()
            _MOSAIC_OK[0] = True
        except Exception:
            _MOSAIC_OK[0] = False
    return _MOSAIC_OK[0]

_LINEAR_SPACES = ("lab", "lch", "oklab", "oklch", "xyb", "xyz")
_CYL_OF = {"lch": "lab", "oklch": "oklab"}

_VMEM_BUDGET = 80 * 1024 * 1024


# -- planar math (identical op order to color/_array.py on tuples) ----------


def _pmix3(t, m):
    c0, c1, c2 = t
    return (c0 * m[0][0] + c1 * m[1][0] + c2 * m[2][0],
            c0 * m[0][1] + c1 * m[1][1] + c2 * m[2][1],
            c0 * m[0][2] + c1 * m[1][2] + c2 * m[2][2])


def _pmap(f, t):
    return tuple(f(c) for c in t)


def _pclip01(t):
    return _pmap(lambda c: jnp.clip(c, 0.0, 1.0), t)


def _p_gamma_to_linear(t, tr):
    def f(c):
        return jnp.where(
            c > A.SRGB_GAMMA_THRESHOLD,
            tr.powf((c + A.SRGB_GAMMA_OFFSET) / A.SRGB_GAMMA_SCALE,
                    A.SRGB_GAMMA_EXPONENT),
            c / A.SRGB_LINEAR_SLOPE)

    return _pmap(f, t)


def _p_linear_to_gamma(t, tr):
    def f(c):
        c_safe = jnp.maximum(c, 0.0)
        return jnp.where(
            c > A.SRGB_LINEAR_THRESHOLD,
            A.SRGB_GAMMA_SCALE * tr.powf(c_safe,
                                         1.0 / A.SRGB_GAMMA_EXPONENT)
            - A.SRGB_GAMMA_OFFSET,
            c * A.SRGB_LINEAR_SLOPE)

    return _pmap(f, t)


def _p_lab_f(c, tr):
    return jnp.where(c > A.LAB_EPSILON, tr.cbrt(c),
                     A.LAB_KAPPA_DIV_116 * c + A.LAB_DELTA)


def _p_xyz_to_lab(t, tr):
    fx = _p_lab_f(t[0] / A.D65_X, tr)
    fy = _p_lab_f(t[1] / A.D65_Y, tr)
    fz = _p_lab_f(t[2] / A.D65_Z, tr)
    return (jnp.maximum(0.0, 116.0 * fy - 16.0),
            500.0 * (fx - fy), 200.0 * (fy - fz))


def _p_lab_to_xyz(t):
    l, aa, bb = t
    fy = (l + 16.0) / 116.0
    fx = aa / 500.0 + fy
    fz = fy - bb / 200.0

    def unf(f):
        f3 = f ** 3
        return jnp.where(f3 > A.LAB_EPSILON, f3,
                         (f - A.LAB_DELTA) / A.LAB_KAPPA_DIV_116)

    return (unf(fx) * A.D65_X, unf(fy) * A.D65_Y, unf(fz) * A.D65_Z)


def _p_linrgb_to_xyb(t, tr):
    lms = _pmap(lambda c: jnp.maximum(c + A.XYB_BIAS, 0.0),
                _pmix3(t, A._LINRGB2XYBMIX))
    d = _pmap(lambda c: tr.cbrt(c) - A.XYB_CBRT_BIAS_ENCODE, lms)
    l, m, s = d
    return (0.5 * (l - m), 0.5 * (l + m), s)


def _p_xyb_to_linrgb(t):
    x, y, b = t
    d = (y + x + A.XYB_CBRT_BIAS_DECODE, y - x + A.XYB_CBRT_BIAS_DECODE,
         b + A.XYB_CBRT_BIAS_DECODE)
    lms = _pmap(lambda c: c ** 3 - A.XYB_BIAS, d)
    return _pmix3(lms, A._XYBMIX2LINRGB)


# -- the chain state machine (mirror of color/_chain.py on planar tuples) ---


class _PState:
    __slots__ = ("space", "arr", "linear", "cart")

    def __init__(self, space, arr=None, linear=None, cart=None):
        self.space = space
        self.arr = arr
        self.linear = linear
        self.cart = cart


def _p_from_linear(lin, dst, tr):
    """linear rgb -> dst; returns (arr_or_None, cart). Cylindrical dsts
    return arr=None: the cyl values are never materialized (the only
    supported consumer is the inverse hop, which reads the shadow —
    fused_chain_ok gates out chains that would need them)."""
    if dst == "xyz":
        return _pmap(lambda c: c * 100.0, _pmix3(lin, A._RGB2XYZ)), None
    if dst == "lab":
        return _p_xyz_to_lab(
            _pmap(lambda c: c * 100.0, _pmix3(lin, A._RGB2XYZ)), tr), None
    if dst == "lch":
        lab = _p_xyz_to_lab(
            _pmap(lambda c: c * 100.0, _pmix3(lin, A._RGB2XYZ)), tr)
        return None, lab
    if dst in ("oklab", "oklch"):
        lms = _pmix3(lin, A._RGB2OKLMS)
        oklab = _pmix3(_pmap(tr.cbrt, lms), A._OKLMS2LAB)
        if dst == "oklab":
            return oklab, None
        return None, oklab
    if dst == "xyb":
        return _p_linrgb_to_xyb(lin, tr), None
    raise AssertionError(dst)


def _p_to_linear(st):
    space, arr = st.space, st.arr
    if space in _CYL_OF:
        arr = st.cart
        space = _CYL_OF[space]
    if space == "xyz":
        lin = _pmix3(_pmap(lambda c: c / 100.0, arr), A._XYZ2RGB)
    elif space == "lab":
        lin = _pmix3(_pmap(lambda c: c / 100.0, _p_lab_to_xyz(arr)),
                     A._XYZ2RGB)
    elif space == "oklab":
        lms = _pmap(lambda c: c ** 3, _pmix3(arr, A._OKLAB2LMS))
        lin = _pmix3(lms, A._OKLMS2RGB)
    elif space == "xyb":
        lin = _p_xyb_to_linrgb(arr)
    else:
        raise AssertionError(space)
    return _pclip01(lin)


def _p_step(st, dst, tr):
    src = st.space
    if src == dst:
        return st
    if _CYL_OF.get(dst) == src:          # lab->lch / oklab->oklch
        return _PState(dst, None, cart=st.arr)
    if _CYL_OF.get(src) == dst:          # back out of the shadow
        return _PState(dst, st.cart)
    if src == "rgb" and dst in _LINEAR_SPACES:
        if st.linear is None:
            st.linear = _p_gamma_to_linear(st.arr, tr)
        arr, cart = _p_from_linear(st.linear, dst, tr)
        return _PState(dst, arr, cart=cart)
    if dst == "rgb" and src in _LINEAR_SPACES:
        return _PState("rgb", linear=_p_to_linear(st))
    raise AssertionError((src, dst))


def _chain_supported(spaces) -> bool:
    """True when every hop hits a fused planar step AND no cylindrical
    values must be materialized (no atan2/sin/cos inside the kernel:
    each cyl space must be entered from its cartesian parent or rgb and
    immediately inverted by the next hop, and the chain must not end on
    one)."""
    spaces = tuple(spaces)
    if len(spaces) < 2 or spaces[0] != "rgb" or spaces[-1] != "rgb":
        return False
    for s in spaces:
        if s != "rgb" and s not in _LINEAR_SPACES:
            return False
    for i, s in enumerate(spaces):
        if s in _CYL_OF:
            prev = spaces[i - 1]
            nxt = spaces[i + 1] if i + 1 < len(spaces) else None
            if prev not in ("rgb", _CYL_OF[s]):
                return False
            if nxt not in ("rgb", _CYL_OF[s]) or nxt is None:
                return False
    return True


def _chain_planar_u8(t_u8, spaces, tr=_EXACT):
    """u8 planar triple -> u8 planar triple through the chain, with the
    bench quantization clip(round(f * 255)) fused at the end. Pure jnp:
    runs identically inside the Pallas kernel and in tests."""
    # u8 -> i32 -> f32: Mosaic has no direct u8 -> f32 cast (and the
    # hop is exact for [0, 255])
    t = _pmap(lambda c: c.astype(jnp.int32).astype(jnp.float32) / 255.0,
              t_u8)
    st = _PState("rgb", arr=t)
    for dst in tuple(spaces)[1:]:
        st = _p_step(st, dst, tr)
    out = st.arr
    if out is None:                      # ended on rgb via linear
        out = _pclip01(_p_linear_to_gamma(st.linear, tr))
    return _pmap(
        lambda c: jnp.clip(jnp.round(c * 255.0), 0, 255)
        .astype(jnp.int32).astype(jnp.uint8), out)


# -- the kernel ---------------------------------------------------------------


def _pick_bh(h: int, w: int) -> int:
    # ~16 live f32 plane blocks (3 in, 3 out, ~10 working) under budget
    for bh in (512, 256, 128, 64, 32, 16, 8):
        if h % bh == 0 and 16 * bh * w * 4 <= _VMEM_BUDGET:
            return bh
    return 0


def fused_chain_ok(shape, spaces) -> bool:
    """Gate: [B, H, W, 3] u8, W a lane multiple, a row-block divisor
    exists, and the chain plan stays inside the fused planar family."""
    if len(shape) != 4 or shape[3] != 3:
        return False
    b, h, w, _ = shape
    return (w % 128 == 0 and _pick_bh(h, w) > 0
            and _chain_supported(spaces))


@partial(jax.jit, static_argnames=("spaces", "interpret"))
def fused_color_chain_u8(batch, spaces, interpret: bool = False):
    """[B, H, W, 3] u8 -> [B, H, W, 3] u8: the full convert_chain plus
    u8 quantization as ONE Pallas program per row-block (the f32 chain
    values never touch HBM). Interpret mode is bit-identical to
    clip(round(convert_chain(x / 255) * 255)); on chip the
    transcendental lowerings may differ by ulps (AUDIT check)."""
    from jax.experimental import pallas as pl

    b, h, w, _ = batch.shape
    bh = _pick_bh(h, w)
    spaces = tuple(spaces)

    tr = _EXACT if interpret else _EXPLOG

    def kernel(r_ref, g_ref, b_ref, or_ref, og_ref, ob_ref):
        t = (r_ref[0], g_ref[0], b_ref[0])
        o = _chain_planar_u8(t, spaces, tr)
        or_ref[0] = o[0]
        og_ref[0] = o[1]
        ob_ref[0] = o[2]

    spec = pl.BlockSpec((1, bh, w), lambda bi, i: (bi, i, 0))
    planes = tuple(batch[..., c] for c in range(3))
    outs = pl.pallas_call(
        kernel,
        grid=(b, h // bh),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), jnp.uint8)] * 3,
        interpret=interpret,
    )(*planes)
    return jnp.stack(outs, axis=-1)
