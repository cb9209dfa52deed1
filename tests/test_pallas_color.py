"""Fused Pallas color-chain kernel (ops/pallas_color.py): interpret-mode
bit-exactness vs the XLA convert_chain path, gate behavior, and the
pipeline.color_chain_u8 dispatch contract.

Reference color math: /root/reference/src/color.zig:987-1533."""

import numpy as np
import pytest

import jax.numpy as jnp

from zignal_tpu.color import convert_chain
from zignal_tpu.ops.pallas_color import (fused_chain_ok,
                                         fused_color_chain_u8)
from zignal_tpu.pipeline import color_chain_u8

RNG = np.random.default_rng(7)

BENCH_CHAIN = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")


def _want(x, spaces):
    f = convert_chain(x.astype(jnp.float32) / 255.0, spaces)
    return np.asarray(jnp.clip(jnp.round(f * 255.0), 0, 255)
                      .astype(jnp.uint8))


@pytest.mark.parametrize("spaces", [
    BENCH_CHAIN,
    ("rgb", "oklab", "rgb"),
    ("rgb", "lab", "lch", "lab", "rgb"),
    ("rgb", "xyz", "rgb"),
    ("rgb", "xyb", "rgb"),
    ("rgb", "oklch", "rgb"),
], ids=lambda s: "-".join(s))
def test_fused_chain_bit_exact_interpret(spaces):
    x = jnp.asarray(RNG.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8))
    assert fused_chain_ok(x.shape, spaces)
    got = np.asarray(fused_color_chain_u8(x, spaces, interpret=True))
    assert np.array_equal(got, _want(x, spaces))


def test_extreme_values_bit_exact():
    # all-0 / all-255 / boundary-heavy content exercises the gamma and
    # lab branch conditions on both sides
    x = np.zeros((1, 32, 128, 3), np.uint8)
    x[0, :8] = 255
    x[0, 8:16] = 1
    x[0, 16:24, :, 0] = 255
    x = jnp.asarray(x)
    got = np.asarray(fused_color_chain_u8(x, BENCH_CHAIN, interpret=True))
    assert np.array_equal(got, _want(x, BENCH_CHAIN))


def test_gate_contract():
    ok = (2, 64, 128, 3)
    assert fused_chain_ok(ok, BENCH_CHAIN)
    assert not fused_chain_ok((2, 64, 100, 3), BENCH_CHAIN)  # lanes
    assert not fused_chain_ok((2, 64, 128, 4), BENCH_CHAIN)  # channels
    assert not fused_chain_ok((64, 128, 3), BENCH_CHAIN)     # rank
    # cyl space not bracketed by rgb/parent needs atan2 — gated out
    assert not fused_chain_ok(ok, ("rgb", "xyz", "lch", "rgb"))
    # chain must start and end on rgb (u8 quantization semantics)
    assert not fused_chain_ok(ok, ("rgb", "lab"))
    # spaces outside the linear family fall back to XLA
    assert not fused_chain_ok(ok, ("rgb", "hsv", "rgb"))


def test_pipeline_dispatch_matches_xla():
    # on the CPU test backend color_chain_u8 must take the XLA path and
    # still produce the quantized chain
    x = jnp.asarray(RNG.integers(0, 256, (2, 32, 128, 3), dtype=np.uint8))
    got = np.asarray(color_chain_u8(x, BENCH_CHAIN))
    assert np.array_equal(got, _want(x, BENCH_CHAIN))
