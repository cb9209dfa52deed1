"""Native-core fast paths must be exactly interchangeable with their
python fallbacks (CLAUDE.md invariant: every native entry point has a
pure-Python fallback). Each test runs both paths and asserts equality
byte-for-byte / value-for-value."""

import numpy as np
import pytest

from zignal_tpu import native


def _synth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        128 + 90 * np.sin(xx / 29.0) * np.cos(yy / 17.0),
        128 + 80 * np.cos(xx / 23.0 + yy / 13.0),
        128 + 70 * np.sin((xx + yy) / 41.0),
    ], axis=-1)
    noise = rng.normal(0.0, 12.0, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.fixture
def fallback():
    """Context that disables the native lib for the duration."""
    def disable():
        saved = (native._lib, native._tried)
        native._lib, native._tried = None, True
        return saved

    def restore(saved):
        native._lib, native._tried = saved

    return disable, restore


def _both(fn, fallback):
    disable, restore = fallback
    a = fn()
    saved = disable()
    try:
        b = fn()
    finally:
        restore(saved)
    return a, b


def test_median_cut_matches_python(fallback):
    from zignal_tpu.ops.quantize import median_cut

    rng = np.random.default_rng(3)
    cases = [_synth(96, 64, seed=s) for s in range(3)]
    cases.append(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
    cases.append(np.zeros((8, 8, 3), np.uint8))
    for img in cases:
        for n in (2, 17, 256):
            a, b = _both(lambda: median_cut(img, n), fallback)
            np.testing.assert_array_equal(a, b)


def test_color_lookup_table_matches_python(fallback):
    from zignal_tpu.ops.quantize import ColorLookupTable, median_cut

    pal = median_cut(_synth(64, 64, seed=5), 200)
    a, b = _both(lambda: ColorLookupTable(pal).table, fallback)
    np.testing.assert_array_equal(a, b)


def test_sixel_emit_matches_python(fallback):
    from zignal_tpu.terminal.sixel import SixelOptions, sixel_from_array

    for img in (_synth(64, 48, seed=7), np.zeros((7, 9, 3), np.uint8)):
        a, b = _both(lambda: sixel_from_array(img, SixelOptions()),
                     fallback)
        assert a == b


def test_rle_deflate_stream_decodes_to_input():
    import zlib

    from zignal_tpu.codecs.png import _native_rle_deflate

    rng = np.random.default_rng(11)
    for data in (
        bytes(rng.integers(0, 256, 100_000, dtype=np.uint8)),
        b"\x00" * 50_000,
        bytes(rng.integers(0, 4, 30_000, dtype=np.uint8)),
        b"",
        b"a",
    ):
        out = _native_rle_deflate(data)
        if out is None:
            pytest.skip("native lib unavailable")
        assert zlib.decompress(out) == data


def test_rle_deflate_deep_tree_clamp():
    """Extreme symbol skew drives optimal Huffman depths past the 14-bit
    cap, exercising the clamp + Kraft-repair path; the stream must stay
    inflatable and lossless."""
    import zlib

    from zignal_tpu.codecs.png import _native_rle_deflate

    rng = np.random.default_rng(12)
    # geometric-ish skew: symbol s appears ~2^(16-s) times
    parts = [bytes([s]) * max(1, 1 << max(0, 16 - s)) for s in range(64)]
    data = b"".join(parts)
    # shuffle in 257-byte chunks to break up the giant runs (keeps the
    # skewed histogram but forces the literal emit path too)
    chunks = [data[i:i + 257] for i in range(0, len(data), 257)]
    order = rng.permutation(len(chunks))
    data = b"".join(chunks[i] for i in order)
    out = _native_rle_deflate(data)
    if out is None:
        pytest.skip("native lib unavailable")
    assert zlib.decompress(out) == data


def test_png_filter_and_encode_roundtrip_without_native(fallback):
    from zignal_tpu.codecs import png

    img = _synth(50, 70, seed=9)
    a, _ = _both(lambda: None, fallback)  # noqa: F841 (fixture sanity)
    disable, restore = fallback
    native_bytes = png.encode(img)
    saved = disable()
    try:
        py_bytes = png.encode(img)
        back_py, _ = png.decode(py_bytes)
    finally:
        restore(saved)
    back_nat, _ = png.decode(native_bytes)
    np.testing.assert_array_equal(back_nat, img)
    np.testing.assert_array_equal(back_py, img)


def test_error_diffusion_dither_matches_python(fallback):
    from zignal_tpu.ops.dither import DitherMode, apply_dither
    from zignal_tpu.ops.quantize import median_cut

    for mode in (DitherMode.FLOYD_STEINBERG, DitherMode.ATKINSON):
        src = _synth(48, 37, seed=13)
        pal = median_cut(src, 16)
        a_img = src.copy()
        idx_a = apply_dither(a_img, pal, mode=mode)
        disable, restore = fallback
        saved = disable()
        try:
            b_img = src.copy()
            idx_b = apply_dither(b_img, pal, mode=mode)
        finally:
            restore(saved)
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(idx_a, idx_b)


def test_host_resize_bit_identical_to_device(fallback):
    """Native + numpy host resize == device resize, byte for byte, so the
    placement layer is invisible in output (ops/host_resize.py)."""
    import jax

    from zignal_tpu.enums import Interpolation
    from zignal_tpu.ops.host_resize import host_resize_u8
    from zignal_tpu.ops.interpolation import resize

    rng = np.random.default_rng(42)
    disable, restore = fallback
    for (h, w, c, oh, ow) in [
        (64, 80, 3, 32, 40),      # clean downscale
        (57, 43, 3, 120, 91),     # fractional upscale
        (120, 160, 1, 37, 53),    # gray, odd downscale
        (33, 33, 4, 66, 22),      # rgba, mixed
        (1, 7, 3, 5, 5),          # degenerate row
    ]:
        src = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        for method in (Interpolation.BILINEAR, Interpolation.NEAREST,
                       Interpolation.BICUBIC, Interpolation.CATMULL_ROM,
                       Interpolation.MITCHELL, Interpolation.LANCZOS):
            want = np.asarray(resize(jax.device_put(src), oh, ow, method))
            got_native = host_resize_u8(src, oh, ow, method)
            saved = disable()
            try:
                got_numpy = host_resize_u8(src, oh, ow, method)
            finally:
                restore(saved)
            if method == Interpolation.LANCZOS:
                # float-weight path: the fmaf host twin matches the CPU
                # XLA backend at these shapes, but ON TPU the fma
                # contraction is SHAPE-DEPENDENT (audit r5: exact at
                # 222x257->111x128, +-1 on isolated pixels at
                # 623x881->400x560) — so the cross-backend contract is
                # +-1, and Image.resize auto placement excludes Lanczos
                for got in (got_native, got_numpy):
                    d = np.abs(got.astype(int) - want.astype(int))
                    assert d.max() <= 1, (h, w, c, oh, ow, method)
                    assert (d > 0).mean() < 1e-3, (h, w, c, oh, ow, method)
            else:
                assert np.array_equal(got_native, want), \
                    (h, w, c, oh, ow, method)
                assert np.array_equal(got_numpy, want), \
                    (h, w, c, oh, ow, method)


def test_image_resize_placement_host_matches_device():
    """Image.resize under forced host placement == forced device placement."""
    import os

    import zignal_tpu as zignal

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, (90, 110, 3), dtype=np.uint8)
    old = os.environ.get("ZT_PLACEMENT")
    try:
        os.environ["ZT_PLACEMENT"] = "host"
        a = zignal.Image.from_numpy(src.copy()).resize((45, 55))
        os.environ["ZT_PLACEMENT"] = "device"
        b = zignal.Image.from_numpy(src.copy()).resize((45, 55))
    finally:
        if old is None:
            os.environ.pop("ZT_PLACEMENT", None)
        else:
            os.environ["ZT_PLACEMENT"] = old
    assert np.array_equal(a.to_numpy(), b.to_numpy())


def test_png_filter_msd_matches_numpy_oracle():
    """The SIMD filter-selection path (fused cost sweep + winner-only
    generation) must pick the same filter and produce the same bytes as
    a direct per-row oracle of the MSD heuristic."""
    from zignal_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    import ctypes

    def oracle(flat, bpp):
        h, stride = flat.shape
        out = np.empty((h, stride + 1), np.uint8)
        prev = np.zeros(stride, np.int32)
        for r in range(h):
            row = flat[r].astype(np.int32)
            a = np.zeros(stride, np.int32)
            a[bpp:] = row[:-bpp]
            c = np.zeros(stride, np.int32)
            c[bpp:] = prev[:-bpp]
            cands = [row.copy(), row - a, row - prev,
                     row - ((a + prev) >> 1)]
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            cands.append(row - pred)
            cands = [cand.astype(np.uint8) for cand in cands]
            costs = [int(np.abs(cand.astype(np.int8).astype(np.int32)).sum())
                     for cand in cands]
            best = int(np.argmin(costs))  # argmin keeps the first tie
            out[r, 0] = best
            out[r, 1:] = cands[best]
            prev = row
        return out.reshape(-1)

    rng = np.random.default_rng(21)
    for bpp in (1, 3, 4):
        for h, w in ((1, 1), (2, 5), (3, 40), (7, 33), (16, 64), (5, 200)):
            for kind in range(3):
                if kind == 0:
                    flat = rng.integers(0, 256, (h, w * bpp), np.uint8)
                elif kind == 1:
                    yy, xx = np.mgrid[0:h, 0:w * bpp]
                    flat = ((yy * 3 + xx // 5) % 256).astype(np.uint8)
                else:
                    flat = np.cumsum(
                        rng.integers(0, 3, (h, w * bpp), np.uint8),
                        axis=1).astype(np.uint8)
                flat = np.ascontiguousarray(flat)
                got = np.empty(h * (w * bpp + 1), np.uint8)
                rc = lib.zt_png_filter_msd(
                    flat.ctypes.data_as(ctypes.c_char_p), h, w * bpp, bpp,
                    got.ctypes.data_as(ctypes.c_char_p))
                assert rc == 0
                want = oracle(flat, bpp)
                assert np.array_equal(got, want), (bpp, h, w, kind)


def test_rle_deflate_window_boundary_runs():
    """The vectorized tokenizer scans 62-byte overlapped windows; runs
    touching every alignment near the window edges must still round-trip
    (and short 1-2 byte stretches must stay literals: the stream stays
    small)."""
    import zlib

    from zignal_tpu.codecs.png import _native_rle_deflate

    rng = np.random.default_rng(22)
    for off in range(50, 80):
        for run_len in (1, 2, 3, 4, 5, 258, 259, 300, 516, 600):
            b = rng.integers(0, 256, 700, dtype=np.uint8)
            b[off:off + run_len] = 7
            data = b.tobytes()
            out = _native_rle_deflate(data)
            if out is None:
                pytest.skip("native lib unavailable")
            assert zlib.decompress(out) == data
    # alternating 1-3 byte stretches (smooth-gradient pathology)
    data = np.repeat(rng.integers(0, 256, 4000, dtype=np.uint8),
                     rng.integers(1, 4, 4000)).tobytes()
    out = _native_rle_deflate(data)
    assert out is not None and zlib.decompress(out) == data


def test_jpeg_stream_decode_matches_buffered(monkeypatch):
    """Band-streaming sequential decode (jpeg_core.cpp
    decode_sequential_streaming) must be byte-identical to the buffered
    coefficient path (ZT_JPEG_STREAM=0) across subsampling modes, odd
    sizes, gray, and smooth (DC-only heavy) content."""
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    from zignal_tpu.codecs import jpeg

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:120, 0:200]
    smooth = np.stack(
        [(yy * 0.9).astype(np.uint8), (xx * 0.6).astype(np.uint8),
         ((xx + yy) // 3).astype(np.uint8)], -1)
    payloads = []
    for sub in ("444", "422", "420"):
        payloads.append(jpeg.encode(
            rng.integers(0, 256, (67, 61, 3), dtype=np.uint8),
            quality=85, subsampling=sub))
        payloads.append(jpeg.encode(smooth, quality=85, subsampling=sub))
    payloads.append(jpeg.encode(
        rng.integers(0, 256, (77, 83, 1), dtype=np.uint8), quality=85))
    for data in payloads:
        monkeypatch.setenv("ZT_JPEG_STREAM", "1")
        streamed = np.asarray(jpeg.decode(data)[0])
        monkeypatch.setenv("ZT_JPEG_STREAM", "0")
        buffered = np.asarray(jpeg.decode(data)[0])
        assert streamed.shape == buffered.shape
        assert np.array_equal(streamed, buffered)
