"""GIF codec + quantize/dither tests (PIL as decode/encode oracle)."""

import io

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.codecs import gif
from zignal_tpu.ops.dither import DitherMode, apply_dither
from zignal_tpu.ops.quantize import (
    ColorLookupTable, VGA16_PALETTE, build_palette, fixed_6x7x6_palette,
    median_cut, web216_palette,
)

PIL = pytest.importorskip("PIL.Image")
RNG = np.random.default_rng(21)


class TestQuantize:
    def test_fixed_palettes(self):
        assert fixed_6x7x6_palette().shape == (252, 3)
        assert web216_palette().shape == (216, 3)
        assert VGA16_PALETTE.shape == (16, 3)
        assert build_palette(None, "fixed_vga16").shape == (16, 3)

    def test_lut_nearest(self):
        pal = VGA16_PALETTE
        lut = ColorLookupTable(pal)
        # exact palette colors map to themselves (nearest)
        for i, color in enumerate(pal):
            got = pal[lut.lookup(color)]
            assert np.array_equal(got, color), (i, color)

    def test_median_cut_few_colors(self):
        arr = np.zeros((8, 8, 3), dtype=np.uint8)
        arr[:4] = (250, 10, 10)
        arr[4:] = (10, 10, 250)
        pal = median_cut(arr, 8)
        assert 2 <= len(pal) <= 8
        lut = ColorLookupTable(pal)
        red_idx = lut.lookup((250, 10, 10))
        blue_idx = lut.lookup((10, 10, 250))
        assert red_idx != blue_idx
        assert pal[red_idx][0] > 200
        assert pal[blue_idx][2] > 200

    def test_median_cut_gradient(self):
        g = np.linspace(0, 255, 64, dtype=np.uint8)
        arr = np.stack([np.tile(g, (64, 1))] * 3, axis=-1)
        pal = median_cut(arr, 16)
        assert len(pal) == 16


class TestDither:
    def test_ordered_and_error_diffusion(self):
        arr = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        pal = median_cut(arr, 16)
        for mode in (DitherMode.ORDERED, DitherMode.FLOYD_STEINBERG,
                     DitherMode.ATKINSON, DitherMode.NONE):
            img = arr.copy()
            idx = apply_dither(img, pal, mode=mode)
            assert idx.shape == (32, 32)
            # all output pixels are palette colors
            if mode != DitherMode.NONE:
                flat = img.reshape(-1, 3)
                pal_set = {tuple(p) for p in pal}
                assert all(tuple(p) in pal_set for p in flat[:64])

    def test_error_diffusion_reduces_banding(self):
        g = np.linspace(0, 255, 128, dtype=np.uint8)
        arr = np.stack([np.tile(g, (16, 1))] * 3, axis=-1).copy()
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        img = np.ascontiguousarray(arr.copy())
        apply_dither(img, pal, mode=DitherMode.FLOYD_STEINBERG)
        # mean of dithered binary image tracks the mean gray level
        assert abs(img.mean() - arr.mean()) < 12


class TestGif:
    def test_roundtrip_single(self):
        arr = np.zeros((20, 30, 3), dtype=np.uint8)
        arr[:, :15] = (255, 0, 0)
        arr[:, 15:] = (0, 0, 255)
        data = gif.encode(arr, dither=DitherMode.NONE)
        out, info = gif.decode(data)
        assert out.shape == (20, 30, 4)
        assert info.frame_count == 1
        assert np.abs(out[..., :3].astype(int) - arr.astype(int)).max() <= 8

    def test_pil_reads_our_gif(self):
        arr = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        data = gif.encode(arr, dither=DitherMode.NONE)
        pil = PIL.open(io.BytesIO(data)).convert("RGB")
        ours = gif.decode(data)[0][..., :3]
        assert np.array_equal(np.asarray(pil), ours)

    def test_decode_pil_gif(self):
        arr = np.zeros((12, 12, 3), dtype=np.uint8)
        arr[:6] = (10, 200, 30)
        buf = io.BytesIO()
        PIL.fromarray(arr, "RGB").save(buf, format="GIF")
        ours = gif.load_from_bytes(buf.getvalue())
        pil = np.asarray(PIL.open(buf).convert("RGB"))
        assert np.array_equal(ours[..., :3], pil)

    def test_animated_roundtrip(self):
        frames = []
        for i in range(3):
            f = np.zeros((10, 10, 3), dtype=np.uint8)
            f[..., 0] = i * 80
            frames.append(f)
        data = gif.encode_animated(frames, [10, 20, 30], loop_count=2,
                                   dither=DitherMode.NONE)
        anim = gif.decode_animated(data)
        assert anim.frame_count == 3
        assert anim.delays == [10, 20, 30]
        assert anim.loop_count == 2
        for i, f in enumerate(anim.frames):
            assert abs(int(f[5, 5, 0]) - i * 80) <= 8

    def test_decode_pil_animated(self):
        frames = [PIL.fromarray(
            np.full((8, 8, 3), i * 60, dtype=np.uint8), "RGB") for i in range(4)]
        buf = io.BytesIO()
        frames[0].save(buf, format="GIF", save_all=True,
                       append_images=frames[1:], duration=100, loop=0)
        anim = gif.decode_animated(buf.getvalue())
        assert anim.frame_count == 4
        info = gif.get_info(buf.getvalue())
        assert info.frame_count == 4

    def test_image_load_save_gif(self, tmp_path):
        img = zignal.Image(10, 10, (200, 100, 50), dtype=zignal.Rgb)
        p = str(tmp_path / "x.gif")
        img.save(p)
        back = zignal.Image.load(p)
        assert (back.rows, back.cols) == (10, 10)
        assert back.dtype is zignal.Rgba
        diff = np.abs(
            back.to_numpy()[..., :3].astype(int) - img.to_numpy().astype(int)
        )
        assert diff.max() <= 8


class TestLzwFallback:
    """Pure-Python LZW fallbacks must interoperate bit-for-bit with the
    native core (ADVICE r1: every native entry point needs a fallback)."""

    def _cases(self):
        rng = np.random.default_rng(7)
        return [
            (np.zeros(300, dtype=np.uint8), 2),            # KwKwK runs
            (rng.integers(0, 4, 64, dtype=np.uint8), 2),
            (rng.integers(0, 256, 30000, dtype=np.uint8), 8),  # table reset
            (np.tile(np.arange(256, dtype=np.uint8), 100), 8),
            (np.zeros(0, dtype=np.uint8), 4),
        ]

    def test_py_encode_native_decode(self):
        from zignal_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("native core unavailable")
        for data, mcs in self._cases():
            enc = gif._lzw_encode_py(data, mcs)
            dec = gif._lzw_decode(enc, mcs, len(data))
            assert np.array_equal(dec, data)

    def test_native_encode_py_decode(self):
        from zignal_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("native core unavailable")
        for data, mcs in self._cases():
            enc = gif._lzw_encode(data, mcs)
            dec = gif._lzw_decode_py(enc, mcs, len(data))
            assert np.array_equal(dec, data)

    def test_native_encode_matches_py_encode(self):
        from zignal_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("native core unavailable")
        for data, mcs in self._cases():
            assert gif._lzw_encode(data, mcs) == gif._lzw_encode_py(data, mcs)

    def test_py_roundtrip_and_corrupt(self):
        for data, mcs in self._cases():
            enc = gif._lzw_encode_py(data, mcs)
            dec = gif._lzw_decode_py(enc, mcs, len(data))
            assert np.array_equal(dec, data)
        with pytest.raises(gif.GifError):
            # code far beyond next_code right after the initial clear
            gif._lzw_decode_py(bytes([0xFF, 0xFF, 0xFF]), 2, 100)

    def test_gif_decode_without_native(self, monkeypatch):
        """Full GIF decode path via PIL-encoded bytes with the native
        lib forced off."""
        arr = RNG.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        im = PIL.fromarray(arr, "RGB").quantize(colors=64)
        buf = io.BytesIO()
        im.save(buf, format="GIF")
        data = buf.getvalue()
        want = gif.decode(data)[0]
        monkeypatch.setattr(gif, "get_lib", lambda: None)
        got = gif.decode(data)[0]
        assert np.array_equal(np.asarray(got), np.asarray(want))
