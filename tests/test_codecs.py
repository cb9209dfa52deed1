"""Codec tests: PNG/BMP round-trips, JPEG decode vs oracle, format sniffing.

PIL is used strictly as an *oracle* (the framework itself never imports it),
mirroring the reference's strategy of validating hand-rolled codecs against
known-good output (SURVEY.md §4)."""

import io
import os

import numpy as np
import pytest

import zignal_tpu as zignal
from zignal_tpu.codecs import bmp, detect_format, jpeg, png

PIL = pytest.importorskip("PIL.Image")

RNG = np.random.default_rng(3)
LIZA = "/root/reference/assets/liza.jpg"


def _rand(h, w, c):
    return RNG.integers(0, 256, (h, w, c), dtype=np.uint8)


class TestPng:
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_roundtrip(self, c):
        arr = _rand(37, 53, c)
        data = png.encode(arr)
        out, info = png.decode(data)
        assert np.array_equal(out, arr)
        assert (info.width, info.height) == (53, 37)

    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_pil_reads_our_png(self, c):
        arr = _rand(21, 17, c)
        data = png.encode(arr)
        pil = np.asarray(PIL.open(io.BytesIO(data)))
        if c == 1:
            pil = pil[..., None]
        assert np.array_equal(pil, arr)

    @pytest.mark.parametrize("mode", ["L", "RGB", "RGBA", "P", "1", "I;16"])
    def test_decode_pil_pngs(self, mode):
        base = _rand(25, 31, 3)
        img = PIL.fromarray(base, "RGB").convert(mode)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        out, _ = png.decode(buf.getvalue())
        want = np.asarray(img.convert("RGBA" if out.shape[2] == 4 else
                                      "RGB" if out.shape[2] == 3 else "L"))
        if want.ndim == 2:
            want = want[..., None]
        if mode == "I;16":
            # 16-bit gray: we take the high byte
            want16 = np.asarray(img)
            want = (want16 >> 8).astype(np.uint8)[..., None]
        assert out.shape == want.shape
        assert np.array_equal(out, want)

    def test_interlaced(self):
        """Hand-build an Adam7-interlaced PNG (filter 0 scanlines)."""
        import struct
        import zlib

        arr = _rand(33, 29, 3)
        h, w = arr.shape[:2]
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                raw.append(0)
                raw.extend(row.tobytes())

        def chunk(ctype, payload):
            return (struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

        data = (png.SIGNATURE
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        out, info = png.decode(data)
        assert info.interlace == 1
        assert np.array_equal(out, arr)
        # sanity: PIL agrees with our hand-built file
        pil = np.asarray(PIL.open(io.BytesIO(data)))
        assert np.array_equal(pil, arr)

    def test_bad_signature_and_crc(self):
        with pytest.raises(ValueError):
            png.decode(b"not a png at all")
        data = bytearray(png.encode(_rand(5, 5, 3)))
        data[50] ^= 0xFF  # corrupt IDAT payload -> CRC mismatch
        with pytest.raises(ValueError):
            png.decode(bytes(data))

    def test_decode_limits(self):
        data = png.encode(_rand(16, 16, 3))
        with pytest.raises(ValueError):
            png.decode(data, png.DecodeLimits(max_width=8))


class TestBmp:
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_roundtrip(self, c):
        arr = _rand(19, 23, c)
        out, _ = bmp.decode(bmp.encode(arr))
        if c == 1:
            assert np.array_equal(out[..., 0], arr[..., 0])
            assert np.array_equal(out[..., 0], out[..., 1])
        else:
            assert np.array_equal(out[..., :c], arr)

    def test_pil_reads_our_bmp(self):
        arr = _rand(11, 13, 3)
        pil = np.asarray(PIL.open(io.BytesIO(bmp.encode(arr))))
        assert np.array_equal(pil, arr)

    def test_decode_pil_bmp(self):
        arr = _rand(14, 10, 3)
        buf = io.BytesIO()
        PIL.fromarray(arr, "RGB").save(buf, format="BMP")
        out, _ = bmp.decode(buf.getvalue())
        assert np.array_equal(out, arr)


class TestJpeg:
    def test_decode_liza(self):
        """Decode the reference's real photo; compare against PIL."""
        if not os.path.exists(LIZA):
            pytest.skip("liza.jpg not available")
        ours = jpeg.load(LIZA)
        theirs = np.asarray(PIL.open(LIZA).convert("RGB")).astype(np.int16)
        assert ours.shape == theirs.shape
        diff = np.abs(ours.astype(np.int16) - theirs)
        # JPEG decoders legitimately differ by a few counts (IDCT/upsampling)
        assert np.mean(diff) < 2.0
        assert np.percentile(diff, 99) <= 12

    @pytest.mark.parametrize("subsampling", ["444", "420"])
    @pytest.mark.parametrize("progressive", [False, True])
    def test_decode_pil_encodes(self, subsampling, progressive):
        arr = _rand(40, 56, 3)
        # smooth it so JPEG can represent it
        arr = np.asarray(
            PIL.fromarray(arr, "RGB").resize((14, 10)).resize((56, 40))
        )
        buf = io.BytesIO()
        PIL.fromarray(arr, "RGB").save(
            buf, format="JPEG", quality=95,
            subsampling={"444": 0, "420": 2}[subsampling],
            progressive=progressive,
        )
        ours = jpeg.load_from_bytes(buf.getvalue())
        theirs = np.asarray(PIL.open(buf).convert("RGB"))
        diff = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
        assert np.mean(diff) < 3.0

    def test_odd_sizes_all_subsamplings(self):
        # widths straddling the 16-px SIMD interleave tail and odd
        # chroma expansion (37, 51, 47 are not multiples of 8 or 16)
        for h, w in ((37, 51), (33, 47), (16, 17)):
            base = np.asarray(
                PIL.fromarray(_rand(h, w, 3), "RGB")
                .resize((max(4, w // 3), max(4, h // 3))).resize((w, h)))
            for sub in (0, 1, 2):  # 4:4:4, 4:2:2, 4:2:0
                buf = io.BytesIO()
                PIL.fromarray(base, "RGB").save(
                    buf, format="JPEG", quality=95, subsampling=sub)
                ours = jpeg.load_from_bytes(buf.getvalue())
                theirs = np.asarray(PIL.open(buf).convert("RGB"))
                assert ours.shape == (h, w, 3)
                diff = np.abs(ours.astype(np.int16) - theirs.astype(np.int16))
                # sub>0: libjpeg applies triangular ("fancy") chroma
                # upsampling; ours is pixel doubling like the reference
                # (jpeg.zig upsample), so allow a wider mean there
                assert np.mean(diff) < (0.5 if sub == 0 else 4.5), (h, w, sub)

    def test_our_encoder_decodes_everywhere(self):
        arr = np.asarray(
            PIL.fromarray(_rand(48, 64, 3), "RGB").resize((16, 12)).resize((64, 48))
        )
        for sub in ("444", "420"):
            data = jpeg.encode(arr, quality=95, subsampling=sub)
            pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
            ours = jpeg.load_from_bytes(data)
            assert pil.shape == arr.shape
            assert np.mean(np.abs(pil.astype(int) - arr.astype(int))) < 4.0
            assert np.mean(np.abs(ours.astype(int) - arr.astype(int))) < 4.0

    def test_native_encoder_quality_matches_numpy(self, monkeypatch):
        """The native scan encoder (jpeg_core.cpp zt_jpeg_encode_scan,
        float AAN FDCT) is a different-but-conformant encoder from the
        numpy sgemm path: streams need not match byte-for-byte, but the
        decoded quality vs the source must be equal, PIL must accept
        the stream, and the alpha channel must be ignored."""
        from zignal_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(11)
        yy, xx = np.mgrid[0:120, 0:150].astype(np.float32)
        photo = np.clip(
            np.stack([128 + 90 * np.sin(yy / 20), 128 + 80 * np.cos(xx / 15),
                      128 + 70 * np.sin((xx + yy) / 30)], -1)
            + rng.normal(0, 6, (120, 150, 3)), 0, 255).astype(np.uint8)
        cases = [
            (photo, dict(quality=90, subsampling="444")),
            (photo, dict(quality=90, subsampling="420")),
            (photo, dict(quality=75, subsampling="422")),
            (rng.integers(0, 256, (67, 61, 3), np.uint8),
             dict(quality=90, subsampling="420")),
            (np.full((40, 56, 3), 77, np.uint8),
             dict(quality=50, subsampling="420")),
            (rng.integers(0, 256, (77, 83, 1), np.uint8), dict(quality=85)),
            (photo[:1, :1], dict(quality=90, subsampling="420")),
        ]
        for img, kw in cases:
            img = np.ascontiguousarray(img)
            monkeypatch.setenv("ZT_JPEG_NATIVE_ENCODE", "1")
            nat = jpeg.encode(img, **kw)
            monkeypatch.setenv("ZT_JPEG_NATIVE_ENCODE", "0")
            pyb = jpeg.encode(img, **kw)
            dn = jpeg.load_from_bytes(nat)
            dp = jpeg.load_from_bytes(pyb)
            PIL.open(io.BytesIO(nat)).load()  # conformant stream
            src = img[..., :3] if img.shape[2] >= 3 else img
            err_n = np.abs(dn.reshape(src.shape).astype(int)
                           - src.astype(int)).mean()
            err_p = np.abs(dp.reshape(src.shape).astype(int)
                           - src.astype(int)).mean()
            assert err_n <= err_p * 1.02 + 0.5, (kw, err_n, err_p)
        # alpha is dropped identically: rgba stream == rgb stream
        monkeypatch.setenv("ZT_JPEG_NATIVE_ENCODE", "1")
        rgba = rng.integers(0, 256, (50, 70, 4), np.uint8)
        assert jpeg.encode(rgba, quality=90, subsampling="420") == \
            jpeg.encode(np.ascontiguousarray(rgba[..., :3]), quality=90,
                        subsampling="420")

    def test_gray_roundtrip(self):
        g = np.asarray(
            PIL.fromarray(_rand(24, 24, 1)[..., 0], "L").resize((8, 8)).resize((24, 24))
        )[..., None]
        data = jpeg.encode(g, quality=95)
        ours = jpeg.load_from_bytes(data)
        assert ours.shape == g.shape
        assert np.mean(np.abs(ours.astype(int) - g.astype(int))) < 4.0


class TestImageIO:
    def test_load_save_roundtrip(self, tmp_path):
        img = zignal.Image(16, 20, (10, 200, 30), dtype=zignal.Rgb)
        p = str(tmp_path / "x.png")
        img.save(p)
        back = zignal.Image.load(p)
        assert back == img

    def test_save_jpeg_and_bmp(self, tmp_path):
        img = zignal.Image(24, 24, (90, 120, 30), dtype=zignal.Rgb)
        for name in ("x.jpg", "x.bmp"):
            p = str(tmp_path / name)
            img.save(p)
            back = zignal.Image.load(p)
            assert (back.rows, back.cols) == (24, 24)
            diff = np.abs(
                back.to_numpy()[..., :3].astype(int) - img.to_numpy().astype(int)
            )
            assert diff.mean() < 3.0

    def test_detect_format(self):
        assert detect_format(png.encode(_rand(4, 4, 3))).value == "png"
        assert detect_format(bmp.encode(_rand(4, 4, 3))).value == "bmp"
        assert detect_format(b"GIF89a....").value == "gif"
        assert detect_format(b"garbage") is None


class TestJpegMalformed:
    def test_malformed_streams_raise_not_crash(self):
        """Corrupt/truncated streams must raise JpegError (or decode to
        something) — never read or write out of bounds. The native
        decoder is additionally fuzzed under ASan/UBSan (second SOF,
        oversubscribed DHT, bad table ids, spectral bounds, ns > 4 —
        all found and fixed by that harness); this smoke keeps the
        error paths exercised in CI."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (48, 64, 3), np.uint8)
        base = jpeg.encode(img, quality=85, subsampling="420")

        def attempt(data):
            try:
                jpeg.decode(bytes(data))
            except ValueError:  # JpegError subclasses ValueError
                pass

        # truncations (dense over the header region)
        for t in range(2, min(len(base), 700), 3):
            attempt(base[:t])
        # single-byte corruptions over the whole stream
        buf = bytearray(base)
        for p in range(0, len(buf), 17):
            old = buf[p]
            buf[p] ^= 0x5A
            attempt(buf)
            buf[p] = old
        # a second SOF with different dimensions must be rejected
        sof = base.index(b"\xff\xc0")
        seg_len = int.from_bytes(base[sof + 2:sof + 4], "big")
        second = base[sof:sof + 2 + seg_len]
        doctored = base[:sof + 2 + seg_len] + second + base[sof + 2 + seg_len:]
        with pytest.raises(ValueError):
            jpeg.decode(doctored)
