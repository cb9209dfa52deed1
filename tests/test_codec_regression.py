"""Golden-hash regression for codec encoders
(reference approach: src/canvas/tests/regression.zig applied to codecs;
the decoders are covered by PIL-oracle round-trip tests instead).

Digests pin today's encoder output byte-for-byte so silent changes are
caught. Regenerate: `python tests/test_codec_regression.py`.
"""

import hashlib

import numpy as np
import pytest

import zignal_tpu as zignal

GOLDEN = {
    "png_rgb": "03ccacae9a2bda87e1e2b5a7d33bab24",
    "png_rgba": "3e90ca1930ddc16af9a6c80481bb5ca1",
    "png_gray": "06da835dac9c5f57ff274109fe150471",
    "bmp_rgb": "2a4c4c8fd24020165a798a34fb3a1699",
    "jpeg_rgb": "49d6962ac61a0f983754998c5308567c",
    "gif_rgb": "f1c63953f02e7a049935f9e1278e81a9",
}


def _image(kind):
    rng = np.random.default_rng(1234)
    if kind.endswith("gray"):
        return rng.integers(0, 256, (33, 47, 1), dtype=np.uint8)
    if kind.endswith("rgba"):
        return rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    return rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)


def _encode(kind) -> bytes:
    arr = _image(kind)
    fmt = kind.split("_")[0]
    if fmt == "png":
        from zignal_tpu.codecs import png
        return png.encode(arr)
    if fmt == "bmp":
        from zignal_tpu.codecs import bmp
        return bmp.encode(arr)
    if fmt == "jpeg":
        import os

        from zignal_tpu.codecs import jpeg
        # pin the numpy fallback path: the native AAN encoder is a
        # different conformant encoder whose bytes may legally vary
        # with -march codegen; it is covered by decoded-quality parity
        # in test_codecs.py instead
        os.environ["ZT_JPEG_NATIVE_ENCODE"] = "0"
        try:
            return jpeg.encode(arr, quality=85)
        finally:
            os.environ.pop("ZT_JPEG_NATIVE_ENCODE", None)
    from zignal_tpu.codecs import gif
    return gif.encode(arr)


@pytest.mark.parametrize("kind", sorted(GOLDEN))
def test_codec_encoder_golden(kind):
    digest = hashlib.md5(_encode(kind)).hexdigest()
    assert digest == GOLDEN[kind]
    # and the bytes must round-trip through our own decoder
    back = zignal.Image.load_from_bytes(_encode(kind))
    assert (back.rows, back.cols) == (33, 47)


if __name__ == "__main__":
    import re
    import sys

    src = open(__file__).read()
    for kind in GOLDEN:
        h = hashlib.md5(_encode(kind)).hexdigest()
        src = re.sub(rf'"{kind}": "[0-9a-fREGEN]+"', f'"{kind}": "{h}"', src)
        print(kind, h)
    open(__file__, "w").write(src)
    sys.exit(0)
