"""Codec playground: encode/decode one image through every codec
(reference: examples/src/codec_playground.zig).

The reference is a WASM widget that re-encodes an uploaded image with
adjustable settings and reports sizes + round-trip results; this demo
does the same sweep on the CLI: PNG, BMP, GIF (quantized), and JPEG at
several qualities/subsamplings, reporting encoded size, decode
round-trip status, and PSNR against the source.
"""

import io

import numpy as np

from _common import load_input, save, zignal
from zignal_tpu.codecs import bmp, detect_format, gif, jpeg, png


def row(fmt, size, psnr, note=""):
    print(f"  {fmt:<22} {size:>9,} B   PSNR {psnr:>6}   {note}")


def main():
    img = load_input(size=(256, 256))
    src = img.to_numpy()[..., :3]
    img_rgb = zignal.Image.from_numpy(src.copy())
    save(img_rgb, "codec_playground_input.png")
    print(f"input: {img_rgb.cols}x{img_rgb.rows} RGB")

    results = []

    data = png.encode(src)
    back, _ = png.decode(data)
    assert detect_format(data).name == "PNG"
    exact = np.array_equal(back, src)
    results.append(("png (lossless)", len(data),
                    "inf" if exact else "BUG", "bit-exact" if exact else ""))

    data = bmp.encode(src)
    back, _ = bmp.decode(data)
    exact = np.array_equal(back, src)
    results.append(("bmp (lossless)", len(data),
                    "inf" if exact else "BUG", "bit-exact" if exact else ""))

    data = gif.encode(src)
    back = np.asarray(gif.decode(data)[0])[..., :3]
    p = zignal.Image.from_numpy(src.copy()).psnr(
        zignal.Image.from_numpy(back.copy()))
    results.append(("gif (256-color dither)", len(data), f"{p:.1f}", ""))

    for quality in (95, 85, 60):
        for sub in ("444", "420"):
            data = jpeg.encode(src, quality=quality, subsampling=sub)
            back = jpeg.load_from_bytes(data)
            p = zignal.Image.from_numpy(src.copy()).psnr(
                zignal.Image.from_numpy(back.copy()))
            results.append((f"jpeg q{quality} {sub}", len(data),
                            f"{p:.1f}", ""))

    print(f"{'format':<24} {'size':>9}     quality")
    for fmt, size, psnr, note in results:
        row(fmt, size, psnr, note)

    # every decoder must agree with the format sniffer
    buf = io.BytesIO()
    for name, data in (("png", png.encode(src)), ("bmp", bmp.encode(src)),
                       ("gif", gif.encode(src)),
                       ("jpeg", jpeg.encode(src, quality=90))):
        detected = detect_format(data)
        assert detected is not None and detected.name.lower() == name, name
        buf.write(data)
    print(f"sniffer agrees on all {4} formats; "
          f"total encoded {buf.tell():,} bytes")


if __name__ == "__main__":
    main()
