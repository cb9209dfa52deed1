"""Color space conversions demo (reference: examples/src/colorspaces.zig)."""

import numpy as np

from _common import load_input, save, zignal
from zignal_tpu.color import convert_array


def main():
    # gradient strip through several color spaces
    w, h = 360, 48
    hue = np.linspace(0, 360, w, endpoint=False, dtype=np.float32)
    hsv = np.zeros((h, w, 3), np.float32)
    hsv[..., 0] = hue[None, :]
    hsv[..., 1] = 100.0
    hsv[..., 2] = 100.0
    rgb = np.asarray(convert_array(hsv, "hsv", "rgb"))
    strip = zignal.Image.from_numpy((rgb * 255).astype(np.uint8).copy())
    save(strip, "hsv_hue_strip.png")

    img = load_input(size=(256, 256))
    arr = img.to_numpy().astype(np.float32) / 255.0
    for space in ("oklab", "lab", "xyb"):
        converted = np.asarray(convert_array(arr, "rgb", space))
        # roundtrip sanity
        back = np.asarray(convert_array(converted, space, "rgb"))
        out = zignal.Image.from_numpy(
            np.clip(back * 255 + 0.5, 0, 255).astype(np.uint8)
        )
        save(out, f"roundtrip_{space}.png")
        print(f"{space}: roundtrip max err "
              f"{np.abs(back - arr).max() * 255:.2f}/255")

    c = zignal.Rgb(255, 136, 0)
    print("Rgb(255,136,0) ->", c.to(zignal.Oklch), "|", c.to(zignal.Lab))


if __name__ == "__main__":
    main()
