"""Autocontrast + histogram equalization (reference:
examples/src/contrast_enhancement.zig)."""

import numpy as np

from _common import load_input, save


def main():
    img = load_input(size=(256, 256))
    # flatten contrast first so the enhancement is visible
    arr = img.to_numpy()
    low_contrast = (arr.astype(np.float32) * 0.4 + 80).astype(np.uint8)
    img.to_numpy()[:] = low_contrast
    save(img, "low_contrast.png")
    save(img.autocontrast(cutoff=0.01), "autocontrast.png")
    save(img.equalize(), "equalized.png")


if __name__ == "__main__":
    main()
