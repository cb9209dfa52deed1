"""Gray-world white balance (reference: examples/src/whitebalance.zig)."""

import numpy as np

from _common import load_input, save, zignal


def main():
    img = load_input(size=(256, 256))
    # cast the image blue, then correct it
    arr = img.to_numpy().astype(np.float64)
    cast = np.clip(arr * [0.85, 0.95, 1.25], 0, 255).astype(np.uint8)
    tinted = zignal.Image.from_numpy(cast.copy())
    save(tinted, "whitebalance_before.png")

    a = cast.astype(np.float64)
    means = a.reshape(-1, 3).mean(axis=0)
    gains = means.mean() / np.maximum(means, 1e-6)
    balanced = np.clip(a * gains, 0, 255).astype(np.uint8)
    save(zignal.Image.from_numpy(balanced.copy()), "whitebalance_after.png")


if __name__ == "__main__":
    main()
