"""Perlin noise textures (reference: examples/src/perlin_noise.zig)."""

import numpy as np

from _common import save, zignal


def main():
    n = 256
    ys, xs = np.meshgrid(np.linspace(0, 8, n), np.linspace(0, 8, n),
                         indexing="ij")
    noise = np.asarray(zignal.perlin_array(xs, ys, octaves=5, persistence=0.55))
    gray = ((noise - noise.min()) / (np.ptp(noise) + 1e-9) * 255).astype(np.uint8)
    img = zignal.Image.from_numpy(gray[..., None].copy())
    save(img, "perlin_gray.png")
    save(img.apply_colormap(zignal.Colormap.viridis()), "perlin_viridis.png")


if __name__ == "__main__":
    main()
