"""Image pyramid for multi-scale detection (reference: src/image/pyramid.zig).

Each level is resized from the original (truncated dims, max 1) after a
light Gaussian anti-aliasing blur — all levels are one batched device
program chain.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ImagePyramid"]


class ImagePyramid:
    """Multi-scale levels; level 0 is the source plane."""

    def __init__(self, levels, scale_factor: float, blur_sigma: float):
        self.levels = levels  # list of [H, W] u8 device arrays
        self.scale_factor = scale_factor
        self.blur_sigma = blur_sigma

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    @classmethod
    def build(cls, plane, n_levels: int = 8, scale_factor: float = 1.2,
              blur_sigma: float = 1.6) -> "ImagePyramid":
        """plane: [H, W] u8 device array."""
        from ..enums import Interpolation
        from .convolution import gaussian_blur
        from .interpolation import resize

        if n_levels < 1 or scale_factor <= 1.0:
            raise ValueError("need n_levels >= 1 and scale_factor > 1")
        h, w = plane.shape
        levels = [plane]
        blurred = gaussian_blur(plane[..., None], blur_sigma)
        for i in range(1, n_levels):
            scale = scale_factor ** i
            rows = max(1, int(np.trunc(h / scale)))
            cols = max(1, int(np.trunc(w / scale)))
            lvl = resize(blurred, rows, cols, Interpolation.BILINEAR)[..., 0]
            levels.append(lvl)
        return cls(levels, scale_factor, blur_sigma)

    def scale_of(self, level: int) -> float:
        return self.scale_factor ** level

    def to_original(self, level: int, x: float, y: float):
        """Map level coordinates to original-image coordinates
        (pyramid.zig:125-140)."""
        s = self.scale_of(level)
        return (x * s, y * s)

    def to_level(self, level: int, x: float, y: float):
        s = self.scale_of(level)
        return (x / s, y / s)
