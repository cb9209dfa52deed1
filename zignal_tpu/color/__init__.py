"""Color system: 13 color types, hub-and-spoke conversions, batched device
conversions (reference: src/color.zig)."""

from ._array import NUM_CHANNELS, convert_array, convert_u8_array
from ._chain import convert_chain
from ._classes import (
    CLASS_BY_SPACE, Gray, Hsl, Hsv, Lab, Lch, Lms,
    Oklab, Oklch, Rgb, Rgba, Xyb, Xyz, Ycbcr,
)
from ._scalar import convert_float, convert_u8

__all__ = [
    "Gray", "Rgb", "Rgba", "Hsl", "Hsv", "Lab", "Lch", "Lms", "Oklab",
    "Oklch", "Xyb", "Xyz", "Ycbcr", "CLASS_BY_SPACE",
    "convert_array", "convert_u8_array", "convert_float", "convert_u8",
    "convert_chain",
    "NUM_CHANNELS",
]
