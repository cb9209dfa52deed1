"""zignal-tpu: TPU-native image processing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`arrufat/zignal` (a zero-dependency Zig image-processing library).
The public API mirrors the `zignal-processing` Python package
call-for-call; the compute path is batched channel-last device arrays
compiled to fused XLA/Pallas programs.
"""

__version__ = "0.1.0"

from .blending import Blending
from .color import (
    Gray, Hsl, Hsv, Lab, Lch, Lms, Oklab, Oklch, Rgb, Rgba, Xyb, Xyz, Ycbcr,
)
from .enums import BorderMode, DrawMode, Interpolation, ThresholdMode
from .geometry import (
    AffineTransform, ConvexHull, ProjectiveTransform, SimilarityTransform,
)
from .fdm import FeatureDistributionMatching
from .batch import ImageBatch
from .image import Image, PixelIterator
from .matrix import Matrix
from .canvas import Canvas
from .codecs.gif import AnimatedImage
from .colormaps import Colormap
from .font import BitmapFont
from .motion_blur import MotionBlur
from .optimization import (
    Assignment, GlobalOptimizer, OptimizationPolicy, optimize,
    solve_assignment_problem,
)
from .perlin import perlin, perlin_array
from .pca import PCA
from .stats import RunningStats
from .rectangle import Rectangle
from .qrcode import EcLevel, QrDecodeResult


def qrcode_encode(data, ec_level=None, version=None, module_size: int = 8,
                  quiet_zone: int = 4):
    """Encode str/bytes as a QR code -> grayscale Image
    (reference: bindings qrcode.zig:287 qrcode_encode)."""
    from .qrcode import EcLevel as _E, encode_text

    return encode_text(data, _E(ec_level) if ec_level is not None else _E.MEDIUM,
                       version, module_size, quiet_zone)


def qrcode_decode(image):
    """Decode the first QR code in an Image -> QrDecodeResult or None
    (reference: bindings qrcode.zig qrcode_decode)."""
    from .image import Image as _Image
    from .qrcode import decode_image

    if not isinstance(image, _Image):
        raise TypeError("qrcode_decode expects an Image")
    results = decode_image(image)
    return results[0] if results else None


__all__ = [
    "__version__",
    "Blending", "BorderMode", "DrawMode", "Interpolation", "ThresholdMode",
    "Gray", "Rgb", "Rgba", "Hsl", "Hsv", "Lab", "Lch", "Lms",
    "Oklab", "Oklch", "Xyb", "Xyz", "Ycbcr",
    "Image", "ImageBatch", "PixelIterator", "Rectangle", "Matrix", "PCA",
    "FeatureDistributionMatching", "RunningStats", "MotionBlur", "Colormap",
    "Canvas", "BitmapFont", "AnimatedImage",
    "perlin", "perlin_array",
    "OptimizationPolicy", "Assignment", "solve_assignment_problem", "optimize",
    "GlobalOptimizer",
    "SimilarityTransform", "AffineTransform", "ProjectiveTransform", "ConvexHull",
    "EcLevel", "QrDecodeResult", "qrcode_encode", "qrcode_decode",
]
