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
from .image import Image, PixelIterator
from .matrix import Matrix
from .canvas import Canvas
from .codecs.gif import AnimatedImage
from .colormaps import Colormap
from .font import BitmapFont
from .motion_blur import MotionBlur
from .optimization import (
    Assignment, OptimizationPolicy, optimize, solve_assignment_problem,
)
from .perlin import perlin, perlin_array
from .pca import PCA
from .stats import RunningStats
from .rectangle import Rectangle

__all__ = [
    "__version__",
    "Blending", "BorderMode", "DrawMode", "Interpolation", "ThresholdMode",
    "Gray", "Rgb", "Rgba", "Hsl", "Hsv", "Lab", "Lch", "Lms",
    "Oklab", "Oklch", "Xyb", "Xyz", "Ycbcr",
    "Image", "PixelIterator", "Rectangle", "Matrix", "PCA",
    "FeatureDistributionMatching", "RunningStats", "MotionBlur", "Colormap",
    "Canvas", "BitmapFont", "AnimatedImage",
    "perlin", "perlin_array",
    "OptimizationPolicy", "Assignment", "solve_assignment_problem", "optimize",
    "SimilarityTransform", "AffineTransform", "ProjectiveTransform", "ConvexHull",
]
