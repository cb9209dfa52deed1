"""The Image container — TPU-native redesign of zignal's Image(T).

Reference: src/image.zig:97-1248 and bindings/python/src/image.zig.

Design (SURVEY.md §7): an ``Image`` is a thin host handle over a
channel-last ``[H, W, C]`` uint8 array with a dtype tag (Gray/Rgb/Rgba).
The pixel data lives in exactly one of two homes:

- **host** (``_np``): a numpy array that backs the mutation API —
  ``to_numpy`` zero-copy views, pixel proxies, slice assignment, views
  sharing memory with their parent. While a host array exists it is
  authoritative (users may write through views), so device ops re-upload.
- **device** (``_dev``): a ``jax.Array`` produced by compute ops. Chains
  of ops (resize → blur → convert …) stay on device and fuse under jit
  with no host round-trips; the host array is materialized lazily only
  when the mutation/introspection API needs it.
"""

from __future__ import annotations

import os

import numpy as np

from .blending import Blending, blend_arrays
from .color._classes import CLASS_BY_SPACE, Gray, Rgb, Rgba, _Color
from .color import _scalar as _sc
from .enums import BorderMode, Interpolation
from .rectangle import Rectangle

__all__ = ["Image", "PixelIterator"]

def _round_half_away_f32(x) -> float:
    import math

    x = float(np.float32(x))
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


_SPACE_CHANNELS = {"gray": 1, "rgb": 3, "rgba": 4}
_CHANNELS_SPACE = {1: "gray", 3: "rgb", 4: "rgba"}


def _dtype_space(dtype) -> str:
    if dtype is None:
        return "rgb"
    if isinstance(dtype, _Color):
        dtype = type(dtype)
    if dtype is Gray:
        return "gray"
    if dtype is Rgb:
        return "rgb"
    if dtype is Rgba:
        return "rgba"
    raise TypeError("dtype must be zignal.Gray, zignal.Rgb, or zignal.Rgba")


def _parse_color(value, space: str):
    """Parse an int / float / tuple / color object into u8 components of
    `space` (reference: bindings/python/src/color_utils.zig parseColor)."""
    if isinstance(value, _Color):
        target = CLASS_BY_SPACE[space]
        return tuple(value.to(target)._v)
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if isinstance(value, float) and 0.0 <= value <= 1.0 and value != int(value):
            g = _sc.f64_to_u8(value)
        else:
            g = int(value)
        if not 0 <= g <= 255:
            raise ValueError("color component must be in range 0-255")
        return _sc.convert_u8("gray", space, (g,))
    if isinstance(value, (tuple, list)):
        vals = tuple(int(v) for v in value)
        if any(not 0 <= v <= 255 for v in vals):
            raise ValueError("color components must be in range 0-255")
        if len(vals) == 3:
            return _sc.convert_u8("rgb", space, vals)
        if len(vals) == 4:
            return _sc.convert_u8("rgba", space, vals)
        raise ValueError("color tuple must have 3 or 4 components")
    raise TypeError(f"cannot interpret {type(value).__name__} as a color")


def _convert_array_u8(arr: np.ndarray, src: str, dst: str) -> np.ndarray:
    """Host-side u8 dtype conversion, bit-exact fixed point
    (reference: src/color.zig:987-1043)."""
    if src == dst:
        return arr
    a = arr
    path = _sc.conversion_path(src, dst)
    for s, d in path:
        if (s, d) == ("rgb", "gray"):
            v = a.astype(np.int64)
            yr, yg, yb = _sc._GRAY_FWD
            y = (v[..., 0] * yr + v[..., 1] * yg + v[..., 2] * yb + 32768) >> 16
            a = np.clip(y, 0, 255).astype(np.uint8)[..., None]
        elif (s, d) == ("gray", "rgb"):
            a = np.repeat(a, 3, axis=-1)
        elif (s, d) == ("rgb", "rgba"):
            a = np.concatenate([a, np.full_like(a[..., :1], 255)], axis=-1)
        elif (s, d) == ("rgba", "rgb"):
            a = np.ascontiguousarray(a[..., :3])
        elif (s, d) == ("rgb", "ycbcr"):
            v = a.astype(np.int64)
            y = (19595 * v[..., 0] + 38470 * v[..., 1] + 7471 * v[..., 2] + 32768) >> 16
            cb = ((-11059 * v[..., 0] - 21710 * v[..., 1] + 32768 * v[..., 2] + 32768) >> 16) + 128
            cr = ((32768 * v[..., 0] - 27439 * v[..., 1] - 5329 * v[..., 2] + 32768) >> 16) + 128
            a = np.clip(np.stack([y, cb, cr], axis=-1), 0, 255).astype(np.uint8)
        elif (s, d) == ("ycbcr", "rgb"):
            v = a.astype(np.int64)
            y, cb, cr = v[..., 0], v[..., 1] - 128, v[..., 2] - 128
            r = (65536 * y + 91881 * cr + 32768) >> 16
            g = (65536 * y - 22554 * cb - 46802 * cr + 32768) >> 16
            b = (65536 * y + 116130 * cb + 32768) >> 16
            a = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
        else:  # pragma: no cover
            raise ValueError(f"unsupported u8 conversion edge {s}->{d}")
    return a


class Image:
    """A 2-D image with dtype Gray, Rgb, or Rgba (u8 components)."""

    __slots__ = ("_np", "_dev", "_space")

    def __init__(self, rows=None, cols=None, color=None, dtype=None, _defer=False):
        if _defer:
            self._np = None
            self._dev = None
            self._space = "rgb"
            return
        rows = int(rows)
        cols = int(cols)
        if rows <= 0 or cols <= 0:
            raise ValueError("rows and cols must be positive")
        if dtype is not None:
            space = _dtype_space(dtype)
        elif color is None:
            space = "rgb"
        elif isinstance(color, (int, float)):
            space = "gray"
        elif isinstance(color, (tuple, list)):
            space = "rgba" if len(color) == 4 else "rgb"
        elif isinstance(color, Rgba):
            space = "rgba"
        else:
            space = "rgb"
        c = _SPACE_CHANNELS[space]
        arr = np.zeros((rows, cols, c), dtype=np.uint8)
        if color is not None:
            arr[:] = np.array(_parse_color(color, space), dtype=np.uint8)
        self._np = arr
        self._dev = None
        self._space = space

    # -- construction helpers ----------------------------------------------

    @classmethod
    def _from_host(cls, arr: np.ndarray, space: str) -> "Image":
        img = cls(_defer=True)
        img._np = arr
        img._dev = None
        img._space = space
        return img

    @classmethod
    def _from_device(cls, dev, space: str) -> "Image":
        img = cls(_defer=True)
        img._np = None
        img._dev = dev
        img._space = space
        return img

    @classmethod
    def from_numpy(cls, array) -> "Image":
        """Wrap a numpy uint8 array of shape [H, W, C] (C in 1/3/4).
        The array is borrowed, not copied — mutations are shared
        (reference: bindings/python/src/image/numpy_interop.zig)."""
        if not isinstance(array, np.ndarray):
            raise TypeError("from_numpy expects a numpy.ndarray")
        if array.dtype != np.uint8:
            raise TypeError("from_numpy requires a uint8 array")
        if not array.flags.writeable:
            raise ValueError(
                "from_numpy borrows the array and requires it to be writable "
                "(pass array.copy() for read-only data)"
            )
        if array.ndim == 3 and array.shape[2] in _CHANNELS_SPACE:
            return cls._from_host(array, _CHANNELS_SPACE[array.shape[2]])
        raise ValueError(
            "from_numpy requires shape (rows, cols, channels) with 1, 3, or 4 channels"
        )

    @classmethod
    def load(cls, path: str) -> "Image":
        """Load a PNG/JPEG/BMP/GIF file; dtype follows the file's content
        (reference: src/image.zig:247; bindings load)."""
        from .codecs import load_array

        arr = load_array(path)
        return cls._from_host(arr, _CHANNELS_SPACE[arr.shape[2]])

    @classmethod
    def load_from_bytes(cls, data) -> "Image":
        from .codecs import load_array_from_bytes

        arr = load_array_from_bytes(bytes(data))
        return cls._from_host(arr, _CHANNELS_SPACE[arr.shape[2]])

    def save(self, path: str, **options) -> None:
        """Save to PNG/JPEG/BMP/GIF chosen by extension
        (reference: src/image.zig:279)."""
        from .codecs import save_array

        save_array(path, self._host(), **options)

    # -- representation plumbing -------------------------------------------

    def _host(self) -> np.ndarray:
        """Materialize (and return) the authoritative host array."""
        if self._np is None:
            self._np = np.asarray(self._dev).copy()
            self._dev = None
        return self._np

    def _device(self):
        """The pixel data as a device array (uploads host data if present)."""
        import jax.numpy as jnp

        if self._np is not None:
            return jnp.asarray(np.ascontiguousarray(self._np))
        return self._dev

    # -- basic properties ---------------------------------------------------

    @property
    def rows(self) -> int:
        return (self._np if self._np is not None else self._dev).shape[0]

    @property
    def cols(self) -> int:
        return (self._np if self._np is not None else self._dev).shape[1]

    @property
    def channels(self) -> int:
        return _SPACE_CHANNELS[self._space]

    @property
    def dtype(self):
        return CLASS_BY_SPACE[self._space]

    def is_contiguous(self) -> bool:
        if self._np is None:
            return True
        return self._np.flags["C_CONTIGUOUS"]

    def get_rectangle(self) -> Rectangle:
        return Rectangle(0, 0, self.cols, self.rows)

    # -- numpy interop ------------------------------------------------------

    def to_numpy(self) -> np.ndarray:
        """Zero-copy [H, W, C] uint8 view of the pixel data; writes are
        reflected in the image."""
        return self._host()

    # -- copying / equality -------------------------------------------------

    def copy(self) -> "Image":
        if self._np is not None:
            return Image._from_host(self._np.copy(), self._space)
        return Image._from_device(self._dev, self._space)  # immutable

    dupe = copy

    def __eq__(self, other):
        if not isinstance(other, Image):
            return NotImplemented
        if self._space != other._space:
            return False
        a, b = self._host(), other._host()
        return a.shape == b.shape and np.array_equal(a, b)

    def __repr__(self):
        return f"Image({self.rows}x{self.cols}, dtype={self.dtype.__name__})"

    def __format__(self, spec):
        if spec in ("", "none"):
            return repr(self)
        from .terminal.display import format_image

        return format_image(self, spec)

    def __len__(self):
        return self.rows * self.cols

    def __iter__(self):
        return PixelIterator(self)

    # -- pixel access -------------------------------------------------------

    def _check_coords(self, row, col):
        if not (0 <= row < self.rows and 0 <= col < self.cols):
            raise IndexError(f"pixel ({row}, {col}) out of bounds")

    def __getitem__(self, key):
        if isinstance(key, tuple) and len(key) == 2:
            row, col = int(key[0]), int(key[1])
            self._check_coords(row, col)
            if self._space == "gray":
                return int(self._host()[row, col, 0])
            return _PixelProxy(self, row, col)
        raise TypeError("image indices must be a (row, col) tuple")

    def __setitem__(self, key, value):
        if isinstance(key, tuple) and len(key) == 2:
            row, col = int(key[0]), int(key[1])
            self._check_coords(row, col)
            px = _parse_color(value, self._space)
            self._host()[row, col] = np.array(px, dtype=np.uint8)
            return
        if isinstance(key, slice):
            if key != slice(None):
                raise TypeError("only full-slice assignment (img[:] = ...) is supported")
            if isinstance(value, Image):
                self._copy_from(value)
            else:
                self.fill(value)
            return
        raise TypeError("image indices must be (row, col) or [:]")

    def _copy_from(self, src: "Image"):
        """Full-image assignment with dtype conversion
        (reference: test_image.py slice-assignment semantics)."""
        if (src.rows, src.cols) != (self.rows, self.cols):
            raise ValueError("source image dimensions must match")
        data = _convert_array_u8(src._host(), src._space, self._space)
        self._host()[:] = data

    # -- mutation -----------------------------------------------------------

    def fill(self, color):
        px = _parse_color(color, self._space)
        self._host()[:] = np.array(px, dtype=np.uint8)

    def set_border(self, rect=None, color=None):
        """Fill everything outside `rect` with `color` (default zero)
        (reference: src/image.zig setBorder)."""
        if rect is None or isinstance(rect, (int, float)):
            raise TypeError("set_border requires a Rectangle or 4-tuple")
        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        if not isinstance(rect, Rectangle):
            raise TypeError("set_border requires a Rectangle or 4-tuple")
        px = (
            np.zeros(self.channels, dtype=np.uint8)
            if color is None
            else np.array(_parse_color(color, self._space), dtype=np.uint8)
        )
        arr = self._host()
        clipped = rect.intersect(self.get_rectangle())
        if clipped is None:
            arr[:] = px
            return
        l, t = int(clipped.left), int(clipped.top)
        r, b = int(clipped.right), int(clipped.bottom)
        arr[:t, :] = px
        arr[b:, :] = px
        arr[:, :l] = px
        arr[:, r:] = px

    # -- views --------------------------------------------------------------

    def view(self, rect) -> "Image":
        """Zero-copy sub-image view sharing memory with self
        (reference: src/image.zig:332)."""
        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        clipped = self.get_rectangle().intersect(rect)
        if clipped is None:
            raise ValueError("view rectangle does not intersect the image")
        l, t = int(clipped.left), int(clipped.top)
        r, b = int(clipped.right), int(clipped.bottom)
        return Image._from_host(self._host()[t:b, l:r], self._space)

    # -- dtype conversion ---------------------------------------------------

    def convert(self, dtype) -> "Image":
        space = _dtype_space(dtype)
        if space == self._space:
            return self.copy()
        if self._np is not None:
            return Image._from_host(
                _convert_array_u8(self._np, self._space, space), space
            )
        from .color._array import convert_u8_array

        return Image._from_device(
            convert_u8_array(self._dev, self._space, space), space
        )

    # -- simple ops ---------------------------------------------------------

    def invert(self) -> "Image":
        """Photographic negative; alpha preserved (reference: image.zig invert)."""
        arr = self._host()
        out = 255 - arr
        if self._space == "rgba":
            out[..., 3] = arr[..., 3]
        return Image._from_host(out, self._space)

    def flip_left_right(self) -> "Image":
        return Image._from_host(self._host()[:, ::-1].copy(), self._space)

    def flip_top_bottom(self) -> "Image":
        return Image._from_host(self._host()[::-1].copy(), self._space)

    def blend(self, overlay: "Image", mode: Blending = Blending.NORMAL) -> None:
        """In-place alpha compositing of `overlay` (RGBA) onto self
        (reference: bindings image blend; src/blending.zig)."""
        if not isinstance(overlay, Image):
            raise TypeError("overlay must be an Image")
        if (overlay.rows, overlay.cols) != (self.rows, self.cols):
            raise ValueError("overlay dimensions must match")
        over = _convert_array_u8(overlay._host(), overlay._space, "rgba")
        base = _convert_array_u8(self._host(), self._space, "rgba")
        f32 = np.float32
        out = blend_arrays(
            base.astype(f32) / f32(255.0), over.astype(f32) / f32(255.0),
            Blending(mode), xp=np,
        )
        out_u8 = np.floor(255.0 * np.clip(out.astype(np.float64), 0.0, 1.0) + 0.5)
        out_u8 = out_u8.astype(np.uint8)
        self._host()[:] = _convert_array_u8(out_u8, "rgba", self._space)

    # -- geometry ops (device path) ----------------------------------------

    def resize(self, size, method: Interpolation = Interpolation.BILINEAR) -> "Image":
        """Resize by scale factor (float) or to (rows, cols)
        (reference: src/image.zig:523-543; transforms binding)."""
        if isinstance(size, (int, float)) and not isinstance(size, bool):
            scale = float(size)
            if not np.isfinite(scale) or abs(scale) > 3.4e38:
                raise ValueError("Scale factor must be a finite number")
            if scale <= 0:
                raise ValueError("Scale factor must be positive")
            rows = int(np.round(np.float32(self.rows) * np.float32(scale)))
            cols = int(np.round(np.float32(self.cols) * np.float32(scale)))
            if rows == 0 or cols == 0:
                raise ValueError("resulting dimensions are zero")
        elif isinstance(size, (tuple, list)) and len(size) == 2:
            rows, cols = int(size[0]), int(size[1])
            if rows <= 0 or cols <= 0:
                raise ValueError("Size must be positive")
        else:
            raise TypeError("size must be a scale factor or a (rows, cols) tuple")
        method = Interpolation(method)
        # transfer-aware placement: a host-resident image with a
        # bit-identical host lowering skips the device round-trip when the
        # link cost exceeds host compute (placement.py; remote-tunnel CLI)
        if self._np is not None and self._dev is None:
            from .ops.host_resize import (HOST_COST, host_resize_available,
                                          host_resize_u8)
            from .placement import prefer_host

            nb_in = self._np.nbytes
            nb_out = rows * cols * self._np.shape[2]
            # auto placement must never change output bytes. The five
            # integer-exact methods are bit-identical host vs device;
            # Lanczos is NOT — XLA's fma contraction of its float
            # accumulate is SHAPE-DEPENDENT on TPU (audit r5: the fmaf
            # host twin matches at 222x257->111x128 but not at
            # 623x881->400x560 or ->450x520, +-1 on isolated pixels),
            # so Lanczos routes host only under an explicit
            # ZT_PLACEMENT=host
            auto_ok = (method is not Interpolation.LANCZOS
                       or os.environ.get("ZT_PLACEMENT") == "host")
            if auto_ok and host_resize_available(method) and prefer_host(
                    nb_in, nb_out,
                    (nb_in + nb_out) / self._np.shape[2] / 1e6
                    * HOST_COST[method]):
                return Image._from_host(
                    host_resize_u8(self._np, rows, cols, method), self._space)
        from .ops.interpolation import resize as resize_op

        out = resize_op(self._device(), rows, cols, method)
        return Image._from_device(out, self._space)

    def letterbox(self, size, method: Interpolation = Interpolation.BILINEAR) -> "Image":
        """Aspect-preserving resize centered on a padded canvas
        (reference: src/image/transforms.zig:49-108)."""
        if isinstance(size, (int, float)) and not isinstance(size, bool):
            rows = cols = int(size)
        elif isinstance(size, (tuple, list)) and len(size) == 2:
            rows, cols = int(size[0]), int(size[1])
        else:
            raise TypeError("size must be an int or a (rows, cols) tuple")
        if rows <= 0 or cols <= 0:
            raise ValueError("Size must be positive")
        import jax.numpy as jnp

        f32 = np.float32
        rows_scale = f32(rows) / f32(self.rows)
        cols_scale = f32(cols) / f32(self.cols)
        if rows_scale == cols_scale:
            return self.resize((rows, cols), method)
        aspect = min(rows_scale, cols_scale)
        scaled_rows = max(1, int(np.round(aspect * f32(self.rows))))
        scaled_cols = max(1, int(np.round(aspect * f32(self.cols))))
        off_r = (rows - scaled_rows) // 2
        off_c = (cols - scaled_cols) // 2
        from .ops.interpolation import resize as resize_op

        content = resize_op(self._device(), scaled_rows, scaled_cols, Interpolation(method))
        canvas = jnp.zeros((rows, cols, self.channels), dtype=jnp.uint8)
        canvas = canvas.at[off_r:off_r + scaled_rows, off_c:off_c + scaled_cols].set(content)
        return Image._from_device(canvas, self._space)

    def rotate(self, angle, method: Interpolation = Interpolation.BILINEAR,
               border: BorderMode = BorderMode.ZERO) -> "Image":
        """Rotate around center (radians, CCW); output auto-sized to fit
        (reference: image.zig:558; transforms.zig:112-213)."""
        angle = float(angle)
        if not np.isfinite(angle) or abs(angle) > 3.4e38:
            raise ValueError("Angle must be a finite number")
        from .ops.warp import rotate as rotate_op, rotate_bounds

        rows, cols = rotate_bounds(self.rows, self.cols, angle)
        out = rotate_op(self._device(), angle, rows, cols,
                        Interpolation(method), BorderMode(border))
        return Image._from_device(out, self._space)

    def crop(self, rect) -> "Image":
        """Crop a rectangle; out-of-bounds fills black
        (reference: transforms.zig:216-222)."""
        rect = self._coerce_rect(rect)
        rows = int(_round_half_away_f32(rect.height))
        cols = int(_round_half_away_f32(rect.width))
        if rows == 0 or cols == 0:
            raise ValueError("crop rectangle is empty")
        return self.extract(rect, 0.0, (rows, cols), Interpolation.NEAREST)

    def extract(self, rect, angle: float = 0.0, size=None,
                method: Interpolation = Interpolation.BILINEAR,
                border: BorderMode = BorderMode.ZERO) -> "Image":
        """Extract a rotated rect, resampled to `size`
        (reference: transforms.zig:231-283)."""
        rect = self._coerce_rect(rect)
        if size is None:
            rows = max(1, int(_round_half_away_f32(rect.height)))
            cols = max(1, int(_round_half_away_f32(rect.width)))
        elif isinstance(size, (int, float)):
            rows = cols = int(size)
        else:
            rows, cols = int(size[0]), int(size[1])
        if rows <= 0 or cols <= 0:
            raise ValueError("size must be positive")
        from .ops.warp import extract as extract_op

        out = extract_op(
            self._device(),
            (rect.left, rect.top, rect.right, rect.bottom),
            float(angle), rows, cols, Interpolation(method), BorderMode(border),
        )
        return Image._from_device(out, self._space)

    def insert(self, source: "Image", rect, angle: float = 0.0,
               method: Interpolation = Interpolation.BILINEAR,
               blend_mode: Blending = Blending.NONE) -> None:
        """Insert `source` into self at a rotated rect (in place)
        (reference: transforms.zig:293-380)."""
        if not isinstance(source, Image):
            raise TypeError("source must be an Image")
        rect = self._coerce_rect(rect)
        from .ops.warp import insert_region

        mode = Blending(blend_mode)
        if mode != Blending.NONE and source._space == "rgba":
            src_dev = source._device()
        else:
            src_dev = source.convert(self.dtype)._device()
            mode = Blending.NONE
        out = insert_region(
            self._device(), src_dev,
            (rect.left, rect.top, rect.right, rect.bottom),
            float(angle), Interpolation(method), mode,
        )
        self._host()[:] = np.asarray(out)

    def warp(self, transform, shape=None,
             method: Interpolation = Interpolation.BILINEAR) -> "Image":
        """Backward-map through a geometric transform
        (reference: image.zig:621; transforms.zig:522)."""
        from .geometry.transforms import (
            AffineTransform, ProjectiveTransform, SimilarityTransform,
        )

        if not isinstance(transform, (SimilarityTransform, AffineTransform,
                                      ProjectiveTransform)):
            raise TypeError("transform must be a Similarity/Affine/Projective transform")
        if shape is None:
            rows, cols = self.rows, self.cols
        else:
            rows, cols = int(shape[0]), int(shape[1])
        import os

        method = Interpolation(method)
        if (method in (Interpolation.NEAREST, Interpolation.BILINEAR)
                and os.environ.get("ZT_WARP_STATIC", "1") != "0"):
            # transform objects are host data: trace-time coords ride
            # the tiled packed-patch path (~4-15x the runtime gathers).
            # Each distinct matrix traces once (jit-cached); set
            # ZT_WARP_STATIC=0 for many-distinct-matrix workloads where
            # recompiles would dominate.
            from .ops.warp import warp_static

            key = tuple(map(tuple, np.asarray(
                transform.homogeneous(), np.float32).tolist()))
            out = warp_static(self._device(), key, rows, cols, method)
        else:
            from .ops.warp import warp as warp_op

            out = warp_op(self._device(), transform.homogeneous(), rows,
                          cols, method)
        return Image._from_device(out, self._space)

    def _coerce_rect(self, rect) -> Rectangle:
        if isinstance(rect, (tuple, list)) and len(rect) == 4:
            return Rectangle(*rect)
        if isinstance(rect, Rectangle):
            return rect
        raise TypeError("expected a Rectangle or (l, t, r, b) tuple")

    # -- filtering (device path) -------------------------------------------

    def box_blur(self, radius: int) -> "Image":
        """Box blur via summed-area table (reference: image.zig:635)."""
        radius = int(radius)
        if radius < 0:
            raise ValueError("radius must be non-negative")
        if radius == 0:
            return self.copy()
        from .ops.integral import box_blur as op

        return Image._from_device(op(self._device(), radius), self._space)

    def sharpen(self, radius: int) -> "Image":
        """Unsharp mask 2*orig - box_blur (reference: image.zig:785)."""
        radius = int(radius)
        if radius < 0:
            raise ValueError("radius must be non-negative")
        if radius == 0:
            return self.copy()
        from .ops.integral import sharpen as op

        return Image._from_device(op(self._device(), radius), self._space)

    def gaussian_blur(self, sigma: float) -> "Image":
        """Separable Gaussian blur, radius=ceil(3*sigma)
        (reference: image.zig:954)."""
        sigma = float(sigma)
        if not (sigma > 0) or not np.isfinite(sigma):
            raise ValueError("sigma must be positive and finite")
        from .ops.convolution import gaussian_blur as op

        return Image._from_device(op(self._device(), sigma), self._space)

    def convolve(self, kernel,
                 border: BorderMode = BorderMode.MIRROR) -> "Image":
        """2-D convolution with an arbitrary kernel (reference:
        image.zig:917 convolve). u8 images use the reference's 8.8
        fixed-point path bit-exactly; float images use f32."""
        k = np.asarray(kernel, dtype=np.float32)
        if k.ndim != 2 or k.shape[0] % 2 == 0 or k.shape[1] % 2 == 0:
            raise ValueError("kernel must be 2-D with odd dimensions")
        ktup = tuple(tuple(float(v) for v in row) for row in k)
        from .ops.convolution import convolve2d as op

        return Image._from_device(
            op(self._device(), ktup, BorderMode(border)), self._space)

    def convolve_separable(self, kernel_x, kernel_y,
                           border: BorderMode = BorderMode.MIRROR) -> "Image":
        """Separable convolution with 1-D kernels (reference:
        image.zig:935 convolveSeparable)."""
        kx = np.asarray(kernel_x, dtype=np.float32)
        ky = np.asarray(kernel_y, dtype=np.float32)
        if kx.ndim != 1 or ky.ndim != 1 or len(kx) % 2 == 0 \
                or len(ky) % 2 == 0:
            raise ValueError("kernels must be 1-D with odd length")
        from .ops.convolution import convolve_separable as op

        return Image._from_device(
            op(self._device(), tuple(float(v) for v in kx),
               tuple(float(v) for v in ky), BorderMode(border)),
            self._space)

    def _order_stat(self, op_name, radius, border, **kw):
        radius = int(radius)
        if radius < 0:
            raise ValueError("radius must be non-negative")
        if radius == 0:
            return self.copy()
        from .ops import order_stat as O

        fn = {"median": O.median_blur, "percentile": O.percentile_blur,
              "min": O.min_blur, "max": O.max_blur,
              "midpoint": O.midpoint_blur,
              "alpha_trimmed": O.alpha_trimmed_mean_blur}[op_name]
        if op_name == "median":
            out = fn(self._device(), radius)
        elif op_name == "percentile":
            out = fn(self._device(), radius, kw["percentile"], BorderMode(border))
        elif op_name == "alpha_trimmed":
            out = fn(self._device(), radius, kw["trim_fraction"], BorderMode(border))
        else:
            out = fn(self._device(), radius, BorderMode(border))
        return Image._from_device(out, self._space)

    def median_blur(self, radius: int) -> "Image":
        """Median filter (reference: image.zig:653)."""
        return self._order_stat("median", radius, BorderMode.MIRROR)

    def percentile_blur(self, radius: int, percentile: float,
                        border: BorderMode = BorderMode.MIRROR) -> "Image":
        """Percentile filter (reference: image.zig:672)."""
        percentile = float(percentile)
        if not 0.0 <= percentile <= 1.0:
            raise ValueError("percentile must be in [0, 1]")
        return self._order_stat("percentile", radius, border, percentile=percentile)

    def min_blur(self, radius: int, border: BorderMode = BorderMode.MIRROR) -> "Image":
        return self._order_stat("min", radius, border)

    def max_blur(self, radius: int, border: BorderMode = BorderMode.MIRROR) -> "Image":
        return self._order_stat("max", radius, border)

    def midpoint_blur(self, radius: int,
                      border: BorderMode = BorderMode.MIRROR) -> "Image":
        return self._order_stat("midpoint", radius, border)

    def alpha_trimmed_mean_blur(self, radius: int, trim_fraction: float,
                                border: BorderMode = BorderMode.MIRROR) -> "Image":
        trim_fraction = float(trim_fraction)
        if not np.isfinite(trim_fraction) or not 0.0 <= trim_fraction < 0.5:
            raise ValueError("trim_fraction must be in [0, 0.5)")
        return self._order_stat("alpha_trimmed", radius, border,
                                trim_fraction=trim_fraction)

    def motion_blur(self, config) -> "Image":
        """Linear or radial motion blur (reference: image.zig:1077)."""
        from .motion_blur import MotionBlur
        from .ops.motion_blur_ops import linear_motion_blur, radial_blur

        if not isinstance(config, MotionBlur):
            raise TypeError("motion_blur expects a MotionBlur configuration")
        dev = self._device()
        if config.kind == "linear":
            out = linear_motion_blur(dev, config.angle, config.distance)
        else:
            out = radial_blur(dev, config.center_x, config.center_y,
                              config.strength, config.kind == "zoom")
        return Image._from_device(out, self._space)

    def sobel(self) -> "Image":
        """Sobel gradient magnitude as a grayscale image
        (reference: image.zig:999; edges.zig:29)."""
        from .ops.convolution import sobel_magnitude

        gray = self._gray_f32()
        out = sobel_magnitude(gray)
        return Image._from_device(out[..., None], "gray")

    def canny(self, sigma: float = 1.4, low: float = 50, high: float = 150) -> "Image":
        """Canny edge detection -> binary gray image
        (reference: image.zig:1047; edges.zig:212)."""
        sigma, low, high = float(sigma), float(low), float(high)
        for v in (sigma, low, high):
            if not np.isfinite(v):
                raise ValueError("parameters must be finite numbers")
        if sigma < 0:
            raise ValueError("sigma must be non-negative")
        if low < 0 or high < 0 or low >= high:
            raise ValueError("thresholds must satisfy 0 <= low < high")
        from .ops.edges import canny as op

        out = op(self._gray_f32(), sigma, low, high)
        return Image._from_device(out[..., None], "gray")

    def shen_castan(self, smooth: float = 0.9, window_size: int = 7,
                    high_ratio: float = 0.99, low_rel: float = 0.5,
                    hysteresis: bool = True, use_nms: bool = False) -> "Image":
        """Shen-Castan (ISEF) edge detection -> binary gray image
        (reference: image.zig:1015; ShenCastan.zig)."""
        smooth = float(smooth)
        window_size = int(window_size)
        high_ratio = float(high_ratio)
        low_rel = float(low_rel)
        if not 0 < smooth < 1:
            raise ValueError("smooth must be in (0, 1)")
        if window_size % 2 == 0:
            raise ValueError("window_size must be odd")
        if window_size < 3:
            raise ValueError("window_size must be >= 3")
        if not 0 < high_ratio < 1:
            raise ValueError("high_ratio must be in (0, 1)")
        if not 0 < low_rel < 1:
            raise ValueError("low_rel must be in (0, 1)")
        from .ops.edges import shen_castan as op

        out = op(self._gray_f32(), smooth, window_size, high_ratio, low_rel,
                 bool(hysteresis), bool(use_nms))
        return Image._from_device(out[..., None], "gray")

    def _gray_f32(self):
        """Luminance plane as 0-255 float (u8 fixed-point path then cast)."""
        import jax.numpy as jnp

        dev = self._device()
        if self._space == "gray":
            return dev[..., 0].astype(jnp.float32)
        from .color._array import rgb_to_gray_u8

        return rgb_to_gray_u8(dev[..., :3])[..., 0].astype(jnp.float32)

    def display(self, format: str = "auto") -> str:
        """Terminal rendering escape sequence (reference: image.zig:462;
        image/display.zig). Formats: auto/kitty/iterm2/sixel/sgr/braille."""
        from .terminal.display import format_image

        return format_image(self, format)

    def apply_colormap(self, colormap) -> "Image":
        """Map intensities through a colormap -> RGB image
        (reference: image.zig:1190; colormaps.zig)."""
        from .colormaps import Colormap

        if not isinstance(colormap, Colormap):
            raise TypeError("apply_colormap expects a Colormap")
        out = colormap.apply_plane(self._gray_u8_plane())
        return Image._from_device(out, "rgb")

    def flood_fill(self, row: int, col: int, fill_value, threshold: float = 0.0,
                   connectivity: int = 4, mode=None) -> None:
        """In-place flood fill from a seed pixel
        (reference: image.zig:831; flood_fill.zig)."""
        from .enums import ThresholdMode

        row, col = int(row), int(col)
        if not (0 <= row < self.rows and 0 <= col < self.cols):
            raise ValueError("seed coordinates out of bounds")
        if connectivity not in (4, 8):
            raise ValueError("connectivity must be 4 or 8")
        mode = ThresholdMode.SEED if mode is None else ThresholdMode(mode)
        threshold = float(threshold)
        fill_px = np.array(_parse_color(fill_value, self._space), dtype=np.uint8)

        arr = self._host()
        if arr.shape[0] * arr.shape[1] > 4096:
            # device path: while_loop mask propagation with run-scan
            # acceleration (ops/flood_fill.py); the host loop below is
            # O(region diameter) full-image passes — fine for tiny
            # images, pathological at megapixel scale (VERDICT r1 #4)
            import jax.numpy as jnp

            from .enums import ThresholdMode as TM
            from .ops.flood_fill import flood_region, threshold_sq_int

            mask = np.asarray(flood_region(
                jnp.asarray(arr), row, col, threshold_sq_int(threshold),
                connectivity=connectivity,
                neighbor_mode=(mode == TM.NEIGHBOR)))
            arr[mask] = fill_px
            return
        img = arr.astype(np.float64)
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            offsets += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

        def shifted(a, dr, dc, fill=np.inf):
            out = np.full_like(a, fill)
            h, w = a.shape[:2]
            rs = slice(max(dr, 0), h + min(dr, 0))
            rd = slice(max(-dr, 0), h + min(-dr, 0))
            cs = slice(max(dc, 0), w + min(dc, 0))
            cd = slice(max(-dc, 0), w + min(-dc, 0))
            out[rd, cd] = a[rs, cs]
            return out

        region = np.zeros(arr.shape[:2], dtype=bool)
        region[row, col] = True
        if mode == ThresholdMode.SEED:
            seed_val = img[row, col]
            dist = np.sqrt(((img - seed_val) ** 2).sum(axis=-1))
            candidates = dist <= threshold
            candidates[row, col] = True
            while True:
                grown = region.copy()
                for dr, dc in offsets:
                    grown |= shifted(region.astype(np.float64)[..., None],
                                     dr, dc, 0.0)[..., 0] > 0
                grown &= candidates
                if (grown == region).all():
                    break
                region = grown
        else:  # NEIGHBOR: compare against the neighbor spread from
            while True:
                grown = region.copy()
                for dr, dc in offsets:
                    nb_in_region = shifted(region.astype(np.float64)[..., None],
                                           dr, dc, 0.0)[..., 0] > 0
                    nb_val = shifted(img, dr, dc)
                    dist = np.sqrt(((img - nb_val) ** 2).sum(axis=-1))
                    grown |= nb_in_region & (dist <= threshold)
                if (grown == region).all():
                    break
                region = grown
        arr[region] = fill_px

    # -- thresholding & morphology -----------------------------------------

    def threshold_otsu(self):
        """Otsu binarization -> (binary gray Image, threshold)
        (reference: image.zig:845; binary.zig:38)."""
        from .ops.binary import otsu_threshold, threshold_apply

        plane = self._gray_u8_plane()
        t = otsu_threshold(plane)
        binary = threshold_apply(plane, t)
        return Image._from_device(binary[..., None], "gray"), int(t)

    def threshold_adaptive_mean(self, radius: int = 6, c: float = 5.0):
        """Adaptive mean threshold via integral image
        (reference: image.zig:858; binary.zig:86)."""
        radius = int(radius)
        if radius <= 0:
            raise ValueError("radius must be positive")
        from .ops.binary import adaptive_mean_threshold

        out = adaptive_mean_threshold(self._gray_u8_plane(), radius, float(c))
        return Image._from_device(out[..., None], "gray")

    def _morph(self, op_name: str, kernel_size: int, iterations: int):
        kernel_size = int(kernel_size)
        iterations = int(iterations)
        if kernel_size < 3 or kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd and >= 3")
        if iterations < 0:
            raise ValueError("iterations must be non-negative")
        if iterations == 0:
            return self.copy()
        from .ops import binary as B

        op = {"dilate": B.dilate, "erode": B.erode,
              "open": B.open_morph, "close": B.close_morph}[op_name]
        out = op(self._gray_u8_plane(), kernel_size, iterations)
        return Image._from_device(out[..., None], "gray")

    def dilate_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("dilate", kernel_size, iterations)

    def erode_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("erode", kernel_size, iterations)

    def open_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("open", kernel_size, iterations)

    def close_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("close", kernel_size, iterations)

    def _gray_u8_plane(self):
        dev = self._device()
        if self._space == "gray":
            return dev[..., 0]
        from .color._array import rgb_to_gray_u8

        return rgb_to_gray_u8(dev[..., :3])[..., 0]

    # -- enhancement ---------------------------------------------------------

    def autocontrast(self, cutoff: float = 0.0) -> "Image":
        """Contrast stretch ignoring `cutoff` fraction per end
        (reference: image.zig:804; enhancement.zig:11)."""
        cutoff = float(cutoff)
        if cutoff < 0 or cutoff >= 0.5:
            raise ValueError("cutoff must be in [0, 0.5)")
        from .ops.enhancement import autocontrast as op

        return Image._from_device(op(self._device(), cutoff), self._space)

    def equalize(self) -> "Image":
        """Histogram equalization per channel
        (reference: image.zig:824; enhancement.zig:84)."""
        from .ops.enhancement import equalize as op

        return Image._from_device(op(self._device()), self._space)

    def histogram(self):
        """Per-channel 256-bin histogram (reference: image.zig:1161)."""
        from .histogram import Histogram

        return Histogram.from_image(self)

    # -- metrics ------------------------------------------------------------

    def ssim(self, other: "Image") -> float:
        """Mean SSIM over 11x11 Gaussian windows
        (reference: image.zig:1126; metrics.zig:56)."""
        self._check_same(other)
        if self.rows < 11 or self.cols < 11:
            raise ValueError("images must be at least 11x11 for SSIM")
        from .ops.metrics import ssim as op

        return float(op(self._device(), other._device()))

    def psnr(self, other: "Image") -> float:
        """Peak signal-to-noise ratio in dB (reference: src/image/metrics.zig:10)."""
        self._check_same(other)
        a = self._host().astype(np.float64)
        b = other._host().astype(np.float64)
        mse = np.mean((a - b) ** 2)
        if mse == 0:
            return float("inf")
        return float(10.0 * np.log10(255.0**2 / mse))

    def diff(self, other: "Image", threshold: float = 0.0, scale: float = 1.0,
             binary: bool = False, force_opaque: bool = False):
        """Per-pixel difference visualization + stats -> (Image, DiffResult)
        (reference: src/image.zig:1139 diff, src/image/diff.zig:27)."""
        self._check_same(other)
        from .ops.diff import DiffOptions, compute

        vis, result = compute(
            self._host(), other._host(),
            DiffOptions(threshold=threshold, scale=scale, binary=binary,
                        force_opaque=force_opaque),
        )
        return Image._from_host(vis, self._space), result

    def mean_pixel_error(self, other: "Image") -> float:
        """Mean absolute pixel error normalized to [0, 1]
        (reference: src/image/metrics.zig:114)."""
        self._check_same(other)
        a = self._host().astype(np.float64)
        b = other._host().astype(np.float64)
        return float(np.mean(np.abs(a - b)) / 255.0)

    def _check_same(self, other):
        if not isinstance(other, Image):
            raise TypeError("expected an Image")
        if (other.rows, other.cols) != (self.rows, self.cols):
            raise ValueError("image dimensions must match")
        if other._space != self._space:
            raise ValueError("image dtypes must match")


class _PixelProxy:
    """Mutable view of one RGB(A) pixel (reference:
    bindings/python/src/pixel_proxy.zig)."""

    __slots__ = ("_img", "_row", "_col")

    def __init__(self, img, row, col):
        object.__setattr__(self, "_img", img)
        object.__setattr__(self, "_row", row)
        object.__setattr__(self, "_col", col)

    def _values(self):
        return tuple(int(v) for v in self._img._host()[self._row, self._col])

    @property
    def _fields(self):
        return ("r", "g", "b", "a")[: self._img.channels]

    def __getattr__(self, name):
        fields = ("r", "g", "b", "a")[: object.__getattribute__(self, "_img").channels]
        if name in fields:
            img = object.__getattribute__(self, "_img")
            return int(img._host()[self._row, self._col, fields.index(name)])
        raise AttributeError(name)

    def __setattr__(self, name, value):
        fields = self._fields
        if name in fields:
            if not (isinstance(value, int) and 0 <= value <= 255):
                raise ValueError("component must be an integer in 0-255")
            self._img._host()[self._row, self._col, fields.index(name)] = value
            return
        raise AttributeError(name)

    def item(self):
        cls = CLASS_BY_SPACE[self._img._space]
        return cls._new_unchecked(list(self._values()))

    def to(self, target):
        return self.item().to(target)

    def blend(self, overlay, mode: Blending = Blending.NORMAL):
        """Blend overlay into this pixel in place; returns the new color."""
        out = self.item().blend(overlay, mode)
        self._img._host()[self._row, self._col] = np.array(out._v, dtype=np.uint8)
        return out

    def __eq__(self, other):
        if isinstance(other, (tuple, list)):
            return self._values() == tuple(other)
        if isinstance(other, _PixelProxy):
            return self._values() == other._values()
        if isinstance(other, _Color):
            return self.item() == other
        return NotImplemented

    def __repr__(self):
        return repr(self.item())

    def __format__(self, spec):
        if spec == "sgr":
            rgb = self.to(Rgb)
            return f"\x1b[48;2;{rgb.r};{rgb.g};{rgb.b}m  \x1b[0m"
        return format(self.item(), spec)


class PixelIterator:
    """Row-major pixel iterator yielding (row, col, pixel)
    (reference: src/image/PixelIterator.zig)."""

    __slots__ = ("_img", "_idx")

    def __init__(self, img):
        self._img = img
        self._idx = 0

    def __iter__(self):
        return self

    def __next__(self):
        img = self._img
        if self._idx >= len(img):
            raise StopIteration
        row, col = divmod(self._idx, img.cols)
        self._idx += 1
        arr = img._host()
        if img._space == "gray":
            px = int(arr[row, col, 0])
        else:
            px = CLASS_BY_SPACE[img._space]._new_unchecked(
                [int(v) for v in arr[row, col]]
            )
        return (row, col, px)
