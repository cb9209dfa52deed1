"""ImageBatch — the batched, sharding-carrying image container.

SURVEY §2 L3 names the central TPU redesign of the reference's pixel
container (/root/reference/src/image.zig:97-1248): "``Image`` becomes a
batched HBM device array [B, H, W, C] with host-side metadata", and
SURVEY §5 requires the batch type to "carry a Sharding so every op is
collective-transparent". ``Image`` (image.py) keeps the single-image
mutation/introspection surface; ``ImageBatch`` is the production
container: a u8 ``[B, H, W, C]`` jax.Array plus a colorspace tag and an
optional ``jax.sharding.Mesh``, with the Image op surface lifted over
the batch.

Sharding model (mesh axis ORDER is the contract):

- 1-D mesh ``(batch,)``: images are sharded over the axis; every op is
  shard-local (per-image independence), zero collectives.
- 2-D mesh ``(batch, space)``: images sharded over the first axis AND
  rows sharded over the second — the large-image serving layout.
  Pointwise ops stay local; windowed fixed-shape ops route through
  ``parallel.spatial_op_2d`` (halo ``ppermute`` rides the ICI ring);
  the clamped-window box family uses dedicated exact bodies
  (``parallel.spatial._sharded_box_sums_2d``); histogram-based global
  ops psum partial histograms. Shape-changing ops (resize/rotate/warp)
  require batch-only sharding and raise a clear error.

Every lifted op is bit-exact vs the single-device op on the same pixels
(tests/test_image_batch.py sweeps the surface on an 8-device CPU mesh
and additionally asserts the compiled HLO of batch-sharded ops contains
no all-gather/all-reduce).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .color._classes import CLASS_BY_SPACE
from .enums import BorderMode, Interpolation
from .image import Image, _CHANNELS_SPACE, _SPACE_CHANNELS, _dtype_space

__all__ = ["ImageBatch"]

# jitted-callable cache: one entry per (op name, trace-time params, mesh)
# so chained calls never rebuild/retrace (jax.jit's own cache handles
# shape polymorphism under each entry)
_JIT: dict = {}

# the most recent (jitted callable, args) — lowered on demand by
# tests/tools to inspect the compiled HLO for collectives
_LAST = None


def _cached(key, build):
    fn = _JIT.get(key)
    if fn is None:
        fn = _JIT[key] = build()
    return fn


def _run(fn, *args):
    global _LAST
    _LAST = (fn, args)
    return fn(*args)


def resize_blur_oklab_fn(rows: int, cols: int, sigma: float, method,
                         mesh=None):
    """The cached jitted callable behind ImageBatch.resize_blur_oklab —
    exposed so the driver entry (__graft_entry__.entry) compile-checks
    exactly what the container dispatches. mesh=None: the plain fused
    chain; a 1-D mesh: shard_map'd per-shard chain (collective-free)."""
    import jax

    def build():
        from .pipeline import resize_blur_oklab as chain

        if mesh is None:
            return jax.jit(partial(chain, out_rows=rows, out_cols=cols,
                                   sigma=sigma, method=method))
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        spec = P(mesh.axis_names[0], None, None, None)
        return jax.jit(shard_map(
            lambda local: chain(local, out_rows=rows, out_cols=cols,
                                sigma=sigma, method=method),
            mesh=mesh, in_specs=spec, out_specs=spec))

    return _cached(("rbo", rows, cols, sigma, method, mesh), build)


def last_compiled_hlo() -> str:
    """Compiled HLO text of the most recent ImageBatch op dispatch
    (sharding-aware: lowering sees the committed input shardings)."""
    fn, args = _LAST
    return fn.lower(*args).compile().as_text()


class ImageBatch:
    """A batch of same-shape images: u8 [B, H, W, C] on device, with an
    optional device mesh carried so every op stays collective-transparent."""

    __slots__ = ("_dev", "_space", "_mesh")

    def __init__(self, array, dtype=None, mesh=None, _space=None):
        import jax.numpy as jnp

        if _space is not None:
            space = _space
        elif dtype is not None:
            space = _dtype_space(dtype)
        else:
            space = None
        if hasattr(array, "ndim"):
            if array.ndim != 4:
                raise ValueError("ImageBatch expects a [B, H, W, C] array")
            c = array.shape[-1]
            if space is None:
                if c not in _CHANNELS_SPACE:
                    raise ValueError("channel count must be 1, 3, or 4")
                space = _CHANNELS_SPACE[c]
            elif _SPACE_CHANNELS[space] != c:
                raise ValueError(
                    f"dtype {space} expects {_SPACE_CHANNELS[space]} "
                    f"channels, array has {c}")
        else:
            raise TypeError("ImageBatch expects a numpy or jax array")
        if getattr(array, "dtype", None) != np.uint8 and array.dtype != jnp.uint8:
            raise TypeError("ImageBatch requires uint8 pixel data")
        self._space = space
        self._mesh = None
        self._dev = jnp.asarray(np.ascontiguousarray(array)) \
            if isinstance(array, np.ndarray) else array
        if mesh is not None:
            self._place(mesh)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_images(cls, images, mesh=None) -> "ImageBatch":
        """Stack a list of same-shape, same-dtype Images."""
        if not images:
            raise ValueError("from_images requires at least one image")
        if not all(isinstance(im, Image) for im in images):
            raise TypeError("from_images expects a list of Image")
        space = images[0]._space
        shape = (images[0].rows, images[0].cols)
        for im in images[1:]:
            if im._space != space or (im.rows, im.cols) != shape:
                raise ValueError(
                    "all images must share shape and dtype (use "
                    ".convert()/.resize() first)")
        arr = np.stack([im.to_numpy() for im in images])
        return cls(arr, mesh=mesh, _space=space)

    @classmethod
    def from_numpy(cls, array, mesh=None) -> "ImageBatch":
        if not isinstance(array, np.ndarray):
            raise TypeError("from_numpy expects a numpy.ndarray")
        return cls(array, mesh=mesh)

    @classmethod
    def from_paths(cls, paths, shape=None, interpolation=None, mesh=None,
                   workers: int = 8) -> "ImageBatch":
        """Decode files in parallel (io_pipeline) into one batch; pass
        ``shape`` to resize each image so the batch is uniform."""
        from .io_pipeline import load_image_batch

        arr = load_image_batch(paths, shape=shape,
                               interpolation=interpolation, workers=workers)
        return cls(np.asarray(arr), mesh=mesh)

    # -- mesh plumbing -------------------------------------------------------

    def _place(self, mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        names = mesh.axis_names
        if len(names) not in (1, 2):
            raise ValueError(
                "ImageBatch supports a 1-D (batch,) or 2-D (batch, space) "
                f"mesh; got axes {names}")
        sizes = dict(zip(names, mesh.devices.shape))
        b, h = self._dev.shape[0], self._dev.shape[1]
        if b % sizes[names[0]] != 0:
            raise ValueError(
                f"batch size {b} not divisible by mesh axis "
                f"'{names[0]}' ({sizes[names[0]]} devices)")
        if len(names) == 2:
            if h % sizes[names[1]] != 0:
                raise ValueError(
                    f"image height {h} not divisible by mesh axis "
                    f"'{names[1]}' ({sizes[names[1]]} devices)")
            spec = P(names[0], names[1], None, None)
        else:
            spec = P(names[0], None, None, None)
        self._mesh = mesh
        self._dev = jax.device_put(self._dev, NamedSharding(mesh, spec))

    def with_mesh(self, mesh) -> "ImageBatch":
        """Return the same pixels placed on ``mesh`` (shards the batch
        axis; a 2-D mesh also shards image rows)."""
        out = ImageBatch.__new__(ImageBatch)
        out._dev = self._dev
        out._space = self._space
        out._mesh = None
        out._place(mesh)
        return out

    @property
    def mesh(self):
        return self._mesh

    @property
    def sharding(self):
        return getattr(self._dev, "sharding", None)

    def _axes(self):
        """(batch_axis, space_axis_or_None) of the carried mesh."""
        names = self._mesh.axis_names
        return names[0], (names[1] if len(names) == 2 else None)

    def _space_sharded(self) -> bool:
        return self._mesh is not None and len(self._mesh.axis_names) == 2

    def _mesh_key(self):
        return self._mesh  # jax.sharding.Mesh is hashable

    def _wrap(self, dev, space=None) -> "ImageBatch":
        out = ImageBatch.__new__(ImageBatch)
        out._dev = dev
        out._space = space or self._space
        out._mesh = self._mesh
        return out

    # -- metadata / interop --------------------------------------------------

    @property
    def batch_size(self) -> int:
        return self._dev.shape[0]

    @property
    def rows(self) -> int:
        return self._dev.shape[1]

    @property
    def cols(self) -> int:
        return self._dev.shape[2]

    @property
    def channels(self) -> int:
        return self._dev.shape[3]

    @property
    def dtype(self):
        return CLASS_BY_SPACE[self._space]

    def __len__(self) -> int:
        return self.batch_size

    def __repr__(self):
        shard = ""
        if self._mesh is not None:
            shard = f", mesh={'x'.join(map(str, self._mesh.devices.shape))}" \
                    f" {self._mesh.axis_names}"
        return (f"ImageBatch({self.batch_size}x{self.rows}x{self.cols}, "
                f"dtype={self.dtype.__name__}{shard})")

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self._dev)

    def device_array(self):
        """The underlying [B, H, W, C] jax.Array (no copy)."""
        return self._dev

    def block_until_ready(self) -> "ImageBatch":
        self._dev.block_until_ready()
        return self

    def __getitem__(self, i) -> Image:
        i = int(i)
        if not -self.batch_size <= i < self.batch_size:
            raise IndexError("batch index out of range")
        return Image._from_host(np.asarray(self._dev[i]), self._space)

    def to_images(self):
        arr = self.to_numpy()
        return [Image._from_host(arr[i].copy(), self._space)
                for i in range(arr.shape[0])]

    def copy(self) -> "ImageBatch":
        """Same pixels and placement (jax arrays are immutable, so this
        is O(1) — mirrors Image.copy's device branch)."""
        return self._wrap(self._dev)

    def get_rectangle(self):
        from .rectangle import Rectangle

        return Rectangle(0, 0, self.cols, self.rows)

    def save(self, paths, workers: int = 8, **options) -> None:
        """Encode every image to its path (codec picked by extension,
        like Image.save; reference: src/image.zig:279) using parallel
        worker threads — the host codecs' native hot loops release the
        GIL, so encodes overlap the way io_pipeline's decodes do."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        from .codecs import save_array

        paths = [os.fspath(p) for p in paths]
        if len(paths) != self.batch_size:
            raise ValueError(
                f"need {self.batch_size} paths, got {len(paths)}")
        arr = self.to_numpy()
        with ThreadPoolExecutor(max_workers=max(1, int(workers))) as ex:
            list(ex.map(lambda i: save_array(paths[i], arr[i], **options),
                        range(len(paths))))

    # -- dispatch helpers ----------------------------------------------------

    def _vmapped(self, key, mk_fn, arr=None, extra=(), out_space=None):
        """Apply a per-image fn over the batch (jit(vmap(fn)), cached).
        Collective-free under batch sharding; callers must gate usage
        under space sharding themselves."""
        import jax

        fn = _cached(("v",) + key, lambda: jax.jit(jax.vmap(mk_fn())))
        out = _run(fn, self._dev if arr is None else arr, *extra)
        return out if out_space == "raw" else self._wrap(out, out_space)

    def _batch_only(self, op: str):
        if self._space_sharded():
            raise ValueError(
                f"{op} changes the image grid and requires batch-only "
                "sharding; construct the batch with a 1-D mesh (or "
                ".with_mesh(make_mesh(...)) to reshard explicitly)")

    def _windowed(self, key, mk_fn, radius: int, border, arr=None,
                  out_space=None, ndim=4):
        """Fixed-shape windowed op: shard-local vmap normally; on a
        (batch, space) mesh, route through spatial_op_2d so the halo
        rows ride the ICI ring (SURVEY §5)."""
        if not self._space_sharded() or radius == 0:
            return self._vmapped(key, mk_fn, arr=arr, out_space=out_space)
        from .parallel import spatial_op_2d

        b_ax, s_ax = self._axes()
        fn = _cached(
            ("w2d",) + key + (self._mesh_key(), radius, border, ndim),
            lambda: spatial_op_2d(self._mesh, mk_fn(), radius,
                                  BorderMode(border), batch_axis=b_ax,
                                  space_axis=s_ax, ndim=ndim))
        out = _run(fn, self._dev if arr is None else arr)
        return out if out_space == "raw" else self._wrap(out, out_space)

    def _gray_plane(self):
        """u8 [B, H, W] luminance plane (BT.709 fixed point, pointwise)."""
        def mk():
            from .color._array import rgb_to_gray_u8

            if self._space == "gray":
                return lambda img: img[..., 0]
            return lambda img: rgb_to_gray_u8(img[..., :3])[..., 0]

        return self._vmapped(("gray_plane", self._space), mk, out_space="raw")

    def _gray_f32(self):
        import jax.numpy as jnp

        plane = self._gray_plane()
        return plane.astype(jnp.float32)

    # -- pointwise ops -------------------------------------------------------

    def convert(self, dtype) -> "ImageBatch":
        """Colorspace conversion (bit-exact u8 fixed point, pointwise —
        shard-local under any sharding)."""
        space = _dtype_space(dtype)
        if space == self._space:
            return self._wrap(self._dev)

        def mk():
            from .color._array import convert_u8_array

            return partial(convert_u8_array, src=self._space, dst=space)

        return self._vmapped(("convert", self._space, space), mk,
                             out_space=space)

    def invert(self) -> "ImageBatch":
        def mk():
            import jax.numpy as jnp

            space = self._space

            def fn(img):
                out = 255 - img
                if space == "rgba":
                    out = jnp.concatenate([out[..., :3], img[..., 3:]],
                                          axis=-1)
                return out

            return fn

        return self._vmapped(("invert", self._space), mk)

    def apply_colormap(self, colormap) -> "ImageBatch":
        from .colormaps import Colormap

        if not isinstance(colormap, Colormap):
            raise TypeError("apply_colormap expects a Colormap")
        if colormap.min is None or colormap.max is None:
            # auto range is a per-image global min/max: fine under batch
            # sharding (vmap), a cross-space reduction otherwise
            self._batch_only("apply_colormap with auto range")
        plane = self._gray_plane()

        def mk():
            return colormap.apply_plane

        key = ("colormap", colormap.type, colormap.min, colormap.max)
        out = self._vmapped(key, mk, arr=plane, out_space="raw")
        return self._wrap(out, "rgb")

    def flip_left_right(self) -> "ImageBatch":
        def mk():
            import jax.numpy as jnp

            return lambda img: jnp.flip(img, axis=1)

        return self._vmapped(("fliplr",), mk)

    def flip_top_bottom(self) -> "ImageBatch":
        # under space sharding XLA lowers the row flip to a collective
        # permute along the ring — still exact
        def mk():
            import jax.numpy as jnp

            return lambda img: jnp.flip(img, axis=0)

        return self._vmapped(("fliptb",), mk)

    def blend(self, overlay: "ImageBatch", mode=None) -> "ImageBatch":
        """Alpha-composite ``overlay`` over every image (pointwise —
        shard-local under any sharding). Unlike the mutating
        ``Image.blend``, returns a NEW batch in self's dtype. Device f32
        blend math: bit-equal to the host path for the arithmetic modes,
        within 1 u8 step for the transcendental ones."""
        from .blending import Blending

        if not isinstance(overlay, ImageBatch):
            raise TypeError("overlay must be an ImageBatch")
        if overlay._dev.shape[:3] != self._dev.shape[:3]:
            raise ValueError("overlay batch dimensions must match")
        mode = Blending.NORMAL if mode is None else Blending(mode)

        def mk():
            import jax.numpy as jnp

            from .blending import blend_arrays
            from .color._array import convert_u8_array

            src_space, over_space = self._space, overlay._space

            def fn(img, over):
                base = convert_u8_array(img, src_space, "rgba") \
                    .astype(jnp.float32) / 255.0
                ov = convert_u8_array(over, over_space, "rgba") \
                    .astype(jnp.float32) / 255.0
                out = blend_arrays(base, ov, mode)
                u8 = jnp.floor(255.0 * jnp.clip(out, 0.0, 1.0) + 0.5) \
                    .astype(jnp.uint8)
                return convert_u8_array(u8, "rgba", src_space)

            return fn

        return self._vmapped(("blend", mode, self._space, overlay._space),
                             mk, extra=(overlay._dev,))

    def _fill_px(self, px: np.ndarray) -> "ImageBatch":
        """Constant-color batch with self's shape/sharding (pointwise)."""
        def mk():
            import jax.numpy as jnp

            p = jnp.asarray(px)
            # (img & 0) | p, not broadcast_to(p): a constant output has
            # no data dependence on the input, so GSPMD would replicate
            # it onto one device instead of keeping the batch sharding
            return lambda img: (img & jnp.uint8(0)) | p

        return self._vmapped(("fill", tuple(int(v) for v in px)), mk)

    def fill(self, color) -> "ImageBatch":
        """Every image becomes the constant ``color`` — the functional
        mirror of the mutating Image.fill (reference: src/image.zig
        fill). Pointwise: shard-local under any sharding."""
        from .image import _parse_color

        return self._fill_px(
            np.array(_parse_color(color, self._space), dtype=np.uint8))

    def set_border(self, rect, color=None) -> "ImageBatch":
        """Fill everything outside ``rect`` with ``color`` (default
        zero) — functional mirror of Image.set_border (reference:
        src/image.zig setBorder). The bounds are trace-time constants,
        so the mask is pointwise iota math: shard-local under any
        sharding, including space-sharded rows."""
        from .image import _parse_color
        from .rectangle import Rectangle

        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        if not isinstance(rect, Rectangle):
            raise TypeError("set_border requires a Rectangle or 4-tuple")
        px = (np.zeros(self.channels, dtype=np.uint8) if color is None
              else np.array(_parse_color(color, self._space),
                            dtype=np.uint8))
        clipped = rect.intersect(self.get_rectangle())
        if clipped is None:
            return self._fill_px(px)
        l, t = int(clipped.left), int(clipped.top)
        r, b = int(clipped.right), int(clipped.bottom)

        def mk():
            import jax.numpy as jnp

            p = jnp.asarray(px)

            def fn(img):
                h, w = img.shape[0], img.shape[1]
                rows_in = (jnp.arange(h) >= t) & (jnp.arange(h) < b)
                cols_in = (jnp.arange(w) >= l) & (jnp.arange(w) < r)
                inside = rows_in[:, None] & cols_in[None, :]
                return jnp.where(inside[..., None], img, p)

            return fn

        return self._vmapped(
            ("border", l, t, r, b, tuple(int(v) for v in px)), mk)

    def diff(self, other: "ImageBatch", threshold: float = 0.0,
             scale: float = 1.0, binary: bool = False,
             force_opaque: bool = False):
        """Batched per-pixel difference visualization -> (ImageBatch,
        [B] int32 differing-pixel counts). The visualization math is
        the device lift of ops/diff.compute (reference:
        src/image/diff.zig:27) and is bit-equal to it: |a-b| of u8 and
        the f32 scale/floor chain are IEEE-exact in f32, and the strict
        ``> threshold`` test on integer-valued diffs is lowered to an
        integer cut so no f32 rounding of the threshold can flip it.
        The per-image RunningStats summary of Image.diff stays a
        host-side diagnostic (f64 Welford has no device equivalent)."""
        self._check_same(other)
        # strict "d > threshold" with d integer-valued == "d >= cut"
        cut = int(np.floor(float(threshold))) + 1
        scl = np.float32(scale)

        def mk():
            import jax.numpy as jnp

            def fn(a, b):
                d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
                differs = (d >= np.float32(cut)).any(axis=-1)
                count = differs.sum(dtype=jnp.int32)
                if binary:
                    vis = jnp.broadcast_to(
                        jnp.where(differs[..., None], jnp.uint8(255),
                                  jnp.uint8(0)), a.shape)
                else:
                    vis = jnp.clip(jnp.floor(d * scl + jnp.float32(0.5)),
                                   0, 255).astype(jnp.uint8)
                if force_opaque and a.shape[-1] == 4:
                    vis = jnp.concatenate(
                        [vis[..., :3], jnp.full_like(vis[..., 3:], 255)],
                        axis=-1)
                return vis, count

            return fn

        vis, counts = self._vmapped(
            ("diff", cut, float(scale), binary, force_opaque), mk,
            extra=(other._dev,), out_space="raw")
        return self._wrap(vis), counts

    # -- geometry (batch-only sharding) --------------------------------------

    def _out_size(self, size):
        if isinstance(size, (int, float)) and not isinstance(size, bool):
            scale = float(size)
            if not np.isfinite(scale) or scale <= 0:
                raise ValueError("scale factor must be positive and finite")
            rows = int(np.round(np.float32(self.rows) * np.float32(scale)))
            cols = int(np.round(np.float32(self.cols) * np.float32(scale)))
            if rows == 0 or cols == 0:
                raise ValueError("resulting dimensions are zero")
            return rows, cols
        if isinstance(size, (tuple, list)) and len(size) == 2:
            rows, cols = int(size[0]), int(size[1])
            if rows <= 0 or cols <= 0:
                raise ValueError("size must be positive")
            return rows, cols
        raise TypeError("size must be a scale factor or (rows, cols)")

    def resize(self, size, method: Interpolation = Interpolation.BILINEAR
               ) -> "ImageBatch":
        """Batched resize (ops/interpolation handles leading batch dims
        natively — one banded MXU matmul per axis for the whole batch)."""
        self._batch_only("resize")
        rows, cols = self._out_size(size)
        method = Interpolation(method)

        def build():
            import jax

            from .ops.interpolation import resize as resize_op

            return jax.jit(partial(resize_op, rows=rows, cols=cols,
                                   method=method))

        fn = _cached(("resize", rows, cols, method), build)
        return self._wrap(_run(fn, self._dev))

    def resize_blur_oklab(self, size, sigma: float = 2.0,
                          method: Interpolation = Interpolation.BILINEAR):
        """The north-star fused chain (BASELINE.md): resize -> Gaussian
        blur -> sRGB->Oklab as ONE program — on TPU a single
        VMEM-resident Pallas kernel per shard when the gate allows
        (ops/pallas_pipeline.py), the fused XLA lowering otherwise.

        Returns a [B, rows, cols, 3] float32 Oklab device array (not an
        ImageBatch — Oklab is float-typed), bit-identical to
        ``pipeline.resize_blur_oklab`` on the same batch. Under a 1-D
        (batch) mesh each shard runs the whole chain locally via
        shard_map, so the compiled HLO is collective-free and the
        output stays batch-sharded."""
        self._batch_only("resize_blur_oklab")
        rows, cols = self._out_size(size)
        sigma = float(sigma)
        method = Interpolation(method)
        if self._space != "rgb" or self.channels != 3:
            raise ValueError("resize_blur_oklab expects an Rgb batch")

        fn = resize_blur_oklab_fn(rows, cols, sigma, method, self._mesh)
        return _run(fn, self._dev)

    def letterbox(self, size, method: Interpolation = Interpolation.BILINEAR
                  ) -> "ImageBatch":
        self._batch_only("letterbox")
        if isinstance(size, (int, float)) and not isinstance(size, bool):
            rows = cols = int(size)
        else:
            rows, cols = int(size[0]), int(size[1])
        if rows <= 0 or cols <= 0:
            raise ValueError("size must be positive")
        f32 = np.float32
        rs, cs = f32(rows) / f32(self.rows), f32(cols) / f32(self.cols)
        if rs == cs:
            return self.resize((rows, cols), method)
        aspect = min(rs, cs)
        sr = max(1, int(np.round(aspect * f32(self.rows))))
        sc = max(1, int(np.round(aspect * f32(self.cols))))
        off_r, off_c = (rows - sr) // 2, (cols - sc) // 2

        def build():
            import jax
            import jax.numpy as jnp

            from .ops.interpolation import resize as resize_op

            def fn(batch):
                content = resize_op(batch, sr, sc, Interpolation(method))
                canvas = jnp.zeros(
                    (batch.shape[0], rows, cols, batch.shape[3]),
                    dtype=jnp.uint8)
                return canvas.at[:, off_r:off_r + sr,
                                 off_c:off_c + sc].set(content)

            return jax.jit(fn)

        fn = _cached(("letterbox", rows, cols, sr, sc, method), build)
        return self._wrap(_run(fn, self._dev))

    def rotate(self, angle, method: Interpolation = Interpolation.BILINEAR,
               border: BorderMode = BorderMode.ZERO) -> "ImageBatch":
        self._batch_only("rotate")
        angle = float(angle)
        if not np.isfinite(angle):
            raise ValueError("angle must be finite")
        from .ops.warp import rotate as rotate_op, rotate_bounds

        rows, cols = rotate_bounds(self.rows, self.cols, angle)

        def mk():
            return partial(rotate_op, angle=angle, out_rows=rows,
                           out_cols=cols, method=Interpolation(method),
                           border=BorderMode(border))

        return self._vmapped(("rotate", angle, rows, cols, method, border),
                             mk)

    def crop(self, rect) -> "ImageBatch":
        from .rectangle import Rectangle

        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        return self.extract(rect, 0.0, None, Interpolation.NEAREST)

    def extract(self, rect, angle: float = 0.0, size=None,
                method: Interpolation = Interpolation.BILINEAR,
                border: BorderMode = BorderMode.ZERO) -> "ImageBatch":
        self._batch_only("extract")
        from .image import _round_half_away_f32
        from .rectangle import Rectangle

        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        if size is None:
            rows = max(1, int(_round_half_away_f32(rect.height)))
            cols = max(1, int(_round_half_away_f32(rect.width)))
        elif isinstance(size, (int, float)):
            rows = cols = int(size)
        else:
            rows, cols = int(size[0]), int(size[1])
        if rows <= 0 or cols <= 0:
            raise ValueError("size must be positive")

        def mk():
            from .ops.warp import extract as extract_op

            return partial(
                extract_op,
                rect=(rect.left, rect.top, rect.right, rect.bottom),
                angle=float(angle), out_rows=rows, out_cols=cols,
                method=Interpolation(method), border=BorderMode(border))

        key = ("extract", rect.left, rect.top, rect.right, rect.bottom,
               float(angle), rows, cols, method, border)
        return self._vmapped(key, mk)

    def warp(self, transform, shape=None,
             method: Interpolation = Interpolation.BILINEAR) -> "ImageBatch":
        self._batch_only("warp")
        from .geometry.transforms import (
            AffineTransform, ProjectiveTransform, SimilarityTransform,
        )

        if not isinstance(transform, (SimilarityTransform, AffineTransform,
                                      ProjectiveTransform)):
            raise TypeError("transform must be a geometric transform")
        rows, cols = ((self.rows, self.cols) if shape is None
                      else (int(shape[0]), int(shape[1])))
        matrix = transform.homogeneous()
        import os

        method = Interpolation(method)
        use_static = (method in (Interpolation.NEAREST,
                                 Interpolation.BILINEAR)
                      and os.environ.get("ZT_WARP_STATIC", "1") != "0")

        def mk():
            if use_static:  # host-data matrix: packed-patch static path
                from .ops.warp import warp_static

                mkey = tuple(map(tuple, np.asarray(
                    matrix, np.float32).tolist()))
                return partial(warp_static, matrix=mkey, out_rows=rows,
                               out_cols=cols, method=method)
            from .ops.warp import warp as warp_op

            return partial(warp_op, matrix=matrix, out_rows=rows,
                           out_cols=cols, method=method)

        key = ("warp", tuple(np.asarray(matrix).ravel().tolist()),
               rows, cols, method, use_static)
        return self._vmapped(key, mk)

    def insert(self, source, rect, angle: float = 0.0,
               method: Interpolation = Interpolation.BILINEAR,
               blend_mode=None) -> "ImageBatch":
        """Insert ``source`` at a rotated rect into every image —
        functional mirror of the mutating Image.insert (reference:
        transforms.zig:293-380). ``source`` is an Image (shared across
        the batch, vmap in_axes=None so it is NOT embedded as an HLO
        constant) or a same-length ImageBatch (per-image sources).
        Batch-only sharding: the warped source region may straddle
        space shards."""
        self._batch_only("insert")
        from .blending import Blending
        from .rectangle import Rectangle

        if isinstance(rect, (tuple, list)):
            rect = Rectangle(*rect)
        if not isinstance(rect, Rectangle):
            raise TypeError("expected a Rectangle or (l, t, r, b) tuple")
        mode = Blending.NONE if blend_mode is None else Blending(blend_mode)
        per_image = isinstance(source, ImageBatch)
        if not per_image and not isinstance(source, Image):
            raise TypeError("source must be an Image or an ImageBatch")
        if per_image and source.batch_size != self.batch_size:
            raise ValueError("source batch length must match")
        src_space = source._space
        if mode != Blending.NONE and src_space == "rgba":
            src = source._dev if per_image else source._device()
        else:
            src = (source.convert(self.dtype)._dev if per_image
                   else source.convert(self.dtype)._device())
            mode = Blending.NONE
        src_shape = tuple(src.shape[-3:])

        def build():
            import jax

            from .ops.warp import insert_region

            fn = partial(
                insert_region,
                rect=(rect.left, rect.top, rect.right, rect.bottom),
                angle=float(angle), method=Interpolation(method),
                blend_mode=mode)
            return jax.jit(jax.vmap(fn, in_axes=(0, 0 if per_image
                                                 else None)))

        key = ("insert", rect.left, rect.top, rect.right, rect.bottom,
               float(angle), method, mode, per_image, src_shape, src_space)
        out = _run(_cached(key, build), self._dev, src)
        return self._wrap(out)

    def flood_fill(self, row: int, col: int, fill_value,
                   threshold: float = 0.0, connectivity: int = 4,
                   mode=None) -> "ImageBatch":
        """Flood fill every image from the same seed — functional
        mirror of Image.flood_fill (reference: image.zig:831;
        flood_fill.zig), always on the device while_loop propagation
        path (ops/flood_fill.py), vmapped over the batch. Batch-only
        sharding: the propagation scans whole rows."""
        self._batch_only("flood_fill")
        from .enums import ThresholdMode
        from .image import _parse_color

        row, col = int(row), int(col)
        if not (0 <= row < self.rows and 0 <= col < self.cols):
            raise ValueError("seed coordinates out of bounds")
        if connectivity not in (4, 8):
            raise ValueError("connectivity must be 4 or 8")
        mode = ThresholdMode.SEED if mode is None else ThresholdMode(mode)
        px = np.array(_parse_color(fill_value, self._space), dtype=np.uint8)

        def mk():
            import jax.numpy as jnp

            from .enums import ThresholdMode as TM
            from .ops.flood_fill import flood_region, threshold_sq_int

            thr = threshold_sq_int(float(threshold))
            neighbor = mode == TM.NEIGHBOR
            p = jnp.asarray(px)

            def fn(img):
                mask = flood_region(img, row, col, thr,
                                    connectivity=connectivity,
                                    neighbor_mode=neighbor)
                return jnp.where(mask[..., None], p, img)

            return fn

        return self._vmapped(
            ("flood", row, col, float(threshold), connectivity, mode,
             tuple(int(v) for v in px)), mk)

    def motion_blur(self, config) -> "ImageBatch":
        self._batch_only("motion_blur")
        from .motion_blur import MotionBlur
        from .ops.motion_blur_ops import linear_motion_blur, radial_blur

        if not isinstance(config, MotionBlur):
            raise TypeError("motion_blur expects a MotionBlur configuration")
        if config.kind == "linear":
            def mk():
                return partial(linear_motion_blur, angle=config.angle,
                               distance=config.distance)

            key = ("mblur_lin", config.angle, config.distance)
        else:
            def mk():
                return partial(radial_blur, center_x=config.center_x,
                               center_y=config.center_y,
                               strength=config.strength,
                               zoom=config.kind == "zoom")

            key = ("mblur_rad", config.kind, config.center_x,
                   config.center_y, config.strength)
        return self._vmapped(key, mk)

    # -- windowed filters (spatial routing under a 2-D mesh) -----------------

    def gaussian_blur(self, sigma: float) -> "ImageBatch":
        sigma = float(sigma)
        if not (sigma > 0) or not np.isfinite(sigma):
            raise ValueError("sigma must be positive and finite")
        from .ops.convolution import gaussian_kernel

        radius = len(gaussian_kernel(sigma)) // 2

        def mk():
            from .ops.convolution import gaussian_blur as op

            return partial(op, sigma=sigma)

        return self._windowed(("gauss", sigma), mk, radius, BorderMode.MIRROR)

    def convolve(self, kernel, border=BorderMode.MIRROR) -> "ImageBatch":
        """Batched 2-D convolution (reference: image.zig:917). Windowed:
        on a (batch, space) mesh the vertical halo rides the ICI ring."""
        k = np.asarray(kernel, dtype=np.float32)
        if k.ndim != 2 or k.shape[0] % 2 == 0 or k.shape[1] % 2 == 0:
            raise ValueError("kernel must be 2-D with odd dimensions")
        ktup = tuple(tuple(float(v) for v in row) for row in k)
        border = BorderMode(border)

        def mk():
            from .ops.convolution import convolve2d as op

            return partial(op, kernel=ktup, border=border)

        return self._windowed(("conv2d", ktup, border), mk,
                              k.shape[0] // 2, border)

    def convolve_separable(self, kernel_x, kernel_y,
                           border=BorderMode.MIRROR) -> "ImageBatch":
        """Batched separable convolution (reference: image.zig:935)."""
        kx = np.asarray(kernel_x, dtype=np.float32)
        ky = np.asarray(kernel_y, dtype=np.float32)
        if kx.ndim != 1 or ky.ndim != 1 or len(kx) % 2 == 0 \
                or len(ky) % 2 == 0:
            raise ValueError("kernels must be 1-D with odd length")
        kxt = tuple(float(v) for v in kx)
        kyt = tuple(float(v) for v in ky)
        border = BorderMode(border)

        def mk():
            from .ops.convolution import convolve_separable as op

            return partial(op, kernel_x=kxt, kernel_y=kyt, border=border)

        return self._windowed(("convsep", kxt, kyt, border), mk,
                              len(kyt) // 2, border)

    def _order_stat(self, op_name, radius, border, **kw):
        radius = int(radius)
        if radius < 0:
            raise ValueError("radius must be non-negative")
        if radius == 0:
            return self._wrap(self._dev)

        def mk():
            from .ops import order_stat as O

            fn = {"median": O.median_blur, "percentile": O.percentile_blur,
                  "min": O.min_blur, "max": O.max_blur,
                  "midpoint": O.midpoint_blur,
                  "alpha_trimmed": O.alpha_trimmed_mean_blur}[op_name]
            if op_name == "median":
                return partial(fn, radius=radius)
            if op_name == "percentile":
                return partial(fn, radius=radius,
                               percentile=kw["percentile"],
                               border=BorderMode(border))
            if op_name == "alpha_trimmed":
                return partial(fn, radius=radius,
                               trim_fraction=kw["trim_fraction"],
                               border=BorderMode(border))
            return partial(fn, radius=radius, border=BorderMode(border))

        key = ("ostat", op_name, radius, border) + tuple(sorted(kw.items()))
        return self._windowed(key, mk, radius, border)

    def median_blur(self, radius: int) -> "ImageBatch":
        return self._order_stat("median", radius, BorderMode.MIRROR)

    def percentile_blur(self, radius: int, percentile: float,
                        border: BorderMode = BorderMode.MIRROR
                        ) -> "ImageBatch":
        percentile = float(percentile)
        if not 0.0 <= percentile <= 1.0:
            raise ValueError("percentile must be in [0, 1]")
        return self._order_stat("percentile", radius, border,
                                percentile=percentile)

    def min_blur(self, radius: int,
                 border: BorderMode = BorderMode.MIRROR) -> "ImageBatch":
        return self._order_stat("min", radius, border)

    def max_blur(self, radius: int,
                 border: BorderMode = BorderMode.MIRROR) -> "ImageBatch":
        return self._order_stat("max", radius, border)

    def midpoint_blur(self, radius: int,
                      border: BorderMode = BorderMode.MIRROR) -> "ImageBatch":
        return self._order_stat("midpoint", radius, border)

    def alpha_trimmed_mean_blur(self, radius: int, trim_fraction: float,
                                border: BorderMode = BorderMode.MIRROR
                                ) -> "ImageBatch":
        trim_fraction = float(trim_fraction)
        if not np.isfinite(trim_fraction) or not 0.0 <= trim_fraction < 0.5:
            raise ValueError("trim_fraction must be in [0, 0.5)")
        return self._order_stat("alpha_trimmed", radius, border,
                                trim_fraction=trim_fraction)

    def sobel(self) -> "ImageBatch":
        plane = self._gray_f32()

        def mk():
            from .ops.convolution import sobel_magnitude

            return sobel_magnitude

        out = self._windowed(("sobel",), mk, 1, BorderMode.REPLICATE,
                             arr=plane, out_space="raw", ndim=3)
        return self._wrap(out[..., None], "gray")

    def canny(self, sigma: float = 1.4, low: float = 50,
              high: float = 150) -> "ImageBatch":
        # hysteresis propagates labels over the whole image — no bounded
        # halo exists, so space sharding is unsupported
        self._batch_only("canny")
        sigma, low, high = float(sigma), float(low), float(high)
        if sigma < 0 or low < 0 or high < 0 or low >= high:
            raise ValueError("need sigma >= 0 and 0 <= low < high")
        plane = self._gray_f32()

        def mk():
            from .ops.edges import canny as op

            return partial(op, sigma=sigma, low=low, high=high)

        out = self._vmapped(("canny", sigma, low, high), mk, arr=plane,
                            out_space="raw")
        return self._wrap(out[..., None], "gray")

    def shen_castan(self, smooth: float = 0.9, window_size: int = 7,
                    high_ratio: float = 0.99, low_rel: float = 0.5,
                    hysteresis: bool = True, use_nms: bool = False
                    ) -> "ImageBatch":
        self._batch_only("shen_castan")
        plane = self._gray_f32()

        def mk():
            from .ops.edges import shen_castan as op

            return partial(op, smooth=float(smooth),
                           window_size=int(window_size),
                           high_ratio=float(high_ratio),
                           low_rel=float(low_rel),
                           hysteresis=bool(hysteresis),
                           use_nms=bool(use_nms))

        key = ("shen", smooth, window_size, high_ratio, low_rel,
               hysteresis, use_nms)
        out = self._vmapped(key, mk, arr=plane, out_space="raw")
        return self._wrap(out[..., None], "gray")

    def _morph(self, op_name: str, kernel_size: int, iterations: int):
        kernel_size = int(kernel_size)
        iterations = int(iterations)
        if kernel_size < 3 or kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd and >= 3")
        if iterations < 0:
            raise ValueError("iterations must be non-negative")
        plane = self._gray_plane()
        if iterations == 0:
            return self._wrap(plane[..., None], "gray")

        if op_name in ("open", "close") and self._space_sharded():
            # a compound dilate->erode cannot ride ONE halo: the first
            # pass's output in the halo region differs from the true
            # global-edge border (each pass re-applies ZERO fill at the
            # real image boundary), so run the two constituents as
            # separate spatial ops. Pure iterated dilate (or erode) IS
            # crop-trick-safe: the synthesized-halo dilation is always
            # dominated by (erode: equal to) the true border fill.
            first, second = (("erode", "dilate") if op_name == "open"
                             else ("dilate", "erode"))
            return self._morph(first, kernel_size, iterations) \
                ._morph(second, kernel_size, iterations)

        def mk():
            from .ops import binary as B

            op = {"dilate": B.dilate, "erode": B.erode,
                  "open": B.open_morph, "close": B.close_morph}[op_name]
            return partial(op, ksize=kernel_size, iterations=iterations)

        radius = (kernel_size // 2) * iterations
        if op_name in ("open", "close"):
            radius *= 2  # erode then dilate (or vice versa) compound
        out = self._windowed(("morph", op_name, kernel_size, iterations),
                             mk, radius, BorderMode.ZERO, arr=plane,
                             out_space="raw", ndim=3)
        return self._wrap(out[..., None], "gray")

    def dilate_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("dilate", kernel_size, iterations)

    def erode_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("erode", kernel_size, iterations)

    def open_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("open", kernel_size, iterations)

    def close_binary(self, kernel_size: int = 3, iterations: int = 1):
        return self._morph("close", kernel_size, iterations)

    # -- clamped-window family (dedicated exact sharded bodies) --------------

    def _clamped(self, kind: str, radius: int, c: float = 0.0):
        radius = int(radius)
        if radius < 0:
            raise ValueError("radius must be non-negative")
        is_plane = kind == "adaptive"
        arr = self._gray_plane() if is_plane else None
        if radius == 0 and not is_plane:
            return self._wrap(self._dev)

        if not self._space_sharded():
            def mk():
                if kind == "box":
                    from .ops.integral import box_blur as op

                    return partial(op, radius=radius)
                if kind == "sharpen":
                    from .ops.integral import sharpen as op

                    return partial(op, radius=radius)
                from .ops.binary import adaptive_mean_threshold

                return partial(adaptive_mean_threshold, radius=radius, c=c)

            out = self._vmapped(("clamped", kind, radius, c), mk, arr=arr,
                                out_space="raw")
        else:
            out = _run(self._clamped_sharded(kind, radius, c),
                       arr if is_plane else self._dev)
        if is_plane:
            return self._wrap(out[..., None], "gray")
        return self._wrap(out)

    def _clamped_sharded(self, kind, radius, c):
        """shard_map body for the clamped-window family on a 2-D mesh:
        ZERO halos make the window sums exact; true areas come from the
        global extent table (parallel/spatial.py design)."""
        b_ax, s_ax = self._axes()
        key = ("clamped2d", kind, radius, c, self._mesh_key(),
               self.rows)

        def build():
            import jax
            import jax.numpy as jnp
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.spatial import (_round_div_u8,
                                           _sharded_box_sums_2d)

            mesh = self._mesh
            n_space = dict(zip(mesh.axis_names,
                               mesh.devices.shape))[s_ax]
            h_total = self.rows

            def body(local):
                lifted = local[..., None] if local.ndim == 3 else local
                sums, area = _sharded_box_sums_2d(
                    lifted, h_total, radius, s_ax, n_space)
                area = area[None]  # broadcast over local batch
                if kind == "box":
                    out = _round_div_u8(sums, area)
                elif kind == "sharpen":
                    if sums.dtype == jnp.int32:
                        q = sums // area
                        rem = sums - q * area
                        t2 = 2 * lifted.astype(jnp.int32)
                        out = jnp.clip(t2 - q - (2 * rem > area),
                                       0, 255).astype(jnp.uint8)
                    else:
                        vals = (2.0 * lifted.astype(jnp.float32)
                                - sums / area.astype(jnp.float32))
                        out = jnp.clip(jnp.floor(vals + 0.5),
                                       0, 255).astype(jnp.uint8)
                else:  # adaptive mean threshold
                    if sums.dtype == jnp.int32:
                        q = sums // area
                        rem = sums - q * area
                        mean = (q.astype(jnp.float32)
                                + rem.astype(jnp.float32)
                                / area.astype(jnp.float32))
                    else:
                        mean = sums / area.astype(jnp.float32)
                    out = jnp.where(
                        lifted.astype(jnp.float32) > mean - c,
                        255, 0).astype(jnp.uint8)
                return out[..., 0] if local.ndim == 3 else out

            nd = 3 if kind == "adaptive" else 4
            spec = P(b_ax, s_ax, *([None] * (nd - 2)))
            return jax.jit(shard_map(body, mesh=mesh, in_specs=spec,
                                     out_specs=spec))

        return _cached(key, build)

    def box_blur(self, radius: int) -> "ImageBatch":
        return self._clamped("box", radius)

    def sharpen(self, radius: int) -> "ImageBatch":
        return self._clamped("sharpen", radius)

    def threshold_adaptive_mean(self, radius: int = 6, c: float = 5.0
                                ) -> "ImageBatch":
        if int(radius) <= 0:
            raise ValueError("radius must be positive")
        return self._clamped("adaptive", int(radius), float(c))

    # -- histogram-based global ops ------------------------------------------

    def _hists(self, plane=None):
        """Per-image per-channel histograms [B, C, 256] int32 (gray
        plane: [B, 1, 256]). Partial histograms are psum'd over the
        space axis on a 2-D mesh — counts are integers, so the sharded
        result is bit-identical."""
        arr = self._dev if plane is None else plane[..., None]
        ch = arr.shape[-1]
        if not self._space_sharded():
            def mk():
                from .ops.binary import histogram256_multi

                return histogram256_multi

            return self._vmapped(("hists", ch, plane is not None), mk,
                                 arr=arr, out_space="raw")
        b_ax, s_ax = self._axes()
        key = ("hists2d", ch, self._mesh_key())

        def build():
            import jax
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .ops.binary import histogram256_multi

            def body(local):
                h = jax.vmap(histogram256_multi)(local)
                return jax.lax.psum(h, s_ax)

            return jax.jit(shard_map(
                body, mesh=self._mesh,
                in_specs=P(b_ax, s_ax, None, None),
                out_specs=P(b_ax, None, None)))

        return _run(_cached(key, build), arr)

    def histogram(self):
        """[B, C, 256] int32 device histogram array."""
        return self._hists()

    def equalize(self) -> "ImageBatch":
        total = self.rows * self.cols
        if not self._space_sharded():
            def mk():
                from .ops.enhancement import equalize as op

                return op

            return self._vmapped(("equalize",), mk)
        b_ax, s_ax = self._axes()
        key = ("equalize2d", self._mesh_key(), total, self.channels)

        def build():
            import jax
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .ops.binary import histogram256_multi
            from .ops.enhancement import equalize_from_hists

            def body(local):
                hists = jax.vmap(histogram256_multi)(local)
                hists = jax.lax.psum(hists, s_ax)
                return jax.vmap(
                    partial(equalize_from_hists, total=total))(local, hists)

            spec = P(b_ax, s_ax, None, None)
            return jax.jit(shard_map(body, mesh=self._mesh, in_specs=spec,
                                     out_specs=spec))

        return self._wrap(_run(_cached(key, build), self._dev))

    def autocontrast(self, cutoff: float = 0.0) -> "ImageBatch":
        cutoff = float(cutoff)
        if cutoff < 0 or cutoff >= 0.5:
            raise ValueError("cutoff must be in [0, 0.5)")
        if not self._space_sharded():
            def mk():
                from .ops.enhancement import autocontrast as op

                return partial(op, cutoff=cutoff)

            return self._vmapped(("autocontrast", cutoff), mk)
        total = self.rows * self.cols
        # match the single-device trace math exactly (f32 multiply)
        cutoff_pixels = int(np.trunc(np.float32(total) * np.float32(cutoff)))
        b_ax, s_ax = self._axes()
        key = ("autocontrast2d", self._mesh_key(), cutoff_pixels,
               self.channels)

        def build():
            import jax
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .ops.binary import histogram256_multi
            from .ops.enhancement import autocontrast_from_hists

            def body(local):
                hists = jax.vmap(histogram256_multi)(local)
                hists = jax.lax.psum(hists, s_ax)
                return jax.vmap(partial(
                    autocontrast_from_hists,
                    cutoff_pixels=cutoff_pixels))(local, hists)

            spec = P(b_ax, s_ax, None, None)
            return jax.jit(shard_map(body, mesh=self._mesh, in_specs=spec,
                                     out_specs=spec))

        return self._wrap(_run(_cached(key, build), self._dev))

    def threshold_otsu(self):
        """Otsu per image -> (binary gray ImageBatch, [B] thresholds).

        Stage 1 (device): exact integer histograms (psum'd over a space
        axis). Stage 2 (host): the 256-entry f64 variance sweep,
        vectorized over the batch — matching ops.binary.otsu_threshold's
        host math exactly. Stage 3 (device): pointwise threshold apply."""
        import jax.numpy as jnp

        plane = self._gray_plane()
        hists = np.asarray(self._hists(plane=plane))[:, 0].astype(np.float64)
        total = hists.sum(axis=1, keepdims=True)
        intensities = np.arange(256, dtype=np.float64)
        sum_total = (hists * intensities).sum(axis=1, keepdims=True)
        wb = hists.cumsum(axis=1)
        sb = (hists * intensities).cumsum(axis=1)
        wf = total - wb
        valid = (wb > 0) & (wf > 0)
        mean_b = sb / np.where(wb == 0, 1, wb)
        mean_f = (sum_total - sb) / np.where(wf == 0, 1, wf)
        variance = wb * wf * (mean_b - mean_f) ** 2
        variance = np.where(valid, variance, -1.0)
        thresholds = variance.argmax(axis=1).astype(np.int32)

        def build():
            import jax

            def fn(p, t):
                return jnp.where(p > t[:, None, None], 255, 0) \
                    .astype(jnp.uint8)

            return jax.jit(fn)

        fn = _cached(("otsu_apply",), build)
        t_dev = jnp.asarray(thresholds)
        out = _run(fn, plane, t_dev)
        return self._wrap(out[..., None], "gray"), thresholds

    # -- metrics (per image -> [B]) ------------------------------------------

    def _check_same(self, other):
        if not isinstance(other, ImageBatch):
            raise TypeError("expected an ImageBatch")
        if other._dev.shape != self._dev.shape:
            raise ValueError("batch shapes must match")
        if other._space != self._space:
            raise ValueError("batch dtypes must match")

    def psnr(self, other: "ImageBatch"):
        """[B] PSNR in dB (device f32 reductions; Image.psnr's host f64
        path remains the per-image oracle)."""
        self._check_same(other)

        def mk():
            from .ops.metrics import psnr as op

            return op

        return self._vmapped(("psnr",), mk, extra=(other._dev,),
                             out_space="raw")

    def mean_pixel_error(self, other: "ImageBatch"):
        self._check_same(other)

        def mk():
            from .ops.metrics import mean_pixel_error as op

            return op

        return self._vmapped(("mpe",), mk, extra=(other._dev,),
                             out_space="raw")

    def ssim(self, other: "ImageBatch"):
        """[B] mean SSIM (valid 11x11 windows). On a (batch, space)
        mesh this runs the halo-exchange body from parallel.spatial_ssim
        vmapped over the local batch (global means and window sums
        psum'd over the space ring) — matches the single-device op to
        f32 reduction-order tolerance; batch sharding is exact vmap."""
        self._check_same(other)
        if self.rows < 11 or self.cols < 11:
            raise ValueError("images must be at least 11x11 for SSIM")
        if not self._space_sharded():
            def mk():
                from .ops.metrics import ssim as op

                return op

            return self._vmapped(("ssim",), mk, extra=(other._dev,),
                                 out_space="raw")
        b_ax, s_ax = self._axes()
        key = ("ssim2d", self._mesh_key(), self.rows)

        def build():
            import jax
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.spatial import _ssim_body

            n_space = dict(zip(self._mesh.axis_names,
                               self._mesh.devices.shape))[s_ax]
            body = _ssim_body(self.rows, s_ax, n_space)
            spec = P(b_ax, s_ax, None, None)
            return jax.jit(shard_map(
                lambda a, b: jax.vmap(body)(a, b), mesh=self._mesh,
                in_specs=(spec, spec), out_specs=P(b_ax)))

        return _run(_cached(key, build), self._dev, other._dev)
