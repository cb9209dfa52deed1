"""ImageBatch: the sharding-carrying batched container (SURVEY §2 L3 /
§5 distributed statement; reference container: src/image.zig:97-1248).

Sweeps the lifted op surface on an 8-device CPU mesh asserting
bit-exactness vs the unsharded batch AND vs per-image Image ops, and
inspects compiled HLO to prove batch-sharded dispatches are
collective-free (no implicit resharding / all-gather)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

import zignal_tpu as z
from zignal_tpu import ImageBatch
from zignal_tpu import batch as batch_mod
from zignal_tpu.parallel import make_mesh


def _arr(b=8, h=32, w=48, c=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (b, h, w, c), dtype=np.uint8)


def _mesh2(nb=2, ns=4):
    return Mesh(np.array(jax.devices())[:nb * ns].reshape(nb, ns),
                ("batch", "space"))


# one entry per op: (name, args) applied via getattr. Everything here
# must be bit-exact sharded vs unsharded.
SWEEP_OPS = [
    ("resize", ((16, 24),)),
    ("resize", (0.5, z.Interpolation.BICUBIC)),
    ("letterbox", (24,)),
    ("rotate", (0.3,)),
    ("invert", ()),
    ("fill", ((10, 200, 30),)),
    ("set_border", ((4, 4, 40, 24), (255, 0, 0))),
    ("flip_left_right", ()),
    ("flip_top_bottom", ()),
    ("gaussian_blur", (1.5,)),
    ("box_blur", (2,)),
    ("sharpen", (1,)),
    ("median_blur", (1,)),
    ("percentile_blur", (1, 0.25)),
    ("min_blur", (1,)),
    ("max_blur", (1,)),
    ("midpoint_blur", (1,)),
    ("alpha_trimmed_mean_blur", (1, 0.2)),
    ("convolve", (((0.0, -1.0, 0.0), (-1.0, 5.0, -1.0), (0.0, -1.0, 0.0)),)),
    ("convolve_separable", ((0.25, 0.5, 0.25), (0.25, 0.5, 0.25))),
    ("sobel", ()),
    ("canny", (1.0, 40, 120)),
    ("equalize", ()),
    ("autocontrast", (0.01,)),
    ("threshold_adaptive_mean", (3, 5.0)),
    ("dilate_binary", (3, 1)),
    ("dilate_binary", (3, 2)),
    ("erode_binary", (3, 2)),
    ("open_binary", (3, 1)),
    ("close_binary", (3, 1)),
]

# ops that keep the image grid: legal on a (batch, space) mesh, where
# windowed ones must route through halo exchange and stay bit-exact
SPACE_OPS = [op for op in SWEEP_OPS
             if op[0] not in ("resize", "letterbox", "rotate", "canny")]


@pytest.mark.parametrize("name,args",
                         SWEEP_OPS, ids=lambda v: str(v)[:24])
def test_batch_sharded_bit_exact(name, args):
    arr = _arr()
    ref = getattr(ImageBatch(arr), name)(*args).to_numpy()
    out = getattr(ImageBatch(arr, mesh=make_mesh(8)), name)(*args)
    assert np.array_equal(ref, out.to_numpy())
    # output stays batch-sharded: no silent gather to one device
    assert len(out.device_array().sharding.device_set) == 8


@pytest.mark.parametrize("name,args",
                         SPACE_OPS, ids=lambda v: str(v)[:24])
def test_space_sharded_bit_exact(name, args):
    arr = _arr(b=4, h=64)
    ref = getattr(ImageBatch(arr), name)(*args).to_numpy()
    out = getattr(ImageBatch(arr, mesh=_mesh2()), name)(*args)
    assert np.array_equal(ref, out.to_numpy())


@pytest.mark.parametrize("name,args", [
    ("gaussian_blur", (1.5,)),
    ("box_blur", (2,)),
    ("median_blur", (1,)),
    ("equalize", ()),
    ("resize", ((16, 24),)),
    ("invert", ()),
])
def test_batch_sharded_hlo_is_collective_free(name, args):
    """Per-image independence must compile with ZERO collectives under
    batch sharding (SURVEY §4 implications (d): no implicit resharding)."""
    b = ImageBatch(_arr(), mesh=make_mesh(8))
    getattr(b, name)(*args)
    hlo = batch_mod.last_compiled_hlo()
    for coll in ("all-gather", "all-reduce", "collective-permute",
                 "all-to-all"):
        assert coll not in hlo, f"{name} compiled a {coll}"


def test_space_sharded_windowed_uses_ring_not_allgather():
    """Under (batch, space) sharding a windowed op exchanges halo rows
    via collective-permute (the ICI ring) — never an all-gather of the
    image."""
    b = ImageBatch(_arr(b=4, h=64), mesh=_mesh2())
    b.gaussian_blur(1.5)
    hlo = batch_mod.last_compiled_hlo()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_matches_per_image_ops():
    arr = _arr(b=4)
    b = ImageBatch(arr, mesh=make_mesh(8, axis_name="batch")) \
        if arr.shape[0] % 8 == 0 else ImageBatch(arr)
    got = b.gaussian_blur(2.0).to_numpy()
    for i in range(arr.shape[0]):
        ref = z.Image.from_numpy(arr[i].copy()).gaussian_blur(2.0)
        assert np.array_equal(got[i], ref.to_numpy())
    got = b.resize((16, 24)).to_numpy()
    for i in range(arr.shape[0]):
        ref = z.Image.from_numpy(arr[i].copy()).resize((16, 24))
        assert np.array_equal(got[i], ref.to_numpy())


def test_convert_roundtrip_and_spaces():
    arr = _arr()
    b = ImageBatch(arr, mesh=make_mesh(8))
    g = b.convert(z.Gray)
    assert g.channels == 1 and g.dtype is z.Gray
    per_image = z.Image.from_numpy(arr[0].copy()).convert(z.Gray)
    assert np.array_equal(g.to_numpy()[0], per_image.to_numpy())
    ra = b.convert(z.Rgba)
    assert ra.channels == 4
    assert np.array_equal(ra.to_numpy()[..., 3], np.full(arr.shape[:3], 255))


def test_threshold_otsu_matches_image():
    arr = _arr(b=4)
    bt, thresholds = ImageBatch(arr, mesh=_mesh2(2, 2)).threshold_otsu()
    assert bt.dtype is z.Gray
    for i in range(4):
        ref_img, ref_t = z.Image.from_numpy(arr[i].copy()).threshold_otsu()
        assert thresholds[i] == ref_t
        assert np.array_equal(bt.to_numpy()[i], ref_img.to_numpy())


def test_histogram_shape_and_counts():
    arr = _arr(b=4, h=64)
    h0 = np.asarray(ImageBatch(arr).histogram())
    h2 = np.asarray(ImageBatch(arr, mesh=_mesh2()).histogram())
    assert h0.shape == (4, 3, 256)
    assert np.array_equal(h0, h2)
    assert (h0.sum(axis=2) == 64 * 48).all()


def test_metrics_match_vmapped_reference():
    a, bb = _arr(b=4, seed=1), _arr(b=4, seed=2)
    ba = ImageBatch(a, mesh=make_mesh(4, axis_name="batch"))
    bo = ImageBatch(bb, mesh=make_mesh(4, axis_name="batch"))
    from zignal_tpu.ops import metrics as M

    psnr = np.asarray(ba.psnr(bo))
    mpe = np.asarray(ba.mean_pixel_error(bo))
    ssim = np.asarray(ba.ssim(bo))
    assert psnr.shape == mpe.shape == ssim.shape == (4,)
    for i in range(4):
        assert psnr[i] == pytest.approx(float(M.psnr(a[i], bb[i])), abs=1e-5)
        assert mpe[i] == pytest.approx(
            float(M.mean_pixel_error(a[i], bb[i])), abs=1e-7)
        assert ssim[i] == pytest.approx(float(M.ssim(a[i], bb[i])), abs=1e-6)


def test_motion_blur_and_warp_batch_only():
    arr = _arr(b=4, h=64)
    b1 = ImageBatch(arr, mesh=make_mesh(4, axis_name="batch"))
    mb = z.MotionBlur.linear(angle=0.4, distance=5)
    ref = ImageBatch(arr).motion_blur(mb).to_numpy()
    assert np.array_equal(ref, b1.motion_blur(mb).to_numpy())
    b2 = ImageBatch(arr, mesh=_mesh2())
    for op, args in [("motion_blur", (mb,)), ("resize", (0.5,)),
                     ("canny", ()), ("warp", (None,)),
                     ("flood_fill", (1, 1, 0)),
                     ("insert", (None, (0, 0, 2, 2)))]:
        with pytest.raises((ValueError, TypeError)):
            getattr(b2, op)(*args)


def test_blend_matches_image():
    arr = _arr(b=4)
    over = _arr(b=4, c=4, seed=9)
    over[..., 3] = 128
    got = ImageBatch(arr, mesh=make_mesh(4, axis_name="batch")).blend(
        ImageBatch(over), z.Blending.NORMAL).to_numpy()
    for i in range(4):
        img = z.Image.from_numpy(arr[i].copy())
        img.blend(z.Image.from_numpy(over[i].copy()), z.Blending.NORMAL)
        assert np.array_equal(got[i], img.to_numpy())
    # transcendental modes: device f32 vs host path within 1 step
    got2 = ImageBatch(arr).blend(ImageBatch(over),
                                 z.Blending.SOFT_LIGHT).to_numpy()
    for i in range(4):
        img = z.Image.from_numpy(arr[i].copy())
        img.blend(z.Image.from_numpy(over[i].copy()), z.Blending.SOFT_LIGHT)
        assert np.abs(got2[i].astype(int)
                      - img.to_numpy().astype(int)).max() <= 1


def test_ssim_space_sharded_matches():
    a, bb = _arr(b=4, h=64, seed=1), _arr(b=4, h=64, seed=2)
    s0 = np.asarray(ImageBatch(a).ssim(ImageBatch(bb)))
    m = _mesh2()
    s2 = np.asarray(ImageBatch(a, mesh=m).ssim(ImageBatch(bb, mesh=m)))
    assert np.allclose(s0, s2, atol=1e-6)  # f32 reduction-order only
    self2 = np.asarray(ImageBatch(a, mesh=m).ssim(ImageBatch(a, mesh=m)))
    assert np.allclose(self2, 1.0)


def test_crop_extract_match_image():
    arr = _arr(b=2, h=40, w=40)
    b = ImageBatch(arr)
    rect = z.Rectangle(5, 5, 30, 25)
    got = b.extract(rect, 0.3, (16, 16)).to_numpy()
    for i in range(2):
        ref = z.Image.from_numpy(arr[i].copy()).extract(rect, 0.3, (16, 16))
        assert np.array_equal(got[i], ref.to_numpy())
    got_c = b.crop(rect).to_numpy()
    for i in range(2):
        ref = z.Image.from_numpy(arr[i].copy()).crop(rect)
        assert np.array_equal(got_c[i], ref.to_numpy())


def test_apply_colormap_matches_image():
    arr = _arr(b=2, c=1)
    cm = z.Colormap.jet(min=0, max=255)
    got = ImageBatch(arr, mesh=_mesh2(2, 2)).apply_colormap(cm).to_numpy()
    for i in range(2):
        ref = z.Image.from_numpy(arr[i].copy()).apply_colormap(cm)
        assert np.array_equal(got[i], ref.to_numpy())


def test_construction_and_interop():
    arr = _arr(b=4)
    imgs = [z.Image.from_numpy(arr[i].copy()) for i in range(4)]
    b = ImageBatch.from_images(imgs)
    assert b.batch_size == 4 and b.rows == 32 and b.cols == 48
    assert np.array_equal(b.to_numpy(), arr)
    assert np.array_equal(b[1].to_numpy(), arr[1])
    back = b.to_images()
    assert all(np.array_equal(back[i].to_numpy(), arr[i]) for i in range(4))

    with pytest.raises(ValueError):
        ImageBatch.from_images([])
    with pytest.raises(ValueError):
        ImageBatch.from_images([imgs[0], imgs[0].convert(z.Gray)])
    with pytest.raises(ValueError):
        ImageBatch(arr[0])  # 3-D
    with pytest.raises(TypeError):
        ImageBatch(arr.astype(np.float32))
    with pytest.raises(ValueError):
        ImageBatch(_arr(b=3), mesh=make_mesh(8))  # 3 % 8 != 0
    with pytest.raises(ValueError):
        ImageBatch(_arr(b=4, h=30), mesh=_mesh2())  # 30 % 4 != 0

    b2 = b.with_mesh(make_mesh(4, axis_name="batch"))
    assert b2.mesh is not None and b.mesh is None
    assert np.array_equal(b2.to_numpy(), arr)


def test_from_paths(tmp_path):
    from zignal_tpu.codecs import save_array

    rng = np.random.default_rng(3)
    paths = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        save_array(str(p), rng.integers(0, 256, (20, 24, 3), dtype=np.uint8))
        paths.append(str(p))
    b = ImageBatch.from_paths(paths, mesh=make_mesh(4, axis_name="batch"))
    assert b.batch_size == 4 and b.rows == 20 and b.cols == 24


def test_fill_set_border_match_image():
    arr = _arr(b=3)
    b = ImageBatch(arr)
    got = b.fill((12, 34, 56)).to_numpy()
    for i in range(3):
        img = z.Image.from_numpy(arr[i].copy())
        img.fill((12, 34, 56))
        assert np.array_equal(got[i], img.to_numpy())
    rect = z.Rectangle(4, 5, 30, 20)
    for color in (None, (9, 8, 7)):
        got = b.set_border(rect, color).to_numpy()
        for i in range(3):
            img = z.Image.from_numpy(arr[i].copy())
            img.set_border(rect, color)
            assert np.array_equal(got[i], img.to_numpy())
    # a non-intersecting rect fills everything (Image.set_border clause)
    far = z.Rectangle(1000, 1000, 1200, 1200)
    got = b.set_border(far, 3).to_numpy()
    img = z.Image.from_numpy(arr[0].copy())
    img.set_border(far, 3)
    assert np.array_equal(got[0], img.to_numpy())


def test_diff_matches_host_compute():
    a, bb = _arr(b=3, seed=1), _arr(b=3, seed=2)
    for kw in (dict(), dict(threshold=10.5, scale=2.0),
               dict(binary=True, threshold=3.0)):
        vis, counts = ImageBatch(a).diff(ImageBatch(bb), **kw)
        counts = np.asarray(counts)
        for i in range(3):
            ref_vis, ref_res = z.Image.from_numpy(a[i].copy()).diff(
                z.Image.from_numpy(bb[i].copy()), **kw)
            assert np.array_equal(vis.to_numpy()[i], ref_vis.to_numpy())
            assert counts[i] == ref_res.diff_count
    # rgba + force_opaque pins alpha
    a4, b4 = _arr(b=2, c=4, seed=3), _arr(b=2, c=4, seed=4)
    vis, _ = ImageBatch(a4).diff(ImageBatch(b4), force_opaque=True)
    ref_vis, _ = z.Image.from_numpy(a4[0].copy()).diff(
        z.Image.from_numpy(b4[0].copy()), force_opaque=True)
    assert np.array_equal(vis.to_numpy()[0], ref_vis.to_numpy())
    assert (vis.to_numpy()[..., 3] == 255).all()


def test_insert_matches_image():
    arr = _arr(b=2, h=40, w=40)
    src = _arr(b=1, h=10, w=12, seed=5)[0]
    rect = z.Rectangle(8, 6, 30, 26)
    got = ImageBatch(arr).insert(
        z.Image.from_numpy(src.copy()), rect, 0.3).to_numpy()
    for i in range(2):
        img = z.Image.from_numpy(arr[i].copy())
        img.insert(z.Image.from_numpy(src.copy()), rect, 0.3)
        assert np.array_equal(got[i], img.to_numpy())
    # per-image sources from a batch
    srcs = _arr(b=2, h=10, w=12, seed=6)
    got2 = ImageBatch(arr).insert(ImageBatch(srcs), rect).to_numpy()
    for i in range(2):
        img = z.Image.from_numpy(arr[i].copy())
        img.insert(z.Image.from_numpy(srcs[i].copy()), rect)
        assert np.array_equal(got2[i], img.to_numpy())
    # rgba source + blending
    src4 = _arr(b=1, h=10, w=12, c=4, seed=7)[0]
    src4[..., 3] = 128
    got3 = ImageBatch(arr).insert(
        z.Image.from_numpy(src4.copy()), rect,
        blend_mode=z.Blending.NORMAL).to_numpy()
    for i in range(2):
        img = z.Image.from_numpy(arr[i].copy())
        img.insert(z.Image.from_numpy(src4.copy()), rect,
                   blend_mode=z.Blending.NORMAL)
        assert np.array_equal(got3[i], img.to_numpy())


def test_flood_fill_matches_image():
    arr = _arr(b=2, h=80, w=80)  # >4096 px: Image takes the device path
    got = ImageBatch(arr).flood_fill(
        40, 40, (255, 0, 0), threshold=60.0).to_numpy()
    for i in range(2):
        img = z.Image.from_numpy(arr[i].copy())
        img.flood_fill(40, 40, (255, 0, 0), threshold=60.0)
        assert np.array_equal(got[i], img.to_numpy())


def test_save_roundtrip(tmp_path):
    arr = _arr(b=3, h=16, w=20)
    b = ImageBatch(arr)
    paths = [str(tmp_path / f"o{i}.png") for i in range(3)]
    b.save(paths)
    b2 = ImageBatch.from_paths(paths)
    assert np.array_equal(b2.to_numpy(), arr)
    with pytest.raises(ValueError):
        b.save(paths[:2])


def test_copy_and_rectangle():
    b = ImageBatch(_arr(b=2))
    c = b.copy()
    assert c is not b and np.array_equal(c.to_numpy(), b.to_numpy())
    r = b.get_rectangle()
    assert (r.left, r.top, r.right, r.bottom) == (0, 0, 48, 32)


def test_chaining_stays_on_device():
    b = ImageBatch(_arr(), mesh=make_mesh(8))
    out = b.resize((16, 24)).gaussian_blur(1.0).convert(z.Gray).equalize()
    assert out.channels == 1
    ref = ImageBatch(_arr()).resize((16, 24)).gaussian_blur(1.0) \
        .convert(z.Gray).equalize()
    assert np.array_equal(out.to_numpy(), ref.to_numpy())


def test_resize_blur_oklab_matches_pipeline():
    """The container's fused north-star entry is bit-identical to
    pipeline.resize_blur_oklab (VERDICT r4 #4), unsharded and on a 1-D
    mesh, and the sharded dispatch compiles collective-free with the
    output still batch-sharded."""
    from zignal_tpu import pipeline

    arr = _arr()
    want = np.asarray(pipeline.resize_blur_oklab(arr, 16, 24, 1.5))
    got = ImageBatch(arr).resize_blur_oklab((16, 24), sigma=1.5)
    assert np.array_equal(np.asarray(got), want)

    b = ImageBatch(arr, mesh=make_mesh(8))
    got_sh = b.resize_blur_oklab((16, 24), sigma=1.5)
    assert np.array_equal(np.asarray(got_sh), want)
    assert len(got_sh.sharding.device_set) == 8
    hlo = batch_mod.last_compiled_hlo()
    for coll in ("all-gather", "all-reduce", "collective-permute",
                 "all-to-all"):
        assert coll not in hlo, f"resize_blur_oklab compiled a {coll}"

    # scale-factor form + gray batch rejection
    got2 = ImageBatch(arr).resize_blur_oklab(0.5)
    assert np.asarray(got2).shape == (8, 16, 24, 3)
    with pytest.raises(ValueError):
        ImageBatch(arr).convert(z.Gray).resize_blur_oklab((16, 24))
