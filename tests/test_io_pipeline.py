"""Input pipeline tests (double-buffered host->device loader)."""

import numpy as np

import zignal_tpu as zignal
from zignal_tpu.io_pipeline import BatchLoader, load_image_batch


def _write_images(tmp_path, n, size=(24, 32)):
    paths = []
    rng = np.random.default_rng(1)
    for i in range(n):
        arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        zignal.Image.from_numpy(arr).save(p)
        paths.append(p)
    return paths


def test_load_image_batch(tmp_path):
    paths = _write_images(tmp_path, 4)
    batch = load_image_batch(paths, shape=(16, 16))
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == np.uint8


def test_batch_loader_iterates_with_prefetch(tmp_path):
    paths = _write_images(tmp_path, 7)
    loader = BatchLoader(paths, batch_size=3, shape=(16, 16))
    assert len(loader) == 3
    shapes = [b.shape for b in loader]
    assert shapes == [(3, 16, 16, 3), (3, 16, 16, 3), (1, 16, 16, 3)]


def test_batch_loader_drop_remainder(tmp_path):
    paths = _write_images(tmp_path, 7)
    loader = BatchLoader(paths, batch_size=3, shape=(8, 8), drop_remainder=True)
    assert len(loader) == 2
    assert sum(1 for _ in loader) == 2


def test_batch_loader_propagates_errors(tmp_path):
    import pytest

    loader = BatchLoader([str(tmp_path / "missing.png")], batch_size=1)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_profile_stages():
    from zignal_tpu.profiling import Profile

    p = Profile()
    with p.stage("a"):
        pass
    with p.stage("b"):
        pass
    with p.stage("a"):
        pass
    assert p.counts["a"] == 2 and p.counts["b"] == 1
    assert "total" in p.report()


def test_measure_runs_on_cpu():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zignal_tpu.profiling import measure

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.asarray(np.ones((64, 64), np.float32))
    secs, gpix = measure(f, x, pixels=64 * 64, n_small=1, n_large=4)
    assert gpix > 0


def test_bucket_shape():
    from zignal_tpu.shapes import bucket_shape

    assert bucket_shape(100, 200) == (128, 256)
    assert bucket_shape(512, 512) == (512, 512)
    assert bucket_shape(513, 100) == (768, 128)
    assert bucket_shape(5000, 4097) == (8192, 8192)


def test_pad_to_bucket():
    import numpy as np
    from zignal_tpu.shapes import pad_to_bucket

    a = np.ones((100, 200, 3), np.uint8)
    p, (h, w) = pad_to_bucket(a)
    assert p.shape == (128, 256, 3) and (h, w) == (100, 200)
    assert (p[:100, :200] == 1).all() and (p[100:] == 0).all()
    b = np.ones((2, 512, 512, 3), np.uint8)
    p2, _ = pad_to_bucket(b)
    assert p2 is b  # already at bucket
