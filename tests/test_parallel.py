"""Multi-chip collective ops on the virtual 8-device CPU mesh
(reference parallelism statement: SURVEY.md §2)."""

import pytest


@pytest.fixture
def mesh8():
    import jax
    from zignal_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)



def test_spatial_histogram_matches_local(mesh8):
    import jax.numpy as jnp
    import numpy as np
    from zignal_tpu.parallel import spatial_histogram

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 32, 3), dtype=np.uint8)
    got = np.asarray(spatial_histogram(mesh8)(jnp.asarray(img)))
    for c in range(3):
        want = np.bincount(img[..., c].ravel(), minlength=256)
        assert np.array_equal(got[c], want)


def test_sharded_pipeline_matches_single_device(mesh8):
    """Batch-sharded north-star pipeline == unsharded pipeline, exactly
    (VERDICT r1 weak #2: value equality, not just shapes)."""
    import numpy as np
    from zignal_tpu.parallel import shard_batch, sharded_pipeline
    from zignal_tpu.pipeline import resize_blur_oklab

    rng = np.random.default_rng(6)
    batch = rng.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    step = sharded_pipeline(mesh8, 32, 32, sigma=1.0)
    got = np.asarray(step(shard_batch(batch, mesh8)))
    want = np.asarray(resize_blur_oklab(batch, 32, 32, 1.0))
    assert np.array_equal(got, want)


def test_global_mean_cov_matches_numpy(mesh8):
    import numpy as np
    from zignal_tpu.parallel import global_mean_cov, shard_batch

    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (16, 24, 24, 3), dtype=np.uint8)
    mean, cov = global_mean_cov(mesh8)(shard_batch(batch, mesh8))
    flat = batch.reshape(-1, 3).astype(np.float64)
    want_mean = flat.mean(axis=0)
    want_cov = flat.T @ flat / flat.shape[0] - np.outer(want_mean, want_mean)
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), want_cov,
                               rtol=1e-4, atol=1e-2)


def test_spatial_equalize_matches_single_device(mesh8):
    import jax.numpy as jnp
    import numpy as np
    from zignal_tpu.ops.enhancement import equalize
    from zignal_tpu.parallel import spatial_equalize

    rng = np.random.default_rng(4)
    img = rng.integers(10, 200, (64, 32, 3), dtype=np.uint8)
    got = np.asarray(spatial_equalize(mesh8)(jnp.asarray(img)))
    want = np.asarray(equalize(jnp.asarray(img)))
    assert np.array_equal(got, want)
