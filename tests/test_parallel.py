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
