"""PCA and FDM tests (ported from the reference's test_pca.py/test_fdm.py
plus statistical correctness checks)."""

import numpy as np
import pytest

import zignal_tpu as zignal


class TestPCA:
    def test_pca_basic(self):
        pca = zignal.PCA()
        data = zignal.Matrix(
            [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0], [10.0, 11.0, 12.0]]
        )
        pca.fit(data, num_components=2)
        assert pca.dim == 3
        assert pca.num_components == 2
        assert len(pca.eigenvalues) == 2
        assert len(pca.mean) == 3
        coeffs = pca.project([5.0, 6.0, 7.0])
        assert len(coeffs) == 2
        transformed = pca.transform(data)
        assert transformed.rows == 4 and transformed.cols == 2
        reconstructed = pca.reconstruct(coeffs)
        assert len(reconstructed) == 3
        # rank-1 data reconstructs exactly
        np.testing.assert_allclose(reconstructed, [5.0, 6.0, 7.0], atol=1e-9)

    def test_pca_with_numpy(self):
        np_data = np.random.default_rng(0).standard_normal((10, 5))
        matrix = zignal.Matrix.from_numpy(np_data)
        pca = zignal.PCA()
        pca.fit(matrix, num_components=3)
        transformed = pca.transform(matrix)
        out = transformed.to_numpy()
        assert out.shape == (10, 3)
        assert out.dtype == np.float64
        # eigenvalues match numpy covariance eigenvalues (top 3)
        cov = np.cov(np_data.T)
        w = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
        np.testing.assert_allclose(sorted(pca.eigenvalues, reverse=True), w, atol=1e-9)

    def test_pca_errors(self):
        pca = zignal.PCA()
        with pytest.raises(RuntimeError):
            pca.project([1.0])
        with pytest.raises(ValueError):
            pca.fit(zignal.Matrix([[1.0, 2.0]]))


class TestFDM:
    def test_fdm_accepts_images(self):
        src = zignal.Image(10, 10, (100, 100, 100))
        ref = zignal.Image(10, 10, (200, 200, 200))
        fdm = zignal.FeatureDistributionMatching()
        assert fdm.match(src, ref) is None

    def test_fdm_works_with_different_sizes(self):
        src = zignal.Image(20, 30, (0, 0, 0))
        ref = zignal.Image(50, 40, (0, 0, 0))
        zignal.FeatureDistributionMatching().match(src, ref)
        assert src.rows == 20 and src.cols == 30

    def test_fdm_batch_processing(self):
        target = zignal.Image(10, 10, (200, 200, 200))
        fdm = zignal.FeatureDistributionMatching()
        fdm.set_target(target)
        for i in range(3):
            val = 50 + i * 50
            src = zignal.Image(10, 10, (val, val, val))
            org = src.copy()
            fdm.set_source(src)
            fdm.update()
            assert not src[0, 0] == org[0, 0]

    def test_fdm_matches_statistics(self):
        """After matching, the source's mean/cov approximate the target's."""
        rng = np.random.default_rng(3)
        src_arr = rng.multivariate_normal(
            [120, 80, 60], np.diag([400, 300, 200]), size=(64, 64)
        ).clip(0, 255).astype(np.uint8)
        tgt_arr = rng.multivariate_normal(
            [60, 140, 180], [[500, 100, 0], [100, 400, 50], [0, 50, 300]],
            size=(64, 64),
        ).clip(0, 255).astype(np.uint8)
        src = zignal.Image.from_numpy(src_arr.copy())
        tgt = zignal.Image.from_numpy(tgt_arr.copy())
        zignal.FeatureDistributionMatching().match(src, tgt)
        out = src.to_numpy().reshape(-1, 3).astype(np.float64)
        want_mean = tgt_arr.reshape(-1, 3).mean(axis=0)
        got_mean = out.mean(axis=0)
        assert np.all(np.abs(got_mean - want_mean) < 4.0)
        want_cov = np.cov(tgt_arr.reshape(-1, 3).T)
        got_cov = np.cov(out.T)
        assert np.all(np.abs(got_cov - want_cov) / (np.abs(want_cov) + 50) < 0.2)

    def test_fdm_errors(self):
        fdm = zignal.FeatureDistributionMatching()
        with pytest.raises(TypeError):
            fdm.match(None, None)
        with pytest.raises(TypeError):
            fdm.match("a", "b")
        img = zignal.Image(10, 10, 0)
        with pytest.raises(TypeError):
            fdm.match("not_an_image", img)
        with pytest.raises(RuntimeError):
            zignal.FeatureDistributionMatching().update()

    def test_fdm_gray_images(self):
        src = zignal.Image(12, 12, 100, dtype=zignal.Gray)
        a = src.to_numpy()
        a[...] = np.random.default_rng(0).integers(40, 80, a.shape).astype(np.uint8)
        tgt = zignal.Image(12, 12, 0, dtype=zignal.Gray)
        b = tgt.to_numpy()
        b[...] = np.random.default_rng(1).integers(150, 250, b.shape).astype(np.uint8)
        zignal.FeatureDistributionMatching().match(src, tgt)
        assert abs(float(src.to_numpy().mean()) - float(b.mean())) < 5.0


def test_fdm_match_batch_matches_single():
    """Batched FDM equals per-image FDM exactly (same SVD + map math)."""
    import numpy as np
    import zignal_tpu as zignal

    rng = np.random.default_rng(12)
    batch = rng.integers(0, 256, (3, 24, 20, 3), dtype=np.uint8)
    target = zignal.Image.from_numpy(
        rng.integers(0, 256, (30, 30, 3), dtype=np.uint8))

    fdm = zignal.FeatureDistributionMatching()
    got = np.asarray(fdm.match_batch(batch, target))

    for i in range(batch.shape[0]):
        img = zignal.Image.from_numpy(batch[i].copy())
        single = zignal.FeatureDistributionMatching()
        single.match(img, target)
        assert np.array_equal(got[i], img.to_numpy()[..., :3]), i


def test_fdm_match_batch_validates():
    import numpy as np
    import pytest
    import zignal_tpu as zignal

    fdm = zignal.FeatureDistributionMatching()
    target = zignal.Image.from_numpy(
        np.random.default_rng(0).integers(0, 256, (8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        fdm.match_batch(np.zeros((4, 4, 3), np.uint8), target)


def test_pca_batched_device_variants_match_host():
    """fit_array/transform_array/reconstruct_array (SURVEY TPU-equiv
    "jnp, batched") agree with the host f64 fit to f32 statistics
    precision, including sign-aligned components."""
    import numpy as np

    from zignal_tpu.pca import PCA

    rng = np.random.default_rng(3)
    # correlated 3-channel "image" data
    base = rng.random((64, 64, 1))
    img = np.concatenate([base * 0.9 + 0.05 * rng.random((64, 64, 1)),
                          base * 0.5 + 0.1 * rng.random((64, 64, 1)),
                          0.2 + 0.3 * rng.random((64, 64, 1))], axis=-1)

    host = PCA()
    host.fit(img.reshape(-1, 3), 2)
    dev = PCA()
    dev.fit_array(img, 2)

    assert np.allclose(dev.mean, host.mean, atol=1e-5)
    assert np.allclose(dev.eigenvalues, host.eigenvalues, rtol=1e-3,
                       atol=1e-7)
    # components defined up to sign
    for k in range(2):
        a = np.asarray(dev._components)[:, k]
        b = np.asarray(host._components)[:, k]
        assert np.allclose(a, b, atol=1e-3) or np.allclose(a, -b, atol=1e-3)

    # round trip through the batched device path
    coeffs = dev.transform_array(img)
    assert coeffs.shape == (64, 64, 2)
    back = np.asarray(dev.reconstruct_array(coeffs))
    # top-2 of 3 correlated channels reconstructs well
    assert float(np.abs(back - img).mean()) < 0.05

    # transform_array matches the Matrix transform path
    flat = img.reshape(-1, 3)
    want = (flat - np.asarray(host._mean)) @ np.asarray(host._components)
    got = np.asarray(host.transform_array(flat))
    assert np.allclose(got, want, atol=1e-4)
