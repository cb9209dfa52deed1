"""Histogram tests (reference: src/image/histogram.zig)."""

import numpy as np

import zignal_tpu as zignal


def test_histogram_gray():
    img = zignal.Image(4, 4, dtype=zignal.Gray)
    img.to_numpy()[..., 0] = np.arange(16, dtype=np.uint8).reshape(4, 4)
    h = img.histogram()
    assert h.channels == ("y",)
    assert h.total_pixels() == 16
    assert h.values[0, :16].sum() == 16
    assert h.mean() == 7.5
    assert h.median() == 7
    assert h.percentile(0.0) == 0
    assert h.percentile(1.0) == 15


def test_histogram_rgb_stats():
    img = zignal.Image(2, 2, (10, 20, 30), dtype=zignal.Rgb)
    h = img.histogram()
    assert h.channels == ("r", "g", "b")
    assert h.mean() == (10.0, 20.0, 30.0)
    assert h.mode() == (10, 20, 30)
    assert h.variance() == (0.0, 0.0, 0.0)
    assert h.channel("g")[20] == 4


def test_incremental():
    img = zignal.Image(2, 2, 5, dtype=zignal.Gray)
    h = img.histogram()
    h.add_value(0, 7)
    assert h.values[0, 7] == 1
    h.remove_value(0, 7)
    assert h.values[0, 7] == 0


def test_histogram256_weighted_and_multi_match_numpy():
    import jax.numpy as jnp
    import numpy as np

    from zignal_tpu.ops.binary import histogram256, histogram256_multi

    rng = np.random.default_rng(17)
    x = rng.integers(0, 256, (123, 77), dtype=np.uint8)
    w = rng.integers(0, 4, x.shape).astype(np.int32)
    got = np.asarray(histogram256(jnp.asarray(x), weights=jnp.asarray(w)))
    want = np.bincount(x.ravel(), weights=w.ravel(),
                       minlength=256).astype(np.int64)
    np.testing.assert_array_equal(got, want)

    rgb = rng.integers(0, 256, (50, 61, 3), dtype=np.uint8)
    multi = np.asarray(histogram256_multi(jnp.asarray(rgb)))
    for c in range(3):
        np.testing.assert_array_equal(
            multi[c], np.bincount(rgb[..., c].ravel(), minlength=256))
