"""Flood fill tests (ported from reference test_image.py test_flood_fill)."""

import pytest

import zignal_tpu as zignal


def test_flood_fill():
    img = zignal.Image(5, 5, 0, dtype=zignal.Gray)
    for r, c in ((2, 2), (2, 1), (2, 3), (1, 2), (3, 2)):
        img[r, c] = 5

    img.flood_fill(2, 2, 9, threshold=0.0)
    assert img[2, 2] == 9
    assert img[2, 1] == 9
    assert img[0, 0] == 0

    with pytest.raises(ValueError):
        img.flood_fill(5, 5, 9)

    img_rgb = zignal.Image(1, 3, dtype=zignal.Rgb)
    img_rgb[0, 0] = (100, 100, 100)
    img_rgb[0, 1] = (100, 100, 103)
    img_rgb[0, 2] = (100, 100, 107)
    img_thresh = img_rgb.copy()
    img_thresh.flood_fill(0, 0, (255, 0, 0), threshold=4.0)
    assert img_thresh[0, 1].item().r == 255
    assert img_thresh[0, 2].item().b == 107

    diag = zignal.Image(3, 3, 0, dtype=zignal.Gray)
    diag[0, 0] = 5
    diag[1, 1] = 5
    diag4 = diag.copy()
    diag4.flood_fill(1, 1, 9, connectivity=4)
    assert diag4[0, 0] == 5
    diag8 = diag.copy()
    diag8.flood_fill(1, 1, 9, connectivity=8)
    assert diag8[0, 0] == 9
    with pytest.raises(ValueError, match="connectivity must be 4 or 8"):
        diag.flood_fill(1, 1, 9, connectivity=5)

    grad = zignal.Image(1, 5, dtype=zignal.Gray)
    for col in range(5):
        grad[0, col] = col
    grad_seed = grad.copy()
    grad_seed.flood_fill(0, 0, 9, threshold=1.0, mode=zignal.ThresholdMode.SEED)
    assert grad_seed[0, 1] == 9
    assert grad_seed[0, 2] == 2
    grad_neighbor = grad.copy()
    grad_neighbor.flood_fill(0, 0, 9, threshold=1.0, mode=zignal.ThresholdMode.NEIGHBOR)
    assert grad_neighbor[0, 4] == 9
