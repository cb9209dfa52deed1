"""Content-aware seam carving (reference: examples/src/seam_carving.zig —
dynamic-programming energy in the example itself)."""

import numpy as np

from _common import load_input, save, zignal


def _remove_vertical_seam(arr):
    h, w = arr.shape[:2]
    gray = (0.2126 * arr[..., 0] + 0.7152 * arr[..., 1]
            + 0.0722 * arr[..., 2]).astype(np.float64)
    gx = np.abs(np.diff(gray, axis=1, append=gray[:, -1:]))
    gy = np.abs(np.diff(gray, axis=0, append=gray[-1:, :]))
    energy = gx + gy
    cost = energy.copy()
    for r in range(1, h):
        left = np.roll(cost[r - 1], 1)
        right = np.roll(cost[r - 1], -1)
        left[0] = np.inf
        right[-1] = np.inf
        cost[r] += np.minimum(np.minimum(left, cost[r - 1]), right)
    seam = np.zeros(h, dtype=int)
    seam[-1] = int(np.argmin(cost[-1]))
    for r in range(h - 2, -1, -1):
        c = seam[r + 1]
        lo = max(c - 1, 0)
        hi = min(c + 2, w)
        seam[r] = lo + int(np.argmin(cost[r, lo:hi]))
    mask = np.ones((h, w), bool)
    mask[np.arange(h), seam] = False
    return arr[mask].reshape(h, w - 1, arr.shape[2])


def main():
    img = load_input(size=(192, 256))
    arr = img.to_numpy().copy()
    for _ in range(64):
        arr = _remove_vertical_seam(arr)
    save(zignal.Image.from_numpy(np.ascontiguousarray(arr)), "seam_carved.png")


if __name__ == "__main__":
    main()
