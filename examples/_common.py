"""Shared example helpers."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import zignal_tpu as zignal  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
DEFAULT_IMAGE = "/root/reference/assets/liza.jpg"


os.makedirs(OUT_DIR, exist_ok=True)


def load_input(argv=None, size=None):
    """The example input image: CLI arg, the reference photo, or synthetic."""
    argv = argv if argv is not None else sys.argv[1:]
    if argv:
        img = zignal.Image.load(argv[0])
    elif os.path.exists(DEFAULT_IMAGE):
        img = zignal.Image.load(DEFAULT_IMAGE)
    else:
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        img = zignal.Image.from_numpy(arr)
    if size is not None:
        img = img.resize(size)
    return img


def save(img, name):
    path = os.path.join(OUT_DIR, name)
    img.save(path)
    print(f"wrote {path} ({img.cols}x{img.rows})")
    return path
