"""`zignal diff` (reference: src/cli/diff.zig; src/image/diff.zig)."""

from __future__ import annotations

import numpy as np

from .common import emit_display

description = "Compute the visual difference between two images."


def configure(parser):
    parser.add_argument("image1")
    parser.add_argument("image2")
    parser.add_argument("-o", "--output", help="Path to save the difference image")
    parser.add_argument("--scale", type=float, default=1.0,
                        help="Scale factor for difference visibility")
    parser.add_argument("--threshold", type=int, default=0,
                        help="Ignore differences smaller than this (0-255)")
    parser.add_argument("--binary", action="store_true",
                        help="White for difference, black for match")
    parser.add_argument("-d", "--display", action="store_true")
    parser.add_argument("--width", type=int)
    parser.add_argument("--height", type=int)
    parser.add_argument("--protocol")


def diff_arrays(a: np.ndarray, b: np.ndarray, scale=1.0, threshold=0,
                binary=False):
    """Difference visualization + stats (reference: image/diff.zig)."""
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    d = np.where(d < threshold, 0, d)
    stats = {
        "max": int(d.max()),
        "mean": float(d.mean()),
        "differing": float((d.sum(axis=-1) > 0).mean()),
    }
    if binary:
        vis = np.where(d.sum(axis=-1, keepdims=True) > 0, 255, 0
                       ).astype(np.uint8).repeat(a.shape[-1], axis=-1)
    else:
        vis = np.clip(d * scale, 0, 255).astype(np.uint8)
    return vis, stats


def run(args):
    from ..image import Image

    a = Image.load(args.image1)
    b = Image.load(args.image2)
    if (a.rows, a.cols) != (b.rows, b.cols):
        raise ValueError("images must have the same dimensions")
    if a.dtype is not b.dtype:
        b = b.convert(a.dtype)
    vis, stats = diff_arrays(a.to_numpy(), b.to_numpy(),
                             args.scale, args.threshold, args.binary)
    print(f"max diff: {stats['max']}  mean diff: {stats['mean']:.3f}  "
          f"differing pixels: {stats['differing'] * 100:.2f}%")
    out = Image.from_numpy(vis)
    if args.output:
        out.save(args.output)
    if args.display or not args.output:
        emit_display(out, args.protocol, args.width, args.height)
    return 0
