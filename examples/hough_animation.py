"""Animated Hough transform of a rotating line
(reference: examples/src/hough_animation.zig).

Each frame: draw a rotating line, compute the Hough accumulator over a
sub-box, detect the strongest line, overlay it (red) plus the compute
box (green), and render the accumulator through the viridis colormap.
Frames are written out as an animated GIF (the reference renders the
same loop to a WASM canvas).
"""

import math
import os

import numpy as np

from _common import OUT_DIR, zignal
from zignal_tpu.ops.hough import HoughTransform

SIZE = 200
HOUGH_SIZE = 128
OFFSET = 25


def rotate_point(center, p, angle):
    s, c = math.sin(angle), math.cos(angle)
    x, y = p[0] - center[0], p[1] - center[1]
    return (center[0] + x * c - y * s, center[1] + x * s + y * c)


def render(hough, time_step: float):
    angle1 = time_step * math.pi / 13.0
    angle2 = time_step * math.pi / 40.0
    center = (SIZE / 2.0, SIZE / 2.0)
    arc = rotate_point(center, (center[0] + SIZE * 0.22, center[1]), angle1)
    l = rotate_point(arc, (arc[0] + 500.0, arc[1]), angle2)
    r = rotate_point(arc, (arc[0] - 500.0, arc[1]), angle2)

    img = zignal.Image(SIZE, SIZE, 0, dtype=zignal.Gray)
    img.canvas().draw_line(l, r, 255, 5, mode=zignal.DrawMode.SOFT)

    # Hough over the sub-box (offset crop, like the reference's box)
    crop = img.to_numpy()[OFFSET:OFFSET + HOUGH_SIZE,
                          OFFSET:OFFSET + HOUGH_SIZE, 0]
    acc = hough.compute(crop)
    max_val = int(acc.max())

    out = img.convert(zignal.Rgb)
    canvas = out.canvas()
    if max_val > 0:
        lines = hough.find_lines(acc, threshold=max(1, max_val // 2),
                                 angle_nms_thresh=5.0,
                                 radius_nms_thresh=5.0)
        if lines:
            ln = lines[0]
            p1 = (ln.p1[0] + OFFSET, ln.p1[1] + OFFSET)
            p2 = (ln.p2[0] + OFFSET, ln.p2[1] + OFFSET)
            canvas.draw_line(p1, p2, (255, 0, 0), 3,
                             mode=zignal.DrawMode.SOFT)
    green = (0, 255, 0)
    b = (OFFSET, OFFSET, OFFSET + HOUGH_SIZE, OFFSET + HOUGH_SIZE)
    canvas.draw_rectangle(b, green, 1)

    # accumulator through viridis, like the reference's colormap pass
    if max_val > 0:
        norm = (acc.astype(np.float64) * 255.0 / max_val).astype(np.uint8)
    else:
        norm = np.zeros_like(acc, dtype=np.uint8)
    acc_img = zignal.Image.from_numpy(norm[..., None].copy()).apply_colormap(
        zignal.Colormap.viridis())
    return out, acc_img


def main(n_frames: int = 12):
    hough = HoughTransform(HOUGH_SIZE)
    frames = []
    for i in range(n_frames):
        out, acc_img = render(hough, time_step=float(i))
        # side-by-side composite
        h = max(out.rows, acc_img.rows)
        composite = np.zeros((h, out.cols + acc_img.cols, 3), np.uint8)
        composite[:out.rows, :out.cols] = out.to_numpy()
        composite[:acc_img.rows, out.cols:] = acc_img.to_numpy()
        frames.append(composite)

    from zignal_tpu.codecs.gif import encode_animated

    data = encode_animated(frames, delays_cs=[12] * len(frames),
                           loop_count=0)
    path = os.path.join(OUT_DIR, "hough_animation.gif")
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(frames)} frames, {len(data)} bytes)")


if __name__ == "__main__":
    main()
