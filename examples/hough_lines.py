"""Hough line detection (reference: examples/src/hough_animation.zig)."""

from _common import load_input, save, zignal
from zignal_tpu.ops.hough import HoughTransform


def main():
    img = load_input(size=(256, 256))
    edges = img.canny(sigma=1.4, low=40, high=120)
    ht = HoughTransform(256)
    acc = ht.compute(edges)
    lines = ht.find_lines(acc, threshold=60)
    print(f"found {len(lines)} lines")
    canvas = img.canvas()
    for ln in lines[:12]:
        canvas.draw_line(ln.p1, ln.p2, (255, 0, 0))
    save(img, "hough_lines.png")
    cmap = zignal.Colormap.inferno()
    acc_img = zignal.Image.from_numpy(
        (acc * 255 / max(acc.max(), 1)).astype("uint8")[..., None].copy()
    )
    save(acc_img.apply_colormap(cmap), "hough_accumulator.png")


if __name__ == "__main__":
    main()
