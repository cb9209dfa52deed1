"""Golden-hash regression for Canvas rasterization
(reference approach: src/canvas/tests/regression.zig — render draw ops,
hash the RGBA buffer, compare to checked-in digests).

Digests were generated from this implementation; they pin today's exact
rasterization so silent changes are caught. Regenerate by running this
file directly: `python tests/test_canvas_regression.py`.
"""

import hashlib

import numpy as np
import pytest

import zignal_tpu as zignal

GOLDEN = {
    "lines_fast": "c3349709bec7c31d77964442e644770c",
    "lines_soft": "2c9451486b3551e32c537b9fe809d3dd",
    "circles": "500682d8e9c3bdca2cde3b7482d00704",
    "polygon_fill": "35d7db2659cdd43dd152c205f9339504",
    "bezier_spline": "9e4d65f1a3b9ff108f7116d644a36942",
    "text": "1cc149a3d63024243b3fddea500e8345",
}


def _canvas_image():
    return zignal.Image(64, 64, (0, 0, 0, 255), dtype=zignal.Rgba)


def _render(name):
    img = _canvas_image()
    c = img.canvas()
    if name == "lines_fast":
        c.draw_line((2, 2), (60, 40), (255, 0, 0), width=1)
        c.draw_line((5, 60), (60, 5), (0, 255, 0, 128), width=3)
    elif name == "lines_soft":
        c.draw_line((2, 2), (60, 40), (255, 0, 0), width=2,
                    mode=zignal.DrawMode.SOFT)
        c.draw_line((5, 60), (60, 5), (0, 128, 255), width=4,
                    mode=zignal.DrawMode.SOFT)
    elif name == "circles":
        c.draw_circle((32, 32), 20, (255, 255, 0))
        c.fill_circle((20, 44), 10, (255, 0, 255, 200))
        c.fill_circle((44, 20), 8, (0, 255, 255), mode=zignal.DrawMode.SOFT)
    elif name == "polygon_fill":
        pts = [(32, 4), (60, 24), (49, 58), (15, 58), (4, 24)]
        c.fill_polygon(pts, (64, 128, 255))
        c.draw_polygon(pts, (255, 255, 255), width=1)
    elif name == "bezier_spline":
        c.draw_quadratic_bezier((4, 60), (32, -20), (60, 60), (255, 64, 64),
                                width=2)
        c.draw_cubic_bezier((4, 10), (20, 50), (44, -30), (60, 30),
                            (64, 255, 64), width=1)
    elif name == "text":
        c.draw_text("Zig!", (4, 4), (255, 255, 255), scale=2)
        c.draw_text("tpu", (8, 40), (255, 200, 0))
    return img.to_numpy()


def _digest(arr) -> str:
    return hashlib.md5(np.ascontiguousarray(arr).tobytes()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_canvas_golden(name):
    assert _digest(_render(name)) == GOLDEN[name]


if __name__ == "__main__":
    import re
    import sys

    path = __file__
    src = open(path).read()
    for name in GOLDEN:
        h = _digest(_render(name))
        src = re.sub(rf'"{name}": "[0-9a-fREGEN]+"', f'"{name}": "{h}"', src)
        print(name, h)
    open(path, "w").write(src)
    sys.exit(0)
