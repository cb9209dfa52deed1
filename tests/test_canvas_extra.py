"""Additional Canvas tests: geometry correctness + AA behavior
(reference strategy: src/canvas/tests/ drawing + regression suites)."""

import math

import numpy as np

import zignal_tpu as zignal


def _img(n=40, dtype=None):
    return zignal.Image(n, n, (0, 0, 0), dtype=dtype or zignal.Rgb)


class TestPrimitives:
    def test_fill_rectangle_exact(self):
        img = _img()
        img.canvas().fill_rectangle(zignal.Rectangle(10, 12, 20, 18), (255, 0, 0))
        a = img.to_numpy()
        assert (a[12:18, 10:20, 0] == 255).all()
        assert a[11, 15, 0] == 0 and a[18, 15, 0] == 0
        assert a[15, 9, 0] == 0 and a[15, 20, 0] == 0

    def test_horizontal_line(self):
        img = _img()
        img.canvas().draw_line((5, 10), (30, 10), (0, 255, 0))
        a = img.to_numpy()
        assert (a[10, 5:31, 1] == 255).all()
        assert a[12, 15, 1] == 0

    def test_thick_line(self):
        img = _img()
        img.canvas().draw_line((5, 20), (35, 20), (255, 255, 255), width=5)
        a = img.to_numpy()
        assert (a[18:23, 15, 0] == 255).all()
        assert a[25, 15, 0] == 0

    def test_circle_fill_and_outline(self):
        img = _img()
        img.canvas().fill_circle((20, 20), 8, (0, 0, 255))
        a = img.to_numpy()
        assert a[20, 20, 2] == 255
        assert a[20, 13, 2] == 255
        assert a[20, 10, 2] == 0
        img2 = _img()
        img2.canvas().draw_circle((20, 20), 8, (0, 0, 255))
        b = img2.to_numpy()
        assert b[20, 20, 2] == 0          # hollow center
        assert b[20, 12, 2] == 255        # on the ring

    def test_soft_mode_antialiases(self):
        img = _img()
        img.canvas().draw_line((5.0, 5.0), (34.0, 20.0), (255, 255, 255),
                               mode=zignal.DrawMode.SOFT)
        a = img.to_numpy()[..., 0]
        partial = ((a > 0) & (a < 255)).sum()
        assert partial > 5  # fractional coverage present

    def test_fill_polygon_triangle(self):
        img = _img()
        img.canvas().fill_polygon([(5, 5), (35, 5), (20, 30)], (255, 0, 0))
        a = img.to_numpy()
        assert a[8, 20, 0] == 255     # inside
        assert a[28, 6, 0] == 0       # outside
        assert a[35, 20, 0] == 0

    def test_arc(self):
        img = _img()
        img.canvas().draw_arc((20, 20), 10, 0, math.pi / 2, (0, 255, 0))
        a = img.to_numpy()
        assert a[20, 30, 1] == 255    # angle 0 (right)
        assert a[30, 20, 1] == 255    # angle pi/2 (down, y+)
        assert a[10, 20, 1] == 0      # angle -pi/2 not drawn

    def test_beziers_and_splines(self):
        img = _img()
        c = img.canvas()
        c.draw_quadratic_bezier((2, 30), (20, -10), (38, 30), (255, 0, 0))
        c.draw_cubic_bezier((2, 35), (10, 25), (30, 25), (38, 35), (0, 255, 0))
        c.draw_spline_polygon([(10, 10), (30, 10), (30, 30), (10, 30)],
                              (0, 0, 255), tension=0.5)
        a = img.to_numpy()
        assert (a[..., 0] == 255).any()
        assert (a[..., 1] == 255).any()
        assert (a[..., 2] == 255).any()
        img2 = _img()
        img2.canvas().fill_spline_polygon(
            [(10, 10), (30, 10), (30, 30), (10, 30)], (255, 255, 0))
        assert img2.to_numpy()[20, 20, 0] == 255

    def test_rgba_alpha_compositing(self):
        img = zignal.Image(10, 10, (100, 0, 0), dtype=zignal.Rgb)
        img.canvas().fill_rectangle((0, 0, 10, 10), (0, 0, 255, 128))
        px = img[5, 5].item()
        assert 40 < px.r < 60     # half red remains
        assert 120 < px.b < 135   # half blue added

    def test_draw_text_positions(self):
        img = _img(48)
        img.canvas().draw_text("A", (10, 10), (255, 255, 255))
        a = img.to_numpy()[..., 0]
        assert (a[10:18, 10:18] == 255).any()
        assert (a[:8, :8] == 0).all()
        img2 = _img(48)
        img2.canvas().draw_text("A", (10, 10), (255, 255, 255), scale=2.0)
        assert (img2.to_numpy()[..., 0] == 255).sum() > (a == 255).sum()


class TestBitmapFontExtra:
    def test_bounds_and_mask(self):
        font = zignal.BitmapFont.font8x8()
        assert font.text_bounds("AB") == (16, 8)
        assert font.text_bounds("A\nB") == (8, 16)
        mask = font.render_mask("I")
        assert mask.shape == (8, 8)
        assert mask.any()

    def test_bdf_roundtrip(self, tmp_path):
        font = zignal.BitmapFont.font8x8()
        p = str(tmp_path / "f.bdf")
        font.save(p)
        back = zignal.BitmapFont.load(p)
        assert len(back.glyphs) == len(font.glyphs)
        assert np.array_equal(back.glyphs[ord("A")], font.glyphs[ord("A")])
        assert back.advances[ord("A")] == 8
        # gzip variant
        pz = str(tmp_path / "f.bdf.gz")
        font.save(pz)
        back2 = zignal.BitmapFont.load(pz)
        assert np.array_equal(back2.glyphs[ord("Z")], font.glyphs[ord("Z")])
