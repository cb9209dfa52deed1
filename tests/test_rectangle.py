"""Rectangle tests (ported from bindings/python/tests/test_rectangle.py)."""

import zignal_tpu as zignal


def test_rectangle_api():
    r = zignal.Rectangle(10, 20, 30, 40)
    assert (r.left, r.top, r.right, r.bottom) == (10, 20, 30, 40)
    assert (r.width, r.height) == (20, 20)
    assert isinstance(r.is_empty(), bool)
    r2 = zignal.Rectangle.init_center(20, 20, 10, 10)
    assert isinstance(r.intersect(r2) or r, zignal.Rectangle)
    assert isinstance(r.intersect((15, 25, 35, 45)) or r, zignal.Rectangle)
    assert isinstance(r.iou(r2), float)
    assert isinstance(r.iou((15, 25, 35, 45)), float)
    assert isinstance(r.overlaps(r2), bool)
    assert isinstance(r.overlaps((15, 25, 35, 45), iou_thresh=0.1), bool)

    assert r.center() == (20.0, 30.0)
    assert r.top_left() == (10.0, 20.0)
    assert r.top_right() == (30.0, 20.0)
    assert r.bottom_left() == (10.0, 40.0)
    assert r.bottom_right() == (30.0, 40.0)

    moved = r.translate(5, -5)
    assert (moved.left, moved.top, moved.right, moved.bottom) == (15.0, 15.0, 35.0, 35.0)

    clipped = r.clip(zignal.Rectangle(0, 0, 25, 35))
    assert (clipped.left, clipped.top, clipped.right, clipped.bottom) == (10.0, 20.0, 25.0, 35.0)

    assert r.overlaps((25, 25, 50, 50), iou_thresh=0.0, coverage_thresh=0.0) is True
    assert r.overlaps((30, 40, 60, 80), iou_thresh=0.0, coverage_thresh=0.0) is False

    outer = zignal.Rectangle(0, 0, 100, 100)
    assert outer.covers(r) is True
    assert r.covers(outer) is False

    assert isinstance(r.diagonal(), float)
    assert r.area() == 400.0
    assert r.perimeter() == 80.0
    grown = r.grow(5)
    assert (grown.left, grown.top, grown.right, grown.bottom) == (5.0, 15.0, 35.0, 45.0)
    shrunk = r.shrink(5)
    assert (shrunk.left, shrunk.top, shrunk.right, shrunk.bottom) == (15.0, 25.0, 25.0, 35.0)
    merged = r.merge((0, 0, 5, 5))
    assert (merged.left, merged.top, merged.right, merged.bottom) == (0.0, 0.0, 30.0, 40.0)
    assert zignal.Rectangle(0, 0, 10, 10).iou((0, 0, 10, 10)) == 1.0
