import pytest

import zignal_tpu as zignal


def test_bitmap_font_default_and_draw():
    font = zignal.BitmapFont.font8x8()
    assert isinstance(font, zignal.BitmapFont)
    img = zignal.Image(40, 80, 0)
    before = img.copy()
    img.canvas().draw_text("Hi", (5, 5), (255, 255, 255), font)
    assert img != before


def test_bitmap_font_invalids():
    canvas = zignal.Image(20, 40, 0).canvas()
    with pytest.raises(TypeError):
        canvas.draw_text("Hi", (0, 0), 255, "not a font")
    with pytest.raises(FileNotFoundError):
        zignal.BitmapFont.load("/definitely/missing.bdf")


# ---------------------------------------------------------------------------
# PCF writer + unicode load filters (reference: pcf.zig:1329, unicode.zig)
# ---------------------------------------------------------------------------


def test_pcf_roundtrip(tmp_path):
    import numpy as np
    from zignal_tpu.font import BitmapFont

    f = BitmapFont.font8x8()
    p = str(tmp_path / "f.pcf")
    f.save(p)
    g = BitmapFont.load(p)
    assert len(g.glyphs) == len(f.glyphs)
    assert g.ascent == f.ascent and g.descent == f.descent
    for cp, glyph in f.glyphs.items():
        assert np.array_equal(g.glyphs[cp][:8, :8], glyph)
        assert g.advances[cp] == f.advances[cp]


def test_pcf_roundtrip_gzip(tmp_path):
    from zignal_tpu.font import BitmapFont

    f = BitmapFont.font8x8()
    p = str(tmp_path / "f.pcf.gz")
    f.save(p)
    g = BitmapFont.load(p)
    assert len(g.glyphs) == len(f.glyphs)


def test_load_filter_range(tmp_path):
    from zignal_tpu.font import BitmapFont, Range

    f = BitmapFont.font8x8()
    pcf = str(tmp_path / "f.pcf")
    bdf = str(tmp_path / "f.bdf")
    f.save(pcf)
    f.save(bdf)
    for p in (pcf, bdf):
        g = BitmapFont.load(p, filter=Range(0x41, 0x5A))
        assert sorted(g.glyphs) == list(range(0x41, 0x5B))
        h = BitmapFont.load(p, filter=[(0x30, 0x39), Range(0x61, 0x66)])
        assert sorted(h.glyphs) == list(range(0x30, 0x3A)) + list(range(0x61, 0x67))


def test_unicode_named_ranges():
    from zignal_tpu.font import ranges

    assert 0x41 in ranges.ascii
    assert 0x4E2D in ranges.cjk_unified
    assert any(0x153 in r for r in ranges.western_european)


def test_format_detection(tmp_path):
    from zignal_tpu.font import BitmapFont, FontFormat, detect_from_path

    f = BitmapFont.font8x8()
    pcf = str(tmp_path / "f.pcf")
    bdf = str(tmp_path / "f.bdf")
    f.save(pcf)
    f.save(bdf)
    assert detect_from_path(pcf) is FontFormat.PCF
    assert detect_from_path(bdf) is FontFormat.BDF


def test_pcf_two_byte_encoding(tmp_path):
    """Codepoints above U+00FF use the two-byte encoding matrix."""
    import numpy as np
    from zignal_tpu.font import BitmapFont

    glyphs = {0x41: np.eye(8, dtype=bool), 0x2500: np.ones((8, 8), bool)}
    adv = {0x41: 8, 0x2500: 8}
    f = BitmapFont("two", glyphs, adv, 8, 0)
    p = str(tmp_path / "two.pcf")
    f.save(p)
    g = BitmapFont.load(p)
    assert sorted(g.glyphs) == [0x41, 0x2500]
    assert np.array_equal(g.glyphs[0x2500][:8, :8], glyphs[0x2500])
