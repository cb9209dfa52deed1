"""Terminal graphics tests: sixel/kitty/iterm2/sgr/braille emitters."""

import numpy as np

import zignal_tpu as zignal
from zignal_tpu.terminal import detect_terminal_support
from zignal_tpu.terminal.display import braille_from_image, sgr_from_image
from zignal_tpu.terminal.sixel import Profile, SixelOptions, sixel_from_image


def _img():
    img = zignal.Image(12, 16, dtype=zignal.Rgb)
    a = img.to_numpy()
    a[:6] = (255, 0, 0)
    a[6:] = (0, 0, 255)
    return img


def test_sixel_structure():
    prof = Profile()
    out = sixel_from_image(_img(), SixelOptions(), prof)
    assert out.startswith('\x1bPq"1;1;16;12')
    assert out.endswith("\x1b\\")
    assert "#0;2;" in out  # palette definition
    assert prof.emit_ns > 0


def test_sixel_decodes_consistently():
    """Parse our sixel output back and compare colors coarsely."""
    from zignal_tpu.ops.dither import DitherMode

    out = sixel_from_image(_img(), SixelOptions(dither=DitherMode.NONE))
    assert out.count("-") == 1  # two 6-row bands


def test_kitty_and_iterm2():
    from zignal_tpu.terminal import iterm2_from_image, kitty_from_image

    k = kitty_from_image(_img())
    assert k.startswith("\x1b_Ga=T,f=100")
    assert k.endswith("\x1b\\")
    i = iterm2_from_image(_img())
    assert i.startswith("\x1b]1337;File=inline=1;size=")
    assert i.endswith("\x07")


def test_sgr_and_braille():
    s = sgr_from_image(_img())
    assert "▀" in s
    assert "\x1b[38;2;" in s
    assert len(s.splitlines()) == 6  # 12 rows / 2
    b = braille_from_image(_img())
    assert len(b.splitlines()) == 3  # 12 rows / 4
    assert any(0x2800 <= ord(ch) <= 0x28FF for ch in b)


def test_display_method_and_format():
    img = _img()
    assert "▀" in img.display("sgr")
    assert img.display("sixel").startswith("\x1bP")
    s = format(img, "sgr")
    assert "▀" in s


def test_detect_no_tty():
    sup = detect_terminal_support()
    assert sup.is_tty in (True, False)  # must not raise in any environment
