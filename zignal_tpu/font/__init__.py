"""Bitmap fonts: built-in 8x8 font, BDF and PCF parsers
(reference: src/font/)."""

from .bitmap_font import BitmapFont

__all__ = ["BitmapFont"]
