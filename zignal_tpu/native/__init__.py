"""Native (C++) host runtime: codec hot loops, loaded via ctypes.

Built lazily with g++ on first use and cached next to the sources (the
.so is never committed — it is built with -march=native for THIS host).
Every entry point has a pure-Python fallback (PNG filter/unfilter, GIF
LZW, dither, JPEG entropy encode) EXCEPT full JPEG decode, which raises
a clean JpegError when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_zt_native.so")
_SOURCES = [os.path.join(_DIR, "codec_core.cpp"), os.path.join(_DIR, "jpeg_core.cpp")]
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    sources = [s for s in _SOURCES if os.path.exists(s)]
    # -fno-math-errno: we never read errno from libm, and it lets the
    # vectorizer turn lrintf into one vcvtps2dq per vector (the errno
    # side effect otherwise pins every rounding call scalar)
    cmd = ["g++", "-O3", "-march=native", "-fno-math-errno", "-shared",
           "-fPIC", "-std=c++17", "-o", _LIB_PATH + ".tmp", *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        newest_src = max(
            (os.path.getmtime(s) for s in _SOURCES if os.path.exists(s)),
            default=0.0,
        )
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.zt_png_unfilter.restype = ctypes.c_int
        lib.zt_png_unfilter.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.zt_gif_lzw_decode.restype = ctypes.c_int64
        lib.zt_gif_lzw_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.zt_gif_lzw_encode.restype = ctypes.c_int64
        lib.zt_gif_lzw_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.zt_png_filter_msd.restype = ctypes.c_int64
        lib.zt_png_filter_msd.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.zt_jpeg_entropy_encode.restype = ctypes.c_int64
        lib.zt_jpeg_entropy_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.zt_jpeg_encode_scan.restype = ctypes.c_int64
        lib.zt_jpeg_encode_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.zt_median_cut.restype = ctypes.c_int64
        lib.zt_median_cut.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p,
        ]
        lib.zt_clt_build.restype = ctypes.c_int
        lib.zt_clt_build.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.zt_sixel_emit.restype = ctypes.c_int64
        lib.zt_sixel_emit.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.zt_zlib_rle_compress.restype = ctypes.c_int64
        lib.zt_zlib_rle_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64,
        ]
        for name in ("zt_resize_bilinear_u8", "zt_resize_nearest_u8"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64,
            ]
        for name in ("zt_resize_cubic_u8", "zt_resize_lanczos_u8"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
        lib.zt_dither_error_diffusion.restype = ctypes.c_int
        lib.zt_dither_error_diffusion.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
    return _lib
