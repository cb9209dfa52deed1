#!/usr/bin/env python
"""Interleaved A/B of zt_zlib_rle_compress between the committed .so
(pass a path, default /tmp/zt_old.so) and the freshly built one.

Host windows drift 1.5-2.5x within minutes (CLAUDE.md): only same-
process round-robin minima are valid. Input = the REAL bench deflate
payload: MSD-filtered scanlines of liza.jpg decoded + half-resized
(falls back to a synthetic photo when the reference checkout is absent).
"""

import ctypes
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    old_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zt_old.so"
    from zignal_tpu.native import get_lib

    new = get_lib()  # triggers rebuild from the edited source
    assert new is not None, "native build failed"
    old = ctypes.CDLL(old_path)
    for lib in (old,):
        lib.zt_zlib_rle_compress.restype = ctypes.c_int64
        lib.zt_zlib_rle_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int64,
        ]

    # real bench payload
    from zignal_tpu.codecs import jpeg
    liza = "/root/reference/assets/liza.jpg"
    if os.path.exists(liza):
        arr, _ = jpeg.decode(open(liza, "rb").read())
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:1200, 0:1600].astype(np.float32)
        base = np.stack([128 + 90 * np.sin(xx / 97) * np.cos(yy / 53),
                         128 + 80 * np.cos(xx / 61 + yy / 41),
                         128 + 70 * np.sin((xx + yy) / 151)], axis=-1)
        arr = np.clip(base + rng.normal(0, 12, base.shape), 0,
                      255).astype(np.uint8)
    from zignal_tpu.image import Image
    os.environ["ZT_PLACEMENT"] = "host"
    out = Image.from_numpy(arr).resize(
        (arr.shape[0] // 2, arr.shape[1] // 2))._host()
    h, w, ch = out.shape
    flat = np.ascontiguousarray(out.reshape(h, w * ch))
    scan = np.empty(h * (w * ch + 1), dtype=np.uint8)
    rc = new.zt_png_filter_msd(
        flat.ctypes.data_as(ctypes.c_char_p), h, w * ch, ch,
        scan.ctypes.data_as(ctypes.c_char_p))
    assert rc == 0
    src = scan.tobytes()
    n = len(src)
    cap = n + (n >> 1) + 4096
    dst = ctypes.create_string_buffer(cap)

    # correctness: both round-trip through zlib and agree on size class
    sizes = {}
    for name, lib in (("old", old), ("new", new)):
        ln = lib.zt_zlib_rle_compress(src, n, dst, cap)
        assert ln > 0, name
        assert zlib.decompress(dst.raw[:ln]) == src, name
        sizes[name] = ln
    print(f"payload {n/1e6:.2f} MB; sizes old={sizes['old']} "
          f"new={sizes['new']} ({sizes['new']/sizes['old']*100:.2f}%)")

    best = {"old": 1e9, "new": 1e9}
    for _ in range(7):
        for name, lib in (("old", old), ("new", new)):
            t0 = time.perf_counter()
            lib.zt_zlib_rle_compress(src, n, dst, cap)
            best[name] = min(best[name], time.perf_counter() - t0)
    print(f"emit old={best['old']*1e3:.2f} ms  new={best['new']*1e3:.2f} ms"
          f"  speedup={best['old']/best['new']:.3f}x")


if __name__ == "__main__":
    main()
