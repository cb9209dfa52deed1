#!/usr/bin/env python
"""Interleaved A/B of the native codec core against another git rev.

Host benchmark windows drift 1.5-10x within minutes (CLAUDE.md), so the
ONLY valid native-code comparison is round-robin within one process:
this builds <rev>'s jpeg_core/codec_core into a second .so, loads both
through separate ctypes handles, and reports per-variant minima over
interleaved rounds. This pattern caught a silent 1.6x autovectorization
regression (alias-check budget) that separate-process timing hid.

Usage: python tools/ab_native.py [rev]   (default HEAD~1)
"""

import ctypes
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRCS = ("zignal_tpu/native/jpeg_core.cpp", "zignal_tpu/native/codec_core.cpp")
FLAGS = ["-O3", "-march=native", "-fno-math-errno", "-shared", "-fPIC",
         "-std=c++17"]


def build(srcs, out):
    subprocess.run(["g++", *FLAGS, "-o", out, *srcs], check=True,
                   capture_output=True)


def build_rev(rev, tmpdir):
    srcs = []
    for s in SRCS:
        path = os.path.join(tmpdir, os.path.basename(s))
        code = subprocess.run(["git", "-C", ROOT, "show", f"{rev}:{s}"],
                              check=True, capture_output=True).stdout
        open(path, "wb").write(code)
        srcs.append(path)
    out = os.path.join(tmpdir, "old.so")
    build(srcs, out)
    return out


def main():
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    from zignal_tpu.codecs import jpeg

    with tempfile.TemporaryDirectory() as td:
        cur_so = os.path.join(td, "cur.so")
        build([os.path.join(ROOT, s) for s in SRCS], cur_so)
        old_so = build_rev(rev, td)
        cur = ctypes.CDLL(cur_so)
        old = ctypes.CDLL(old_so)

        rng = np.random.default_rng(3)
        payloads = {}
        liza = "/root/reference/assets/liza.jpg"
        if os.path.exists(liza):
            payloads["liza(photo)"] = open(liza, "rb").read()
        noisy = rng.integers(0, 256, (1200, 1600, 3), np.uint8)
        payloads["noise q90 420"] = jpeg.encode(noisy, quality=90,
                                                subsampling="420")

        for name, data in payloads.items():
            w, h, nc = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
            cur.zt_jpeg_info(data, len(data), ctypes.byref(w),
                             ctypes.byref(h), ctypes.byref(nc))
            oa = np.empty((h.value, w.value, 3), np.uint8)
            ob = np.empty_like(oa)
            best = {"old": 1e9, "cur": 1e9}
            for _ in range(7):
                for lib, out, key in ((old, oa, "old"), (cur, ob, "cur")):
                    t0 = time.perf_counter()
                    rc = lib.zt_jpeg_decode(
                        data, len(data), out.ctypes.data_as(ctypes.c_char_p),
                        3)
                    assert rc == 0, rc
                    best[key] = min(best[key], time.perf_counter() - t0)
            mp = w.value * h.value / 1e6
            same = np.array_equal(oa, ob)
            print(f"decode {name}: identical={same} "
                  f"{rev} {best['old']*1e3:.2f} ms  "
                  f"worktree {best['cur']*1e3:.2f} ms "
                  f"({mp/best['cur']:.0f} MPix/s)  "
                  f"speedup {best['old']/best['cur']:.3f}x")


if __name__ == "__main__":
    main()
