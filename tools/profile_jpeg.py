#!/usr/bin/env python
"""JPEG decode stage attribution (ZT_JPEG_PROFILE=1 native timers) on
photo-like and noisy content. Single-core host: A/B only within this
process; absolute numbers drift 3-10x across sessions (CLAUDE.md)."""

import os
import sys
import time

os.environ["ZT_JPEG_PROFILE"] = "1"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    yy = yy.astype(np.float32)
    xx = xx.astype(np.float32)
    base = np.stack([
        128 + 90 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
        128 + 80 * np.cos(xx / 61.0 + yy / 41.0),
        128 + 70 * np.sin((xx + yy) / 151.0),
    ], axis=-1)
    noise = rng.normal(0.0, 12.0, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def main():
    from zignal_tpu.codecs import jpeg

    h, w = 1200, 1600
    mpix = h * w / 1e6
    cases = {}
    liza = "/root/reference/assets/liza.jpg"
    if os.path.exists(liza):
        cases["liza(photo)"] = open(liza, "rb").read()
    cases["synth q90 (noisy)"] = jpeg.encode(synth_photo(h, w), quality=90)
    rng = np.random.default_rng(0)
    cases["pure noise q90"] = jpeg.encode(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8), quality=90)

    for name, data in cases.items():
        info = jpeg.get_info(data)
        m = info.width * info.height / 1e6
        # stage attribution needs the buffered path (the default
        # band-streaming decode fuses all stages into one timer)
        os.environ["ZT_JPEG_STREAM"] = "0"
        jpeg.decode(data)  # warm (prints entropy/idct/upsample stages)
        best = {"stream": 1e9, "buffered": 1e9}
        for _ in range(4):
            for mode, key in (("1", "stream"), ("0", "buffered")):
                os.environ["ZT_JPEG_STREAM"] = mode
                t0 = time.perf_counter()
                jpeg.decode(data)
                best[key] = min(best[key], time.perf_counter() - t0)
        os.environ.pop("ZT_JPEG_STREAM", None)
        print(f"== {name}: {len(data)/1e6:.2f} MB, {m:.2f} MPix, "
              f"stream {best['stream']*1e3:.1f} ms = "
              f"{m/best['stream']:.0f} MPix/s, buffered "
              f"{best['buffered']*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
