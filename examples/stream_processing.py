"""Sustained image-stream processing: decode -> resize -> filter chain
-> encode, with transfer-aware placement.

Shows the round-3 pipeline surfaces:
- `placement` decides host vs device per op from the measured link
  (a remote tunnel keeps one-shot resizes on the host; co-located TPU
  hardware sends them to the device) — outputs are bit-identical;
- `pipeline.filter_chain` runs blur+sharpen+threshold+morphology as one
  fused Pallas kernel on TPU;
- `io_pipeline.BatchLoader` overlaps decode with device compute for
  batched throughput work.
"""

import os
import tempfile
import time

import numpy as np

from _common import zignal
from zignal_tpu.codecs import jpeg, png
from zignal_tpu.pipeline import filter_chain


def main():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:600, 0:800].astype(np.float32)
    base = np.stack([128 + 90 * np.sin(xx / 97) * np.cos(yy / 53),
                     128 + 80 * np.cos(xx / 61 + yy / 41),
                     128 + 70 * np.sin((xx + yy) / 151)], -1)
    photo = np.clip(base + rng.normal(0, 12, (600, 800, 3)),
                    0, 255).astype(np.uint8)

    with tempfile.TemporaryDirectory() as tmp:
        paths = []
        for k in range(6):
            p = os.path.join(tmp, f"frame{k}.jpg")
            open(p, "wb").write(jpeg.encode(photo, quality=90))
            paths.append(p)

        # one-shot stream: decode -> placement-aware resize -> encode
        t0 = time.perf_counter()
        for p in paths:
            img = zignal.Image.load(p)
            small = img.resize(0.5)     # host or device per measured link
            small.save(p.replace(".jpg", "_half.png"))
        dt = time.perf_counter() - t0
        mpix = len(paths) * 0.48
        print(f"stream: {len(paths)} images in {dt * 1e3:.0f} ms "
              f"({mpix / dt:.1f} MPix/s sustained)")

        # batched device work: letterboxed batch + fused filter chain
        from zignal_tpu.io_pipeline import BatchLoader

        for batch in BatchLoader(paths, batch_size=6, shape=(512, 512)):
            gray = batch[..., 0]        # [B, 512, 512] u8
            masks = filter_chain(gray)  # fused Pallas kernel on TPU
            print("filter_chain batch:", masks.shape,
                  "foreground fraction:",
                  round(float((np.asarray(masks) > 0).mean()), 3))


if __name__ == "__main__":
    main()
