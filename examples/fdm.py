"""Feature Distribution Matching style transfer (reference: examples/src/fdm.zig)."""

import numpy as np

from _common import load_input, save, zignal


def main():
    src = load_input(size=(256, 256))
    # build a warm "style" target from the source
    t = src.to_numpy().astype(np.int16)
    tgt = zignal.Image.from_numpy(
        np.clip(t[..., ::-1] * 0.8 + 30, 0, 255).astype(np.uint8)
    )
    save(tgt, "fdm_target.png")
    fdm = zignal.FeatureDistributionMatching()
    fdm.match(src, tgt)
    save(src, "fdm_result.png")


if __name__ == "__main__":
    main()
