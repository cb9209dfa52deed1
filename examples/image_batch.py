"""ImageBatch demo: the sharding-carrying batched container.

Load a set of images into one [B, H, W, C] device batch, place it on a
mesh, and chain ops exactly like on a single Image — collectives are
handled transparently (SURVEY §5; zignal_tpu/batch.py).

Runs on real chips when available; otherwise force a virtual 8-device
CPU mesh first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/image_batch.py
"""

import numpy as np

from _common import load_input, save

import jax

import zignal_tpu as zignal
from zignal_tpu import ImageBatch
from zignal_tpu.parallel import make_mesh


def main():
    n = len(jax.devices())
    img = load_input(size=(256, 256))
    arr = img.to_numpy()[..., :3]

    # a batch of perturbed copies (stand-in for a real dataset)
    batch_np = np.stack([np.roll(arr, i * 11, axis=1) for i in range(2 * n)])

    # 1) batch sharding: every op is shard-local, zero collectives
    mesh = make_mesh()
    print(f"mesh: {n} x {jax.devices()[0].platform}")
    b = ImageBatch(batch_np, mesh=mesh)
    print("in: ", b)
    out = (b.resize((128, 128))
            .gaussian_blur(1.5)
            .autocontrast(0.01)
            .convert(zignal.Gray)
            .equalize())
    print("out:", out, "shards:", len(out.device_array().sharding.device_set))
    save(out[0], "image_batch_first.png")

    # per-image metrics come back as a [B] vector
    blurred = b.gaussian_blur(3.0)
    print("psnr[b] vs blurred:", np.round(np.asarray(b.psnr(blurred)), 2))

    # 2) 2-D (batch x space) mesh: rows sharded too — windowed ops
    #    exchange halo rows over the ICI ring automatically
    if n % 2 == 0:
        mesh2 = jax.sharding.Mesh(
            np.array(jax.devices()).reshape(2, n // 2), ("batch", "space"))
        b2 = ImageBatch(batch_np[:2], mesh=mesh2)
        out2 = b2.gaussian_blur(2.0).box_blur(2).sharpen(1)
        ref = ImageBatch(batch_np[:2]).gaussian_blur(2.0).box_blur(2) \
            .sharpen(1)
        print("2-D mesh windowed chain bit-exact:",
              np.array_equal(out2.to_numpy(), ref.to_numpy()))

    # 3) Otsu per image: device histograms + host f64 sweep -> [B] ints
    binary, thresholds = b.convert(zignal.Gray).threshold_otsu()
    print("otsu thresholds:", thresholds.tolist())
    save(binary[0], "image_batch_otsu.png")


if __name__ == "__main__":
    main()
