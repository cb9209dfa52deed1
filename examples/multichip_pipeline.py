"""Multi-chip scale-out demo: batch-sharded pipeline, halo-exchange blur,
psum statistics (zignal_tpu.parallel).

Runs on real chips when available; otherwise force a virtual 8-device
CPU mesh first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multichip_pipeline.py
"""

import numpy as np

from _common import load_input, save

import jax
import jax.numpy as jnp

from zignal_tpu.parallel import (
    make_mesh, shard_batch, sharded_pipeline,
    spatial_equalize, spatial_gaussian_blur, spatial_histogram,
)


def main():
    n = len(jax.devices())
    mesh = make_mesh()
    print(f"mesh: {n} x {jax.devices()[0].platform}")

    img = load_input(size=(512, 512))  # [H, W, 3] u8
    arr = img.to_numpy()[..., :3]

    # 1) data parallelism: a batch of images sharded over the mesh,
    #    the whole resize+blur+Oklab pipeline runs collective-free
    batch = np.stack([np.roll(arr[:512, :512], i * 7, axis=1)
                      for i in range(2 * n)])
    step = sharded_pipeline(mesh, 256, 256, sigma=2.0)
    out = step(shard_batch(batch, mesh))
    print("sharded pipeline:", out.shape, out.dtype,
          "shards:", len(out.sharding.device_set))

    # 2) spatial sharding: ONE image split across chips by rows,
    #    convolution windows exchange halo rows over ICI (ppermute)
    blur = spatial_gaussian_blur(mesh, sigma=2.0)
    blurred = blur(jnp.asarray(arr))
    import zignal_tpu as zignal
    save(zignal.Image.from_numpy(np.asarray(blurred).copy()), "multichip_blur.png")

    # 3) global statistics via psum: histogram + equalization of the
    #    row-sharded image
    hist = spatial_histogram(mesh)(jnp.asarray(arr))
    print("global histogram channel sums:", np.asarray(hist).sum(axis=1))
    eq = spatial_equalize(mesh)(jnp.asarray(arr))
    save(zignal.Image.from_numpy(np.asarray(eq).copy()), "multichip_equalized.png")


if __name__ == "__main__":
    main()
