import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from functools import partial
sys.path.insert(0, '/root/repo')
import bench

rng = np.random.default_rng(0)
img = jax.device_put(rng.integers(0, 256, (1024, 1024, 3), np.uint8))
gray = jax.device_put(rng.integers(0, 256, (1024, 1024, 1), np.uint8))

from zignal_tpu.ops.convolution import gaussian_blur
from zignal_tpu.ops.interpolation import resize
from zignal_tpu.enums import Interpolation
from zignal_tpu.ops.integral import box_blur, sharpen
from zignal_tpu.ops.binary import dilate, erode, otsu_threshold
from zignal_tpu.ops.enhancement import autocontrast, equalize
from zignal_tpu.ops.order_stat import median_blur
from zignal_tpu.ops.edges import canny
from zignal_tpu.ops.pyramid import ImagePyramid
from zignal_tpu.color._array import convert_array

OPS = [
    ("gaussian_blur s2", lambda x: gaussian_blur(x, 2.0), img),
    ("resize bilinear 2x down", lambda x: resize(x, 512, 512, Interpolation.BILINEAR), img),
    ("resize bicubic 2x down", lambda x: resize(x, 512, 512, Interpolation.BICUBIC), img),
    ("resize lanczos 2x down", lambda x: resize(x, 512, 512, Interpolation.LANCZOS), img),
    ("resize bilinear 2x up", lambda x: resize(x, 2048, 2048, Interpolation.BILINEAR), img),
    ("box_blur r3", lambda x: box_blur(x, 3), img),
    ("sharpen r2", lambda x: sharpen(x, 2), img),
    ("dilate r3", lambda x: dilate(x[..., 0], 3)[..., None], gray),
    ("median_blur r2", lambda x: median_blur(x, 2), img),
    ("canny", lambda x: canny(x[..., 0].astype(jnp.float32)), gray),
    ("equalize", lambda x: equalize(x), img),
    ("autocontrast", lambda x: autocontrast(x), img),
    ("rgb->oklab->rgb", lambda x: jnp.clip(jnp.round(convert_array(convert_array(x.astype(jnp.float32)/255., 'rgb','oklab'),'oklab','rgb')*255.),0,255).astype(jnp.uint8), img),
]

from zignal_tpu.color import convert_chain
from zignal_tpu.pipeline import filter_chain

OPS += [
    ("convert_chain lab/oklch/xyb rt", lambda x: jnp.clip(jnp.round(
        convert_chain(x.astype(jnp.float32) / 255.,
                      ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb"))
        * 255.), 0, 255).astype(jnp.uint8), img),
    ("filter_chain (fused on TPU)",
     lambda x: filter_chain(x[..., 0])[..., None], gray),
]

def timer(fn, x, n_small=2, n_large=12):
    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(x.dtype))
            return acc + jnp.sum(fn(xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(looped(x, n_small)); float(looped(x, n_large))
    ests = []
    for _ in range(3):
        t0=time.perf_counter(); float(looped(x, n_small)); ts=time.perf_counter()-t0
        t0=time.perf_counter(); float(looped(x, n_large)); tl=time.perf_counter()-t0
        ests.append((tl-ts)/(n_large-n_small))
    return sorted(ests)[1]

for name, fn, x in OPS:
    try:
        t = timer(fn, x)
        if t * 1e3 < 0.4:
            # sub-0.4 ms/Mpix ops leave <5 ms of differenced signal at
            # 12 iters — below tunnel jitter (r2 rule: need ~8 ms);
            # re-measure with loops sized for ~15+ ms of signal
            t = timer(fn, x, n_small=5, n_large=155)
        if t * 1e3 < 0.05:  # ultra-fast ops (e.g. dilate): one more rung
            t = timer(fn, x, n_small=5, n_large=1005)
        print(f"{name:28s} {t*1e3:7.2f} ms/Mpix", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED {str(e)[:80]}", flush=True)

# Radial blur times via chained xor calls, NOT the fori_loop timer:
# its trace-time numpy coord tables ride as cached device ARGS of the
# library's own jit, and re-tracing inside an outer jit would embed
# them as megapixel HLO constants (axon HTTP 413; CLAUDE.md r4 notes).
# Per-call ~6 ms dispatch stays in the number, so this is an upper
# bound on device time.
from zignal_tpu.ops import motion_blur_ops as mb

def chain_timer(call, x, k_small=1, k_large=5):
    ests = []
    for _ in range(3):
        ts = {}
        for k in (k_small, k_large):
            t0 = time.perf_counter()
            r = call(x)
            for _i in range(k - 1):
                r = call(jnp.bitwise_xor(x, r))
            int(r[0, 0, 0])
            ts[k] = time.perf_counter() - t0
        ests.append((ts[k_large] - ts[k_small]) / (k_large - k_small))
    return sorted(ests)[1]

img512 = jax.device_put(rng.integers(0, 256, (512, 512, 3), np.uint8))
for name, zoom in (("radial zoom s0.7 (24 samp)", True),
                   ("radial spin s0.7 (24 samp)", False)):
    try:
        call = lambda a, z=zoom: mb.radial_blur(a, 0.5, 0.5, 0.7, z)
        call(img512)  # warm compile
        t = chain_timer(call, img512)
        print(f"{name:28s} {t*1e3*4:7.2f} ms/Mpix  (incl. dispatch)",
              flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED {str(e)[:80]}", flush=True)
