#!/usr/bin/env python
"""Benchmark driver: every BASELINE.md config, one JSON line each.

Line 1 is always the north-star pipeline (the driver's headline metric);
the remaining lines cover the full BASELINE config table:

  1. resize+blur+Oklab pipeline (GPix/s, single chip) + scaling curve
  2. end-to-end CLI-style resize: JPEG decode -> device resize -> PNG
     encode (exposes the host codec feeder)
  3. batched colorspace conversions (sRGB<->Lab/Oklab/Oklch/Xyb) +
     autocontrast/equalize
  4. fused Gaussian blur + sharpen + morphology + threshold
  5. FDM style transfer scored with PSNR/SSIM
  6. ORB/FAST + Hamming matching + Hough + Canvas AA (stretch)

Timing methodology (see CLAUDE.md "axon tunnel"): per-call dispatch
through the axon tunnel costs ~6 ms — far more than most pipelines — and
execution is deferred past block_until_ready, so device configs repeat
the op INSIDE one jitted lax.fori_loop (input perturbed per iteration so
nothing hoists, one scalar consumed per iteration so iterations chain),
a single scalar is fetched at the end, and two loop lengths are
differenced to cancel the remaining fixed costs. Host+device end-to-end
configs (2, 5, 6) use wall-clock over repeats — dispatch overhead is
part of what they measure.

vs_baseline is the ratio to the reference's only published figures
(interpolation.zig:24-29, single CPU core); configs with no published
reference number report null.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

# ZT_BENCH_SMOKE=1 shrinks every config to toy shapes — CI/API checks
# only (numbers are meaningless); the driver runs the real thing.
_SMOKE = os.environ.get("ZT_BENCH_SMOKE") == "1"
_DIM = 128 if _SMOKE else 1024
_LOOPS = (1, 3) if _SMOKE else (2, 12)


def synth_photo(h, w, seed=0):
    """Deterministic photo-like test image (smooth structure + grain) so
    the bench is self-contained — no asset files needed."""
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


_EMITTED = []  # every JSON object printed, for the final summary line


def emit(metric, value, unit, vs_baseline, **extra):
    line = {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": vs_baseline}
    line.update(extra)
    _EMITTED.append(line)
    print(json.dumps(line), flush=True)


def timed_roundtrip_ms(arr, timeout_s=30.0):
    """Upload+fetch wall time for `arr`, or None if the tunnel is
    stalled (probe runs in a daemon thread — a hung fetch releases the
    GIL but can never be cancelled, and attribution must not take the
    whole config down with it)."""
    import threading

    res = []

    def _probe():
        import jax

        t0 = time.perf_counter()
        np.asarray(jax.device_put(arr))
        res.append((time.perf_counter() - t0) * 1e3)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return round(res[0], 1) if res else None


def device_loop_timer(jax, jnp, step_fn, x, n_small=None, n_large=None):
    """Seconds per iteration of step_fn via in-jit fori_loop differencing."""

    @partial(jax.jit, static_argnames=("n",))
    def looped(x, n):
        def body(i, acc):
            xi = jnp.bitwise_xor(x, i.astype(jnp.uint8))
            r = step_fn(xi)
            # consume EVERY output element: XLA pushes a single-element
            # slice through elementwise producers and would skip the
            # rest of the image (measured: a 48 MB op "ran" in 13 us)
            return acc + jnp.sum(r.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    if n_small is None:
        n_small, n_large = _LOOPS

    def timed(n):
        t0 = time.perf_counter()
        float(looped(x, n))
        return time.perf_counter() - t0

    # the tunnel chip shows multi-x contention spikes (CLAUDE.md), and a
    # spike during the SMALL loop makes the differenced estimate
    # overshoot (not just undershoot): take the median of 3 independent
    # difference estimates, each from interleaved small/large runs
    float(looped(x, n_small))   # compile
    float(looped(x, n_large))   # compile
    ests = []
    for _ in range(3):
        ts = timed(n_small)
        tl = timed(n_large)
        ests.append((tl - ts) / (n_large - n_small))
    return sorted(ests)[1]


# v5e (TPU v5 lite) peak HBM bandwidth, for roofline fields
_V5E_HBM_GB_S = 819.0


def bench_north_star(jax, jnp):
    # the CONTAINER's fused entry (ImageBatch.resize_blur_oklab
    # dispatch callable — VERDICT r4 #4): the bench exercises the same
    # path a user of the public batch type reaches
    from zignal_tpu.batch import resize_blur_oklab_fn
    from zignal_tpu.enums import Interpolation

    chain = resize_blur_oklab_fn(_DIM // 2, _DIM // 2, 2.0,
                                 Interpolation.BILINEAR)
    rng = np.random.default_rng(0)
    results = {}
    # loop counts scale inversely with batch so the differenced device
    # time stays well above tunnel jitter (~1 ms): at 1 MPix an iter is
    # ~0.05 ms, so 12-iter loops measured NEGATIVE throughput in one
    # recorded run; 160 extra iters put the signal at ~8 ms
    sizes = ((2, 1, 3), (1, 1, 3)) if _SMOKE else \
        ((16, 2, 12), (4, 3, 43), (1, 5, 165))
    for b, n_small, n_large in sizes:
        batch = jax.device_put(
            rng.integers(0, 256, (b, _DIM, _DIM, 3), dtype=np.uint8))
        # two independent passes, keep the better: the tunnel chip shows
        # MINUTES-long contention windows (one recorded run measured the
        # same binary at 1/3 throughput); a repeat is the only defense
        per_iter = min(device_loop_timer(jax, jnp, chain,
                                         batch, n_small, n_large)
                       for _ in range(1 if _SMOKE else 2))
        results[b] = b * _DIM * _DIM / per_iter / 1e9
    b_best = max(results)
    gpix = results[b_best]
    # roofline accounting (VERDICT r4 #3): HBM traffic is one u8 read +
    # one f32 Oklab write (the Pallas kernel holds everything between
    # them VMEM-resident); MXU MACs = the banded resample dots (2-tap
    # bilinear per axis at dst scale + 13-tap sigma-2 blur per axis),
    # both orders of magnitude under the 197 TFLOPs bf16 peak — the
    # binding unit is the VPU (u8 fixed-point stages + oklab
    # transcendentals; CLAUDE.md r2 kernel notes)
    t_iter = b_best * _DIM * _DIM / gpix / 1e9
    in_b = b_best * _DIM * _DIM * 3
    out_b = b_best * (_DIM // 2) * (_DIM // 2) * 3 * 4
    hbm_gb_s = (in_b + out_b) / t_iter / 1e9
    dst_px = b_best * (_DIM // 2) * (_DIM // 2)
    macs = dst_px * 3 * (2 + 2 + 13 + 13)  # resize y+x, blur y+x
    baseline_gpix = 0.1  # reference bilinear resize (100 Mpix/s)
    emit("resize+blur+oklab pipeline throughput (single chip)",
         round(gpix, 3), "GPix/s", round(gpix / baseline_gpix, 1),
         scaling={f"{b}_mpix": round(v, 3) for b, v in results.items()},
         hbm_bytes_per_iter=in_b + out_b,
         hbm_gb_s=round(hbm_gb_s, 1),
         pct_hbm_roofline=round(100 * hbm_gb_s / _V5E_HBM_GB_S, 1),
         mxu_tflops=round(2 * macs / t_iter / 1e12, 3),
         bound_by="vpu (u8 resample/blur stages + oklab transcendentals"
                  "; HBM and MXU both far from peak)",
         # BASELINE.md's target is AGGREGATE v5e-8 throughput; only one
         # chip is reachable here. Linear scaling is justified, not
         # assumed: the batch-sharded container ops compile
         # collective-free on a 1-D mesh (HLO asserted,
         # tests/test_image_batch.py) and dryrun_multichip(8) executes
         # the full sharded step every round (MULTICHIP_r*.json)
         v5e8_aggregate_projection_gpix_s=round(8 * gpix, 1),
         projection_basis="8x single-chip: batch-parallel mesh, "
                          "HLO-asserted collective-free, 8-device "
                          "dryrun executes")


def bench_codec_roundtrip():
    """BASELINE config 1: CLI-style resize (JPEG decode -> resize -> PNG
    encode). Primary value = SUSTAINED throughput over a stream of
    images through the real Image.resize path, whose transfer-aware
    placement (zignal_tpu/placement.py) keeps a one-shot CLI resize on
    the host when the measured device link is a slow remote tunnel and
    uses the device when transfers are cheap — output bytes identical
    either way (tests/test_native_parity.py). Single-image latency and
    the forced-device path are attribution fields."""
    import jax

    from zignal_tpu.codecs import jpeg, png
    from zignal_tpu.image import Image

    # BASELINE names assets/liza.jpg; fall back to a synthetic photo
    # when the reference checkout is absent (the synthetic is noisier
    # than a real photo, i.e. harder on the entropy decoder)
    liza = "/root/reference/assets/liza.jpg"
    shape = (150, 200) if _SMOKE else (1200, 1600)
    n_stream = 2 if _SMOKE else 12
    if os.path.exists(liza):
        base = open(liza, "rb").read()
        info = jpeg.get_info(base)
        mpix = info.width * info.height / 1e6
        # a stream of the original file: the codec path caches nothing,
        # so repeats measure true sustained throughput (q90 re-encodes
        # are ~2x noisier than the camera original and would understate
        # the decoder on real stream content)
        corpus = [base] * n_stream
    else:
        mpix = shape[0] * shape[1] / 1e6
        corpus = [jpeg.encode(synth_photo(*shape, seed=100 + k), quality=90)
                  for k in range(n_stream)]

    def once(jpg):
        arr, _ = jpeg.decode(jpg)
        out = Image.from_numpy(arr).resize(
            (arr.shape[0] // 2, arr.shape[1] // 2))
        return png.encode(out._host())

    once(corpus[0])  # warm (native lib, placement calibration, compiles)

    # single-image latency
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        once(corpus[0])
        lat.append(time.perf_counter() - t0)
    t_lat = min(lat)

    # sustained stream (best of 2 passes: the single host core shows
    # multi-x frequency/contention variance across seconds)
    t_stream = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for jpg in corpus:
            once(jpg)
        t_stream = min(t_stream, time.perf_counter() - t0)
    sustained = len(corpus) * mpix / t_stream

    # attribution: stage costs + the forced-device path (through the
    # axon tunnel the upload+download alone costs ~100+ ms/image at
    # ~5-40 MB/s aggregate, which is why placement picks the host here;
    # co-located hardware would pick the device)
    t0 = time.perf_counter()
    for _ in range(3):
        arr, _ = jpeg.decode(corpus[0])
    t_dec = (time.perf_counter() - t0) / 3
    os.environ["ZT_PLACEMENT"] = "host"
    try:
        img = Image.from_numpy(arr)
        t0 = time.perf_counter()
        out = img.resize((arr.shape[0] // 2, arr.shape[1] // 2))
        t_resize_host = time.perf_counter() - t0
    finally:
        os.environ.pop("ZT_PLACEMENT", None)
    out_np = out._host()
    t0 = time.perf_counter()
    for _ in range(3):
        png.encode(out_np)
    t_enc = (time.perf_counter() - t0) / 3
    transfer_ms = timed_roundtrip_ms(arr)

    emit("end-to-end resize stream (JPEG decode -> resize -> PNG encode,"
         " sustained)",
         round(sustained, 2), "MPix/s", round(sustained / 100.0, 2),
         single_image_latency_ms=round(t_lat * 1e3, 1),
         jpeg_decode_mpix_s=round(mpix / t_dec, 1),
         host_resize_ms=round(t_resize_host * 1e3, 2),
         png_encode_mpix_s=round(mpix / 4 / t_enc, 1),
         tunnel_transfer_floor_ms=transfer_ms,
         device_roundtrip_note="placement=auto picked host: link measured"
         " slower than host compute; forced-device path is tunnel-bound")


def _hlo_transcendental_census(jax, fn, x):
    """Element counts of transcendental ops in fn's OPTIMIZED HLO
    (post-fusion: what actually executes), keyed by op kind."""
    import re

    txt = jax.jit(fn).lower(x).compile().as_text()
    counts = {}
    pat = re.compile(
        r"=\s+(?:f32|bf16)\[([\d,]*)\][^ ]*\s+"
        r"(power|cbrt|exponential|log|sqrt|rsqrt|tanh|atan2|sine|cosine)"
        r"\(")
    for m in pat.finditer(txt):
        dims = m.group(1)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        counts[m.group(2)] = counts.get(m.group(2), 0) + n
    return counts


def _transcendental_rates(jax, jnp):
    """Measured per-element throughput (elems/s) of XLA pow / cbrt /
    exp on this chip (the colorspace chain's binding unit)."""
    rng = np.random.default_rng(7)
    u = jax.device_put(
        rng.integers(0, 256, (4, _DIM, _DIM), dtype=np.uint8))
    elems = u.size
    # a single transcendental over 4M elems is ~30-60 us/iter, so the
    # loop counts must be ~20x the other configs' to push the
    # differenced signal past tunnel jitter (r5: loops of (2,30) put
    # ~1 ms of signal under ~ms noise and measured NEGATIVE pow/exp
    # rates; the r2 rule is a differenced signal of >= ~8 ms)
    loops = (1, 3) if _SMOKE else (4, 516)
    rates = {}
    for name, op in (
            ("pow", lambda v: v ** 2.4),
            ("cbrt", jnp.cbrt),
            ("exp", jnp.exp)):
        def step(xi, op=op):
            # the u8->f32 scale is ~10x cheaper than the transcendental
            # and keeps the xor-perturbed loop-timer contract (u8 input)
            v = (xi.astype(jnp.float32) + 1.0) * (1.0 / 256.0)
            return op(v)
        per = device_loop_timer(jax, jnp, step, u, *loops)
        if per <= 0:  # contention swamped the signal: no honest rate
            raise RuntimeError(f"non-positive {name} rate "
                               f"({per * 1e6:.0f} us/iter)")
        rates[name] = elems / per
    return rates


def bench_colorspace(jax, jnp):
    """BASELINE config 2: batched colorspace chain + autocontrast +
    equalize, fully fused on device. The chain runs through
    color.convert_chain (color/_chain.py), which eliminates the exact
    inverse pairs at junctions (gamma round-trips, in-chain cyl hops)
    while running every conversion's own math — u8 outputs are
    bit-identical to the sequential convert_array chain (tested)."""
    from zignal_tpu.ops.enhancement import autocontrast, equalize
    from zignal_tpu.pipeline import color_chain_u8

    spaces = ("rgb", "lab", "rgb", "oklch", "rgb", "xyb", "rgb")

    def chain(x):
        # fused XLA lowering (color/_chain.py): measured 2x faster than
        # the Pallas kernel on chip (r4, tools/ab_color.py) — the chain
        # is transcendental-bound and XLA's native pow/cbrt beat
        # Mosaic's exp/log+Newton; kernel stays opt-in (ZT_COLOR_PALLAS)
        u8 = color_chain_u8(x, spaces)
        eq = equalize(u8[0])
        ac = autocontrast(u8[1] if u8.shape[0] > 1 else u8[0])
        return eq.astype(jnp.float32) + ac.astype(jnp.float32)

    rng = np.random.default_rng(1)
    x = jax.device_put(
        rng.integers(0, 256, (4, _DIM, _DIM, 3), dtype=np.uint8))
    per_iter = device_loop_timer(jax, jnp, chain, x,
                                 *((1, 3) if _SMOKE else (2, 14)))
    npix = 4 * _DIM * _DIM
    gpix = npix / per_iter / 1e9

    # transcendental roofline (VERDICT r4 #3): census the compiled HLO
    # for pow/cbrt/exp/... element counts, measure each family's
    # throughput on this chip, and derive the time those ops alone
    # would take — pct_transcendental_roofline answers "is 3.36 GPix/s
    # the machine limit?" from the artifact itself
    extra = {}
    try:
        census = _hlo_transcendental_census(jax, chain, x)
        rates = _transcendental_rates(jax, jnp)
        # log costs ~exp on the VPU; remaining kinds are charged at the
        # pow rate (conservative: pow is the slowest family measured)
        rate_of = {"power": rates["pow"], "cbrt": rates["cbrt"],
                   "exponential": rates["exp"], "log": rates["exp"]}
        t_bound = sum(n / rate_of.get(kind, rates["pow"])
                      for kind, n in census.items())
        extra = {
            "transcendental_elems_per_pixel":
                round(sum(census.values()) / npix, 1),
            "transcendental_census": {k: round(v / npix, 2)
                                      for k, v in census.items()},
            "pow_gelem_s": round(rates["pow"] / 1e9, 2),
            "cbrt_gelem_s": round(rates["cbrt"] / 1e9, 2),
            "exp_gelem_s": round(rates["exp"] / 1e9, 2),
            "transcendental_roofline_gpix_s":
                round(npix / t_bound / 1e9, 2) if t_bound else None,
            "pct_transcendental_roofline":
                round(100 * t_bound / per_iter, 1) if t_bound else None,
            # r5 measurement: the chain runs at ~39% of the pure-
            # transcendental bound — the other ~60% is the config's
            # equalize/autocontrast histogram+LUT MXU passes and the
            # u8 fixed-point color mixes, not waste in the pow/cbrt
            "bound_by": "vpu transcendentals (pow/cbrt/exp) + "
                        "histogram/LUT MXU passes (equalize+autocontrast)",
        }
    except Exception as e:  # census is diagnostic: never kill the config
        extra = {"roofline_error": str(e)[:120]}
    try:
        # stagewise floor: the transcendental roofline above ignores
        # the chain's equalize/autocontrast histogram+LUT MXU passes,
        # so "is the chain at its bound?" needs the other comparison —
        # chain time vs the SUM of each stage timed standalone. Each
        # stage is separately at its own measured optimum
        # (convert_chain beat the Pallas color kernel 2x on chip, r4;
        # equalize/autocontrast ride the nibble one-hot MXU path), so
        # pct_of_stagewise_floor ~= 100 means no fusion headroom left.
        u8_pair = jax.block_until_ready(color_chain_u8(x, spaces))
        t_color = device_loop_timer(
            jax, jnp, lambda xi: color_chain_u8(xi, spaces)
            .astype(jnp.float32), x, *((1, 3) if _SMOKE else (2, 14)))
        eq_loops = (1, 3) if _SMOKE else (2, 30)
        t_eq = device_loop_timer(
            jax, jnp, lambda xi: equalize(xi).astype(jnp.float32),
            u8_pair[0], *eq_loops)
        t_ac = device_loop_timer(
            jax, jnp, lambda xi: autocontrast(xi).astype(jnp.float32),
            u8_pair[1], *eq_loops)
        floor_s = t_color + t_eq + t_ac
        extra.update(
            stage_ms={"color_chain": round(t_color * 1e3, 2),
                      "equalize": round(t_eq * 1e3, 2),
                      "autocontrast": round(t_ac * 1e3, 2)},
            stagewise_floor_gpix_s=round(npix / floor_s / 1e9, 2),
            pct_of_stagewise_floor=round(100 * floor_s / per_iter, 1))
    except Exception as e:
        extra["stagewise_error"] = str(e)[:120]
    emit("batched colorspace chain (rgb<->lab/oklch/xyb) + equalize"
         " + autocontrast", round(gpix, 3), "GPix/s", None, **extra)


def bench_filter_fusion(jax, jnp):
    """BASELINE config 3: fused blur + sharpen + morphology + threshold.
    On TPU this dispatches to the single VMEM-resident Pallas kernel
    (ops/pallas_filter.py, bit-identical to the XLA chain)."""
    from zignal_tpu.pipeline import filter_chain

    def chain(x):
        return filter_chain(x[..., 0], 2.0, 2, 128.0)

    rng = np.random.default_rng(2)
    x = jax.device_put(
        rng.integers(0, 256, (_DIM, _DIM, 1), dtype=np.uint8))
    # 1 MPix gray per iter is FAST (~18 us at the kernel's ~55 GPix/s),
    # so the loop count must be large: an 85-iter loop left only a
    # ~1.5 ms differenced signal and once read 260 GPix/s of pure
    # jitter (r4); 500 extra iters put the signal at ~10 ms
    per_iter = device_loop_timer(jax, jnp, chain, x,
                                 *((1, 3) if _SMOKE else (5, 505)))
    gpix = _DIM * _DIM / per_iter / 1e9
    # roofline (VERDICT r4 #3): one u8 plane in + one u8 plane out is
    # ALL the HBM traffic (the Pallas kernel keeps blur/sharpen/morph
    # intermediates VMEM-resident); MXU does the two 13-tap banded blur
    # passes + box sums. The binding unit is the VPU (compare/select
    # morphology + fixed-point rounding), not HBM.
    hbm_b = 2 * _DIM * _DIM
    hbm_gb_s = hbm_b / per_iter / 1e9
    # sigma-2 blur = 13 taps per axis; radius-2 sharpen box = 5 per axis
    macs = _DIM * _DIM * (13 + 13 + 5 + 5)
    emit("fused blur+sharpen+morphology+threshold", round(gpix, 3),
         "GPix/s", None,
         hbm_bytes_per_iter=hbm_b,
         hbm_gb_s=round(hbm_gb_s, 1),
         pct_hbm_roofline=round(100 * hbm_gb_s / _V5E_HBM_GB_S, 1),
         mxu_tflops=round(2 * macs / per_iter / 1e12, 3),
         bound_by="vpu (morphology min/max + fixed-point stages; HBM"
                  " and MXU both far from peak)")


def bench_fdm():
    """BASELINE config 4: FDM style transfer scored with PSNR/SSIM."""
    from zignal_tpu.fdm import FeatureDistributionMatching
    from zignal_tpu.image import Image

    n = 128 if _SMOKE else 1024
    src = Image.from_numpy(synth_photo(n, n, seed=3))
    # target with a genuinely different distribution (crushed shadows,
    # warm cast) so the transfer does real work
    t = synth_photo(n, n, seed=4).astype(np.float32) / 255.0
    t = t ** 2.2 * np.array([230.0, 180.0, 120.0]) + 20.0
    tgt = Image.from_numpy(np.clip(t, 0, 255).astype(np.uint8))

    fdm = FeatureDistributionMatching()
    fdm.set_target(tgt)
    fdm.set_source(src.copy())
    fdm.update()  # warm compile

    times = []
    for _ in range(3):
        work = src.copy()
        t0 = time.perf_counter()
        fdm.set_source(work)
        fdm.update()
        times.append(time.perf_counter() - t0)
    t = min(times)
    matched = work
    score_psnr = src.psnr(matched)
    score_ssim = src.ssim(matched)
    # attribution: through the axon tunnel a raw [n,n,3] u8 upload +
    # download alone costs ~0.3 s (~20 MB/s link) — the end-to-end
    # figure is tunnel-transfer-bound, not compute-bound; on co-located
    # hardware (PCIe/on-chip) the transfer floor is ~1000x lower
    arr = src.to_numpy()
    transfer_ms = timed_roundtrip_ms(arr)

    # device-only companion metric (VERDICT r3 #6): the full per-update
    # device work (mean/cov einsum + W/bias pixel map — the 3x3 host SVD
    # between them is microseconds) timed with the chain-differenced
    # fori_loop pattern, transfer excluded
    device_mpix_s = None
    try:
        import jax
        import jax.numpy as jnp

        from zignal_tpu.fdm import _mean_cov_packed_impl

        w = jnp.eye(3, dtype=jnp.float32)
        bias = jnp.zeros((3,), jnp.float32)

        def fdm_device_step(xi):
            packed = _mean_cov_packed_impl(xi)
            x = xi.astype(jnp.float32) / 255.0
            res = jnp.clip(
                jnp.einsum("hwc,cd->hwd", x, w, precision="highest")
                + bias, 0.0, 1.0)
            out = jnp.floor(res * 255.0 + 0.5).astype(jnp.uint8)
            return out.astype(jnp.float32) + jnp.sum(packed)

        dev = jax.device_put(arr[..., :3])
        per_iter = device_loop_timer(jax, jnp, fdm_device_step, dev,
                                     *((1, 3) if _SMOKE else (2, 42)))
        device_mpix_s = round(n * n / 1e6 / per_iter, 1)
    except Exception:
        pass
    emit("fdm style transfer (1 MPix, end-to-end)",
         round(n * n / 1e6 / t, 2), "MPix/s", None,
         device_mpix_s=device_mpix_s,
         psnr_vs_source=round(float(score_psnr), 2),
         ssim_vs_source=round(float(score_ssim), 4),
         tunnel_transfer_floor_ms=transfer_ms)


def bench_features_stretch():
    """BASELINE stretch config: ORB + Hamming matching + Hough + Canvas."""
    from zignal_tpu.canvas import Canvas
    from zignal_tpu.features.matcher import BruteForceMatcher
    from zignal_tpu.features.orb import Orb
    from zignal_tpu.image import Image
    from zignal_tpu.ops.hough import HoughTransform

    dim = 128 if _SMOKE else 512
    img = Image.from_numpy(synth_photo(dim, dim, seed=5))
    # same-size rotated view (extract keeps the dim x dim frame, so the
    # whole corpus batches into one [B, H, W] dispatch)
    rot = img.extract(img.get_rectangle(), angle=0.2)

    orb = Orb()
    # the production serving path ships a BATCH of images per
    # host->device round-trip (one vmapped dispatch + one packed fetch,
    # detect_and_compute_batch) so the ~6 ms dispatch + tunnel latency
    # amortizes across the batch (VERDICT r4 #5) — per-image device
    # compute is unchanged (orb_device_ms_per_image below)
    # k=8 (not 16): halves the vmapped-ORB warm compile through the
    # tunnel — r5's 20-min run starved this config at its 245 s budget
    # clamp with k=16; amortization is already ~flat past 8 images
    k_batch = 4 if _SMOKE else 8
    corpus = [img, rot] + [Image.from_numpy(synth_photo(
        dim, dim, seed=50 + i)) for i in range(k_batch - 2)]
    results = orb.detect_and_compute_batch(corpus)  # warm (compiles)
    BruteForceMatcher(cross_check=True).match(
        results[0][1], results[1][1])  # warm the matcher's size bucket

    t0 = time.perf_counter()
    results = orb.detect_and_compute_batch(corpus)
    t_batch = time.perf_counter() - t0
    (kp1, d1), (kp2, d2) = results[0], results[1]
    t0 = time.perf_counter()
    matches = BruteForceMatcher(cross_check=True).match(d1, d2)
    t_match = time.perf_counter() - t0
    # headline keeps the original definition (detect 2 images + match)
    t_orb = 2 * t_batch / k_batch + t_match

    # device-only attribution: the fused single-dispatch ORB program
    # (pyramid+FAST+NMS+Harris+top-k+orientation+BRIEF) timed with the
    # fori_loop pattern — everything above device time is tunnel latency
    t_orb_device = None
    try:
        import jax
        import jax.numpy as jnp
        from functools import partial as _partial

        from zignal_tpu.features.orb import _orb_fused_impl

        plane = jax.device_put(jnp.asarray(orb._plane(img)))
        shapes = orb._level_shapes(dim, dim)
        per = orb._features_per_level()
        ks = tuple(0 if (per[l] == 0 or min(shapes[l]) < 16) else per[l]
                   for l in range(orb.n_levels))
        margs = tuple(float(max(3.0, orb.edge_threshold
                                / orb.scale_factor ** l))
                      for l in range(orb.n_levels))

        @_partial(jax.jit, static_argnames=("n",))
        def looped(x, n):
            def body(i, acc):
                xi = jnp.bitwise_xor(x, i.astype(jnp.uint8))
                r = _orb_fused_impl(xi, orb.n_levels, orb.scale_factor,
                                    orb.fast_threshold, ks, margs, True,
                                    True)
                return acc + jnp.sum(r)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(looped(plane, 1)), float(looped(plane, 6))
        ests = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(looped(plane, 1))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(looped(plane, 6))
            tl = time.perf_counter() - t0
            ests.append((tl - ts) / 5)
        t_orb_device = sorted(ests)[1]
    except Exception:
        pass

    edges = img.sobel()
    hough = HoughTransform(256)
    acc = hough.compute(edges)  # warm
    t0 = time.perf_counter()
    acc = hough.compute(edges)
    lines = hough.find_lines(acc, threshold=120)
    t_hough = time.perf_counter() - t0

    canvas = Canvas(Image.from_numpy(np.zeros((512, 512, 3), np.uint8)))
    t0 = time.perf_counter()
    for i in range(50):
        canvas.draw_line((10 + i * 9, 20), (500 - i * 9, 490),
                         (255, 128, 0))
        canvas.draw_circle((256, 256), 40 + i * 2, (0, 255, 128))
    t_canvas = time.perf_counter() - t0

    # attribution: each detect_and_compute fetches the packed pyramid +
    # score maps (~0.9 MB) through the ~20 MB/s tunnel — measure the
    # raw round-trip of an equivalent buffer so the artifact shows how
    # much of orb_ms is link latency rather than compute
    probe = np.zeros((dim, dim, 3), np.uint8)
    timed_roundtrip_ms(probe)  # warm
    t_link_ms = timed_roundtrip_ms(probe)

    total = t_orb + t_hough + t_canvas
    emit("ORB+match / Hough / Canvas stretch (512^2)",
         round(total * 1000, 1), "ms", None,
         orb_ms=round(t_orb * 1000, 1),
         orb_batch=k_batch,
         orb_wall_ms_per_image=round(t_batch / k_batch * 1000, 2),
         orb_match_ms=round(t_match * 1000, 2),
         orb_device_ms_per_image=(round(t_orb_device * 1000, 2)
                                  if t_orb_device else None),
         device_mpix_s=(round(dim * dim / 1e6 / t_orb_device, 1)
                        if t_orb_device else None),
         n_matches=len(matches),
         hough_ms=round(t_hough * 1000, 1),
         n_lines=len(lines),
         canvas_ms=round(t_canvas * 1000, 1),
         tunnel_roundtrip_ms_per_image=t_link_ms)


# features runs BEFORE fdm: it has the heaviest warm compile (vmapped
# fused ORB), so giving it the earlier slot leaves the lighter fdm
# config as the one that inherits a starved end-of-budget window
_CONFIGS = ("north_star", "codec_roundtrip", "colorspace",
            "filter_fusion", "features", "fdm")

# canonical metric names, so skip lines carry the same metric string the
# real run would (the artifact stays parseable per-config either way)
_METRIC_NAMES = {
    "north_star": "resize+blur+oklab pipeline throughput (single chip)",
    "codec_roundtrip": "end-to-end resize stream (JPEG decode -> resize"
                       " -> PNG encode, sustained)",
    "colorspace": "batched colorspace chain (rgb<->lab/oklch/xyb)"
                  " + equalize + autocontrast",
    "filter_fusion": "fused blur+sharpen+morphology+threshold",
    "fdm": "fdm style transfer (1 MPix, end-to-end)",
    "features": "ORB+match / Hough / Canvas stretch (512^2)",
}

# configs that need a live device: their numbers are fori_loop device
# timings (or jit-driven pipelines). codec_roundtrip is host-feasible —
# placement keeps it on the host when the link probe scores the tunnel
# dead, and its in-config transfer probes are all bounded daemon threads.
_NEEDS_DEVICE = ("north_star", "colorspace", "filter_fusion", "fdm",
                 "features")


def _run_config(name):
    import jax
    import jax.numpy as jnp

    # sitecustomize pre-registers the axon PJRT plugin, which ignores
    # the JAX_PLATFORMS env var — only the config knob reroutes to CPU
    # (same trick as tests/conftest.py). Honors e.g. smoke runs on CPU.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    try:  # persistent compile cache: repeat bench runs skip ~5 min of
        # XLA compiles (harmless if the backend does not support it)
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zignal_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if name == "north_star":
        bench_north_star(jax, jnp)
    elif name == "codec_roundtrip":
        bench_codec_roundtrip()
    elif name == "colorspace":
        bench_colorspace(jax, jnp)
    elif name == "filter_fusion":
        bench_filter_fusion(jax, jnp)
    elif name == "fdm":
        bench_fdm()
    elif name == "features":
        bench_features_stretch()


def _probe_tunnel(timeout_s=90):
    """True when a tiny device round-trip completes within timeout_s.

    Runs in a SUBPROCESS: the axon tunnel stalls completely for tens of
    minutes at a time (device_put/fetch hang past any block_until_ready
    — observed repeatedly, see CLAUDE.md), and a hung in-process fetch
    can never be cancelled. A child process can always be killed."""
    import subprocess
    code = ("import numpy as np, jax; "
            "x = jax.device_put(np.ones((8, 8), np.float32)); "
            "print(float(np.asarray(x + 1).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, cwd=os.path.dirname(
                               os.path.abspath(__file__)) or ".")
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False


def _emit_child_lines(text, extra=None):
    """Re-emit only well-formed JSON lines from a child's stdout (the
    artifact contract is one JSON object per line; stray diagnostics
    from dependencies must not corrupt it). ``extra`` fields are merged
    into each line (the salvage pass tags lines "retried": true).
    Returns #lines emitted."""
    n = 0
    for line in (text or "").splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if extra and isinstance(obj, dict):
            obj.update(extra)
            line = json.dumps(obj)
        if isinstance(obj, dict):
            _EMITTED.append(obj)
        print(line, flush=True)
        n += 1
    return n


def _run_child(here, name, t_limit, extra=None):
    """Run one config in a killable child and re-emit its JSON lines
    (merged with ``extra``). Returns (got_data, timed_out). A child
    killed at its cap may still have emitted its result before hanging
    in backend teardown on a stalled tunnel — those lines are salvaged."""
    import subprocess
    env = dict(os.environ, _ZT_BENCH_CHILD=name)
    tag = dict(extra or {})
    try:
        r = subprocess.run([sys.executable, here], env=env,
                           timeout=t_limit, capture_output=True,
                           text=True)
        n_lines = _emit_child_lines(r.stdout, extra=tag or None)
        if r.returncode != 0 and n_lines == 0:
            emit(_METRIC_NAMES[name], None, "error", None,
                 error=f"exit {r.returncode}: " + (r.stderr or "")[-200:],
                 **tag)
            return False, False
        return n_lines > 0, False
    except subprocess.TimeoutExpired as e:
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        if _emit_child_lines(out, extra=tag or None):
            return True, True
        emit(_METRIC_NAMES[name], None, "error", None,
             error=f"timeout after {t_limit:.0f}s (tunnel stall?)", **tag)
        return False, True
    except OSError as e:
        emit(_METRIC_NAMES[name], None, "error", None,
             error=str(e)[:200], **tag)
        return False, False


def _emit_skip(name, reason):
    emit(_METRIC_NAMES[name], None, "skipped", None, skipped=reason)


def _worker(names):
    """Worker child (_ZT_BENCH_WORKER): run the listed configs
    sequentially IN ONE PROCESS, emitting each config's JSON lines and
    then a {"__done__": name} sentinel.

    Why a persistent worker: a fresh process's FIRST device op through
    the axon tunnel costs anywhere from 26 to 280 s in slow windows
    (measured r5, same-minute back-to-back probes) while warm ops in
    the same process run in milliseconds — per-config child processes
    pay that cold start per CONFIG and can starve the whole budget, and
    concurrent probe processes make each other slower. One process pays
    it once; the {"__session__": seconds} line after a tiny warmup
    roundtrip tells the parent the tunnel is alive at all."""
    t0 = time.time()
    try:
        import jax
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            jax.config.update("jax_platforms", "cpu")
        np.asarray(jax.device_put(np.ones((8, 8), np.float32)) + 1)
    except Exception as e:
        print(json.dumps({"__session__": None, "error": repr(e)[:200]}),
              flush=True)
        return
    print(json.dumps({"__session__": round(time.time() - t0, 1)}),
          flush=True)
    for name in names:
        if name in _CONFIGS:
            try:
                _run_config(name)
            except BaseException as e:  # keep later configs alive
                emit(_METRIC_NAMES[name], None, "error", None,
                     error=repr(e)[:200])
        print(json.dumps({"__done__": name}), flush=True)


def _worker_pass(here, names, deadline, tag=None, session_cap=300.0):
    """Drive `names` through a persistent worker, enforcing per-config
    deadlines from the parent (a hung in-process fetch can never be
    cancelled, so stalls are handled by killing the worker). Returns
    (no_data, not_attempted, tunnel_suspect):

    - no_data: configs attempted but with no data line (an error line
      was emitted for each; retryable),
    - not_attempted: configs never started (no line of any kind),
    - tunnel_suspect: True when the pass ended on a silent stall (no
      session sentinel within session_cap, or a config timeout with
      zero output) — the caller should probe before trying again.

    A config that produced data but no __done__ sentinel (e.g. the
    worker hung in teardown) counts as captured; the worker is killed
    and restarted for the remaining configs."""
    import collections
    import queue as queue_mod
    import subprocess
    import threading

    no_data = []
    idx = 0
    while idx < len(names):
        if deadline - time.time() < 45:
            return no_data, list(names[idx:]), False
        batch = names[idx:]
        env = dict(os.environ, _ZT_BENCH_WORKER=",".join(batch))
        proc = subprocess.Popen([sys.executable, here], env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        q = queue_mod.Queue()
        err_tail = collections.deque(maxlen=40)

        def _drain_out(p=proc, q=q):
            for ln in p.stdout:
                q.put(ln)
            q.put(None)

        def _drain_err(p=proc, buf=err_tail):
            for ln in p.stderr:
                buf.append(ln)

        threading.Thread(target=_drain_out, daemon=True).start()
        threading.Thread(target=_drain_err, daemon=True).start()

        def _next_obj(t_deadline):
            """Next parsed JSON object from the worker, or 'eof'/None."""
            while time.time() < t_deadline:
                try:
                    ln = q.get(timeout=min(
                        5.0, max(0.1, t_deadline - time.time())))
                except queue_mod.Empty:
                    continue
                if ln is None:
                    return "eof"
                try:
                    obj = json.loads(ln.strip())
                except ValueError:
                    continue
                if isinstance(obj, dict):
                    return obj
            return None

        # session warmup: the worker's first device roundtrip IS the
        # tunnel probe — no separate probe processes (they contend)
        sess_deadline = time.time() + min(session_cap,
                                          max(60, deadline - time.time()))
        obj = _next_obj(sess_deadline)
        if not (isinstance(obj, dict) and obj.get("__session__")
                is not None):
            proc.kill()
            return no_data, list(batch), True

        restart = tunnel_suspect = False
        for j, name in enumerate(batch):
            remaining = deadline - time.time()
            if remaining < 45:
                break
            nominal = 600 if name == "north_star" else 400
            if _SMOKE:
                nominal = 300
            n_left = len(batch) - j - 1
            t_limit = max(60, min(nominal, remaining - 45 * n_left - 15))
            cfg_deadline = time.time() + t_limit
            got = done = eof = False
            while True:
                obj = _next_obj(cfg_deadline)
                if obj is None:
                    break
                if obj == "eof":
                    eof = True
                    break
                if "__done__" in obj:
                    if obj["__done__"] == name:
                        done = True
                    break
                if "__session__" in obj:
                    continue
                if tag:
                    obj.update(tag)
                _EMITTED.append(obj)
                print(json.dumps(obj), flush=True)
                if (obj.get("metric") == _METRIC_NAMES.get(name)
                        and obj.get("value") is not None):
                    got = True
            idx += 1
            if done:
                continue
            # config deadline passed, or the worker died mid-config
            if not got:
                why = ("worker exited" if eof
                       else f"timeout after {t_limit:.0f}s (tunnel stall?)")
                tail = "".join(err_tail)[-200:].strip()
                emit(_METRIC_NAMES[name], None, "error", None,
                     error=why + (f": {tail}" if eof and tail else ""),
                     **(tag or {}))
                no_data.append(name)
                tunnel_suspect = not eof
            restart = True
            break
        proc.kill()  # also reaps a worker idling in backend teardown
        if not restart:
            return no_data, list(names[idx:]), False
        if tunnel_suspect:
            # silent stall: hand the remaining configs back so the
            # caller can probe/wait instead of burning their caps on
            # the same dead window
            return no_data, list(names[idx:]), True
    return no_data, [], False


def _summary():
    """Close the artifact with the headline metric: the driver treats
    the LAST line as THE bench number, so it must not be whatever
    config happened to run last."""
    def _best(key):
        want = _METRIC_NAMES[key]
        for obj in reversed(_EMITTED):
            if obj.get("metric") == want and obj.get("value") is not None:
                return obj
        return None

    head = _best("north_star") or _best("codec_roundtrip")
    if head is not None:
        line = dict(head)
        line["summary"] = True
        print(json.dumps(line), flush=True)


def main():
    """Parent driver. Contract (VERDICT r3 #1): ALWAYS exits 0 with one
    JSON line per config — a measured value, an error line, or an
    explicit skip — and NEVER exceeds the total wall budget
    (ZT_BENCH_TOTAL_MINUTES, default 20), whatever the tunnel does.
    All configs ride ONE persistent worker (_worker_pass) so the
    26-280 s per-process tunnel cold start is paid once, not per
    config; the worker's session sentinel doubles as the tunnel probe,
    and silent stalls fall back to a probe-gated salvage loop."""
    only = os.environ.get("_ZT_BENCH_CHILD")  # parent->child protocol
    if only:  # child mode: one config, in-process, no probe
        if only not in _CONFIGS:
            print(f"unknown bench config {only!r}; expected one of "
                  f"{_CONFIGS}", file=sys.stderr)
            return 2
        _run_config(only)
        return

    worker = os.environ.get("_ZT_BENCH_WORKER")
    if worker:  # parent->worker protocol
        _worker([n for n in worker.split(",") if n])
        return

    total_min = float(os.environ.get("ZT_BENCH_TOTAL_MINUTES", "20"))
    deadline = time.time() + total_min * 60
    here = os.path.abspath(__file__)

    def _note(msg):
        print(json.dumps({"note": msg}), file=sys.stderr, flush=True)

    no_data, not_run, suspect = _worker_pass(here, list(_CONFIGS),
                                             deadline)
    if suspect:
        _note("worker stalled before/at "
              f"{(not_run or ['?'])[0]}; falling back to probe-gated "
              "retries")

    # the codec config never needs the tunnel — if the worker died
    # before reaching it, run it as its own child right away
    if "codec_roundtrip" in not_run and deadline - time.time() > 105:
        not_run.remove("codec_roundtrip")
        _run_child(here, "codec_roundtrip",
                   max(60, min(400, deadline - time.time() - 90)))

    # Salvage (VERDICT r4 #1): retry device configs that produced no
    # data, headline first, for as long as budget remains. Probe-gated:
    # after a silent stall the cheap way to wait out the window is a
    # killable probe, not another worker burning config caps. Each
    # config gets at most 3 attempts total so a crash-looping config
    # cannot spam the artifact.
    _PRIORITY = ("north_star", "filter_fusion", "colorspace", "fdm",
                 "features", "codec_roundtrip")
    pending = sorted(set(no_data) | set(not_run), key=_PRIORITY.index)
    tries = {name: 1 if name in no_data else 0 for name in pending}
    sess_fails = 0  # consecutive worker deaths before ANY config ran
    while pending:
        remaining = deadline - time.time()
        if remaining < 90:
            break
        if suspect and not _probe_tunnel(
                timeout_s=min(150, max(20, remaining / 6))):
            _note(f"salvage probe for {pending[0]} failed; tunnel still "
                  "stalled — will re-probe while budget remains")
            time.sleep(min(45, max(5, (deadline - time.time()) / 8)))
            continue
        nd, nr, suspect = _worker_pass(here, pending, deadline,
                                       tag={"retried": True})
        attempted = [n for n in pending if n not in nr]
        if not attempted:
            # the worker died during session warmup even though the
            # probe passed — something beyond a tunnel stall; bounded
            sess_fails += 1
            if sess_fails >= 3:
                break
        else:
            sess_fails = 0
        for name in attempted:
            tries[name] += 1
        pending = sorted((set(nd) | set(nr)) & {
            n for n in tries if tries[n] < 3}, key=_PRIORITY.index)

    # contract sweep: any config that never produced a line of any kind
    # gets an explicit skip so the artifact stays one-line-per-config
    seen = {obj.get("metric") for obj in _EMITTED}
    for name in _CONFIGS:
        if _METRIC_NAMES[name] not in seen:
            _emit_skip(name, "tunnel stalled (no healthy window within "
                             f"the {total_min:.0f} min budget)")

    _summary()
    return 0


if __name__ == "__main__":
    sys.exit(main())
