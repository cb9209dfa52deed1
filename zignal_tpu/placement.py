"""Transfer-aware host/device placement policy (SURVEY §5 "minimise
host<->device transfers"; HBM-bandwidth design rule).

A TPU-native framework co-located with its chips should push every batched
op to the device; the same framework driven through a slow remote link (the
axon tunnel here measures ~5-40 MB/s aggregate) should keep small one-shot
CLI work on the host when a bit-identical host path exists. The policy is
measured, not guessed: the first decision calibrates the link once with a
tiny round-trip probe and caches the bandwidth for the process.

Override with ZT_PLACEMENT=host|device|auto (default auto).
"""

from __future__ import annotations

import os
import time

import numpy as np

__all__ = ["link_bandwidth_mbps", "prefer_host", "reset_calibration"]

_CAL: dict = {}

# host-side native resize throughput, conservative (measured ~300+ MPix/s;
# use 150 so the policy only picks the host when it clearly wins)
_HOST_MPIX_S = 150.0
# fixed per-dispatch overhead through a remote RPC link (measured ~6 ms)
_DISPATCH_S = 0.006


def reset_calibration() -> None:
    # bump the generation so an in-flight probe thread from before the
    # reset cannot write its (possibly contended) bandwidth into the
    # fresh calibration state
    _CAL.clear()
    _GEN[0] += 1


_GEN = [0]


def link_bandwidth_mbps() -> float:
    """One-time calibrated host<->device round-trip bandwidth (MB/s).

    The probe runs in a daemon thread with a timeout: the axon tunnel
    stalls completely for tens of minutes at a time, a hung fetch can
    never be cancelled (it does release the GIL — measured), and an
    untimed calibration would hang the first auto-placement decision
    (= the whole CLI). On timeout the link is scored as dead so every
    op with a host path stays on the host; the probe thread is left to
    finish in the background and its result replaces the dead score
    for later decisions if the tunnel recovers."""
    if "bw" not in _CAL:
        import threading

        gen = _GEN[0]

        def _probe():
            try:
                import jax

                probe = np.zeros((512, 512), np.uint8)  # 0.25 MB
                d = jax.device_put(probe)
                np.asarray(d)  # warm any lazy backend init
                t0 = time.perf_counter()
                np.asarray(jax.device_put(probe))
                dt = max(time.perf_counter() - t0, 1e-7)
                if _GEN[0] == gen:  # stale after reset_calibration()
                    _CAL["bw"] = 2 * probe.nbytes / 1e6 / dt
            except Exception:
                pass  # transient RPC error: probe_thread dies, retried

        with _CAL.setdefault("lock", threading.Lock()):
            t = _CAL.get("probe_thread")
            if t is not None and not t.is_alive() and "bw" not in _CAL:
                t = None  # probe died with an error — retry it
            if t is None:
                t = threading.Thread(target=_probe, daemon=True)
                t.start()
                _CAL["probe_thread"] = t
                # a healthy probe lands in ~0.2-0.5 s (two 0.25 MB
                # round-trips, even on the ~5 MB/s tunnel); the cap
                # exists purely to bound stall damage per process
                wait = float(os.environ.get("ZT_LINK_PROBE_TIMEOUT_S",
                                            "1.5"))
            else:
                wait = 0.0  # later calls just peek at the pending probe
        t.join(wait)
        if "bw" not in _CAL:
            if not _CAL.get("warned"):
                _CAL["warned"] = True
                import logging

                logging.getLogger("zignal_tpu").warning(
                    "device link probe timed out (tunnel stalled?); "
                    "keeping host paths until it recovers")
            return 1e-3  # stalled link: effectively unusable (not cached)
    return _CAL["bw"]


def prefer_host(in_bytes: int, out_bytes: int, host_mpix: float) -> bool:
    """True when a host implementation is expected to beat upload + device
    compute + download for this op instance.

    in_bytes/out_bytes: transfer volume; host_mpix: megapixels of host
    work (device compute itself is taken as free — the comparison is
    link cost vs host cost).
    """
    mode = os.environ.get("ZT_PLACEMENT", "auto")
    if mode == "host":
        return True
    if mode == "device":
        return False
    host_s = host_mpix / _HOST_MPIX_S
    device_s = (in_bytes + out_bytes) / 1e6 / link_bandwidth_mbps() \
        + _DISPATCH_S
    return host_s < device_s
