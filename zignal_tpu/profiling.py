"""Profiling utilities (SURVEY §5 tracing/profiling equivalent).

The reference's profiling surface is ad-hoc: `sixel.Profile` per-stage
nanosecond accumulation (terminal/sixel.zig:59-105) and the CLI `Timer`
(cli/common.zig). The TPU equivalents here:

- ``Profile``: named-stage wall-time accumulator (the sixel.Profile
  shape, usable anywhere)
- ``measure``: throughput of a jitted op in GPix/s, axon-tunnel-aware
  (chains N calls and differences two chain lengths so deferred
  execution and fixed RPC latency cancel — see CLAUDE.md)
- ``trace``: context manager around ``jax.profiler.trace`` for XLA-level
  traces viewable in TensorBoard/Perfetto
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["Profile", "measure", "trace"]


class Profile:
    """Accumulates per-stage elapsed seconds (reference: sixel.zig:59)."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> str:
        total = self.total or 1.0
        lines = [
            f"{name:<20} {secs * 1000:8.2f} ms  {secs / total * 100:5.1f}%"
            f"  (x{self.counts[name]})"
            for name, secs in sorted(self.stages.items(),
                                     key=lambda kv: -kv[1])
        ]
        lines.append(f"{'total':<20} {self.total * 1000:8.2f} ms")
        return "\n".join(lines)


def measure(fn, *args, pixels: int | None = None, n_small: int = 2,
            n_large: int = 12):
    """Per-call seconds (and GPix/s if `pixels` given) of a jitted op.

    Builds a device-side dependency chain of N invocations and fetches a
    single scalar, differencing two N so compile time, deferred dispatch,
    and the tunnel's fixed RPC latency all cancel.
    """
    import jax.numpy as jnp

    def chain(n):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(n):
            r = fn(*args)
            acc = acc + r.ravel()[0].astype(jnp.float32)
        float(acc)  # host fetch forces the chain
        return time.perf_counter() - t0

    chain(1)  # warmup/compile
    # On a loaded host the noise can exceed the differenced signal and
    # the estimate goes negative; retry with more repetitions, then fall
    # back to the (positive, pessimistic) undifferenced upper bound.
    per_call = -1.0
    for attempt in range(3):
        reps = 2 + attempt
        t_small = min(chain(n_small) for _ in range(reps))
        t_large = min(chain(n_large) for _ in range(reps))
        per_call = (t_large - t_small) / (n_large - n_small)
        if per_call > 0:
            break
    if per_call <= 0:
        per_call = t_large / n_large
    if pixels is None:
        return per_call
    return per_call, pixels / per_call / 1e9


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level trace via jax.profiler (TensorBoard/Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
