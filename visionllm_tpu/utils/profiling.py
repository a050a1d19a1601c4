"""Tracing / profiling / debugging harness.

SURVEY.md §5: the reference has no profiling beyond an unused
TimeCounter; the TPU rebuild standardizes on jax.profiler traces plus a
relay-aware timing harness (the axon tunnel adds O(10-100 ms) per host
round trip, so naive block_until_ready timing measures the relay, not
the device — `fit_device_time` runs the op n times inside one compiled
while_loop at two trip counts and returns the slope).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Scoped NaN checking (the reference has none; jax re-runs the
    offending op un-jitted and raises with a proper traceback)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def fit_device_time(fn: Callable[..., Any], *args,
                    n_lo: int = 4, n_hi: int = 36,
                    repeats: int = 2) -> float:
    """Device seconds per `fn(*args, carry)` invocation, relay overhead
    fitted out. `fn` must accept a trailing float32 carry scalar and
    return an array (used to chain iterations)."""

    def chained(n, a):
        def cond(s):
            return s[0] < n

        def body(s):
            i, c = s
            out = fn(*a, c)
            return i + 1, jnp.sum(out).astype(jnp.float32) * 1e-12

        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.float32(0)))[1]

    jitted = jax.jit(chained)
    _ = np.asarray(jitted(n_lo, args))

    def run(n):
        t0 = time.perf_counter()
        _ = np.asarray(jitted(n, args))
        return time.perf_counter() - t0

    run(n_lo)
    t_lo = min(run(n_lo) for _ in range(repeats))
    t_hi = min(run(n_hi) for _ in range(repeats))
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


class TimeCounter:
    """Named wall-clock accumulator (reference unipose TimeCounter
    equivalent, host-side)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": v, "mean_s": v / self.counts[k],
                    "count": self.counts[k]}
                for k, v in self.totals.items()}
