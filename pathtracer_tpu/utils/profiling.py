"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference's only observability is the interactive FPS readout; here:
  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable trace of the XLA programs in the region;
  * `device_barrier(x)` — a RELIABLE completion barrier. NOTE:
    `block_until_ready()` returns early through the axon TPU tunnel
    (verified empirically), so timing code must force a host fetch of at
    least one element; this helper is the single place encoding that.
  * `Timer` — wall-clock timer using the barrier.
"""

from __future__ import annotations

import contextlib
import time


def device_barrier(x) -> float:
    """Force completion of everything `x` depends on; returns one scalar."""
    import numpy as np

    arr = np.asarray(x)
    return float(arr.reshape(-1)[0])


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """with Timer() as t: ... t.barrier(result); print(t.seconds)"""

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.seconds = None
        return self

    def barrier(self, x):
        device_barrier(x)
        self.seconds = time.perf_counter() - self.t0
        return self.seconds

    def __exit__(self, *exc):
        if self.seconds is None:
            self.seconds = time.perf_counter() - self.t0
        return False


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12)
