"""Persistent XLA compilation cache.

TPU compiles of the unrolled wavefront program are expensive (~4 min for a
deep config via the axon tunnel) while execution is milliseconds; a
persistent on-disk cache makes every program a one-time cost across
processes (bench runs, CLI renders, driver checks). Call enable() before
the first jit dispatch; it is idempotent and safe on any backend.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(path: str | None = None) -> None:
    import jax

    cache_dir = os.path.abspath(path or os.environ.get(
        "PATHTRACER_JAX_CACHE", _DEFAULT
    ))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program regardless of size/compile time.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
