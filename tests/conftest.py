"""Test-suite environment: CPU backend with 8 virtual devices.

Per SURVEY.md §4.5 (the standard JAX trick), all tests run on the CPU
backend with `--xla_force_host_platform_device_count=8` so Mesh/shard_map/
psum paths are exercised without TPU hardware. Threefry is bit-exact across
backends, so CPU test renders equal TPU renders at the same seeds.

This file must set the environment BEFORE jax is imported anywhere, which
pytest guarantees by importing conftest first.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Hard override: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), and the axon plugin wins over the env var — only a post-import
# config update reliably forces the CPU backend (verified empirically).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: CPU test compiles of the traversal/engine
# programs take minutes; cache them across runs.
from pathtracer_tpu.utils.cache import enable as _enable_cache  # noqa: E402

_enable_cache()
