"""Counter-based threefry sampler.

The reference seeds a curand state per CUDA thread and advances it
imperatively through the bounce loop (SURVEY.md §2.1 R5) — the draw a path
consumes therefore depends on execution order. That is hostile to XLA and to
multi-chip determinism, so the TPU design replaces it with a *stateless*
counter-based scheme (BASELINE.json:5 "curand → stateless threefry"):

    every uniform is a pure function of (seed, spp_idx, bounce, pixel_id, slot)

computed with JAX's threefry2x32. Threefry is bit-exact across CPU and TPU
backends, so the numpy oracle (oracle/tracer.py) consumes *identical*
uniforms by calling these same functions on the CPU backend — this is what
makes "allclose at fixed seeds" meaningful across oracle/jnp/Pallas and
across any sharding of the pixel space (SURVEY.md §7 hard part 4: counters
derive from absolute pixel id, never device id or iteration order).

Draw layout per (spp_idx, bounce), fixed at N_DRAWS slots:

    0: light-triangle selection      3: BSDF u1 (cosine r^2)
    1: light barycentric u1          4: BSDF u2 (cosine phi)
    2: light barycentric u2          5: Russian-roulette u

Pixel jitter (2 draws) uses a distinct fold_in tag so it never collides
with a bounce stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Slot indices into a per-bounce draw row.
LIGHT_SEL, LIGHT_U1, LIGHT_U2, BSDF_U1, BSDF_U2, RR_U = range(6)
N_DRAWS = 6

_JITTER_TAG = 0x9E3779B1  # distinct stream tag for pixel jitter


def _base_key(seed: int, spp_idx) -> jax.Array:
    key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(key, spp_idx)


def pixel_jitter(seed: int, spp_idx, n_pixels: int) -> jax.Array:
    """(n_pixels, 2) uniforms in [0,1) for sub-pixel camera-ray jitter.

    Row i is pixel i in row-major (y * width + x) order — the absolute
    pixel id, so any sharding of the image produces the same jitter.
    """
    key = jax.random.fold_in(_base_key(seed, spp_idx), _JITTER_TAG)
    return jax.random.uniform(key, (n_pixels, 2), dtype=jnp.float32)


def bounce_uniforms(seed: int, spp_idx, bounce, n_pixels: int) -> jax.Array:
    """(n_pixels, N_DRAWS) uniforms for one bounce of every pixel's path.

    Generated for ALL pixels each bounce and gathered by a ray's pixel id,
    so stream-compacted / permuted ray buffers still consume the draws that
    belong to their pixel (SURVEY.md §3.3).
    """
    key = jax.random.fold_in(_base_key(seed, spp_idx), bounce)
    return jax.random.uniform(key, (n_pixels, N_DRAWS), dtype=jnp.float32)
