"""Primary-ray generation (jnp mirror of oracle/tracer.py:camera_rays).

The reference generates camera rays per CUDA thread inside the megakernel
(SURVEY.md §3.1 R9); here ray-gen is a vectorized jnp op over all pixels of
the (sub-)image so XLA fuses it with the first bounce. The formula must
stay in lockstep with the oracle — tests/oracle/test_engine.py checks
agreement to float precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_rays(camera, width: int, height: int, jitter, pixel_ids):
    """Rays for the given absolute pixel ids (row-major y*width+x).

    jitter: (N, 2) in [0,1); pixel_ids: (N,) int32. Returns (o, d), each
    (N, 3) float32. Taking explicit pixel ids (not an implicit arange)
    lets sharded renders generate exactly their tile's rays.
    """
    pos = jnp.asarray(camera.position, jnp.float32)
    w = jnp.asarray(camera.look_at, jnp.float32) - pos
    w = w / jnp.linalg.norm(w)
    up = jnp.asarray(camera.up, jnp.float32)
    # Screen-right = up x forward (canonical Cornell view; keep in lockstep
    # with oracle/tracer.py:camera_rays).
    u = jnp.cross(up, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)
    half_h = jnp.tan(jnp.asarray(camera.fov_y, jnp.float32) / 2.0)
    half_w = half_h * (width / height)

    ys = pixel_ids // width
    xs = pixel_ids - ys * width
    sx = ((xs + jitter[:, 0]) / width) * 2.0 - 1.0
    sy = 1.0 - ((ys + jitter[:, 1]) / height) * 2.0
    d = (
        w[None, :]
        + sx[:, None] * (half_w * u)[None, :]
        + sy[:, None] * (half_h * v)[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(pos, d.shape)
    return o.astype(jnp.float32), d.astype(jnp.float32)
