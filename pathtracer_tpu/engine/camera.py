"""Primary-ray generation (jnp mirror of oracle/tracer.py:camera_rays).

The reference generates camera rays per CUDA thread inside the megakernel
(SURVEY.md §3.1 R9); here ray-gen is a vectorized jnp op over all pixels of
the (sub-)image so XLA fuses it with the first bounce. The formula must
stay in lockstep with the oracle — tests/oracle/test_engine.py checks
agreement to float precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def tiled_pixel_ids(band_start, n: int, width: int, tile_w: int = 32,
                    tile_h: int = 16):
    """Pixel ids of a row-major band, reordered so consecutive rays form
    (tile_w x tile_h) screen tiles.

    The dense cluster intersector culls per 512-ray block
    (ops/intersect_cluster.py); with row-major order a block is a
    512-pixel scanline strip whose primary-ray frustum spans the whole
    image width, so the cull barely bites. In tile order a block is one
    compact 32x16 tile — a narrow frustum that skips most clusters.
    Closed-form bijection (no sort, no host constants); falls back to
    arange when the band is not tile-aligned. band_start must be a
    row-aligned multiple of width*tile_h for the mapping to tile the band.
    """
    if width % tile_w or n % (width * tile_h):
        return band_start + jnp.arange(n, dtype=jnp.uint32)
    j = jnp.arange(n, dtype=jnp.uint32)
    per_tile = tile_w * tile_h
    tiles_per_row = width // tile_w
    tile_id = j // per_tile
    within = j - tile_id * per_tile
    v = within // tile_w
    u = within - v * tile_w
    ty = tile_id // tiles_per_row
    tx = tile_id - ty * tiles_per_row
    y = ty * tile_h + v
    x = tx * tile_w + u
    return band_start + y * width + x


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
