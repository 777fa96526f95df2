"""Primary benchmark: rays/s/chip, 1spp 1024x1024 Cornell-mesh.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}

Metric definition (BASELINE.json:2): useful rays traced per second per
chip on the Cornell-mesh scene at 1spp 1024x1024 (4-bounce path with NEE
shadow rays; ray count measured exactly by the instrumented engine, dead
lanes excluded). The upstream reference publishes no numbers
("published": {}, BASELINE.json:13), so vs_baseline compares against this
repo's own recorded best (.bench_baseline.json, committed once first
measured); 1.0 on the first run.

Usage: python bench.py [--smoke] [--scene cornell_mesh] [--depth 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny size, CPU-friendly smoke run")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--backend", default=None,
                    help="override cfg.backend (jnp|pallas)")
    ap.add_argument("--bands", type=int, default=0,
                    help="render in N horizontal bands (0 = auto). Keeps "
                    "each device program short enough for remote-TPU "
                    "watchdogs while measuring the same total work.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.utils.cache import enable as enable_cache

    enable_cache()

    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine.wavefront import trace_sample
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device

    cfg = PRESETS["bench"]
    if args.smoke:
        cfg = cfg.replace(width=128, height=128)
    if args.width:
        cfg = cfg.replace(width=args.width)
    if args.height:
        cfg = cfg.replace(height=args.height)
    if args.depth:
        cfg = cfg.replace(max_depth=args.depth)
    if args.scene:
        cfg = cfg.replace(scene=args.scene)
    if args.backend:
        cfg = cfg.replace(backend=args.backend)

    # Until the BVH lands, brute force over the mesh scene is infeasible;
    # fall back to the analytic scene so the bench never crashes.
    try:
        from pathtracer_tpu.accel.build import build_bvh  # noqa: F401

        have_bvh = True
    except Exception:
        have_bvh = False
    if not have_bvh and cfg.scene != "cornell_spheres":
        cfg = cfg.replace(scene="cornell_spheres", use_bvh=False)

    scene = build_scene(cfg.scene)
    if cfg.use_bvh and have_bvh:
        from pathtracer_tpu.accel.build import with_bvh

        scene = with_bvh(scene)
    scene = scene_to_device(scene)
    dev = jax.devices()[0]

    # Band the image so each device program stays short (the remote-TPU
    # watchdog kills multi-second programs); auto = <=128k pixels/band.
    bands = args.bands or max(1, cfg.n_pixels // (128 * 1024))
    band = cfg.n_pixels // bands
    assert cfg.n_pixels % bands == 0, (cfg.n_pixels, bands)

    @jax.jit
    def run(geometry, materials, camera, lights, band_start):
        # iota INSIDE jit: a closed-over concrete index array would be
        # embedded as a huge HLO constant, which stalls the axon compile.
        pixel_ids = band_start + jnp.arange(band, dtype=jnp.uint32)
        return trace_sample(
            geometry, materials, camera, lights, cfg, pixel_ids,
            jnp.uint32(0), with_stats=True,
        )

    sargs = (scene.geometry, scene.materials, scene.camera, scene.lights)

    def full_frame():
        """One full image; returns (last_radiance, total_rays)."""
        total = 0
        for b in range(bands):
            radiance, n = run(*sargs, jnp.uint32(b * band))
            total += int(n)  # int() is the host-fetch completion barrier
        return radiance, total

    # Warm-up / compile + exact useful-ray count.
    radiance, n_rays = full_frame()

    # Timing forces a host fetch each band: block_until_ready() returns
    # early through the axon tunnel (verified), so fetching is the only
    # reliable completion barrier.
    iters = 3 if args.smoke else args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        radiance, _ = full_frame()
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = n_rays / dt

    baseline_path = os.path.join(os.path.dirname(__file__) or ".",
                                 ".bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = rays_per_s / float(base["value"])
    elif not args.smoke:
        with open(baseline_path, "w") as f:
            json.dump(
                {"value": rays_per_s, "unit": "rays/s/chip",
                 "device": str(dev), "cfg": cfg.to_json()}, f,
            )

    print(json.dumps({
        "metric": (
            f"rays/s/chip ({cfg.scene} {cfg.width}x{cfg.height} "
            f"{cfg.spp}spp depth{cfg.max_depth} backend={cfg.backend} "
            f"on {dev.device_kind})"
        ),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
