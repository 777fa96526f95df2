"""Whole-band device-time profile of the cornell bench program.

The round-4 trace put the 147ms cornell band at ~75ms cluster kernels +
~70ms engine "fusion tail" in ~2ms pieces (PROFILE.md r4). Round-5's
orders (VERDICT r5 items 1/2) are to cut BOTH; this script is the
measurement loop for that campaign: it jits the EXACT bench band program
(bench.py's run()), traces N executions with jax.profiler, and prints

  * the device-time split: Pallas cluster-kernel custom-calls vs
    everything else (the engine tail), plus sort / gather / scatter
    buckets;
  * the top-K events by total device time;
  * with --hlo: for each top fusion, the fusion's first body ops with
    their source lines from the compiled HLO text — the r4 "HLO fusion
    audit" that mapped every hot fusion to a named source line.

Run on the TPU host:
  python scripts/band_profile.py [--pixels 1048576] [--scene cornell_mesh]
                                 [--reps 3] [--hlo] [--grad]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from scripts.grid_profile import parse_trace  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_mesh")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--pixels", type=int, default=1024 * 1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo", action="store_true",
                    help="map top fusions to source lines via compiled HLO")
    ap.add_argument("--grad", action="store_true",
                    help="profile the value_and_grad band instead")
    ap.add_argument("--trace-dir", default="/tmp/band_profile_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.utils.cache import enable
    enable()

    from pathtracer_tpu.accel.auto import prepare_accel
    from pathtracer_tpu.accel.build import with_bvh
    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine.camera import tiled_pixel_ids
    from pathtracer_tpu.engine.wavefront import trace_sample
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device

    cfg = PRESETS["bench"].replace(scene=args.scene)
    if args.backend:
        cfg = cfg.replace(backend=args.backend)
    scene = build_scene(cfg.scene)
    if cfg.use_bvh:
        scene = with_bvh(scene)
    scene = scene_to_device(prepare_accel(scene, cfg))
    band = args.pixels

    if args.grad:
        @jax.jit
        def run(geometry, materials, camera, lights, band_start):
            pixel_ids = tiled_pixel_ids(band_start, band, cfg.width)

            def loss_fn(mats):
                rad, n = trace_sample(geometry, mats, camera, lights,
                                      cfg, pixel_ids, jnp.uint32(0),
                                      with_stats=True)
                return jnp.mean(rad * rad), n

            (loss, n), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(materials)
            gsum = loss + sum(jnp.sum(jnp.abs(g))
                              for g in jax.tree.leaves(grads))
            return gsum, n
    else:
        @jax.jit
        def run(geometry, materials, camera, lights, band_start):
            pixel_ids = tiled_pixel_ids(band_start, band, cfg.width)
            return trace_sample(geometry, materials, camera, lights, cfg,
                                pixel_ids, jnp.uint32(0), with_stats=True)

    sargs = (scene.geometry, scene.materials, scene.camera, scene.lights)
    t0 = time.perf_counter()
    _, n0 = run(*sargs, jnp.uint32(0))
    n0 = int(n0)
    print(f"compiled in {time.perf_counter()-t0:.1f}s; "
          f"band rays={n0} pixels={band} backend={cfg.backend} "
          f"grad={args.grad}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, n = run(*sargs, jnp.uint32(0))
        int(n)
        ts.append(time.perf_counter() - t0)
    print(f"warm band wall: {min(ts)*1e3:.1f}ms "
          f"({n0/min(ts)/1e6:.2f} Mrays/s incl. tunnel)")

    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    from pathtracer_tpu.utils.profiling import trace as ptrace

    with ptrace(args.trace_dir):
        for _ in range(args.reps):
            _, n = run(*sargs, jnp.uint32(0))
            int(n)
    by_name = parse_trace(args.trace_dir)
    if not by_name:
        print(f"no device events parsed — inspect {args.trace_dir}")
        return 1

    total = max((v for k, v in by_name.items() if "jit" in k),
                default=sum(by_name.values()))
    kernel = sum(v for k, v in by_name.items()
                 if "cluster_impl" in k or "cluster_kernel" in k
                 or "_pair_impl" in k or "pair_kernel" in k
                 or "stream_impl" in k or "custom-call" in k)
    sorts = sum(v for k, v in by_name.items()
                if "sort" in k.lower() and "jit" not in k)
    print(f"\ndevice split of {args.reps}x band "
          f"(outermost jit {total/1e3:.1f}ms => "
          f"{total/1e3/args.reps:.1f}ms/band):")
    print(f"  Pallas kernels     {kernel/1e3:8.1f}ms {100*kernel/total:5.1f}%")
    print(f"  engine tail (rest) {(total-kernel)/1e3:8.1f}ms "
          f"{100*(total-kernel)/total:5.1f}%")
    print(f"    of which sorts   {sorts/1e3:8.1f}ms")
    print(f"\ntop {args.top} events:")
    top_events = sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]
    for k, v in top_events:
        print(f"  {v/1e3:8.1f}ms  {k[:100]}")

    if args.hlo:
        print("\nmapping top fusions to HLO source lines...")
        txt = run.lower(*sargs, jnp.uint32(0)).compile().as_text()
        # fusion.N computation bodies: find the fused_computation for
        # each top fusion event name and print its largest ops.
        for k, v in top_events:
            m = re.match(r"(fusion(?:\.\d+)?)", k)
            if not m:
                continue
            fus = m.group(1)
            # The fusion instruction line names its called computation.
            mm = re.search(
                rf'%?{re.escape(fus)} = [^\n]*calls=([%\w.\-]+)', txt)
            if not mm:
                continue
            comp = mm.group(1).lstrip("%")
            body = re.search(
                rf'(?:%?{re.escape(comp)})[^\n]*\{{(.*?)\n\}}', txt,
                re.DOTALL)
            if not body:
                continue
            lines = body.group(1).splitlines()
            interesting = [
                ln.strip() for ln in lines
                if re.search(r"gather|scatter|sort|dot|convert|reduce|"
                             r"iota|rng|transpose|concatenate", ln)
            ]
            print(f"\n  {fus} ({v/1e3:.1f}ms):")
            for ln in interesting[:6]:
                # keep op name + source metadata only
                meta = re.search(r'metadata=\{[^}]*\}', ln)
                head = ln.split(" = ")[0][-40:]
                opm = re.search(r'= ([\w\-\.]+)', ln)
                op = opm.group(1) if opm else "?"
                src = ""
                if meta:
                    sm = re.search(r'source_file="([^"]+)"[^}]*'
                                   r'source_line=(\d+)', meta.group(0))
                    if sm:
                        src = (f"{os.path.basename(sm.group(1))}:"
                               f"{sm.group(2)}")
                print(f"    {head:40s} {op:20s} {src}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
