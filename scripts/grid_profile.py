"""Grid-path roofline + glue/kernel split (VERDICT r3 item 7).

Extends scripts/roofline.py's methodology to the per-ray DDA grid
intersector (ops/intersect_grid.py): reconstructs the bench band's real
pass distributions (primary tile rays; bounce rays via the engine's own
shading/RNG + coherence sort; NEE shadow rays with distance caps), then
for each pass reports

  * wall time of the full closest-hit call (warm, best of N)
  * era-ladder diagnostics from the path itself (stats=True): how many
    straggler eras ran and how many rays survived the full-R phase 0 —
    the quantities that set the O(R2*W)-per-era glue bill
  * with --trace: a device-time breakdown parsed from a jax.profiler
    trace — Pallas pair-kernel time vs sort time vs gather/scatter time
    vs everything else, the per-phase glue-vs-kernel split that guides
    tuning (PROFILE.md r3 "remaining headroom").

Run on the TPU host:
  python scripts/grid_profile.py --scene big_mesh [--axis 8] [--trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_trace(logdir: str) -> dict[str, float]:
    """Aggregate device-op durations (us) by name from a profiler dump.

    Reads the trace-viewer JSON the profiler writes under
    <logdir>/plugins/profile/*/; keeps only events on TensorCore/device
    lanes (XLA op events carry 'dur'), summing duration by event name.
    """
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*trace.json.gz"))
    if not paths:
        return {}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name, to keep device lanes only.
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    by_name: dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pnames.get(e.get("pid"), "")
        if "TPU" not in pname and "Tensor" not in pname and \
                "/device" not in pname.lower():
            continue
        by_name[e["name"]] += e["dur"]
    return dict(by_name)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="big_mesh")
    ap.add_argument("--axis", type=int, default=None)
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--phase-steps", type=int, default=None)
    ap.add_argument("--first-steps", type=int, default=None)
    ap.add_argument("--era-steps", type=int, default=None)
    ap.add_argument("--sweep", default=None,
                    help="semicolon list of W0,We combos to time in one "
                    "process (amortizes scene build + compile pipeline), "
                    "e.g. '6,12;12,12;8,18'")
    ap.add_argument("--max-cand", type=int, default=None)
    ap.add_argument("--trace", action="store_true",
                    help="jax.profiler trace of the bounce pass + parsed "
                    "device-time breakdown")
    ap.add_argument("--trace-dir", default="/tmp/grid_profile_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.utils.cache import enable
    enable()

    from pathtracer_tpu import constants as C
    from pathtracer_tpu.accel.grid import with_grid
    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine.camera import camera_rays, tiled_pixel_ids
    from pathtracer_tpu.engine.shading import cosine_hemisphere, sample_light
    from pathtracer_tpu.engine.wavefront import _coherence_key
    from pathtracer_tpu.ops import intersect_grid as ig
    from pathtracer_tpu.sampling import rng as rng_mod
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device

    cfg = PRESETS["bench"].replace(scene=args.scene, backend="grid")
    scene = scene_to_device(with_grid(build_scene(cfg.scene),
                                      axis=args.axis))
    g = scene.geometry
    R = args.rays
    axis = ig.grid_axis(g)
    n_clusters = int(g.cl_feat.shape[1]) // 512
    kw = {}
    if args.max_cand is not None:
        kw["max_cand"] = args.max_cand
    if args.phase_steps is not None:
        kw["phase_steps"] = args.phase_steps
    if args.first_steps is not None:
        kw["first_steps"] = args.first_steps
    if args.era_steps is not None:
        kw["era_steps"] = args.era_steps
    print(f"scene={cfg.scene} axis={axis} clusters={n_clusters} "
          f"rays/call={R} kw={kw}")

    # Geometry is an ARGUMENT, not a closure: a closed-over device array
    # is serialized as an HLO constant and the 535MB big_mesh feature
    # table blows the tunnel's request cap (HTTP 413, PROFILE.md r3).
    def make_hit(kw2):
        _hit = jax.jit(lambda geom, o, d, tm: ig.closest_hit_grid(
            geom, o, d, t_max=tm, **kw2))
        _hit_stats = jax.jit(lambda geom, o, d, tm: ig.closest_hit_grid(
            geom, o, d, t_max=tm, stats=True, **kw2))
        return (lambda o, d, tm: _hit(g, o, d, tm),
                lambda o, d, tm: _hit_stats(g, o, d, tm))

    hit, hit_stats = make_hit(kw)

    # --- reconstruct the band's passes with the engine's own machinery
    pix = tiled_pixel_ids(jnp.uint32(0), R, cfg.width)
    jit0 = rng_mod.pixel_jitter(cfg.seed, jnp.uint32(0), pix)
    o0, d0 = camera_rays(scene.camera, cfg.width, cfg.height, jit0, pix)
    tm0 = jnp.full((R,), C.T_FAR, jnp.float32)
    t0_, n0_, m0_ = hit(o0, d0, tm0)
    hitm = np.asarray(t0_) < C.T_FAR * 0.5
    print(f"primary hit rate {hitm.mean():.3f}")
    cos_in = -jnp.sum(n0_ * d0, -1)
    n_shade = n0_ * jnp.where(cos_in > 0, 1.0, -1.0)[:, None]
    p_hit = o0 + t0_[:, None] * d0
    U = rng_mod.bounce_uniforms(cfg.seed, jnp.uint32(0), 0, pix)
    d1 = cosine_hemisphere(n_shade, U[:, rng_mod.BSDF_U1],
                           U[:, rng_mod.BSDF_U2])
    o1 = p_hit + n_shade * C.RAY_OFFSET
    alive = jnp.asarray(hitm)
    scene_lo = jnp.asarray(g.gr_lo)
    scene_hi = scene_lo + jnp.asarray(g.gr_cell) * axis
    key = _coherence_key(o1, d1, alive, scene_lo, scene_hi)
    perm = jnp.argsort(key, stable=True)
    o1s, d1s = o1[perm], d1[perm]
    alive_s = alive[perm]
    o1q = jnp.where(alive_s[:, None], o1s, 0.0)
    d1q = jnp.where(alive_s[:, None], d1s, jnp.asarray([0.0, 0.0, 1.0]))
    t1cap = jnp.where(alive_s, C.T_FAR, C.T_MIN)
    x_l, n_l, _ = sample_light(scene.lights, g, U[:, rng_mod.LIGHT_SEL],
                               U[:, rng_mod.LIGHT_U1],
                               U[:, rng_mod.LIGHT_U2])
    x_ls = x_l[perm]
    dvec = x_ls - o1s
    dist = jnp.linalg.norm(dvec, axis=-1)
    wi = dvec / jnp.maximum(dist[:, None], 1e-20)
    o_shq = jnp.where(alive_s[:, None], o1s, 0.0)
    wi_q = jnp.where(alive_s[:, None], wi, jnp.asarray([0.0, 0.0, 1.0]))
    t_sh = jnp.where(alive_s, dist, C.T_MIN)

    passes = [
        ("primary (tiled)", o0, d0, tm0),
        ("bounce-1 (sorted)", o1q, d1q, t1cap),
        ("shadow-1 (sorted, capped)", o_shq, wi_q, t_sh),
    ]

    def time_passes(hit_f, stats_f, label=""):
        if label:
            print(f"--- {label} ---")
        print(f"{'pass':28s} {'t_call':>9} {'Mrays/s':>8} {'eras':>5} "
              f"{'liveA':>7} {'unfin':>6} {'visits':>7} {'v/ray':>6} "
              f"{'us/vis':>7}")
        tot = 0.0
        for name, o, d, tm in passes:
            out = stats_f(o, d, tm)
            np.asarray(out[0])
            info = jax.tree.map(lambda x: int(np.asarray(x)), out[3])
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out2 = hit_f(o, d, tm)
                np.asarray(out2[0])
                ts.append(time.perf_counter() - t0)
            t_call = min(ts)
            tot += t_call
            vis = info.get("visits", 0)
            # us/visit charges the WHOLE call (kernel + glue + ~25ms
            # tunnel floor) to the visits — an upper bound; the
            # kernel-only share comes from --trace.
            print(f"{name:28s} {t_call*1e3:8.1f}ms {R/t_call/1e6:8.2f} "
                  f"{info['eras']:5d} {info['live_after_phase0']:7d} "
                  f"{info['unfinished']:6d} {vis:7d} {vis/R:6.3f} "
                  f"{t_call*1e6/max(vis,1):7.2f}", flush=True)
        print(f"{'TOTAL (3 passes)':28s} {tot*1e3:8.1f}ms")
        return tot

    if args.sweep:
        # Combo syntax: "W0,We" or "W0,We,l1-l2[-l3]" (ladder divisors).
        results = {}
        for combo in args.sweep.split(";"):
            parts = combo.split(",")
            w0, we = int(parts[0]), int(parts[1])
            kw2 = dict(kw, first_steps=w0, era_steps=we)
            label = f"W0={w0} We={we}"
            if len(parts) > 2:
                kw2["ladder"] = tuple(int(x) for x in parts[2].split("-"))
                label += f" ladder={kw2['ladder']}"
            hf, sf = make_hit(kw2)
            results[combo] = time_passes(hf, sf, label)
        best = min(results, key=results.get)
        print(f"best: {best} total {results[best]*1e3:.1f}ms")
        return 0

    time_passes(hit, hit_stats)

    if args.trace:
        import shutil

        shutil.rmtree(args.trace_dir, ignore_errors=True)
        from pathtracer_tpu.utils.profiling import trace as ptrace

        name, o, d, tm = passes[1]
        with ptrace(args.trace_dir):
            for _ in range(3):
                out = hit(o, d, tm)
                np.asarray(out[0])
        by_name = parse_trace(args.trace_dir)
        if not by_name:
            print("no device events parsed — inspect the trace dir "
                  f"manually: {args.trace_dir}")
            return 0
        # Events nest (jit > while > kernel), so the honest split is:
        # total = the outermost jit event; kernel = sum of _pair_impl
        # regions (the Pallas pair-kernel calls); glue = the rest.
        total = max((v for k, v in by_name.items() if "jit" in k),
                    default=sum(by_name.values()))
        kernel = sum(v for k, v in by_name.items()
                     if "_pair_impl" in k or "pair_kernel" in k)
        sorts = sum(v for k, v in by_name.items()
                    if "sort" in k.lower() and "jit" not in k)
        fusions = sum(v for k, v in by_name.items()
                      if k.startswith("fusion"))
        print(f"\ndevice-time split of 3x {name} "
              f"(outermost jit {total/1e3:.1f}ms):")
        print(f"  pair kernel (_pair_impl) {kernel/1e3:8.1f}ms "
              f"{100*kernel/total:5.1f}%")
        print(f"  glue (total - kernel)    "
              f"{(total-kernel)/1e3:8.1f}ms {100*(total-kernel)/total:5.1f}%")
        print(f"    of which named fusions {fusions/1e3:8.1f}ms, "
              f"sorts {sorts/1e3:.1f}ms")
        print("\ntop 15 ops:")
        for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {v/1e3:8.1f}ms  {k[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
