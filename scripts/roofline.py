"""Single-chip roofline for the dense cluster intersector (VERDICT r2
item 2: "the builder should know its ceiling, not just its trend").

Reconstructs the bench band's real per-pass ray distributions (primary
tile rays; bounce rays via the engine's own shading/RNG + coherence
sort; NEE shadow rays with per-ray distance bounds), then for each pass:

  * visit counts from the kernel itself (the walk's k_end is written
    into idx row 1 — ops/intersect_cluster.py:cluster_visit_counts)
  * wall time of the full closest-hit call (warm, best of N)
  * MXU arithmetic: 3 bf16 passes x (2 * 16 * 512 * 512) FLOP per
    cluster visit; achieved TFLOP/s vs the v5e's ~197 TFLOP/s bf16 peak
  * the matmul-only lower bound for the same visit count

Appends nothing; prints a table to paste into PROFILE.md.
Run on the TPU host: python scripts/roofline.py [--scene cornell_mesh]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PEAK_BF16_TFLOPS = 197.0  # TPU v5e (v5 lite), one chip


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_mesh")
    ap.add_argument("--rays", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.utils.cache import enable
    enable()

    from pathtracer_tpu import constants as C
    from pathtracer_tpu.accel.build import with_bvh
    from pathtracer_tpu.accel.clusters import CLUSTER_COLS, with_clusters
    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine.camera import camera_rays, tiled_pixel_ids
    from pathtracer_tpu.engine.shading import cosine_hemisphere, sample_light
    from pathtracer_tpu.engine.wavefront import _coherence_key
    from pathtracer_tpu.ops.intersect_cluster import (
        RAY_BLOCK,
        RAY_CULL_MAX_C,
        _pad_rays,
        _ray_features,
        closest_hit_cluster,
        cluster_visit_counts,
        cull_candidates,
        exit_bound,
        ray_cluster_mask,
        ray_super_mask,
    )
    from pathtracer_tpu.sampling import rng as rng_mod
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device

    cfg = PRESETS["bench"].replace(scene=args.scene)
    scene = scene_to_device(with_clusters(with_bvh(build_scene(cfg.scene))))
    g = scene.geometry
    R = args.rays
    n_clusters = int(g.cl_lo.shape[0])
    print(f"scene={cfg.scene} clusters={n_clusters} rays/call={R}")

    # --- reconstruct the band's passes with the engine's own machinery
    pix = tiled_pixel_ids(jnp.uint32(0), R, cfg.width)
    jit0 = rng_mod.pixel_jitter(cfg.seed, jnp.uint32(0), pix)
    o0, d0 = camera_rays(scene.camera, cfg.width, cfg.height, jit0, pix)
    t0_, n0_, m0_ = closest_hit_cluster(g, o0, d0)
    hit = np.asarray(t0_) < C.T_FAR * 0.5
    cos_in = -jnp.sum(n0_ * d0, -1)
    n_shade = n0_ * jnp.where(cos_in > 0, 1.0, -1.0)[:, None]
    p_hit = o0 + t0_[:, None] * d0
    U = rng_mod.bounce_uniforms(cfg.seed, jnp.uint32(0), 0, pix)
    d1 = cosine_hemisphere(n_shade, U[:, rng_mod.BSDF_U1],
                           U[:, rng_mod.BSDF_U2])
    o1 = p_hit + n_shade * C.RAY_OFFSET
    alive = jnp.asarray(hit)
    scene_lo = g.bvh_lo[0]
    scene_hi = g.bvh_hi[0]
    key = _coherence_key(o1, d1, alive, scene_lo, scene_hi)
    perm = jnp.argsort(key, stable=True)
    o1s, d1s = o1[perm], d1[perm]
    alive_s = alive[perm]
    o1q = jnp.where(alive_s[:, None], o1s, 0.0)
    d1q = jnp.where(alive_s[:, None], d1s,
                    jnp.asarray([0.0, 0.0, 1.0]))
    t1cap = jnp.where(alive_s, C.T_FAR, C.T_MIN)
    # shadow pass from the same (sorted) vertices
    x_l, n_l, _ = sample_light(scene.lights, g, U[:, rng_mod.LIGHT_SEL],
                               U[:, rng_mod.LIGHT_U1],
                               U[:, rng_mod.LIGHT_U2])
    x_ls = x_l[perm]
    o_sh = o1s
    dvec = x_ls - o_sh
    dist = jnp.linalg.norm(dvec, axis=-1)
    wi = dvec / jnp.maximum(dist[:, None], 1e-20)
    o_shq = jnp.where(alive_s[:, None], o_sh, 0.0)
    wi_q = jnp.where(alive_s[:, None], wi, jnp.asarray([0.0, 0.0, 1.0]))
    t_sh = jnp.where(alive_s, dist, C.T_MIN)

    passes = [
        ("primary (tiled)", o0, d0, None),
        ("bounce-1 (sorted)", o1q, d1q, t1cap),
        ("shadow-1 (sorted, dist-capped)", o_shq, wi_q, t_sh),
    ]

    FLOP_PER_VISIT = 3 * 2 * 16 * 512 * 512  # three bf16 matmul passes
    f = jax.jit(lambda o, d, tm: closest_hit_cluster(g, o, d, t_max=tm))

    print(f"{'pass':32s} {'visits/blk':>10} {'vis/ray':>8} "
          f"{'t_call':>8} {'us/visit':>9} {'TFLOP/s':>8} {'%peak':>6} "
          f"{'mxu-bound':>9}")
    for name, o, d, tm in passes:
        # visit counts via the probe (same cand build as the hot path)
        o_p, d_p, tm_p = _pad_rays(o, d, tm, RAY_BLOCK)
        t_exit = exit_bound(g.cl_lo, g.cl_hi, o_p, d_p)
        tm_eff = t_exit if tm_p is None else jnp.minimum(
            jnp.asarray(tm_p, jnp.float32), t_exit)
        extra = None
        if 1 < n_clusters <= RAY_CULL_MAX_C:
            extra = ray_cluster_mask(g.cl_lo, g.cl_hi, o_p, d_p,
                                     tm_eff, RAY_BLOCK)
        elif g.su_lo.shape[0] > 1:
            extra = ray_super_mask(g.su_lo, g.su_hi, g.cl_super, o_p,
                                   d_p, tm_eff, RAY_BLOCK)
        cand, count, tnear, _ = cull_candidates(
            g.cl_lo, g.cl_hi, o_p, d_p, RAY_BLOCK, t_max=tm_eff,
            extra_mask=extra)
        rayf = _ray_features(o_p, d_p, tm_eff)
        visits = np.asarray(cluster_visit_counts(
            cand, count, tnear, rayf, g.cl_feat, False))
        v_tot = int(visits.sum())

        # timing (warm, best of reps)
        tmj = tm if tm is not None else jnp.full((R,), C.T_FAR,
                                                 jnp.float32)
        out = f(o, d, tmj)
        np.asarray(out[0])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(o, d, tmj)
            np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        t_call = min(ts)

        flops = v_tot * FLOP_PER_VISIT
        tflops = flops / t_call / 1e12
        mxu_bound = flops / (PEAK_BF16_TFLOPS * 1e12)
        print(f"{name:32s} {v_tot/len(visits):10.1f} "
              f"{v_tot*512/R:8.2f} {t_call*1e3:7.1f}ms "
              f"{t_call*1e6/max(v_tot,1):9.2f} {tflops:8.2f} "
              f"{100*tflops/PEAK_BF16_TFLOPS:5.1f}% "
              f"{mxu_bound*1e3:7.2f}ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
