"""Microbenchmark: closest-hit traversal strategies on the attached chip.

Round-2 perf investigation (VERDICT.md next-round item 3): the round-1 jnp
traversal measured ~36-40k rays/s flat across image sizes — latency
bound, ~3 orders of magnitude off. This script times candidate
implementations head-to-head on the real device so the engine backend
choice is data, not vibes:

    map     accel/traverse.py as shipped (lax.map over 8192-ray chunks)
    flat    one batched while_loop over the whole ray batch (no lax.map)
    packed  flat + single packed-row gather per node/triangle fetch
    brute   engine/intersect.py brute force (reference point, O(R*T))

Each variant is timed on primary rays (coherent) and uniform random rays
(incoherent) at several batch sizes; results print as a table and are
appended to microbench_results.jsonl.

Usage: python scripts/microbench_traverse.py [--sizes 65536,262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=5):
    """Median wall seconds over iters; full-result fetch as the barrier."""
    out = fn(*args)
    np.asarray(jax_tree_leaf(out))  # compile + settle
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in _leaves(out):
            np.asarray(leaf)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))


def _leaves(out):
    import jax

    return jax.tree.leaves(out)


def jax_tree_leaf(out):
    return _leaves(out)[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="65536,262144")
    ap.add_argument("--scene", default="cornell_mesh")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip", default="",
                    help="comma-separated variant names to skip")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp

    from pathtracer_tpu.accel.build import with_bvh
    from pathtracer_tpu.accel.traverse import _traverse_chunk, closest_hit
    from pathtracer_tpu.engine import intersect as isect
    from pathtracer_tpu.engine.camera import camera_rays
    from pathtracer_tpu.scene import builder
    from pathtracer_tpu.scene.model import scene_to_device
    from pathtracer_tpu.utils.cache import enable

    enable()
    dev = jax.devices()[0]
    scene = scene_to_device(with_bvh(builder.build_scene(args.scene)))
    g = scene.geometry
    n_tris = int(g.tri_v0.shape[0])
    n_nodes = int(g.bvh_lo.shape[0])
    print(f"device={dev.device_kind} scene={args.scene} "
          f"tris={n_tris} nodes={n_nodes}", file=sys.stderr)

    # ---- variant: flat (single while_loop over the whole batch) --------
    @jax.jit
    def flat(o, d):
        return _traverse_chunk(g, o, d, 4)

    # ---- variant: packed (one gather per node, one per leaf tri) -------
    nodes_f = jnp.concatenate([g.bvh_lo, g.bvh_hi], axis=1)  # (N, 6)
    nodes_i = jnp.stack([g.bvh_first, g.bvh_count, g.bvh_skip], 1)  # (N,3)
    tris_f = jnp.concatenate([g.tri_v0, g.tri_e1, g.tri_e2], 1)  # (T, 9)
    import pathtracer_tpu.constants as C

    def _packed(o, d, max_leaf=4):
        n_nodes_ = nodes_f.shape[0]
        R = o.shape[0]
        tiny = 1e-20
        dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
        inv_d = 1.0 / dd

        def cond(state):
            cursor, _, _ = state
            return jnp.any(cursor < n_nodes_)

        def body(state):
            cursor, t_best, best = state
            c = jnp.minimum(cursor, n_nodes_ - 1)
            active = cursor < n_nodes_
            nf = nodes_f[c]  # (R, 6) single gather
            ni = nodes_i[c]  # (R, 3) single gather
            lo, hi = nf[:, 0:3], nf[:, 3:6]
            first, count, nskip = ni[:, 0], ni[:, 1], ni[:, 2]
            t0 = (lo - o) * inv_d
            t1 = (hi - o) * inv_d
            tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hit_box = active & (tfar >= jnp.maximum(tnear, C.T_MIN)) & (
                tnear < t_best)
            is_leaf = count > 0
            for k in range(max_leaf):
                idx = jnp.minimum(first + k, n_tris - 1)
                valid = hit_box & is_leaf & (k < count)
                tf = tris_f[idx]  # (R, 9) single gather
                v0, e1, e2 = tf[:, 0:3], tf[:, 3:6], tf[:, 6:9]
                pvec = jnp.cross(d, e2)
                det = jnp.sum(e1 * pvec, -1)
                safe = jnp.where(det == 0, 1.0, det)
                inv = jnp.where(jnp.abs(det) > C.DET_EPS, 1.0 / safe, 0.0)
                tvec = o - v0
                uu = jnp.sum(tvec * pvec, -1) * inv
                qvec = jnp.cross(tvec, e1)
                vv = jnp.sum(d * qvec, -1) * inv
                t = jnp.sum(e2 * qvec, -1) * inv
                ok = (valid & (jnp.abs(det) > C.DET_EPS) & (uu >= 0.0)
                      & (vv >= 0.0) & (uu + vv <= 1.0) & (t > C.T_MIN)
                      & (t < C.T_FAR))
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                best = jnp.where(better, idx, best)
            nxt = jnp.where(hit_box & ~is_leaf, c + 1, nskip)
            cursor = jnp.where(active, nxt, cursor)
            return cursor, t_best, best

        init = (jnp.zeros((R,), jnp.int32),
                jnp.full((R,), C.T_FAR, jnp.float32),
                jnp.full((R,), -1, jnp.int32))
        _, t_best, best = jax.lax.while_loop(cond, body, init)
        return t_best, best

    packed = jax.jit(_packed)

    # ---- variant: map (as shipped) --------------------------------------
    @jax.jit
    def mapped(o, d):
        return closest_hit(g, o, d)

    @jax.jit
    def brute(o, d):
        return isect.brute(g, o, d)

    variants = {"flat": flat, "packed": packed, "map": mapped,
                "brute": brute}
    for name in skip:
        variants.pop(name, None)

    # ---- ray batches -----------------------------------------------------
    rng = np.random.default_rng(0)
    rows = []
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for R in sizes:
        batches = {}
        # coherent: primary camera rays for the first R pixels of 1024^2
        pix = jnp.arange(R, dtype=jnp.uint32)
        jit2 = jnp.zeros((R, 2), jnp.float32)
        o_c, d_c = camera_rays(scene.camera, 1024, 1024, jit2, pix)
        batches["coherent"] = (jnp.asarray(o_c), jnp.asarray(d_c))
        # incoherent: uniform origins in the box, random directions
        o_r = (rng.random((R, 3)) * 0.9 + 0.05).astype(np.float32)
        d_r = rng.normal(size=(R, 3)).astype(np.float32)
        d_r /= np.linalg.norm(d_r, axis=-1, keepdims=True)
        batches["incoherent"] = (jnp.asarray(o_r), jnp.asarray(d_r))

        for bname, (o, d) in batches.items():
            for vname, fn in variants.items():
                if vname == "brute" and R * n_tris > 2**31:
                    continue
                try:
                    med, best = timeit(fn, o, d, iters=args.iters)
                except Exception as e:  # noqa: BLE001
                    print(f"R={R:8d} {bname:10s} {vname:8s} FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}",
                          file=sys.stderr)
                    continue
                rps = R / med
                row = {"R": R, "batch": bname, "variant": vname,
                       "median_s": round(med, 5), "min_s": round(best, 5),
                       "rays_per_s": round(rps, 1),
                       "device": str(dev.device_kind)}
                rows.append(row)
                print(f"R={R:8d} {bname:10s} {vname:8s} "
                      f"med={med*1e3:9.2f}ms  {rps/1e6:10.3f} Mrays/s")

    with open(os.path.join(here, "microbench_results.jsonl"), "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
