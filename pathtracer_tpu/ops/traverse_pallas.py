"""Pallas TPU kernel: synchronized stackless BVH traversal + Möller–Trumbore.

STATUS: ARCHIVED EXPERIMENT (round-3 decision, VERDICT r2 item 6).
This kernel is correct, compiles on the v5e in ~1.6s, and matches the
jnp traversal to 1.2e-7 (TPU_CHECKS.md) — but it is dominated in every
measured regime: the dense cluster kernel (ops/intersect_cluster.py)
is ~10x+ faster wherever the packet kernel's VMEM-resident tables fit
(microbench_results.jsonl vs bench_metrics.jsonl), and the per-ray DDA
grid path (ops/intersect_grid.py) owns large scenes. No preset selects
it; `--backend pallas` remains wired for comparison runs, and its
tests stay green as a regression fence for the Mosaic alignment
patterns documented below (128-aligned block load + one-hot lane
select), which the other kernels inherit. If a niche appears where
packet traversal wins (e.g. extremely divergent tiny scenes), measure
before promoting it back.

The original rationale — the north-star hot kernel (BASELINE.json:5
"flattened stackless BVH traversal and ray-triangle intersection as
Pallas kernels"): the TPU-native replacement for the reference's
per-thread stack walk in tracer.cu (SURVEY.md §2.1 R2/R3).

Why *synchronized* traversal: Mosaic's dynamic-gather lowers only within a
single 128-lane vreg ("Multiple source vregs along gather dimension" —
verified on this toolchain), so classic per-lane divergent traversal (each
ray chasing its own node cursor through gathers, as accel/traverse.py does
via XLA) cannot be expressed efficiently in a TPU kernel. Instead each
RAY_BLOCK-ray block walks the skip-link BVH with ONE shared scalar cursor:

    per visited node:  fetch its column with a scalar dynamic slice
                       (bounds_ref[:, pl.ds(c, 1)]) — broadcast, no gather;
                       slab-test all R lanes at once (VPU, planar (3, R));
                       leaf → up to max_leaf vectorized MT tests;
    descend (c+1) iff ANY lane hit the box, else jump to skip[c].

This is the classic SIMD speculative packet traversal, and it is exactly
the shape the VPU wants: scalar control flow + wide elementwise vector
work, zero scatter/gather. Coherent blocks (primary rays, shadow rays
toward one light) visit a small union of nodes; incoherent bounce batches
degrade toward visiting every node, which the engine counters by sorting
rays (engine-level, SURVEY.md §7 hard part 1/2).

Mosaic alignment (round-2 fix, VERDICT.md item 2): lane-dimension dynamic
slices must be 128-aligned — the round-1 `bounds_ref[:, pl.ds(cursor, 1)]`
column load failed to compile on the v5e ("cannot statically prove that
index in dimension 1 is a multiple of 128"). Node/triangle fetches now
load the 128-aligned block containing the target column and reduce it out
with a one-hot lane select (4 cheap VPU ops); node metadata
(first/count/skip) lives in SMEM where dynamic scalar reads are native.

Tables live in VMEM (+ meta in SMEM), replicated per grid step → this
variant targets scenes whose tables fit on-chip (~<=100k tris); larger
scenes use the jnp traversal whose XLA gathers stream from HBM, and the
fast path for everything is the dense cluster kernel
(ops/intersect_cluster.py), which this packet kernel predates.

Semantics match accel/traverse.py exactly (same MT predicate, same visit
order = same tie-breaks); asserted in tests/unit/test_pallas.py in
interpret mode and compiled on TPU via scripts/tpu_checks.py (PASS log:
TPU_CHECKS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..engine import intersect as isect

RAY_BLOCK = 512  # rays per grid step; smaller blocks = more coherence


def _aligned_column(ref, col, rows: int):
    """Fetch `ref[:, col]` as (rows, 1) with Mosaic-legal addressing.

    Lane-dim dynamic slices must be 128-aligned, so load the aligned
    128-wide block containing `col` and reduce it out with a one-hot
    lane select.
    """
    base = pl.multiple_of((col // 128) * 128, 128)
    blk = ref[:, pl.ds(base, 128)]  # (rows, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    onehot = lane == (col - base)
    return jnp.sum(jnp.where(onehot, blk, 0), axis=1, keepdims=True)


def _traverse_kernel(meta_ref, bounds_ref, tris_ref, rays_ref, t_ref,
                     idx_ref, *, n_nodes, max_leaf):
    """Kernel body (one grid step = one ray block).

    meta_ref:   (3, N) i32 SMEM — rows [first count skip]
    bounds_ref: (8, N) f32 — rows [lox loy loz hix hiy hiz pad pad]
    tris_ref:   (16, T) f32 — rows [v0(3) e1(3) e2(3) pad*7]
    rays_ref:   (8, R) f32 — rows [o(3) d(3) pad pad]
    t_ref:      (8, R) f32 out — row 0 = closest t (T_FAR miss)
    idx_ref:    (8, R) i32 out — row 0 = triangle index (-1 miss)
    """
    R = rays_ref.shape[1]
    o = rays_ref[0:3, :]  # (3, R)
    d = rays_ref[3:6, :]
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv_d = 1.0 / dd

    def cond(state):
        cursor, _, _ = state
        return cursor < n_nodes

    def body(state):
        cursor, t_best, best = state  # scalar, (R,), (R,)
        node = _aligned_column(bounds_ref, cursor, 8)  # (8, 1)
        lo = node[0:3, :]  # (3, 1) broadcasts against (3, R)
        hi = node[3:6, :]
        first = meta_ref[0, cursor]
        count = meta_ref[1, cursor]
        skip = meta_ref[2, cursor]

        t0 = (lo - o) * inv_d  # (3, R)
        t1 = (hi - o) * inv_d
        tlo = jnp.minimum(t0, t1)
        thi = jnp.maximum(t0, t1)
        # Keep everything 2-D ((1, R) rows): Mosaic prefers rank-2 vregs.
        tnear = jnp.maximum(
            jnp.maximum(tlo[0:1, :], tlo[1:2, :]), tlo[2:3, :]
        )  # (1, R)
        tfar = jnp.minimum(
            jnp.minimum(thi[0:1, :], thi[1:2, :]), thi[2:3, :]
        )
        hit_box = (tfar >= jnp.maximum(tnear, C.T_MIN)) & (tnear < t_best)
        any_hit = jnp.any(hit_box)
        is_leaf = count > 0

        d0, d1, d2 = d[0:1, :], d[1:2, :], d[2:3, :]  # (1, R)
        o0, o1, o2 = o[0:1, :], o[1:2, :], o[2:3, :]

        def do_leaf(args):
            t_best, best = args
            for k in range(max_leaf):
                tri_idx = jnp.minimum(first + k, tris_ref.shape[1] - 1)
                tr = _aligned_column(tris_ref, tri_idx, 16)  # (16, 1)
                # (1, 1) slices broadcast against the (1, R) ray rows.
                e1x, e1y, e1z = tr[3:4, :], tr[4:5, :], tr[5:6, :]
                e2x, e2y, e2z = tr[6:7, :], tr[7:8, :], tr[8:9, :]
                # pvec = d × e2 (e2 broadcast over lanes)
                pv0 = d1 * e2z - d2 * e2y
                pv1 = d2 * e2x - d0 * e2z
                pv2 = d0 * e2y - d1 * e2x
                det = e1x * pv0 + e1y * pv1 + e1z * pv2
                safe = jnp.where(det == 0, 1.0, det)
                inv = jnp.where(jnp.abs(det) > C.DET_EPS, 1.0 / safe, 0.0)
                tv0 = o0 - tr[0:1, :]
                tv1 = o1 - tr[1:2, :]
                tv2 = o2 - tr[2:3, :]
                uu = (tv0 * pv0 + tv1 * pv1 + tv2 * pv2) * inv
                qv0 = tv1 * e1z - tv2 * e1y
                qv1 = tv2 * e1x - tv0 * e1z
                qv2 = tv0 * e1y - tv1 * e1x
                vv = (d0 * qv0 + d1 * qv1 + d2 * qv2) * inv
                t = (e2x * qv0 + e2y * qv1 + e2z * qv2) * inv
                ok = (
                    hit_box
                    & (k < count)
                    & (jnp.abs(det) > C.DET_EPS)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (t > C.T_MIN)
                    & (t < C.T_FAR)
                )
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                best = jnp.where(better, tri_idx, best)
            return t_best, best

        t_best, best = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda a: a, (t_best, best)
        )
        nxt = jnp.where(any_hit & jnp.logical_not(is_leaf), cursor + 1, skip)
        return nxt, t_best, best

    init = (
        jnp.int32(0),
        jnp.full((1, R), C.T_FAR, jnp.float32),
        jnp.full((1, R), -1, jnp.int32),
    )
    _, t_best, best = jax.lax.while_loop(cond, body, init)
    t_ref[:, :] = jnp.broadcast_to(t_best, (8, R))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, R))


def _pack_tables(geom):
    """Planar VMEM tables from the flat BVH geometry (jnp; trace-safe)."""
    n = int(geom.bvh_lo.shape[0])
    t = int(geom.tri_v0.shape[0])
    n_pad = max(128, -(-n // 128) * 128)
    t_pad = max(128, -(-t // 128) * 128)
    bounds = jnp.zeros((8, n_pad), jnp.float32)
    bounds = bounds.at[0:3, :n].set(jnp.asarray(geom.bvh_lo).T)
    bounds = bounds.at[3:6, :n].set(jnp.asarray(geom.bvh_hi).T)
    # meta rows [first count skip] — (3, N) i32 for SMEM scalar reads.
    meta = jnp.zeros((3, n_pad), jnp.int32)
    meta = meta.at[0, :n].set(jnp.asarray(geom.bvh_first))
    meta = meta.at[1, :n].set(jnp.asarray(geom.bvh_count))
    meta = meta.at[2, :n].set(jnp.asarray(geom.bvh_skip))
    meta = meta.at[2, n:].set(n)
    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(jnp.asarray(geom.tri_v0).T)
    tris = tris.at[3:6, :t].set(jnp.asarray(geom.tri_e1).T)
    tris = tris.at[6:9, :t].set(jnp.asarray(geom.tri_e2).T)
    return bounds, meta, tris, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _traverse_pallas(bounds, meta, tris, rays, n_nodes, max_leaf, interpret):
    """custom_vjp boundary around the kernel (SURVEY.md §3.4/T9).

    pallas_call has no AD rule; the detach policy says traversal outputs
    carry no gradients anyway (hit geometry is piecewise-constant in the
    differentiable parameters), so the VJP returns zero cotangents. This
    is what lets jax.grad flow through a render whose intersector is the
    Pallas kernel."""
    return _traverse_impl(bounds, meta, tris, rays, n_nodes, max_leaf,
                          interpret)


def _traverse_fwd(bounds, meta, tris, rays, n_nodes, max_leaf, interpret):
    out = _traverse_impl(bounds, meta, tris, rays, n_nodes, max_leaf,
                         interpret)
    res = (bounds.shape, meta.shape, tris.shape, rays.shape)
    return out, res


def _traverse_bwd(n_nodes, max_leaf, interpret, res, g):
    b_shape, m_shape, t_shape, r_shape = res
    float0 = jax.dtypes.float0
    return (
        jnp.zeros(b_shape, jnp.float32),
        np.zeros(m_shape, float0),  # int input → float0 tangent
        jnp.zeros(t_shape, jnp.float32),
        jnp.zeros(r_shape, jnp.float32),
    )


_traverse_pallas.defvjp(_traverse_fwd, _traverse_bwd)


@functools.partial(
    jax.jit, static_argnames=("n_nodes", "max_leaf", "interpret")
)
def _traverse_impl(bounds, meta, tris, rays, n_nodes, max_leaf, interpret):
    R = rays.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    kernel = functools.partial(
        _traverse_kernel, n_nodes=n_nodes, max_leaf=max_leaf
    )
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(meta.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(bounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, R), jnp.float32),
            jax.ShapeDtypeStruct((8, R), jnp.int32),
        ],
        interpret=interpret,
    )(meta, bounds, tris, rays)
    return t_out[0], idx_out[0]


def closest_hit_pallas(geom, o, d, max_leaf: int = 4,
                       interpret: bool | None = None):
    """Drop-in closest hit with the Pallas traversal kernel.

    Same contract as engine/intersect.py:brute / accel/traverse.py:
    (t, n_geom, mat). Sphere primitives are merged with the brute path
    (spheres are few). interpret=None auto-selects interpreter mode off
    the TPU (CPU tests run the kernel interpreted).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bounds, meta, tris, n_nodes = _pack_tables(geom)
    R = o.shape[0]
    r_pad = -(-R // 128) * 128
    if r_pad > RAY_BLOCK:
        r_pad = -(-R // RAY_BLOCK) * RAY_BLOCK
    rays = jnp.zeros((8, r_pad), jnp.float32)
    rays = rays.at[0:3, :R].set(jnp.asarray(o).T)
    rays = rays.at[3:6, :R].set(jnp.asarray(d).T)
    # Padding rays get direction z=1 to stay well-formed.
    if r_pad > R:
        rays = rays.at[5, R:].set(1.0)

    t_best, best = _traverse_pallas(
        bounds, meta, tris, rays, n_nodes, max_leaf, interpret
    )
    t_best = t_best[:R]
    best = best[:R]

    hit = best >= 0
    safe = jnp.maximum(best, 0)
    n_best = jnp.where(hit[:, None], geom.tri_n[safe], 0.0)
    m_best = jnp.where(hit, geom.tri_mat[safe], 0)
    t_out = jnp.where(hit, t_best, C.T_FAR)

    if geom.sph_c.shape[0] > 0:
        ts = isect.intersect_spheres(o, d, geom.sph_c, geom.sph_r)
        si = jnp.argmin(ts, axis=1)
        sv = jnp.take_along_axis(ts, si[:, None], axis=1)[:, 0]
        better = sv < t_out
        p = o + sv[:, None] * d
        ns = (p - geom.sph_c[si]) / geom.sph_r[si][:, None]
        t_out = jnp.where(better, sv, t_out)
        n_best = jnp.where(better[:, None], ns, n_best)
        m_best = jnp.where(better, geom.sph_mat[si], m_best)
    return t_out, n_best, m_best
