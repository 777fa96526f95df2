"""HBM-streaming cluster intersection: the large-scene closest-hit path.

SURVEY.md §5.7 mechanism 4 ("HBM-resident flat BVH with Pallas streaming
— bounded VMEM for arbitrarily large scenes") and VERDICT.md round-1 item
4: the dense intersector (ops/intersect_cluster.py) keeps the whole
cluster feature table VMEM-resident, capping scenes at ~65k triangles.
This variant keeps the table in HBM and DMAs only the clusters each ray
block actually needs:

  XLA (this file):   the same conservative interval cull as the dense
      path, extended to produce per-ray-block CANDIDATE LISTS — cluster
      ids sorted by conservative entry distance (near first), padded to a
      static cap K. Dense ops: interval test, argsort. No gathers.

  Pallas (this file): grid = ray blocks. Each step walks its candidate
      row (SMEM), double-buffering 32KB feature blocks HBM->VMEM with
      `pltpu.make_async_copy` while the MXU intersects the previous
      cluster — the classic DMA/compute overlap pattern. Compute per
      visit is identical to the dense kernel (shared epilogue).

  Exactness guard:   a block whose candidate count exceeds K cannot be
      silently truncated (a missed cluster = a wrong image). The wrapper
      computes `max_count` and a scalar `lax.cond` selects the jnp BVH
      walk for the WHOLE batch in that case. The streaming result is
      therefore always exact; K only controls how often the slow path
      triggers. Coherent blocks (camera tiles, NEE shadow batches,
      compaction-sorted bounces) stay far below any reasonable K.

The reference has no analogue — its BVH lives in GPU global memory and
is pointer-chased per thread (SURVEY.md §2.1 R2, AoS pointer nodes);
streaming whole 128-triangle clusters over a wide DMA bus instead of
chasing 32-byte nodes is the TPU-native re-pose of "the scene lives in
big memory, the working set lives close to compute".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..accel.clusters import CLUSTER_COLS, CLUSTER_TRIS, FEAT_ROWS
from ..engine import intersect as isect
from .intersect_cluster import RAY_BLOCK, _ray_features, _interval_prod_bounds

# Default per-block candidate cap. 256 clusters = 32k triangles of
# working set per ray block; camera-tile frustums in the 2M-triangle
# big_mesh scene measure far below this (tests/unit/test_stream.py).
MAX_CAND = 256


def cull_candidates(cl_lo, cl_hi, o, d, block: int = RAY_BLOCK,
                    max_cand: int = MAX_CAND):
    """Per-ray-block candidate cluster lists, near-first.

    Same conservative interval slab test as intersect_cluster.cull_mask,
    additionally keeping the LOWER bound of the entry distance so
    candidates can be ordered front-to-back (the streaming kernel visits
    them in this order; with a per-block t bound this enables early
    termination later).

    Returns (cand, count, overflow):
      cand: (B, K) i32 cluster ids, -1 padded, sorted by tnear_lo
      count: (B,) i32 number of valid candidates per block (uncapped)
      overflow: () bool — any block exceeded K (result must not be used)
    """
    R = o.shape[0]
    B = R // block
    K = min(max_cand, cl_lo.shape[0])
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    o_b = o.reshape(B, block, 3)
    i_b = inv.reshape(B, block, 3)
    olo = o_b.min(1)[:, None, :]
    ohi = o_b.max(1)[:, None, :]
    ilo = i_b.min(1)[:, None, :]
    ihi = i_b.max(1)[:, None, :]
    a_lo = cl_lo[None, :, :] - ohi
    a_hi = cl_lo[None, :, :] - olo
    b_lo = cl_hi[None, :, :] - ohi
    b_hi = cl_hi[None, :, :] - olo
    pmin_a, pmax_a = _interval_prod_bounds(a_lo, a_hi, ilo, ihi)
    pmin_b, pmax_b = _interval_prod_bounds(b_lo, b_hi, ilo, ihi)
    ax_min = jnp.minimum(pmin_a, pmin_b)
    ax_max = jnp.maximum(pmax_a, pmax_b)
    tnear_lo = jnp.max(ax_min, axis=-1)  # (B, C)
    tfar_hi = jnp.min(ax_max, axis=-1)
    hit = tfar_hi >= jnp.maximum(tnear_lo, C.T_MIN)

    count = hit.sum(axis=1).astype(jnp.int32)  # (B,)
    key = jnp.where(hit, tnear_lo, jnp.inf)
    order = jnp.argsort(key, axis=1)[:, :K].astype(jnp.int32)  # (B, K)
    rank = jax.lax.broadcasted_iota(jnp.int32, order.shape, 1)
    cand = jnp.where(rank < count[:, None], order, -1)
    overflow = jnp.max(count) > K
    return cand, count, overflow


def _stream_kernel(cand_ref, count_ref, rayf_ref, feat_hbm, t_ref, idx_ref,
                   buf, sems):
    """One grid step = one RAY_BLOCK-ray block walking its candidate row.

    cand_ref:  (1, K) i32 SMEM — this block's candidate cluster ids
    count_ref: (1, 1) i32 SMEM — number of valid candidates
    rayf_ref:  (16, RB) f32 VMEM — ray feature rows
    feat_hbm:  (16, C*512) f32 ANY/HBM — full feature table (unblocked)
    t_ref/idx_ref: (8, RB) outputs, row 0 meaningful
    buf:  (2, 16, 512) f32 VMEM scratch — double buffer
    sems: (2,) DMA semaphores
    """
    RB = rayf_ref.shape[1]
    rayf = rayf_ref[:, :]
    rayf_hi = rayf.astype(jnp.bfloat16)
    rayf_lo = (rayf - rayf_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    n_cand = count_ref[0, 0]

    def dma(slot, k):
        cid = cand_ref[0, k]
        col0 = pl.multiple_of(cid * CLUSTER_COLS, CLUSTER_COLS)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(col0, CLUSTER_COLS)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_cand > 0)
    def _():
        dma(0, 0).start()

    def visit(k, carry):
        t_best, best = carry  # (1, RB) f32, (1, RB) i32
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_cand)
        def _():
            dma(jax.lax.rem(k + 1, 2), k + 1).start()

        dma(slot, k).wait()
        blk = buf[slot]  # (16, 512)
        # Same three-pass bf16 hi/lo near-f32 matmul as the dense kernel
        # (see ops/intersect_cluster.py for the precision rationale).
        b_hi = blk.astype(jnp.bfloat16)
        b_lo = (blk - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((0,), (0,)), ((), ()))
        q = (
            jax.lax.dot_general(
                b_hi, rayf_hi, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                b_hi, rayf_lo, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                b_lo, rayf_hi, dims, preferred_element_type=jnp.float32)
        )
        n = CLUSTER_TRIS
        det = q[0 * n:1 * n, :]
        un = q[1 * n:2 * n, :]
        vn = q[2 * n:3 * n, :]
        tn = q[3 * n:4 * n, :]
        s = jnp.where(det < 0.0, -1.0, 1.0)
        adet = det * s
        un = un * s
        vn = vn * s
        tn = tn * s
        eps_ok = adet > C.DET_EPS
        valid = (
            eps_ok
            & (un >= 0.0)
            & (vn >= 0.0)
            & (un + vn <= adet)
            & (tn > C.T_MIN * adet)
            & (tn < C.T_FAR * adet)
        )
        tc = jnp.where(valid, tn / jnp.where(eps_ok, adet, 1.0), C.T_FAR)
        tmin = jnp.min(tc, axis=0, keepdims=True)  # (1, RB)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, RB), 0)
        jstar = jnp.min(
            jnp.where(tc == tmin, row, n), axis=0, keepdims=True
        )
        better = tmin < t_best
        cid = cand_ref[0, k]
        best = jnp.where(better, cid * CLUSTER_TRIS + jstar, best)
        t_best = jnp.where(better, tmin, t_best)
        return t_best, best

    init = (
        jnp.full((1, RB), C.T_FAR, jnp.float32),
        jnp.full((1, RB), -1, jnp.int32),
    )
    t_best, best = jax.lax.fori_loop(0, n_cand, visit, init)
    t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _stream_pallas(cand, count, rayf, feat, max_cand, interpret):
    """custom_vjp boundary — traversal outputs are piecewise-constant in
    the differentiable parameters (same detach policy as the dense
    kernel and ops/traverse_pallas.py; SURVEY.md §3.4/T9)."""
    return _stream_impl(cand, count, rayf, feat, max_cand, interpret)


def _stream_fwd(cand, count, rayf, feat, max_cand, interpret):
    out = _stream_impl(cand, count, rayf, feat, max_cand, interpret)
    return out, (cand.shape, count.shape, rayf.shape, feat.shape)


def _stream_bwd(max_cand, interpret, res, g):
    c_shape, n_shape, r_shape, f_shape = res
    return (
        np.zeros(c_shape, jax.dtypes.float0),
        np.zeros(n_shape, jax.dtypes.float0),
        jnp.zeros(r_shape, jnp.float32),
        jnp.zeros(f_shape, jnp.float32),
    )


_stream_pallas.defvjp(_stream_fwd, _stream_bwd)


@functools.partial(jax.jit, static_argnames=("max_cand", "interpret"))
def _stream_impl(cand, count, rayf, feat, max_cand, interpret):
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    K = cand.shape[1]
    t_out, idx_out = pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((FEAT_ROWS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat stays in HBM
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
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, CLUSTER_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cand, count.reshape(-1, 1), rayf, feat)
    return t_out[0], idx_out[0]


def closest_hit_stream(geom, o, d, interpret: bool | None = None,
                       max_cand: int = MAX_CAND):
    """Drop-in closest hit for scenes whose cluster tables exceed VMEM.

    Same contract as intersect_cluster.closest_hit_cluster: (t, n, mat),
    t == T_FAR on miss. Exact for any candidate distribution — if a ray
    block's candidate count exceeds `max_cand`, the whole batch is
    computed by the jnp BVH walk instead (scalar lax.cond; both branches
    are compiled, one executes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_clusters = geom.cl_lo.shape[0]
    assert n_clusters > 0, "no cluster tables: call with_clusters(scene)"
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R0 = o.shape[0]
    block = RAY_BLOCK
    pad = (-R0) % block
    if pad:
        o_p = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d_p = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    else:
        o_p, d_p = o, d

    rayf = _ray_features(o_p, d_p)
    cand, count, overflow = cull_candidates(
        jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi), o_p, d_p,
        block, max_cand,
    )

    def run_stream(_):
        t_best, slot = _stream_pallas(
            cand, count, rayf, jnp.asarray(geom.cl_feat),
            cand.shape[1], interpret,
        )
        t_best = t_best[:R0]
        slot = slot[:R0]
        hit = slot >= 0
        best = jnp.where(
            hit, jnp.asarray(geom.cl_map)[jnp.maximum(slot, 0)], -1
        )
        hit = best >= 0
        safe = jnp.maximum(best, 0)
        n_best = jnp.where(hit[:, None], jnp.asarray(geom.tri_n)[safe], 0.0)
        m_best = jnp.where(hit, jnp.asarray(geom.tri_mat)[safe], 0)
        t_out = jnp.where(hit, t_best, C.T_FAR)
        return t_out, n_best, m_best

    def run_fallback(_):
        from ..accel.traverse import closest_hit

        return closest_hit(geom, o, d)

    if geom.bvh_lo.shape[0] > 0:
        t_out, n_best, m_best = jax.lax.cond(
            overflow, run_fallback, run_stream, operand=None
        )
    else:
        # No BVH tables: the streaming result is the only option; callers
        # must size max_cand >= worst-case candidate count (asserted in
        # interpret-mode tests, unverifiable inside jit on TPU).
        t_out, n_best, m_best = run_stream(None)

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
