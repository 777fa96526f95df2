"""HBM-streaming cluster intersection: the large-scene closest-hit path.

SURVEY.md §5.7 mechanism 4 ("HBM-resident flat BVH with Pallas streaming
— bounded VMEM for arbitrarily large scenes") and VERDICT.md round-1 item
4: the dense intersector (ops/intersect_cluster.py) keeps the whole
cluster feature table VMEM-resident, capping scenes at ~65k triangles.
This variant keeps the table in HBM and DMAs only the clusters each ray
block actually needs:

  XLA (intersect_cluster.cull_candidates): per-ray-block candidate lists
      — cluster ids surviving the conservative interval cull, sorted by
      entry distance (near first), padded to a static cap K. Dense ops:
      interval test, argsort. No gathers.

  Pallas (this file): grid = ray blocks. Each step walks its candidate
      row (SMEM), double-buffering 32KB feature blocks HBM->VMEM with
      `pltpu.make_async_copy` while the MXU intersects the previous
      cluster — the classic DMA/compute overlap pattern. Compute per
      visit is identical to the dense kernel (shared visit_q /
      visit_epilogue), including the ordered EARLY EXIT once every ray's
      best hit precedes the next candidate's conservative entry distance.

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
from ..accel.clusters import CLUSTER_COLS, FEAT_ROWS
from ..engine import intersect as isect
from .intersect_cluster import (
    RAY_BLOCK,
    _ray_features,
    cull_candidates,
    split_bf16,
    visit_epilogue,
    visit_q,
)

# Default per-block candidate cap. 256 clusters = 32k triangles of
# working set per ray block; camera-tile frustums in the 2M-triangle
# big_mesh scene measure far below this (tests/unit/test_stream.py).
MAX_CAND = 256


def _stream_kernel(cand_ref, count_ref, tnear_ref, rayf_ref, feat_hbm,
                   t_ref, idx_ref, buf, sems):
    """One grid step = one RAY_BLOCK-ray block walking its candidate row.

    cand_ref:  (8, K) i32 SMEM — candidate rows for 8 ray blocks (Mosaic
        sublane-divisibility windowing; this block's row = program_id % 8)
    count_ref: (8, 1) i32 SMEM — candidate counts, same windowing
    tnear_ref: (8, K) f32 SMEM — sorted conservative entry distances
    rayf_ref:  (16, RB) f32 VMEM — ray feature rows
    feat_hbm:  (16, C*512) f32 ANY/HBM — full feature table (unblocked)
    t_ref/idx_ref: (8, RB) outputs, row 0 meaningful
    buf:  (2, 16, 512) f32 VMEM scratch — double buffer
    sems: (2,) DMA semaphores
    """
    RB = rayf_ref.shape[1]
    K = cand_ref.shape[1]
    row = pl.program_id(0) % 8
    rayf = rayf_ref[:, :]
    rayf_hi, rayf_lo = split_bf16(rayf)
    t0 = rayf[10:11, :]  # per-ray t upper bound (T_FAR when unbounded)
    n_cand = count_ref[row, 0]

    def dma(slot, k):
        cid = cand_ref[row, k]
        col0 = pl.multiple_of(cid * CLUSTER_COLS, CLUSTER_COLS)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(col0, CLUSTER_COLS)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_cand > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        k, tmax, _, _ = state
        # Ordered early exit (see intersect_cluster._cluster_kernel).
        # A prefetched-but-skipped cluster's DMA is waited for in the
        # epilogue below so no semaphore is left pending.
        kc = jnp.minimum(k, K - 1)
        return (k < n_cand) & (tnear_ref[row, kc] < tmax)

    def body(state):
        k, _, t_best, best = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_cand)
        def _():
            dma(jax.lax.rem(k + 1, 2), k + 1).start()

        dma(slot, k).wait()
        q = visit_q(buf[slot], rayf_hi, rayf_lo)
        cid = cand_ref[row, k]
        t_best, best = visit_epilogue(q, t_best, best, cid)
        return k + 1, jnp.max(t_best), t_best, best

    init = (
        jnp.int32(0),
        jnp.max(t0),
        t0,
        jnp.full((1, RB), -1, jnp.int32),
    )
    k_end, _, t_best, best = jax.lax.while_loop(cond, body, init)

    # If the loop exited early, the prefetch for step k_end is still in
    # flight (k_end == 0: the warm-up DMA; k_end > 0: the lookahead from
    # the last body). Absorb it so the semaphore is clean for the next
    # grid step.
    @pl.when(k_end < n_cand)
    def _():
        dma(jax.lax.rem(k_end, 2), k_end).wait()

    t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _stream_pallas(cand, count, tnear, rayf, feat, interpret):
    """custom_vjp boundary — traversal outputs are piecewise-constant in
    the differentiable parameters (same detach policy as the dense
    kernel and ops/traverse_pallas.py; SURVEY.md §3.4/T9)."""
    return _stream_impl(cand, count, tnear, rayf, feat, interpret)


def _stream_fwd(cand, count, tnear, rayf, feat, interpret):
    out = _stream_impl(cand, count, tnear, rayf, feat, interpret)
    return out, (cand.shape, count.shape, tnear.shape, rayf.shape,
                 feat.shape)


def _stream_bwd(interpret, res, g):
    c_shape, n_shape, tn_shape, r_shape, f_shape = res
    return (
        np.zeros(c_shape, jax.dtypes.float0),
        np.zeros(n_shape, jax.dtypes.float0),
        jnp.zeros(tn_shape, jnp.float32),
        jnp.zeros(r_shape, jnp.float32),
        jnp.zeros(f_shape, jnp.float32),
    )


_stream_pallas.defvjp(_stream_fwd, _stream_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stream_impl(cand, count, tnear, rayf, feat, interpret):
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    K = cand.shape[1]
    assert cand.shape[0] % 8 == 0, cand.shape  # 8-row SMEM windows
    t_out, idx_out = pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, K), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, K), lambda i: (i // 8, 0),
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
    )(cand, count.reshape(-1, 1), tnear, rayf, feat)
    return t_out[0], idx_out[0]


def closest_hit_stream(geom, o, d, interpret: bool | None = None,
                       max_cand: int = MAX_CAND, t_max=None):
    """Drop-in closest hit for scenes whose cluster tables exceed VMEM.

    Same contract as intersect_cluster.closest_hit_cluster: (t, n, mat),
    t == T_FAR on miss; optional per-ray t_max bound (hits beyond it MAY
    read as misses — the shadow-query contract). Exact for any candidate
    distribution — if a ray block's candidate count exceeds `max_cand`,
    the whole batch is computed by the jnp BVH walk instead (scalar
    lax.cond; both branches are compiled, one executes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_clusters = geom.cl_lo.shape[0]
    assert n_clusters > 0, "no cluster tables: call with_clusters(scene)"
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R0 = o.shape[0]
    block = RAY_BLOCK
    from .intersect_cluster import _pad_rays

    o_p, d_p, t_max_p = _pad_rays(o, d, t_max, block)

    rayf = _ray_features(o_p, d_p, t_max_p)
    cand, count, tnear, overflow = cull_candidates(
        jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi), o_p, d_p,
        block, max_cand, t_max=t_max_p,
    )

    def run_stream(_):
        t_best, slot = _stream_pallas(
            cand, count, tnear, rayf, jnp.asarray(geom.cl_feat), interpret
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

    if geom.bvh_lo.shape[0] > 0 and max_cand < n_clusters:
        t_out, n_best, m_best = jax.lax.cond(
            overflow, run_fallback, run_stream, operand=None
        )
    else:
        # K == C (overflow impossible) or no BVH tables to fall back to;
        # in the latter case callers must size max_cand for the scene
        # (asserted in interpret-mode tests, unverifiable inside jit).
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
