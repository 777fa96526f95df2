"""HBM-streaming cluster intersection: the large-scene closest-hit path.

SURVEY.md §5.7 mechanism 4 ("HBM-resident flat BVH with Pallas streaming
— bounded VMEM for arbitrarily large scenes") and VERDICT.md round-1 item
4: the dense intersector (ops/intersect_cluster.py) keeps the whole
cluster feature table VMEM-resident, capping scenes at ~65k triangles.
This variant keeps the table in HBM and DMAs only the clusters each ray
block actually needs:

  XLA (intersect_cluster.cull_candidates + this wrapper): the FULL
      near-first candidate ordering per ray block — cluster ids
      surviving the conservative interval cull, sorted by entry-distance
      lower bound. Dense ops: interval test, argsort. No gathers.

  Pallas (this file): grid = ray blocks. Each step walks a K-candidate
      window of its row (SMEM), double-buffering 32KB feature blocks
      HBM->VMEM with `pltpu.make_async_copy` while the MXU intersects
      the previous cluster. Compute per visit is identical to the dense
      kernel (shared visit_q / visit_epilogue), including the ordered
      early exit. Best-t/best-index carry IN and OUT of the kernel, so
      the walk can continue across calls.

  ROUNDS (the exactness mechanism): a single window of K candidates is
      not enough for incoherent blocks on large scenes — and falling
      back to a whole-batch gather walk is orders of magnitude slower
      (long enough to trip device watchdogs on 2M-triangle scenes;
      observed on the v5e). Instead the wrapper runs the kernel in a
      `lax.while_loop` over K-candidate ROUNDS: after each round a block
      is RESOLVED iff every ray's best hit is strictly nearer than the
      first candidate the window dropped (their entry bounds only grow,
      so no dropped cluster can beat a resolved ray) or its candidate
      list is exhausted. Resolved blocks get count=0 in later rounds
      (near-zero kernel cost); the loop ends when all blocks resolve.
      Worst case ceil(C/K) rounds == visiting every culled cluster —
      exact by construction, no fallback path, bounded VMEM always.

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
from ..accel.clusters import CLUSTER_COLS, FEAT_ROWS, FEAT_STACK
from ..engine import intersect as isect
from .intersect_cluster import (
    RAY_BLOCK,
    _block_cluster_intervals,
    _decode_winner,
    _pad_rays,
    _ray_features,
    exit_bound,
    ray_super_mask,
    stack_rays,
    visit_epilogue,
    visit_q,
)

# Candidates per round window. 256 clusters = 32k triangles of working
# set per (block, round); coherent blocks resolve in round 1, incoherent
# ones take a few rounds (tests/unit/test_stream.py exercises many).
ROUND_CAND = 256


def _stream_kernel(cand_ref, count_ref, tnear_ref, rayf_ref, t_in_ref,
                   idx_in_ref, feat_hbm, t_ref, idx_ref, buf, sems):
    """One grid step = one RAY_BLOCK-ray block walking one candidate
    window, continuing from carried-in best-t/best-index.

    cand_ref:  (8, K) i32 SMEM — candidate rows for 8 ray blocks (Mosaic
        sublane-divisibility windowing; this block's row = program_id % 8)
    count_ref: (8, 1) i32 SMEM — candidates THIS round (0 = skip block)
    tnear_ref: (8, K) f32 SMEM — sorted conservative entry distances
    rayf_ref:  (16, RB) f32 VMEM — ray feature rows
    t_in_ref / idx_in_ref: (8, RB) VMEM — carried best so far (row 0)
    feat_hbm:  (48, C*512) bf16 ANY/HBM — stacked table (unblocked)
    t_ref/idx_ref: (8, RB) outputs, row 0 meaningful
    buf:  (2, 48, 512) bf16 VMEM scratch — double buffer
    sems: (2,) DMA semaphores
    """
    RB = rayf_ref.shape[1]
    K = cand_ref.shape[1]
    row = pl.program_id(0) % 8
    rayf48 = stack_rays(rayf_ref[:, :])
    t0 = t_in_ref[0:1, :]
    best0 = idx_in_ref[0:1, :]
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
        kc = jnp.minimum(k, K - 1)
        return (k < n_cand) & (tnear_ref[row, kc] < tmax)

    def body(state):
        k, _, t_best, best = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_cand)
        def _():
            dma(jax.lax.rem(k + 1, 2), k + 1).start()

        dma(slot, k).wait()
        q = visit_q(buf[slot], rayf48)
        cid = cand_ref[row, k]
        t_best, best = visit_epilogue(q, t_best, best, cid)
        return k + 1, jnp.max(t_best), t_best, best

    init = (jnp.int32(0), jnp.max(t0), t0, best0)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _stream_pallas(cand, count, tnear, rayf, t_in, idx_in, feat, interpret):
    """custom_vjp boundary — traversal outputs are piecewise-constant in
    the differentiable parameters (same detach policy as the dense
    kernel and ops/traverse_pallas.py; SURVEY.md §3.4/T9)."""
    return _stream_impl(cand, count, tnear, rayf, t_in, idx_in, feat,
                        interpret)


def _stream_fwd(cand, count, tnear, rayf, t_in, idx_in, feat, interpret):
    out = _stream_impl(cand, count, tnear, rayf, t_in, idx_in, feat,
                       interpret)
    return out, (cand.shape, count.shape, tnear.shape, rayf.shape,
                 t_in.shape, idx_in.shape, feat.shape)


def _stream_bwd(interpret, res, g):
    c_s, n_s, tn_s, r_s, ti_s, ii_s, f_s = res
    return (
        np.zeros(c_s, jax.dtypes.float0),
        np.zeros(n_s, jax.dtypes.float0),
        jnp.zeros(tn_s, jnp.float32),
        jnp.zeros(r_s, jnp.float32),
        jnp.zeros(ti_s, jnp.float32),
        np.zeros(ii_s, jax.dtypes.float0),
        jnp.zeros(f_s, jnp.float32),
    )


_stream_pallas.defvjp(_stream_fwd, _stream_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stream_impl(cand, count, tnear, rayf, t_in, idx_in, feat, interpret):
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
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
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
            pltpu.VMEM((2, FEAT_STACK, CLUSTER_COLS), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cand, count.reshape(-1, 1), tnear, rayf, t_in, idx_in, feat)
    return t_out, idx_out


def closest_hit_stream(geom, o, d, interpret: bool | None = None,
                       max_cand: int = ROUND_CAND, t_max=None):
    """Drop-in closest hit for scenes whose cluster tables exceed VMEM.

    Same contract as intersect_cluster.closest_hit_cluster: (t, n, mat),
    t == T_FAR on miss; optional per-ray t_max bound (hits beyond it MAY
    read as misses — the shadow-query contract). Exact for any candidate
    distribution via the round loop (module docstring): `max_cand` is
    the per-round window size, a pure performance knob.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_clusters = geom.cl_lo.shape[0]
    assert n_clusters > 0, "no cluster tables: call with_clusters(scene)"
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R0 = o.shape[0]
    block = RAY_BLOCK
    o_p, d_p, t_max_p = _pad_rays(o, d, t_max, block)
    R = o_p.shape[0]
    B = R // block
    K = min(max_cand, n_clusters)

    lo = jnp.asarray(geom.cl_lo)
    hi = jnp.asarray(geom.cl_hi)
    # Scene-box exit cap (exit_bound): without it, rays that miss the
    # scene never resolve and every block walks its FULL candidate list
    # — measured as 64/64 rounds executing on big_mesh (PROFILE.md).
    t_exit = exit_bound(lo, hi, o_p, d_p)
    t_max_p = t_exit if t_max_p is None else jnp.minimum(
        jnp.asarray(t_max_p, jnp.float32), t_exit
    )

    rayf = _ray_features(o_p, d_p, t_max_p)
    tnear_lo, tfar_hi = _block_cluster_intervals(lo, hi, o_p, d_p, block)
    keep = tfar_hi >= jnp.maximum(tnear_lo, C.T_MIN)
    btm = t_max_p.reshape(B, block)
    keep = keep & (tnear_lo < btm.max(1)[:, None])
    if geom.su_lo.shape[0] > 1:
        # Per-ray line cull at super-cluster granularity — the round-3
        # fix for the big_mesh collapse: the block-interval test above
        # keeps the block's CONE (thousands of clusters at 16k), the
        # super mask keeps only clusters whose ~32-cluster super box is
        # crossed by >= 1 ray's LINE within that ray's own t bounds
        # (intersect_cluster.ray_super_mask).
        keep = keep & ray_super_mask(
            jnp.asarray(geom.su_lo), jnp.asarray(geom.su_hi),
            jnp.asarray(geom.cl_super), o_p, d_p, t_max_p, block,
        )
    count = keep.sum(axis=1).astype(jnp.int32)  # (B,)
    key = jnp.where(keep, tnear_lo, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)  # (B, C) near-first
    tsort = jnp.take_along_axis(key, order, axis=1).astype(jnp.float32)
    # Pad the sorted tables to a whole number of K-rounds PLUS one extra
    # window, so every dynamic_slice below (including the round-(r+1)
    # resolution-cap read) stays in bounds without clamping.
    n_rounds = -(-n_clusters // K)
    pad_c = n_rounds * K + K - n_clusters
    order = jnp.concatenate(
        [order, jnp.zeros((B, pad_c), jnp.int32)], axis=1
    )
    tsort = jnp.concatenate(
        [tsort, jnp.full((B, pad_c), jnp.inf, jnp.float32)], axis=1
    )

    feat = jnp.asarray(geom.cl_feat)
    # t_max_p derives from the rays (exit_bound), so this init is
    # varying-safe under shard_map (see accel/traverse.py note).
    t_init = jnp.broadcast_to(t_max_p[None, :], (8, R))
    idx_init = jnp.full((8, R), -1, jnp.int32) + (
        t_init[:1, :] * 0.0
    ).astype(jnp.int32)  # varying-safe -1

    def round_cond(state):
        r, resolved, _, _ = state
        return (r < n_rounds) & ~jnp.all(resolved)

    def round_body(state):
        r, resolved, t_cur, idx_cur = state
        start = r * K
        cand_r = jax.lax.dynamic_slice(order, (0, start), (B, K))
        tnear_r = jax.lax.dynamic_slice(tsort, (0, start), (B, K))
        cnt_r = jnp.clip(count - start, 0, K)
        cnt_r = jnp.where(resolved, 0, cnt_r)
        t_new, idx_new = _stream_pallas(
            cand_r, cnt_r, tnear_r, rayf, t_cur, idx_cur, feat, interpret
        )
        # Resolution test: the nearest candidate the next round would
        # visit bounds every unvisited cluster from below; if each ray's
        # best hit is already nearer, later rounds cannot change it.
        cap = jax.lax.dynamic_slice(tsort, (0, start + K), (B, 1))[:, 0]
        tmax_b = t_new[0].reshape(B, block).max(axis=1)
        resolved = resolved | (tmax_b <= cap) | (count <= start + K)
        return r + 1, resolved, t_new, idx_new

    state0 = (
        jnp.int32(0),
        count == 0,  # empty blocks are born resolved
        t_init,
        idx_init,
    )
    _, _, t_all, idx_all = jax.lax.while_loop(
        round_cond, round_body, state0
    )
    t_best = t_all[0][:R0]
    slot = idx_all[0][:R0]
    t_out, n_best, m_best = _decode_winner(geom, slot, t_best)

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
