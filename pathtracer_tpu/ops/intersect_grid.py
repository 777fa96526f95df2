"""Per-ray DDA grid intersection: the round-3 large-scene hot path.

Replaces the per-BLOCK candidate machinery (ops/intersect_stream.py) for
scenes where block-shared lists degenerate (PROFILE.md "round-3
analysis"): at 16k clusters an incoherent 512-ray block's interval-cull
cone holds thousands of clusters and block-level early exit is pinned by
the worst lane, so the round-2 kernel walked essentially everything
(~3M cluster visits per 262k-ray call, measured). Here every ray gets
per-ray traversal order and per-ray termination, built only from dense
lockstep math:

  XLA (this file):
    1. `dda_cells` — all rays march a uniform AXIS^3 grid in lockstep
       (Amanatides-Woo), producing each ray's morton cell ids and cell
       ENTRY distances in front-to-back order. Pure vectorized
       arithmetic: the step count is static, the control flow is
       data-independent, there are no sorts and no per-ray loops.
    2. Per (512-ray block, step): the lanes' per-cell cluster ranges
       (contiguous by construction — clusters are laid out in morton
       cell order, accel/grid.py) are covered by one [min, max)
       range. Morton locality keeps the cover tight for coherent
       blocks; empty cells are excluded from the cover.

  PALLAS (`_grid_kernel`): grid = ray blocks. Each block loops its
    steps; per step it walks the (small) cluster range with the same
    32KB double-buffered HBM DMA + MXU matmul visit as the stream
    kernel (shared visit_q / visit_epilogue). Termination is PER LANE:
    a lane whose best hit is nearer than its step-k cell entry is
    inactive at k, and because entries are nondecreasing along each
    ray, the block stops at the first step with NO active lane. A miss
    ray therefore costs its own ~3*AXIS cells — it cannot pin the
    block to the whole scene (the round-2 failure mode).

Exactness argument (tests/unit/test_grid.py):
  * accel/grid.py duplicates every triangle into every cell its
    inflated AABB overlaps, so the cell containing a hit point — and,
    via the inflation, any cell within fp error of it — contains the
    triangle. The DDA enumerates every cell the ray crosses within
    [T_MIN, t_max]; duplicate finds are idempotent under the min.
  * Per-lane early exit is sound: entries are nondecreasing, so once
    best_t(lane) <= entry_k(lane) (compared with a conservative
    margin) no later cell can contain a nearer hit for that lane.
  * Contract caveat: rays with t_max <= 2*T_MIN are treated as no-ops
    (the engine's dead-lane canonicalization uses t_max = T_MIN); any
    real query has t_max far above T_MIN.

The reference's analogue is the per-thread BVH stack walk in CUDA
(SURVEY.md §2.1 R2) — per-ray order and termination from pointer
chasing. This is the same property rebuilt from dense lockstep math,
which is the only shape the TPU executes at full rate.
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
    _pad_rays,
    _ray_features,
    split_bf16,
    visit_epilogue,
    visit_q,
)

# Sentinel entry distance for invalid DDA steps (must stay finite so the
# activity compare is well-defined; far above any real t).
_ENTRY_INF = np.float32(3.0e37)
# Conservative margin on the per-lane activity compare: computed cell
# entries can exceed the true entry by fp rounding; shrinking them
# slightly can only ADD work, never skip a reachable hit.
_ENTRY_REL = 1.0 - 1e-4
_ENTRY_ABS = 1e-6


def grid_axis(geom) -> int:
    """Cells per axis, inferred from the gr_cell_start table length."""
    G = int(geom.gr_cell_start.shape[0]) - 1
    axis = round(G ** (1.0 / 3.0))
    assert axis ** 3 == G, (G, axis)
    return axis


def _morton3(ix, iy, iz, bits: int):
    m = jnp.zeros_like(ix)
    for b in range(bits):
        m = m | (((ix >> b) & 1) << (3 * b))
        m = m | (((iy >> b) & 1) << (3 * b + 1))
        m = m | (((iz >> b) & 1) << (3 * b + 2))
    return m


def dda_cells(o, d, t_max, grid_lo, cell, axis: int):
    """Lockstep 3D-DDA: each ray's cells front-to-back, all rays at once.

    Returns (cells, entry), both (S, R) with S = 3*axis:
      cells: i32 morton cell ids, -1 past the ray's last cell
      entry: f32 distance at which the ray ENTERS that cell
             (_ENTRY_INF for invalid steps; nondecreasing along S)

    A ray contributes cells only while entry < t_max; rays with
    t_max <= 2*T_MIN (dead-lane canonicalization) contribute none.
    """
    S = 3 * axis
    R = o.shape[0]
    bits = max(1, int(axis - 1).bit_length())
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    grid_hi = grid_lo + cell * axis
    t0 = (grid_lo[None, :] - o) * inv
    t1 = (grid_hi[None, :] - o) * inv
    t_en = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), C.T_MIN)
    t_ex = jnp.min(jnp.maximum(t0, t1), -1)
    tm = jnp.asarray(t_max, jnp.float32)
    alive = (t_ex >= t_en) & (t_en < tm) & (tm > 2 * C.T_MIN)

    # Probe a point strictly inside the first cell.
    t_probe = t_en * (1.0 + 1e-6) + 1e-7
    p = o + d * t_probe[:, None]
    c = jnp.clip(
        jnp.floor((p - grid_lo[None, :]) / cell[None, :]).astype(jnp.int32),
        0, axis - 1,
    )  # (R, 3)
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    nxt = c + (d >= 0).astype(jnp.int32)
    t_next = (grid_lo[None, :] + nxt.astype(jnp.float32) * cell[None, :]
              - o) * inv  # (R, 3)
    dt = jnp.abs(cell[None, :] * inv)

    cells_out = []
    entry_out = []
    t_cur = t_en
    for _ in range(S):
        m = _morton3(c[:, 0], c[:, 1], c[:, 2], bits)
        cells_out.append(jnp.where(alive, m, -1))
        entry_out.append(jnp.where(alive, t_cur, _ENTRY_INF))
        # Advance to the nearest axis boundary.
        t_step = jnp.min(t_next, -1)  # (R,)
        is_min = t_next <= t_step[:, None]
        # Break ties toward a single axis (lowest index) so corner
        # crossings advance one axis at a time — the skipped diagonal
        # neighbor is covered by the triangle AABB inflation.
        first = jnp.cumsum(is_min.astype(jnp.int32), -1) == 1
        adv = (is_min & first).astype(jnp.int32)
        c = c + step * adv
        t_next = t_next + dt * adv.astype(jnp.float32)
        out = ((c < 0) | (c >= axis)).any(-1)
        alive = alive & ~out & (t_step < tm)
        t_cur = t_step
    return jnp.stack(cells_out), jnp.stack(entry_out)  # (S, R)


def block_ranges(cells, cell_start, block: int = RAY_BLOCK):
    """(S, R) cells -> per-(block, step) contiguous cluster-range cover.

    Clusters are laid out in morton cell order (accel/grid.py), so each
    cell is a contiguous range and a block's lanes at one step are
    covered by [min(start), max(end)). Empty cells and invalid lanes
    are excluded from the cover.

    Returns (rg_lo, rg_hi): (B, S) i32 each; rg_hi <= rg_lo means skip.
    """
    S, R = cells.shape
    B = R // block
    safe = jnp.maximum(cells, 0)
    start = cell_start[safe]
    end = cell_start[safe + 1]
    nonempty = (cells >= 0) & (end > start)
    start = jnp.where(nonempty, start, jnp.int32(2 ** 31 - 1))
    end = jnp.where(nonempty, end, 0)
    rg_lo = start.reshape(S, B, block).min(-1).T  # (B, S)
    rg_hi = end.reshape(S, B, block).max(-1).T
    empty = rg_hi <= rg_lo
    rg_lo = jnp.where(empty, 0, rg_lo)
    rg_hi = jnp.where(empty, 0, rg_hi)
    return rg_lo, rg_hi


def _grid_kernel(rglo_ref, rghi_ref, entry_ref, rayf_ref, feat_hbm,
                 t_ref, idx_ref, buf, sems):
    """One grid step = one RAY_BLOCK-ray block marching its DDA steps.

    rglo_ref/rghi_ref: (8, S) i32 SMEM — per-step cluster-range cover
        for 8 ray blocks (Mosaic sublane windowing; this block's row =
        program_id % 8)
    entry_ref: (S8, RB) f32 VMEM — per-lane cell entry distances
        (S8 = S padded to a multiple of 8; pad rows _ENTRY_INF)
    rayf_ref: (16, RB) f32 VMEM — ray features; row 10 = per-ray t_max
    feat_hbm: (16, C*512) f32 ANY/HBM — full feature table
    t_ref/idx_ref: (8, RB) outputs, row 0 meaningful
    buf: (2, 16, 512) f32 VMEM double buffer; sems: (2,) DMA semaphores
    """
    RB = rayf_ref.shape[1]
    S = rglo_ref.shape[1]
    row = pl.program_id(0) % 8
    rayf = rayf_ref[:, :]
    rayf_hi, rayf_lo = split_bf16(rayf)
    t0 = rayf[10:11, :]  # per-ray t upper bound (= init best)

    def dma(slot, cid):
        col0 = pl.multiple_of(cid * CLUSTER_COLS, CLUSTER_COLS)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(col0, CLUSTER_COLS)],
            buf.at[slot],
            sems.at[slot],
        )

    def outer_cond(state):
        k, _, _ = state
        return k < S

    def outer_body(state):
        k, t_best, best = state
        ent = entry_ref[pl.ds(k, 1), :]  # (1, RB)
        act = (ent * _ENTRY_REL - _ENTRY_ABS) < t_best
        act_any = jnp.max(act.astype(jnp.int32)) > 0
        lo_k = rglo_ref[row, k]
        hi_k = rghi_ref[row, k]
        hi_eff = jnp.where(act_any, hi_k, lo_k)

        @pl.when(hi_eff > lo_k)
        def _():
            dma(jax.lax.rem(lo_k, 2), lo_k).start()

        def in_cond(s):
            cid, _, _ = s
            return cid < hi_eff

        def in_body(s):
            cid, t_best, best = s
            slot = jax.lax.rem(cid, 2)

            @pl.when(cid + 1 < hi_eff)
            def _():
                dma(jax.lax.rem(cid + 1, 2), cid + 1).start()

            dma(slot, cid).wait()
            q = visit_q(buf[slot], rayf_hi, rayf_lo)
            t_best, best = visit_epilogue(q, t_best, best, cid)
            return cid + 1, t_best, best

        _, t_best, best = jax.lax.while_loop(
            in_cond, in_body, (lo_k, t_best, best)
        )
        # Entries are nondecreasing along each ray, so a step with no
        # active lane means no LATER step can have one either: stop.
        k_next = jnp.where(act_any, k + 1, S)
        return k_next, t_best, best

    init = (jnp.int32(0), t0, jnp.full((1, RB), -1, jnp.int32))
    _, t_best, best = jax.lax.while_loop(outer_cond, outer_body, init)
    t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _grid_pallas(rg_lo, rg_hi, entry, rayf, feat, interpret):
    """custom_vjp boundary — traversal outputs are piecewise-constant in
    the differentiable parameters (same detach policy as the cluster and
    stream kernels; SURVEY.md §3.4/T9)."""
    return _grid_impl(rg_lo, rg_hi, entry, rayf, feat, interpret)


def _grid_fwd(rg_lo, rg_hi, entry, rayf, feat, interpret):
    out = _grid_impl(rg_lo, rg_hi, entry, rayf, feat, interpret)
    return out, (rg_lo.shape, rg_hi.shape, entry.shape, rayf.shape,
                 feat.shape)


def _grid_bwd(interpret, res, g):
    lo_s, hi_s, e_s, r_s, f_s = res
    return (
        np.zeros(lo_s, jax.dtypes.float0),
        np.zeros(hi_s, jax.dtypes.float0),
        jnp.zeros(e_s, jnp.float32),
        jnp.zeros(r_s, jnp.float32),
        jnp.zeros(f_s, jnp.float32),
    )


_grid_pallas.defvjp(_grid_fwd, _grid_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _grid_impl(rg_lo, rg_hi, entry, rayf, feat, interpret):
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    S = rg_lo.shape[1]
    S8 = entry.shape[0]
    assert rg_lo.shape[0] % 8 == 0, rg_lo.shape
    assert S8 % 8 == 0 and S8 >= S, (S8, S)
    t_out, idx_out = pl.pallas_call(
        _grid_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, S), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, S), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((S8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
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
    )(rg_lo, rg_hi, entry, rayf, feat)
    return t_out[0], idx_out[0]


def closest_hit_grid(geom, o, d, interpret: bool | None = None,
                     t_max=None):
    """Drop-in closest hit via the per-ray DDA grid kernel.

    Same contract as intersect_cluster.closest_hit_cluster: (t, n, mat),
    t == T_FAR on miss; optional per-ray t_max bound (hits at
    t >= t_max[i] MAY be reported as misses — the shadow contract; and
    rays with t_max <= 2*T_MIN are treated as no-ops, see module
    docstring). Requires grid tables (accel/grid.py:with_grid).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert geom.gr_cell_start.shape[0] > 1, (
        "no grid tables: call with_grid(scene)"
    )
    axis = grid_axis(geom)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R0 = o.shape[0]
    block = RAY_BLOCK
    t_cap = (jnp.full((R0,), C.T_FAR, jnp.float32) if t_max is None
             else jnp.asarray(t_max, jnp.float32))
    o_p, d_p, t_cap_p = _pad_rays(o, d, t_cap, block)

    cells, entry = dda_cells(
        o_p, d_p, t_cap_p, jnp.asarray(geom.gr_lo),
        jnp.asarray(geom.gr_cell), axis,
    )
    rg_lo, rg_hi = block_ranges(cells, jnp.asarray(geom.gr_cell_start),
                                block)
    S = cells.shape[0]
    S8 = -(-S // 8) * 8
    if S8 > S:
        entry = jnp.concatenate(
            [entry, jnp.full((S8 - S, entry.shape[1]), _ENTRY_INF,
                             jnp.float32)]
        )
    rayf = _ray_features(o_p, d_p, t_cap_p)
    t_best, slot = _grid_pallas(rg_lo, rg_hi, entry, rayf,
                                jnp.asarray(geom.cl_feat), interpret)
    t_best = t_best[:R0]
    slot = slot[:R0]

    hit = slot >= 0
    best = jnp.where(
        hit, jnp.asarray(geom.cl_map)[jnp.maximum(slot, 0)], -1
    )
    hit = best >= 0  # padding slots never win (det == 0), but be safe
    safe = jnp.maximum(best, 0)
    n_best = jnp.where(hit[:, None], jnp.asarray(geom.tri_n)[safe], 0.0)
    m_best = jnp.where(hit, jnp.asarray(geom.tri_mat)[safe], 0)
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
