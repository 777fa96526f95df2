"""Per-ray DDA grid intersection: the round-3 large-scene hot path.

Replaces the per-BLOCK candidate generation of ops/intersect_stream.py
for scenes where block-shared lists degenerate (PROFILE.md "round-3
analysis"): at 16k clusters an incoherent 512-ray block's interval-cull
cone holds thousands of clusters and block-level early exit is pinned by
the worst lane, so the round-2 kernel walked essentially everything
(~3M cluster visits per 262k-ray call, measured on the v5e). Here the
candidate lists come from PER-RAY traversal, built from dense lockstep
math only:

  1. `dda_cells` — all rays march a uniform AXIS^3 grid in lockstep
     (Amanatides-Woo), producing each ray's morton cell ids and cell
     ENTRY distances in front-to-back order. Pure vectorized
     arithmetic: static step count, data-independent control flow, no
     sorts, no per-ray loops. Because it is gather-free and per-ray
     deterministic, the era ladder RE-RUNS it per era on the selected
     stragglers instead of gathering windows from a materialized
     (R, S) table (round-4 redesign; the windowed 2-D gathers it
     replaces ran at ~15ns/element).
  2. PAIR BINNING, in phases of `PHASE_STEPS` DDA steps: (ray, step)
     pairs are sorted by cell id, so each 512-pair kernel block works
     on a handful of morton-adjacent cells — whose cluster ranges are
     adjacent in the table (clusters are laid out in morton cell
     order, accel/grid.py) — i.e. its EXACT working set. No block ever
     pays a cover over divergent lanes. Between phases, pair results
     min-reduce back to rays, and rays retire per-ray (best hit nearer
     than the next cell entry, or cells exhausted).
  3. The PROVEN stream kernel (ops/intersect_stream.py:_stream_pallas —
     32KB double-buffered HBM DMA + one MXU matmul per cluster visit,
     per-lane best-t carried in and out) consumes each block's
     contiguous cluster range in K-candidate ROUNDS.

  (A first cut gave the kernel per-lane step activity via a nested
  while over (step, range) and a dynamic-sublane entry slice: correct
  in interpret mode and on the v5e, but the remote Mosaic compile ran
  6-30+ minutes per program — the nested-loop/DMA shape is a compiler
  pathology, same class as the Precision.HIGHEST stall noted in
  intersect_cluster.split_bf16. Reusing the single-while stream kernel
  keeps compiles in seconds; the per-ray precision lives in the
  RANGES, which is where the round-2 collapse actually was.)

Exactness argument (tests/unit/test_grid.py):
  * accel/grid.py duplicates every triangle into every cell its
    inflated AABB overlaps, so the cell containing a hit point — and,
    via the inflation, any cell within fp error of it — contains the
    triangle. The DDA enumerates every cell the ray crosses within
    [T_MIN, t_max]; duplicate finds are idempotent under the min.
  * Ordered early exit is sound: per-lane DDA entries are
    nondecreasing, so the per-step block-min key is nondecreasing, and
    the kernel stops only when min_lane(entry) >= max_lane(best_t) —
    which implies entry(L) >= best_t(L) for every lane L.
  * Contract caveat: rays with t_max <= 2*T_MIN are treated as no-ops
    (the engine's dead-lane canonicalization uses t_max = T_MIN); any
    real query has t_max far above T_MIN.

The reference's analogue is the per-thread BVH stack walk in CUDA
(SURVEY.md §2.1 R2) — per-ray order and termination from pointer
chasing. This rebuilds the same property from dense lockstep math,
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
from ..accel.clusters import CLUSTER_COLS, FEAT_ROWS, FEAT_STACK
from ..engine import intersect as isect
from .intersect_cluster import (
    RAY_BLOCK,
    _decode_winner,
    _pad_rays,
    _ray_features,
    stack_rays,
    visit_epilogue,
    visit_q,
)
from .intersect_stream import ROUND_CAND

# Sentinel entry distance for invalid DDA steps (finite so compares are
# well-defined; far above any real t).
_ENTRY_INF = np.float32(3.0e37)
# How per-pair ray features reach the cell-sorted pair order
# (measured-on-v5e toggle, see _phase_core):
#   "lane":    (16, P) lane gather (the r3 design)
#   "row":     (P, 16) row gather + two transposes (row gathers run
#              20-40x faster than lane gathers on this chip)
#   "payload": no gather at all — the 16 feature rows ride THE bin
#              sort as payload operands (pre-sort pair features are a
#              free broadcast of the per-ray rows)
# Measured on the v5e 2M-tri scene at (W0=4, We=4), 3-pass totals:
# row 564ms, lane ~569-601ms, payload 618ms (16 extra sort operands
# cost more than the row gather they replace). "row" wins.
_RAYF_MODE = "row"
# Widths the pair kernel's block may widen to in the dense
# pairs-per-cell regime (see _phase_core): one DMA + candidate walk
# then serves 2-4x the pairs. Measured on the v5e 2M-tri scene at
# (W0=4, We=4), 3-pass total: PB=512 569ms, 1024 564ms, 2048 609ms —
# the (512, 2048) f32 epilogue temporaries of the widest block outweigh
# its saved DMA/loop overhead, 1024 is the sweet spot. Exactness at all
# widths is pinned by tests/unit/test_grid.py (wide-pair-blocks).
_PAIR_BLOCK_LADDER: tuple[int, ...] = (1024,)
# Visits per while-iteration of the pair kernel and DMA pipeline depth
# (2*group): grouping divides the serial per-iteration scalar/branch
# cost (the dense kernel's VISIT_GROUP lesson, PROFILE.md r4). G=4 was
# A/B'd on the full big_mesh bench and measured a WASH vs 2 (1.031 vs
# 1.038M rays/s adjacent runs) while padding attempted visits ~9%
# (short sparse-call lists round up to the group size), so 2 stays.
_PAIR_GROUP = 2
_PAIR_SLOTS = 2 * _PAIR_GROUP
# Conservative margin on entry-distance keys: computed cell entries can
# exceed the true entry by fp rounding; shrinking them can only ADD
# work, never skip a reachable hit.
_ENTRY_REL = 1.0 - 1e-4
_ENTRY_ABS = 1e-6
# Occupied-cell windowing (round 5): the DDA skips EMPTY cells — cells
# whose cluster range is zero-length contain no triangles, so no hit
# can lie in them and walking them is pure glue. The occupancy lookup
# inside the scan is a GATHER-FREE dense compare-select over packed
# 32-cell bitmask words; its cost scales with n_cells/32 per step, so
# it is gated to grids up to this many words (axis <= 16 at 128;
# axis=32 grids fall back to the walk-every-cell windows).
_OCC_MAX_WORDS = 128


def pack_occupancy(cell_start):
    """(n_cells+1,) cluster-range starts -> (ceil(n/32),) i32 bitmask.

    Bit c%32 of word c//32 is 1 iff cell c has a non-empty cluster
    range. Two's-complement bit 31 makes some words negative — bit ops
    ((w >> b) & 1 with arithmetic shift) still read every bit exactly.
    """
    occ = (cell_start[1:] > cell_start[:-1]).astype(jnp.int32)
    n = occ.shape[0]
    pad = (-n) % 32
    if pad:
        occ = jnp.concatenate([occ, jnp.zeros((pad,), jnp.int32)])
    w = occ.reshape(-1, 32)
    shifts = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(w << shifts[None, :], axis=1)


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


def dda_cells(o, d, t_max, grid_lo, cell, axis: int,
              length: int | None = None, occ_words=None):
    """Lockstep 3D-DDA: each ray's cells front-to-back, all rays at once.

    Returns (cells, entry), both (S, R) with S = 3*axis (or `length`
    when given — the first `length` steps only; cheap re-derivation is
    what lets the era ladder RECOMPUTE windows per era instead of
    gathering from a materialized (R, S) table, see closest_hit_grid):
      cells: i32 morton cell ids, -1 past the ray's last cell
      entry: f32 distance at which the ray ENTERS that cell
             (_ENTRY_INF for invalid steps; nondecreasing along S)

    With `occ_words` (a pack_occupancy bitmask) the call ALSO returns
    `oidx` (S, R) i32: the index of step s's cell among the ray's
    OCCUPIED cells, or -1 for invalid/empty-cell steps. Callers window
    on oidx instead of the step index, so phases cover the next W
    occupied cells and empty cells cost nothing but the scan step that
    enumerates them (round-5 redesign: shadow/primary rays crossing
    open space previously paid a full era ladder of empty-cell pair
    glue — 174k shadow stragglers producing 8.8k kernel visits). The
    occupancy lookup is a dense (R, n_words) compare-select per step —
    gather-free, same cost class as the morton interleave.

    A ray contributes cells only while entry < t_max; rays with
    t_max <= 2*T_MIN (dead-lane canonicalization) contribute none.
    Per-ray outputs are pure elementwise arithmetic in (o, d, t_max)
    (and the static occupancy table) — bitwise identical for a ray
    regardless of which batch it appears in, which is what makes
    recompute == materialize.
    """
    S = 3 * axis if length is None else length
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

    # Probe a point strictly inside the first cell. The forward nudge is
    # bounded by a fraction of the fastest per-axis cell crossing time:
    # a t_en-RELATIVE epsilon alone (1e-6 * t_en) can exceed whole cells
    # when the origin is far from the grid (t_en >> cell extent along
    # the ray) and silently skip entry-face cells (ADVICE r3). The
    # relative term still dominates in-scene rays (fp error of t_en
    # itself scales with t_en); the cap keeps far-origin probes within
    # the entry cell.
    dt = jnp.abs(cell[None, :] * inv)  # (R, 3) per-axis crossing time
    dt_min = jnp.min(dt, -1)
    t_probe = t_en + jnp.minimum(t_en * 1e-6 + 1e-7, 0.25 * dt_min)
    p = o + d * t_probe[:, None]
    c = jnp.clip(
        jnp.floor((p - grid_lo[None, :]) / cell[None, :]).astype(jnp.int32),
        0, axis - 1,
    )  # (R, 3)
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    nxt = c + (d >= 0).astype(jnp.int32)
    t_next = (grid_lo[None, :] + nxt.astype(jnp.float32) * cell[None, :]
              - o) * inv  # (R, 3)

    if occ_words is not None:
        w_iota = jnp.arange(occ_words.shape[0], dtype=jnp.int32)

    def step_fn(carry, _):
        c, t_next, alive, t_cur, occ_cnt = carry
        m = _morton3(c[:, 0], c[:, 1], c[:, 2], bits)
        cell_out = jnp.where(alive, m, -1)
        entry_out = jnp.where(alive, t_cur, _ENTRY_INF)
        if occ_words is not None:
            word = jnp.sum(
                jnp.where((m >> 5)[:, None] == w_iota[None, :],
                          occ_words[None, :], 0),
                axis=1,
            )
            is_occ = alive & (((word >> (m & 31)) & 1) == 1)
            oidx_out = jnp.where(is_occ, occ_cnt, -1)
            occ_cnt = occ_cnt + is_occ.astype(jnp.int32)
            ys = (cell_out, entry_out, oidx_out)
        else:
            # No occupancy: do not even EMIT an oidx output — a dead
            # (S, R) i32 stack would rely on scan DCE to stay free
            # (code-review r5).
            ys = (cell_out, entry_out)
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
        return (c, t_next, alive, t_step, occ_cnt), ys

    # lax.scan, not a Python loop: S is up to 3*32 = 96 steps, and the
    # renderer traces 8 intersect calls per band — an unrolled DDA put
    # ~25k extra ops into the HLO graph and sent the server-side XLA
    # compile into the tens of minutes (observed on the axon tunnel).
    occ0 = jnp.zeros((o.shape[0],), jnp.int32)
    _, outs = jax.lax.scan(
        step_fn, (c, t_next, alive, t_en, occ0), None, length=S
    )
    return outs  # (cells, entry[, oidx]), each (S, R)


def _pair_kernel(cand_ref, count_ref, rayf_ref, feat_hbm, t_ref, idx_ref,
                 buf, sems):
    """One grid step = one 512-PAIR block walking its candidate list.

    The carry-free sibling of intersect_stream._stream_kernel (same
    single-while + double-buffered DMA shape — the form Mosaic compiles
    in seconds): per-pair best-t initializes from rayf row 10 (each
    pair's ray-carry), best index from -1, and the list — a handful of
    cells' clusters, cell-ordered, not distance-ordered — is walked in
    full (no tnear early exit; it is tiny by construction). Dropping
    the (8, P) t/idx carry inputs of the stream kernel halves the
    per-phase HBM traffic, which dominated the phased walk (measured:
    ~21ms/phase fusions moving carry/broadcast buffers).

    cand_ref:  (8, K) i32 SMEM — candidate rows (Mosaic windowing;
        this block's row = program_id % 8)
    count_ref: (8, 1) i32 SMEM — candidates this round (0 = skip)
    rayf_ref:  (16, RB) f32 VMEM — pair ray features; row 10 = the
        pair's current best-t (upper bound)
    feat_hbm:  (48, C*512) bf16 ANY/HBM — stacked feature table
    t_ref/idx_ref: (8, RB) outputs, row 0 meaningful
    buf: (_PAIR_SLOTS, 48, 512) bf16 VMEM pipeline; sems: DMA semaphores
    """
    RB = rayf_ref.shape[1]
    row = pl.program_id(0) % 8
    rayf = rayf_ref[:, :]
    rayf48 = stack_rays(rayf)
    t0 = rayf[10:11, :]
    n_cand = count_ref[row, 0]

    K = cand_ref.shape[1]
    NS = _PAIR_SLOTS
    G = _PAIR_GROUP

    def dma(slot, k):
        cid = cand_ref[row, k]
        col0 = pl.multiple_of(cid * CLUSTER_COLS, CLUSTER_COLS)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(col0, CLUSTER_COLS)],
            buf.at[slot],
            sems.at[slot],
        )

    # G visits per iteration over a 2G-slot DMA pipeline: divides the
    # per-iteration scalar/branch overhead by G and keeps G cluster
    # fetches in flight (the dense kernel's VISIT_GROUP idea; here G=4
    # A/B'd a wash vs 2 on the full bench while padding visits ~9%, so
    # G=2 ships — see _PAIR_GROUP).
    # The list is walked in full (no early exit), so every started DMA
    # is waited by its own visit; trailing visits past n_cand re-read
    # the last already-waited slot (never uninitialized VMEM, ADVICE
    # r4) and their results are discarded by the epilogue's `enabled`
    # gate.
    for g0 in range(G):
        @pl.when(n_cand > g0)
        def _(g0=g0):
            dma(g0, g0).start()

    def cond(state):
        k, _, _ = state
        return k < n_cand

    def body(state):
        k, t_best, best = state
        for g in range(G, 2 * G):
            @pl.when(k + g < n_cand)
            def _(g=g):
                dma(jax.lax.rem(k + g, NS), k + g).start()

        dma(jax.lax.rem(k, NS), k).wait()
        q = visit_q(buf[jax.lax.rem(k, NS)], rayf48)
        t_best, best = visit_epilogue(q, t_best, best,
                                      cand_ref[row, k])
        slot_prev = jax.lax.rem(k, NS)
        for g in range(1, G):
            kg = k + g
            okg = kg < n_cand

            @pl.when(okg)
            def _(kg=kg):
                dma(jax.lax.rem(kg, NS), kg).wait()

            kcg = jnp.minimum(kg, K - 1)
            slot_g = jnp.where(okg, jax.lax.rem(kg, NS), slot_prev)
            qg = visit_q(buf[slot_g], rayf48)
            t_best, best = visit_epilogue(
                qg, t_best, best, jnp.maximum(cand_ref[row, kcg], 0),
                enabled=okg,
            )
            slot_prev = slot_g
        return k + G, t_best, best

    init = (jnp.int32(0), t0, jnp.full((1, RB), -1, jnp.int32))
    k_end, t_best, best = jax.lax.while_loop(cond, body, init)
    t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))
    # Row 1 = visit count (rows are broadcast copies anyway): free
    # roofline instrumentation, same as _cluster_kernel.
    idx_ref[1:2, :] = jnp.zeros((1, RB), jnp.int32) + k_end


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pair_pallas(cand, count, rayf, interpret, pair_block, feat):
    """custom_vjp boundary — same zero-cotangent detach policy as the
    other traversal kernels (SURVEY.md §3.4/T9). Returns
    (t, idx, visits): visits is the call's total attempted kernel
    visits (from idx row 1) — free roofline accounting, DCE'd when the
    caller drops it."""
    return _pair_impl(cand, count, rayf, interpret, pair_block, feat)


def _pair_fwd(cand, count, rayf, interpret, pair_block, feat):
    out = _pair_impl(cand, count, rayf, interpret, pair_block, feat)
    return out, (cand.shape, count.shape, rayf.shape, feat.shape)


def _pair_bwd(interpret, pair_block, res, g):
    c_s, n_s, r_s, f_s = res
    del g  # (t, idx, visits) cotangents — all detached
    return (
        np.zeros(c_s, jax.dtypes.float0),
        np.zeros(n_s, jax.dtypes.float0),
        jnp.zeros(r_s, jnp.float32),
        jnp.zeros(f_s, jnp.float32),
    )


_pair_pallas.defvjp(_pair_fwd, _pair_bwd)


def pair_visit_counts(cand, count, rayf, interpret, feat,
                      pair_block: int = RAY_BLOCK):
    """Per-block visit counts of the pair walk (roofline probe; reads
    the k_end the kernel writes into idx row 1). (n_blocks,) i32."""
    _, idx_out = _pair_full(cand, count, rayf, interpret, pair_block,
                            feat)
    return idx_out[1].reshape(-1, pair_block)[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "pair_block"))
def _pair_impl(cand, count, rayf, interpret, pair_block, feat):
    t_out, idx_out = _pair_full(cand, count, rayf, interpret, pair_block,
                                feat)
    pb = min(rayf.shape[1], pair_block)
    visits = jnp.sum(idx_out[1].reshape(-1, pb)[:, 0])
    return t_out[0], idx_out[0], visits


def _pair_full(cand, count, rayf, interpret, pair_block, feat):
    R = rayf.shape[1]
    block = min(R, pair_block)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    K = cand.shape[1]
    assert cand.shape[0] % 8 == 0, cand.shape
    t_out, idx_out = pl.pallas_call(
        _pair_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, K), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
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
            pltpu.VMEM((_PAIR_SLOTS, FEAT_STACK, CLUSTER_COLS),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_PAIR_SLOTS,)),
        ],
        interpret=interpret,
    )(cand, count.reshape(-1, 1), rayf, feat)
    return t_out, idx_out


# Era width (cells walked per straggler era): trades per-era pair
# volume (sorts/gathers/kernel buffers scale with Rx*We, and a resolved
# ray still pays for the rest of its era's cells) against era count
# (per-era fixed costs). Re-swept after the round-4 era redesign
# (DDA-recompute + two-level ladder made narrow eras cheap) on the
# 2M-tri scene at axis=8, 3-pass totals: (W0,We) = (6,6) 657ms,
# (4,4) 569, (3,5) 599-617, (4,6) 647, (2,6) 674, (6,4) 668ms; after
# the HLO-audit glue cuts, same-process re-sweep: (3,4) 511, (5,4)
# 513, (2,4) 536, (4,3) 538ms.
PHASE_STEPS = 4
# Cells covered by the full-R first phase (stage A in closest_hit_grid).
# Narrower than r3's 6: at full R every up-front cell is paid by EVERY
# ray, and >512 pairs/cell re-walk each cell range once per 512-pair
# block — the cheap era ladder now absorbs the stragglers instead.
# Post-glue-cut same-process 3-pass sweep said (3,4) 511 vs (5,4) 513
# — but at the full-band level W0=4 measured 963k vs W0=3's 947k
# rays/s (within the +-3-5% band variance; 4 kept as the default).
FIRST_STEPS = 4


def closest_hit_grid(geom, o, d, interpret: bool | None = None,
                     t_max=None, max_cand: int = 2 * ROUND_CAND,
                     phase_steps: int = PHASE_STEPS,
                     first_steps: int = FIRST_STEPS,
                     era_steps: int | None = None,
                     ladder: tuple[int, ...] | None = None,
                     occupied_windows: bool | None = None,
                     stats: bool = False):
    """Drop-in closest hit via phased per-ray DDA + the stream kernel.

    Same contract as intersect_cluster.closest_hit_cluster: (t, n, mat),
    t == T_FAR on miss; optional per-ray t_max bound (hits at
    t >= t_max[i] MAY be reported as misses — the shadow contract; and
    rays with t_max <= 2*T_MIN are treated as no-ops, see module
    docstring). Requires grid tables (accel/grid.py:with_grid).
    `max_cand` (round window), `phase_steps` (compat alias for the era
    width), `first_steps` (stage-A width) and `era_steps` (era width,
    defaults to phase_steps) are pure performance knobs; exactness
    comes from the phase/round loops.

    Why pairs + phases: any BLOCK-shared candidate structure pays the
    union of its 512 lanes' needs, and divergent bounce lanes stop
    sharing cells within a few steps — a contiguous [min, max) cover
    over their morton-scattered cells degenerates to the whole table
    (measured: ~600k candidates/block on the 2M-tri scene). So the
    walk is re-posed at PAIR granularity: each phase explodes (ray,
    step) pairs for the next `phase_steps` DDA steps, sorts pairs by
    cell id, and runs the stream kernel over 512-pair blocks — sorted
    pairs share a handful of morton-ADJACENT cells whose cluster
    ranges are adjacent in the table, so each block's candidate list
    is its exact working set (typically < 20 clusters). Pair results
    min-reduce back to rays; rays whose best hit is nearer than their
    next cell entry (or whose cells ran out) are done and contribute
    no pairs to later phases — per-RAY termination, rebuilt from one
    argsort per phase.
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
    R = o_p.shape[0]
    B = R // block
    S = 3 * axis
    n_cells = axis ** 3
    We = era_steps if era_steps is not None else phase_steps
    K = max_cand
    grid_lo = jnp.asarray(geom.gr_lo)
    grid_cell = jnp.asarray(geom.gr_cell)
    cell_start = jnp.asarray(geom.gr_cell_start)
    # (start << 15 | len) per cell — the one-gather segment table
    # (valid iff n_clusters < 2^15; _phase_core guards statically).
    seg_packed = (
        (cell_start[:-1] << 15) | (cell_start[1:] - cell_start[:-1])
    )
    rayf = _ray_features(o_p, d_p, t_cap_p)
    feat = jnp.asarray(geom.cl_feat)
    n_clusters = feat.shape[1] // CLUSTER_COLS

    def _phase_core(cellsW, rayf_x, t_best, idx_best):
        """One pair-binned phase over Rx rays' next W cells.

        Shape-generic: instantiated once at full R (the first phase,
        where every ray is live) and once at the compacted era size
        (stage B below). cellsW must already be -1 for done rays.
        Returns updated per-ray (t_best, idx_best).
        """
        Rx, Wx = cellsW.shape
        P = Rx * Wx
        # Kernel block width adapts to the expected pairs-per-cell:
        # when a phase has >512 pairs per occupied cell (dense regime —
        # stage A, and eras at coarse grids), a 512-pair block walks the
        # same cell range as its neighbors, re-paying the DMA, the
        # candidate list, and the loop per block. A 2048-pair block
        # serves 4x the pairs with ONE DMA + walk (the matmul/epilogue
        # widen but their per-pair cost is unchanged). In the sparse
        # regime (pairs/cell < block) wide blocks would instead widen
        # every OTHER cell's matmul over lanes that don't care, so the
        # width clamps to the measured-good 512.
        target_pb = P // max(n_cells, 1)
        PB = block
        for pb in _PAIR_BLOCK_LADDER:
            if target_pb >= pb and P % (8 * pb) == 0:
                PB = pb
                break
        Bp = P // PB
        cell_p = cellsW.reshape(P)  # ray-major pairs
        # THE sort: pairs grouped by cell id. Blocks of 512 consecutive
        # sorted pairs then share a handful of morton-ADJACENT cells,
        # whose cluster ranges are adjacent in the table — the block's
        # exact working set, no cover over divergent lanes. One
        # multi-operand lax.sort carries the pair position along (a
        # payload column costs far less than the argsort + three
        # 2M-element gathers it replaces — ~7ns/element each on this
        # chip); ray id and validity are then pure arithmetic.
        keys = jnp.where(cell_p >= 0, cell_p, jnp.int32(2 ** 30))
        if _RAYF_MODE == "payload":
            rayf_t0 = jax.lax.dynamic_update_slice(
                rayf_x, t_best[None, :], (10, 0)
            )
            pre = jnp.broadcast_to(
                rayf_t0[:, :, None], (16, Rx, Wx)
            ).reshape(16, P)
            out = jax.lax.sort(
                (keys, cell_p, jnp.arange(P, dtype=jnp.int32), *pre),
                num_keys=1, is_stable=True,
            )
            cell_s, pos_s = out[1], out[2]
            rayf_pairs = jnp.stack(out[3:], axis=0)  # (16, P), sorted
        else:
            _, cell_s, pos_s = jax.lax.sort(
                (keys, cell_p, jnp.arange(P, dtype=jnp.int32)),
                num_keys=1, is_stable=True,
            )
            rayf_pairs = None
        ray_s = pos_s // Wx
        vp = cell_s >= 0
        if n_clusters < 32768:
            # ONE (start << 15 | len) packed gather instead of two
            # cell_start gathers (each measured ~5.6ms/call at P=1M —
            # HLO fusion audit r4). Fits i32 iff C < 2^15, the same
            # static bound as the window packing below.
            sp = seg_packed[jnp.maximum(cell_s, 0)]
            s_start = sp >> 15
            s_len_p = sp & 32767
        else:
            s_start = cell_start[jnp.maximum(cell_s, 0)]
            s_len_p = cell_start[jnp.maximum(cell_s, 0) + 1] - s_start
        # Exact per-block candidate SEGMENTS: the block's candidate
        # list is the concatenation of its DISTINCT cells' cluster
        # ranges (pairs are cell-sorted, so distinct cells are the
        # first-occurrence lanes). A [min, max) cover would also pull
        # in every table cell morton-between two straddled cells —
        # measured as ~7000-cluster covers on gap-straddling blocks.
        cell_b = cell_s.reshape(Bp, PB)
        vp_b = vp.reshape(Bp, PB)
        prev = jnp.concatenate(
            [jnp.full((Bp, 1), -2, jnp.int32), cell_b[:, :-1]], axis=1
        )
        first = vp_b & (cell_b != prev)
        seg_len = jnp.where(
            first, s_len_p.reshape(Bp, PB), 0
        )
        cum = jnp.concatenate(
            [jnp.zeros((Bp, 1), jnp.int32), jnp.cumsum(seg_len, axis=1)],
            axis=1,
        )  # (Bp, PB+1)
        total = cum[:, -1]
        seg_start = s_start.reshape(Bp, PB)

        # Pair ray features; row 10 carries each pair's ray's current
        # best-t, which is both the kernel's t_best init and its upper
        # bound — no separate (8, P) carry buffers (they dominated the
        # phase cost when the stream kernel was used here). Writing
        # t_best into rayf row 10 BEFORE the pair gather folds the
        # per-pair t carry into the same gather (a separate
        # t_best[ray_s] cost 18ms/phase).
        if _RAYF_MODE == "payload":
            rayf_s = rayf_pairs  # rode the sort; t carry already in row 10
        else:
            rayf_t = jax.lax.dynamic_update_slice(
                rayf_x, t_best[None, :], (10, 0)
            )
            if _RAYF_MODE == "row":
                # Gather ROWS (the shape the TPU gather unit runs
                # 20-40x faster than lane gathers, PROFILE.md r3) and
                # pay dense transposes instead of a (16, P) lane
                # gather. Only the 7 underived rows ride the gather —
                # [d(3), o(3), t-carry] padded to an 8-f32 row — and
                # o x d is recomputed per pair (bitwise the same
                # jnp.cross as _ray_features on identical o, d values);
                # rows 9/11-15 are constants. Halves the gather bytes
                # of the 16-row form (the stage-A rayf row gather was
                # the largest single glue fusion, ~10ms/call at P=1M —
                # PROFILE.md r4 handoff).
                g8 = jnp.concatenate([
                    rayf_t[0:3], rayf_t[6:9], rayf_t[10:11],
                    jnp.zeros((1, Rx), jnp.float32),
                ], axis=0)  # (8, Rx)
                g8_s = jnp.transpose(jnp.transpose(g8)[ray_s])  # (8, P)
                d_s3 = g8_s[0:3]
                o_s3 = g8_s[3:6]
                oxd_s = jnp.cross(o_s3, d_s3, axis=0)  # (3, P)
                rayf_s = jnp.concatenate([
                    d_s3, oxd_s, o_s3,
                    jnp.ones((1, P), jnp.float32), g8_s[6:7],
                    jnp.zeros((FEAT_ROWS - 11, P), jnp.float32),
                ], axis=0)  # (16, P)
            else:
                rayf_s = rayf_t[:, ray_s]  # (16, P)
        t_pair0 = rayf_s[10]

        n_rounds = jnp.max(-(-total // jnp.int32(K)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, PB), 1)
        lane_bits = PB.bit_length() - 1  # lane < PB = 2^lane_bits

        def window_positions(r):
            """(cand, cnt) for round r's K positions of each block.

            Segment lookup is done with dense compare + reduce, never
            searchsorted (its vmapped binary search lowered to ~10
            batched-gather sweeps = 1.4s/call) and never per-position
            gathers (take_along on (Bp, K) cost ~21ms each per round).
            Both segment fields ride PACKED monotone max-reduces: cum
            is nondecreasing over lanes and totals are bounded by the
            cluster count, so (cum<<lane_bits | lane) and
            (lane<<15 | start) are strictly increasing where defined
            and fit int32 when C < 2^15 (asserted at build via this
            static branch; lane < PB <= 2048 = 2^11, so both packs
            stay under 2^26).
            """
            pos = r * K + jax.lax.broadcasted_iota(jnp.int32, (Bp, K), 1)
            cond = cum[:, :PB, None] <= pos[:, None, :]
            if n_clusters < 32768:
                p1 = (cum[:, :PB] << lane_bits) | lane
                pm1 = jnp.max(
                    jnp.where(cond, p1[:, :, None], -1), axis=1
                )
                cum_at = pm1 >> lane_bits
                p2 = (lane << 15) | seg_start
                pm2 = jnp.max(
                    jnp.where(cond, p2[:, :, None], -1), axis=1
                )
                base = pm2 & 32767
            else:
                j = jnp.clip(
                    jnp.sum(cond.astype(jnp.int32), axis=1) - 1,
                    0, PB - 1,
                )
                base = jnp.take_along_axis(seg_start, j, axis=1)
                cum_at = jnp.take_along_axis(cum, j, axis=1)
            cand = jnp.where(pos < total[:, None], base + (pos - cum_at),
                             0)
            cnt = jnp.clip(total - r * K, 0, K)
            return cand, cnt

        def round_cond(rstate):
            r, _, _, _ = rstate
            return r < n_rounds

        def round_body(rstate):
            r, t_pair, idx_pair, vis = rstate
            cand_r, cnt_r = window_positions(r)
            rayf_r = jax.lax.dynamic_update_slice(
                rayf_s, t_pair[None, :], (10, 0)
            )
            t_new, idx_new, v_new = _pair_pallas(
                cand_r, cnt_r, rayf_r, interpret, PB, feat
            )
            improved = t_new < t_pair
            idx_pair = jnp.where(improved, idx_new, idx_pair)
            t_pair = jnp.minimum(t_new, t_pair)
            return r + 1, t_pair, idx_pair, vis + v_new

        rstate0 = (jnp.int32(0), t_pair0, jnp.full((P,), -1, jnp.int32),
                   jnp.int32(0))
        _, t_row, idx_row, visits = jax.lax.while_loop(
            round_cond, round_body, rstate0
        )
        # Min-combine pair results back to rays: unsort by sorting on
        # the carried original position (multi-operand sort again —
        # cheaper than inverse-argsort + two 2M gathers), then a dense
        # (R, W) row reduction.
        t_row = jnp.where(vp, t_row, C.T_FAR)
        _, t_back, idx_back = jax.lax.sort(
            (pos_s, t_row, idx_row), num_keys=1, is_stable=False
        )
        t_rw = t_back.reshape(Rx, Wx)
        idx_rw = idx_back.reshape(Rx, Wx)
        # Dense min + tie-match instead of argmin + two take_alongs
        # (those lowered to ~4ms/call gathers — HLO fusion audit r4).
        # Ties pick the LARGEST index among equal-t pairs; index
        # tie-breaks between duplicate finds are unpinned by contract
        # (duplicates are idempotent under the min).
        t_from = jnp.min(t_rw, axis=1)
        idx_from = jnp.max(
            jnp.where(t_rw == t_from[:, None], idx_rw, -1), axis=1
        )
        improved_ray = (t_from < t_best) & (idx_from >= 0)
        idx_best = jnp.where(improved_ray, idx_from, idx_best)
        t_best = jnp.where(improved_ray, t_from, t_best)
        return t_best, idx_best, visits

    # Occupied-cell windowing (round 5): phases cover the next W
    # OCCUPIED cells. Empty cells cannot contain a hit (their cluster
    # range is empty — grid.py duplicates every triangle into every
    # overlapped cell), so skipping them preserves the coverage
    # argument verbatim while collapsing the era ladder for rays that
    # cross open space (unoccluded shadow rays previously walked every
    # cell to the light through pure pair glue). `ptr` below counts
    # occupied cells, and the retirement probe compares against the
    # next OCCUPIED cell's entry — a larger bound, so retirement can
    # only happen earlier (and it is sound for the same reason).
    # Static auto-gate: occupied windows pay when a meaningful share of
    # cells is empty; on DENSE grids (big_mesh at axis=8 is 97%
    # occupied) they are pure overhead — the stage-A DDA grows from
    # W0+1 to all S steps and every step pays the occupancy select,
    # with no eras saved (measured: 3-pass 546 vs 522ms). Occupancy is
    # data (can't be read at trace time), so the gate keys on the
    # static shape ratio clusters/cell: coarse grids (>= 8, the
    # pick_axis regime for dense scenes) skip the machinery; fine/open
    # grids enable it. `occupied_windows` overrides either way.
    n_words = -(-n_cells // 32)
    if occupied_windows is None:
        occupied_windows = n_clusters < 8 * n_cells
    ow = (pack_occupancy(cell_start)
          if occupied_windows and n_words <= _OCC_MAX_WORDS else None)

    def _window(cellsS, entryS, oidxS, ptr_x, width):
        """Select each ray's occupied cells [ptr, ptr+width) from a
        full-S DDA — (cellsW, entryW), -1/_ENTRY_INF past the end."""
        cols = ptr_x[:, None] + jnp.arange(width, dtype=jnp.int32)[None]
        cmp = oidxS.T[:, :, None] == cols[:, None, :]
        cw = jnp.maximum(jnp.max(
            jnp.where(cmp, cellsS.T[:, :, None], -2), axis=1), -1)
        ew = jnp.max(jnp.where(cmp, entryS.T[:, :, None], -1.0), axis=1)
        return cw, jnp.where(ew < 0, _ENTRY_INF, ew)

    # ---- stage A: ONE phase at full R (every ray is live anyway) ----
    # Narrower than the era width: the median ray resolves within its
    # first 2-3 occupied cells, and at full R every extra up-front cell
    # is paid by EVERY ray (phase-0 kernel work scales with W0), while
    # the stragglers continue at reduced cost in the eras below. The
    # window select needs the full-S DDA here (the W0-th occupied cell
    # can sit at any step), but the scan is gather-free elementwise
    # arithmetic — a few ms at full R.
    #
    # first_steps == 0 SKIPS stage A entirely (ladder-only mode): for
    # LOW-OCCUPANCY calls (late bounces/shadows where most lanes are
    # dead) the full-R phase glue is the dominant cost with near-zero
    # kernel work, while the era ladder's argsort compaction only ever
    # processes live rays. The engine selects this statically per
    # unrolled bounce (engine/wavefront.py).
    W0 = min(first_steps, S)
    t_best = t_cap_p
    idx_best = jnp.full((R,), -1, jnp.int32)
    if W0 > 0:
        if ow is not None:
            cells0, entry0, oidx0 = dda_cells(
                o_p, d_p, t_cap_p, grid_lo, grid_cell, axis,
                occ_words=ow)  # (S, R)
            cellsA, entryA = _window(
                cells0, entry0, oidx0,
                jnp.zeros((R,), jnp.int32), W0 + 1)
            done0 = cellsA[:, 0] < 0  # no occupied cell at all
            cellsW0 = jnp.where(done0[:, None], -1, cellsA[:, :W0])
            next_cell0 = cellsA[:, W0]
            next_entry0 = entryA[:, W0]
        else:
            L0 = min(W0 + 1, S)
            cells0, entry0 = dda_cells(o_p, d_p, t_cap_p, grid_lo,
                                       grid_cell, axis, length=L0)
            done0 = cells0[0] < 0  # no cells (missed grid / dead lane)
            cellsW0 = jnp.where(done0[:, None], -1, cells0[:W0].T)
            if L0 > W0:
                next_cell0 = cells0[W0]
                next_entry0 = entry0[W0]
            else:  # W0 covers the whole grid: nothing can remain
                next_cell0 = jnp.full((R,), -1, jnp.int32)
                next_entry0 = jnp.full((R,), _ENTRY_INF, jnp.float32)
        t_best, idx_best, visits_a = _phase_core(cellsW0, rayf, t_best,
                                                 idx_best)
        resolved0 = t_best <= next_entry0 * _ENTRY_REL - _ENTRY_ABS
        done = done0 | (next_cell0 < 0) | resolved0
    else:
        cells0, _ = dda_cells(o_p, d_p, t_cap_p, grid_lo, grid_cell,
                              axis, length=1)
        # Dead lanes / grid misses only; rays whose path holds zero
        # OCCUPIED cells retire after their first era (window select
        # yields -1 everywhere).
        done = cells0[0] < 0
        visits_a = jnp.int32(0)
    ptr = jnp.full((R,), W0, jnp.int32)
    live_a = jnp.sum(~done)  # stats: stragglers entering the era ladder

    # ---- stage B: era ladder over a COMPACTED live-ray buffer ----
    # After phase 0 most rays have retired (measured ~80%+ at axis=8 on
    # the 2M-tri scene), but every phase's pair glue costs O(Rx*We)
    # regardless of the live count. Each era argsorts rays by done
    # (live first), continues the FIRST Rx live rays from their own
    # cell pointer, and scatters the carries back. If more than Rx rays
    # are live, later eras pick up the rest (stable sort + per-ray
    # pointers make progress monotone); the era caps cover the worst
    # case of every ray walking every phase in R/Rx batches. The ladder
    # runs at R/4 first, then drops to R/16 once the live count fits —
    # straggler eras stop paying quarter-R glue for a few hundred rays.
    #
    # Per-era ray state is RECOMPUTED, not gathered: the era re-runs
    # the (gather-free, elementwise) DDA on its selected rays and
    # selects the [ptr, ptr+We] window arithmetically. The alternative
    # — materializing (R, S) cell/entry tables and gathering (Rx, We)
    # windows — pays ~15ns/element 2-D gathers (the r3 design; its
    # era gather fusion alone was ~7ms/era at axis=16), while the DDA
    # recompute is a few-ms fused scan with bitwise-identical per-ray
    # results (dda_cells is elementwise in (o, d, t_max)).
    n_phases_e = -(-S // We)
    # Era ray-state rides ONE aligned (R, 8) row gather: o_p[sel] /
    # d_p[sel] are (R, 3) gathers whose 12-byte minor dim is exactly
    # the badly-shaped class measured at ~15ns/element (PROFILE.md r3
    # toolchain findings); 8-f32 rows gather 20-40x faster per element.
    ray_rows = jnp.concatenate([
        o_p, d_p, t_cap_p[:, None],
        jnp.zeros((R, 1), jnp.float32),
    ], axis=1)  # (R, 8)

    def _ladder_size(target):
        Rx = max(2048, -(-target // 2048) * 2048)
        while (Rx * We) % (8 * block):  # Bp must be a multiple of 8
            Rx += 2048
        return min(Rx, R)

    # Level sizes: with a stage A, stragglers are <= ~40% of R, so the
    # ladder starts at R/4. In ladder-only mode (W0 == 0) the first
    # level must swallow the call's full live set in ~1-2 eras, so it
    # starts at R/2 and decays faster. `ladder` (static divisor tuple,
    # e.g. (2, 8)) overrides the level sizes — a perf-only knob (the
    # era loop is exact at any capacity; stable sort + per-ray
    # pointers make progress monotone).
    if ladder is not None:
        targets = tuple(R // div for div in ladder)
    else:
        targets = (R // 4, R // 16) if W0 > 0 else (R // 2, R // 8,
                                                    R // 32)
    sizes: list[int] = []
    for tgt in targets:
        Rx = _ladder_size(tgt)
        if not sizes or Rx < sizes[-1]:
            sizes.append(Rx)
    R2 = sizes[0]  # stats: first-level size
    probe_iota = jnp.arange(We + 1, dtype=jnp.int32)
    s_iota = jnp.arange(S, dtype=jnp.int32)

    def _make_era_body(Rx):
        def era_body(state):
            era, done, ptr, t_best, idx_best, vis = state
            sel = jnp.argsort(done, stable=True)[:Rx]
            done_s = done[sel]
            ptr_s = ptr[sel]
            rows_s = ray_rows[sel]  # one aligned row gather (see above)
            o_s = rows_s[:, 0:3]
            d_s = rows_s[:, 3:6]
            tm_s = rows_s[:, 6]
            # Arithmetic window select over the recomputed DDA: with
            # occupancy, each (ray, w) column matches the (ptr+w)-th
            # OCCUPIED step (or none — exhausted / all-empty tail);
            # without, the plain step index.
            if ow is not None:
                cells_e, entry_e, oidx_e = dda_cells(
                    o_s, d_s, tm_s, grid_lo, grid_cell, axis,
                    occ_words=ow)  # (S, Rx)
                cellsW_p, entryW_p = _window(cells_e, entry_e, oidx_e,
                                             ptr_s, We + 1)
            else:
                cells_e, entry_e = dda_cells(o_s, d_s, tm_s, grid_lo,
                                             grid_cell, axis)  # (S, Rx)
                cols = ptr_s[:, None] + probe_iota[None, :]  # (Rx, We+1)
                cmp = s_iota[None, :, None] == cols[:, None, :]
                cellsW_p = jnp.maximum(jnp.max(
                    jnp.where(cmp, cells_e.T[:, :, None], -2), axis=1),
                    -1)
                entryW_p = jnp.max(
                    jnp.where(cmp, entry_e.T[:, :, None], -1.0), axis=1)
                entryW_p = jnp.where(entryW_p < 0, _ENTRY_INF, entryW_p)
            cellsW = jnp.where(done_s[:, None], -1, cellsW_p[:, :We])
            rayf_s = _ray_features(o_s, d_s, tm_s)  # rebuilt, no gather
            t_s, idx_s, v_e = _phase_core(cellsW, rayf_s, t_best[sel],
                                          idx_best[sel])
            next_cell = cellsW_p[:, We]
            next_entry = entryW_p[:, We]
            resolved = t_s <= next_entry * _ENTRY_REL - _ENTRY_ABS
            done_s = done_s | (next_cell < 0) | resolved
            t_best = t_best.at[sel].set(t_s)
            idx_best = idx_best.at[sel].set(idx_s)
            done = done.at[sel].set(done_s)
            ptr = ptr.at[sel].set(ptr_s + We)
            return era + 1, done, ptr, t_best, idx_best, vis + v_e

        return era_body

    era_fin = jnp.int32(0)
    visits = visits_a
    for i, Rx in enumerate(sizes):
        floor = sizes[i + 1] if i + 1 < len(sizes) else 0
        MAX_E = 4 * (R // Rx) * n_phases_e

        def era_cond(state, MAX_E=MAX_E, floor=floor):
            era, done = state[0], state[1]
            if floor:
                # Hand off to the next (smaller) level once the live
                # set fits it — exactness is level-independent (stable
                # sort + per-ray pointers, monotone progress).
                return (era < MAX_E) & (jnp.sum(~done) > floor)
            return (era < MAX_E) & ~jnp.all(done)

        estate = (jnp.int32(0), done, ptr, t_best, idx_best, visits)
        era_i, done, ptr, t_best, idx_best, visits = jax.lax.while_loop(
            era_cond, _make_era_body(Rx), estate
        )
        era_fin = era_fin + era_i
    done_fin = done
    t_fin, idx_fin = t_best, idx_best
    t_best = t_fin[:R0]
    slot = idx_fin[:R0]

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
    if stats:
        # Measurement-only diagnostics (scripts/grid_profile.py): how
        # many eras the straggler ladder actually ran, and how many rays
        # were still live after the full-R first phase — the two
        # quantities that set the O(R2*W)-per-era glue bill.
        info = {
            "eras": era_fin,
            "live_after_phase0": live_a,
            "unfinished": jnp.sum(~done_fin),
            "n_phases": n_phases_e,
            "R_pad": R,
            "R2": R2,
            # Total attempted pair-kernel visits (stage A + all eras) —
            # one visit = one 128-triangle cluster DMA + K=48 matmul +
            # epilogue against a pair block. The grid roofline's
            # visits/pair and us/visit derive from this.
            "visits": visits,
        }
        return t_out, n_best, m_best, info
    return t_out, n_best, m_best
