"""Dense cluster intersection: the TPU-native closest-hit hot path.

This is the round-2 replacement for gather-based BVH traversal as the
engine's default intersector (VERDICT.md round-1 items 2/3). The
reference's hot path is a divergent per-thread BVH stack walk in CUDA
(SURVEY.md §2.1 R2/R3, §3.1 "HOTTEST"); measured on the attached v5e,
every faithful translation of that shape (per-ray cursors + gathers) runs
at 0.05-0.3 Mrays/s because TPUs execute data-dependent gathers and
max-lane-bounded loops orders of magnitude below their dense throughput
(scripts/microbench_traverse.py, microbench_results.jsonl). The TPU-native
re-pose, following the machine instead of the reference:

  candidate build (XLA, cull_candidates): conservative interval-
      arithmetic slab test per (ray block, cluster) -> per-block lists of
      surviving cluster ids SORTED NEAR-FIRST by the lower bound of the
      entry distance. Dense, fused, no gathers. Plays with
      engine/wavefront.py's coherence compaction: sorted rays give tight
      block intervals, so lists get shorter exactly when it matters.

  fine test (Pallas, this file): per ray block, walk the candidate list
      front-to-back. Each visited cluster is ONE matmul on the MXU

          q = feat_block(16, 512)^T . rayF(16, RB)  ->  (512, RB)

      yielding det, u*det, v*det, t*det for all 128 cluster triangles
      against all RB rays at once (feature algebra: accel/clusters.py),
      then a short VPU epilogue (sign-canonical Möller-Trumbore predicate
      in multiply form) and a sublane min/argmin reduction. The walk
      EARLY-TERMINATES once every ray's best hit is nearer than the next
      cluster's conservative entry distance — the ordered-traversal
      optimization of a classic BVH walk, re-posed per block. Zero
      gathers, every memory access 128-aligned and static-size by
      construction — the two Mosaic constraints that broke the round-1
      packet kernel (VERDICT.md "What's missing" 2) are unviolable here.

Correctness contract: same hit set as engine/intersect.py:brute (same
DET_EPS/T_MIN/T_FAR predicate, evaluated in multiply-by-|det| form).
t values agree to f32 tolerance, not bit-exactly (different association);
tie-breaks between equal-t triangles may differ in *index* but tests pin
t/material/normal agreement (tests/unit/test_cluster.py). Early exit
cannot drop a hit: it only skips clusters whose whole AABB lies strictly
beyond every ray's current best t.

Capacity: the feature table lives VMEM-resident, replicated per grid
step => C*512*16*4 bytes must fit comfortably in VMEM (~<=512 clusters,
~65k triangles). Larger scenes use the HBM-streaming variant
(ops/intersect_stream.py) automatically at the engine level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..accel.clusters import (
    CLUSTER_COLS,
    CLUSTER_TRIS,
    FEAT_ROWS,
    FEAT_STACK,
)
from ..engine import intersect as isect

RAY_BLOCK = 512  # rays per grid step (lanes; 4 f32 vregs per row)

# VMEM budget for the resident feature table; above this the engine
# switches to the HBM-streaming kernel (see fits_vmem()).
_VMEM_FEAT_BYTES = 10 * 1024 * 1024


def fits_vmem(n_clusters: int) -> bool:
    # Stacked bf16 table: 48 rows x 2 bytes per column.
    return n_clusters * CLUSTER_COLS * FEAT_STACK * 2 <= _VMEM_FEAT_BYTES


def split_bf16(x):
    """bf16 hi/lo error split: x ~= hi + lo with both parts bf16.

    The MXU's single-pass f32 dot rounds multiplicands to bf16, which
    flips near-edge hit predicates (~2% of rays wrong vs brute — verified
    on v5e), and Precision.HIGHEST sent the remote Mosaic compile into a
    >20-minute stall. The error-split product
    x*y ~= hi(x)hi(y) + hi(x)lo(y) + lo(x)hi(y) (dropping only the
    ~2^-18-relative lo*lo term) keeps the known-fast bf16 lowering;
    since round 4 the three passes ride ONE K=48 matmul over stacked
    operands instead of three K=16 dots (see stack_rays / visit_q and
    accel/clusters.py:stack_feat).
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def stack_rays(rayf):
    """(16, RB) f32 ray features -> (48, RB) bf16 [hi; lo; hi] stack.

    Pairs with the triangle table's [hi; hi; lo] stack
    (accel/clusters.py:stack_feat): one K=48 contraction then sums
    hi*hi + hi*lo + lo*hi — exactly the old three error-split passes,
    in one MXU issue, with the same dropped lo*lo term. Built once per
    kernel block (the table side is prebuilt at scene build).
    """
    hi, lo = split_bf16(rayf)
    return jnp.concatenate([hi, lo, hi], axis=0)


def visit_q(blk, rayf48):
    """(48, 512) stacked feature block x (48, RB) stacked rays -> q.

    q rows [0:128)=det, [128:256)=u*det, [256:384)=v*det, [384:512)=t*det
    for the block's 128 triangles against all RB rays — one cluster visit
    in ONE MXU matmul (near-f32 via the stacked error split, see
    stack_rays).
    """
    dims = (((0,), (0,)), ((), ()))
    return jax.lax.dot_general(
        blk, rayf48, dims, preferred_element_type=jnp.float32)


def visit_epilogue(q, t_best, best, base_id, enabled=True):
    """VPU epilogue of one cluster visit: MT predicate + min-reduction.

    Sign-canonical multiply-form Möller-Trumbore: dividing by det flips
    inequality directions when det < 0, so fold the sign into the
    numerators and compare against |det|. Returns updated (t_best, best)
    with best = base_id * 128 + row for improved lanes.

    The winning ROW is found by ENCODING it into the low 7 mantissa
    bits of t (all candidate t's are positive finite, so the integer
    order of their bit patterns is the float order) — ONE integer
    min-reduction replaces the min + tie-matching argmin pair of
    reductions, the second-largest term in the per-visit cost
    (roofline, PROFILE.md r3). The reported t is perturbed by at most
    127 ulp (~1.5e-5 relative) — an order below the kernel's bf16
    hi/lo matmul tolerance (rtol 4e-3, tests/unit/test_cluster.py).

    Side effects of the downward rounding (ADVICE r3): (a) the ordered
    early exit compares cluster tnear against the block max of the
    rounded best-t, so it is marginally TIGHTER — a later cluster whose
    conservative entry lies inside the ~1.5e-5-relative rounding gap can
    be skipped; (b) tie-breaks between near-coincident surfaces closer
    than that gap in t may resolve to a different triangle than the
    exact min would. Both stay within the documented bf16 tolerance;
    t/normal/material agreement is what the tests pin, not the index.
    """
    RB = q.shape[1]
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
    # No upper t bound here: an over-large tc simply never wins the min
    # (t_best initializes at t_max <= T_FAR).
    valid = (
        eps_ok
        & (un >= 0.0)
        & (vn >= 0.0)
        & (un + vn <= adet)
        & (tn > C.T_MIN * adet)
    )
    # Invalid sentinel STRICTLY above any possible t_best (bit-clearing
    # T_FAR itself would dip just below a t_best == T_FAR init and
    # report a phantom hit on an all-miss visit). The max() denominator
    # guard replaces a select: for valid lanes adet > DET_EPS so the
    # quotient is bit-identical; invalid lanes are overridden anyway.
    tc = jnp.where(valid, tn / jnp.maximum(adet, np.float32(1e-30)),
                   2.0 * C.T_FAR)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, RB), 0)
    tenc = (
        (jax.lax.bitcast_convert_type(tc, jnp.int32)
         & jnp.int32(~(CLUSTER_TRIS - 1)))  # clear low 7 bits
        | row
    )
    menc = jnp.min(tenc, axis=0, keepdims=True)  # (1, RB) int min
    tmin = jax.lax.bitcast_convert_type(
        menc & jnp.int32(~(CLUSTER_TRIS - 1)), jnp.float32
    )
    # `enabled` (scalar bool) gates the update for grouped-visit walks:
    # a group's trailing visits past n_cand re-test a clamped candidate
    # and must never win (see _cluster_kernel VISIT_GROUP).
    better = (tmin < t_best) & enabled
    best = jnp.where(
        better, base_id * CLUSTER_TRIS + (menc & (CLUSTER_TRIS - 1)),
        best,
    )
    t_best = jnp.where(better, tmin, t_best)
    return t_best, best


# Clusters tested per while-loop iteration of the dense kernel. The
# roofline's kernel-variant experiments put the per-visit cost at
# ~0.6us matmul + ~1.5us VPU epilogue + ~1.0us serial loop/SMEM/slice
# overhead (PROFILE.md r3); unrolling G visits per iteration divides
# the loop term by G. The ordered early exit coarsens to G-visit
# granularity (at most G-1 extra visits per block exit) and trailing
# visits past n_cand are epilogue-gated (visit_epilogue `enabled`).
VISIT_GROUP = 4


def _make_cluster_kernel(visit_group: int):
    def _cluster_kernel(cand_ref, count_ref, tnear_ref, rayf_ref, feat_ref,
                        t_ref, idx_ref):
        """One grid step = one RAY_BLOCK-ray block walking its candidates.

        cand_ref:  (8, K) i32 SMEM — candidate rows for 8 ray blocks
            (Mosaic requires sublane-dim blocks divisible by 8, so
            per-block rows are windowed 8 at a time; this block's row is
            program_id % 8)
        count_ref: (8, 1) i32 SMEM — candidate counts, same windowing
        tnear_ref: (8, K) f32 SMEM — sorted conservative entry distances
        rayf_ref:  (16, RB) f32 VMEM — rows [d(3), o x d(3), o(3), 1, ...]
        feat_ref:  (48, C*512) bf16 VMEM — stacked table, resident
        t_ref:   (8, RB) f32 out — row 0 = closest t (T_FAR miss)
        idx_ref: (8, RB) i32 out — row 0 = padded cluster slot (-1 miss)
        """
        RB = rayf_ref.shape[1]
        K = cand_ref.shape[1]
        row = pl.program_id(0) % 8
        rayf = rayf_ref[:, :]
        rayf48 = stack_rays(rayf)
        t0 = rayf[10:11, :]  # per-ray t upper bound (T_FAR if unbounded)
        n_cand = count_ref[row, 0]

        def cond(state):
            k, tmax, _, _ = state
            # tmax is the block's worst best-hit so far (carried as a
            # scalar so the while condition stays scalar-only for
            # Mosaic). Once the next-nearest cluster cannot contain a
            # closer hit for ANY ray, no later (farther) cluster can
            # either: ordered early exit.
            kc = jnp.minimum(k, K - 1)
            return (k < n_cand) & (tnear_ref[row, kc] < tmax)

        def body(state):
            k, _, t_best, best = state
            for g in range(visit_group):
                kk = k + g if g else k
                ok = kk < n_cand
                kc = jnp.minimum(kk, K - 1)
                cid = jnp.maximum(cand_ref[row, kc], 0)
                col0 = pl.multiple_of(cid * CLUSTER_COLS, CLUSTER_COLS)
                blk = feat_ref[:, pl.ds(col0, CLUSTER_COLS)]  # (48, 512)
                q = visit_q(blk, rayf48)
                t_best, best = visit_epilogue(q, t_best, best, cid,
                                              enabled=ok)
            return k + visit_group, jnp.max(t_best), t_best, best

        init = (
            jnp.int32(0),
            jnp.max(t0),
            t0,
            jnp.full((1, RB), -1, jnp.int32),
        )
        k_end, _, t_best, best = jax.lax.while_loop(cond, body, init)
        t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
        idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))
        # Row 1 carries the block's visit count (the rows are broadcast
        # copies anyway): free instrumentation for the roofline
        # accounting (scripts/roofline.py). Row 0 — the only row callers
        # consume — is unchanged. With grouping this counts ATTEMPTED
        # visits (a multiple of visit_group).
        idx_ref[1:2, :] = jnp.zeros((1, RB), jnp.int32) + k_end

    return _cluster_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _cluster_pallas(cand, count, tnear, rayf, feat, interpret,
                    visit_group=VISIT_GROUP):
    """custom_vjp boundary (same detach policy as ops/traverse_pallas.py:
    traversal outputs are piecewise-constant in the differentiable
    parameters, so the VJP returns zero cotangents — SURVEY.md §3.4/T9)."""
    return _cluster_impl(cand, count, tnear, rayf, feat, interpret,
                         visit_group)


def _cluster_fwd(cand, count, tnear, rayf, feat, interpret,
                 visit_group=VISIT_GROUP):
    out = _cluster_impl(cand, count, tnear, rayf, feat, interpret,
                        visit_group)
    return out, (cand.shape, count.shape, tnear.shape, rayf.shape,
                 feat.shape)


def _cluster_bwd(interpret, visit_group, res, g):
    c_shape, n_shape, tn_shape, r_shape, f_shape = res
    return (
        np.zeros(c_shape, jax.dtypes.float0),  # int input -> float0
        np.zeros(n_shape, jax.dtypes.float0),
        jnp.zeros(tn_shape, jnp.float32),
        jnp.zeros(r_shape, jnp.float32),
        jnp.zeros(f_shape, jnp.float32),
    )


_cluster_pallas.defvjp(_cluster_fwd, _cluster_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "visit_group"))
def _cluster_impl(cand, count, tnear, rayf, feat, interpret,
                  visit_group=VISIT_GROUP):
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    K = cand.shape[1]
    assert cand.shape[0] % 8 == 0, cand.shape  # 8-row SMEM windows
    # cull_candidates returns count UNCAPPED (its overflow flag is easy to
    # ignore); the kernel walks k < count reading cand_ref[row, k], so an
    # uncapped count with a max_cand-truncated cand row would read past
    # the SMEM window. Clamp here at the kernel boundary.
    count = jnp.minimum(count, K)
    t_out, idx_out = pl.pallas_call(
        _make_cluster_kernel(visit_group),
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
            pl.BlockSpec(feat.shape, lambda i: (0, 0),
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
    )(cand, count.reshape(-1, 1), tnear, rayf, feat)
    return t_out[0], idx_out[0]


@functools.partial(jax.jit, static_argnames=("interpret", "visit_group"))
def cluster_visit_counts(cand, count, tnear, rayf, feat, interpret,
                         visit_group=VISIT_GROUP):
    """Per-block visit counts of the ordered walk (roofline probe).

    Runs the same kernel as _cluster_impl and reads the k_end the
    kernel writes into idx row 1 (see _cluster_kernel). Returns
    (n_blocks,) i32 ATTEMPTED visits (a multiple of visit_group).
    Not differentiable — profiling only.
    """
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    grid = (R // block,)
    K = cand.shape[1]
    count = jnp.minimum(count, K)
    _, idx_out = pl.pallas_call(
        _make_cluster_kernel(visit_group),
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
            pl.BlockSpec(feat.shape, lambda i: (0, 0),
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
    )(cand, count.reshape(-1, 1), tnear, rayf, feat)
    return idx_out[1].reshape(-1, block)[:, 0]


def _ray_features(o, d, t_max=None):
    """(R, 3) origins/directions -> planar (16, R) ray feature rows.

    Row layout: [d(3), o x d(3), o(3), 1, t_max, 0(5)]. Rows 0-9 pair
    with the triangle feature columns (accel/clusters.py — those columns
    are zero in rows 10+, so extra rows never perturb q). Row 10 carries
    the per-ray t upper bound: the kernels initialize their best-t to it,
    so hits beyond t_max MAY be reported as misses and the ordered early
    exit stops at t_max instead of T_FAR — the NEE shadow-ray win (a
    shadow query only cares about occluders nearer than the light).
    """
    R = o.shape[0]
    oxd = jnp.cross(o, d)
    if t_max is None:
        tm = jnp.full((1, R), C.T_FAR, jnp.float32)
    else:
        tm = jnp.asarray(t_max, jnp.float32).reshape(1, R)
    rows = jnp.concatenate(
        [d.T, oxd.T, o.T, jnp.ones((1, R), jnp.float32), tm,
         jnp.zeros((FEAT_ROWS - 11, R), jnp.float32)],
        axis=0,
    )
    return rows


def _interval_prod_bounds(xlo, xhi, ylo, yhi):
    """Elementwise interval product bounds: [xlo,xhi] * [ylo,yhi]."""
    p1 = xlo * ylo
    p2 = xlo * yhi
    p3 = xhi * ylo
    p4 = xhi * yhi
    pmin = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    pmax = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return pmin, pmax


def _block_cluster_intervals(cl_lo, cl_hi, o, d, block):
    """Conservative per-(block, cluster) slab-test intervals.

    Returns (tnear_lo, tfar_hi): LOWER bound of the entry distance and
    UPPER bound of the exit distance of cluster c for ANY ray in block b
    — the interval-arithmetic 'coarse BVH' of the two-phase intersector.
    """
    R = o.shape[0]
    B = R // block
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    o_b = o.reshape(B, block, 3)
    i_b = inv.reshape(B, block, 3)
    olo = o_b.min(1)[:, None, :]  # (B, 1, 3)
    ohi = o_b.max(1)[:, None, :]
    ilo = i_b.min(1)[:, None, :]
    ihi = i_b.max(1)[:, None, :]
    # Per axis: products (plane - o) * inv over plane in {lo, hi} corners.
    a_lo = cl_lo[None, :, :] - ohi  # (B, C, 3) lower end of (lo - o)
    a_hi = cl_lo[None, :, :] - olo
    b_lo = cl_hi[None, :, :] - ohi
    b_hi = cl_hi[None, :, :] - olo
    pmin_a, pmax_a = _interval_prod_bounds(a_lo, a_hi, ilo, ihi)
    pmin_b, pmax_b = _interval_prod_bounds(b_lo, b_hi, ilo, ihi)
    ax_min = jnp.minimum(pmin_a, pmin_b)  # lower bound of min(t0, t1)
    ax_max = jnp.maximum(pmax_a, pmax_b)  # upper bound of max(t0, t1)
    tnear_lo = jnp.max(ax_min, axis=-1)  # (B, C)
    tfar_hi = jnp.min(ax_max, axis=-1)
    return tnear_lo, tfar_hi


# Per-ray line cull at CLUSTER granularity is affordable up to this
# many clusters ((R, C) dense slab tests); beyond it the super-cluster
# mask (ray_super_mask) provides the same effect at ~C/32 granularity.
# The VMEM routing bound (~213 clusters, fits_vmem) keeps every dense-
# kernel scene under this, so in practice the cluster path always uses
# the exact mask.
RAY_CULL_MAX_C = 512


def ray_cluster_mask(cl_lo, cl_hi, o, d, t_max, block: int = RAY_BLOCK):
    """(B, C) per-ray line cull at CLUSTER granularity.

    The round-5 visit-reduction lever (VERDICT r5 item 1): the bounce
    pass walked ~25 clusters/block where a per-ray walk needs ~6 —
    the per-BLOCK interval cone over 512 hemisphere-scattered bounce
    rays covers most of a small scene, and the super mask is useless
    there (cornell has 2 supers). This mask slab-tests every RAY
    against every CLUSTER box (dense (R, C) — affordable for
    VMEM-resident scenes, <= ~213 clusters) within the ray's own
    [T_MIN, t_max], and cluster c survives for block b iff SOME ray in
    b crosses it: the block list shrinks to the exact union of its
    rays' line needs.

    Sound: a hit at t < t_max lies on the ray's line inside the
    cluster box, so the (inflated — same fp-conservatism policy as
    build_supers) slab test keeps that cluster; dropping never loses a
    hit. The hit set — and the rendered image — is bit-unchanged.
    """
    R = o.shape[0]
    B = R // block
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    pad = 1e-6 * jnp.maximum(jnp.abs(cl_lo), jnp.abs(cl_hi)) + 1e-7
    lo = cl_lo - pad
    hi = cl_hi + pad
    # Per-axis accumulation keeps the largest live intermediate at
    # (R, C) instead of (R, C, 3).
    t_in = jnp.full((R, cl_lo.shape[0]), -jnp.inf, jnp.float32)
    t_out = jnp.full((R, cl_lo.shape[0]), jnp.inf, jnp.float32)
    for ax in range(3):
        t0 = (lo[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t1 = (hi[None, :, ax] - o[:, ax:ax + 1]) * inv[:, ax:ax + 1]
        t_in = jnp.maximum(t_in, jnp.minimum(t0, t1))
        t_out = jnp.minimum(t_out, jnp.maximum(t0, t1))
    tm = jnp.asarray(t_max, jnp.float32)[:, None]
    crossed = (t_out >= jnp.maximum(t_in, C.T_MIN)) & (t_in <= tm)
    return crossed.reshape(B, block, -1).any(axis=1)  # (B, C)


def ray_super_mask(su_lo, su_hi, cl_super, o, d, t_max,
                   block: int = RAY_BLOCK):
    """(B, C) per-ray line-union cull at super-cluster granularity.

    The per-block interval cull (_block_cluster_intervals) keeps every
    cluster in the block's origin-direction CONE; a single ray only
    crosses the clusters on its LINE. At large cluster counts the cone
    holds thousands while the union of 512 lines holds dozens — the
    round-2 big_mesh collapse (PROFILE.md). This mask restores per-ray
    precision while staying fully dense: every ray slab-tests every
    SUPER box (supers = ~32-cluster groups, accel/clusters.py:
    build_supers), each against its OWN [T_MIN, t_max] interval, and
    cluster c survives for block b iff some ray in b crosses super(c).

    Sound: cluster boxes are contained in their (inflated) super box,
    so a ray that crosses a cluster within its bounds crosses the super
    too — dropping never loses a hit at t < t_max.
    """
    R = o.shape[0]
    B = R // block
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    t0 = (su_lo[None, :, :] - o[:, None, :]) * inv[:, None, :]  # (R, S, 3)
    t1 = (su_hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t_in = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (R, S)
    t_out = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tm = jnp.asarray(t_max, jnp.float32)[:, None]
    crossed = (t_out >= jnp.maximum(t_in, C.T_MIN)) & (t_in <= tm)
    block_super = crossed.reshape(B, block, -1).any(axis=1)  # (B, S)
    return block_super[:, cl_super]  # (B, C)


def cull_mask(cl_lo, cl_hi, o, d, block: int = RAY_BLOCK):
    """Conservative (n_blocks, C) i32 mask: 0 => no ray in block i can hit
    cluster c."""
    tnear_lo, tfar_hi = _block_cluster_intervals(cl_lo, cl_hi, o, d, block)
    hit = tfar_hi >= jnp.maximum(tnear_lo, C.T_MIN)
    return hit.astype(jnp.int32)


def cull_candidates(cl_lo, cl_hi, o, d, block: int = RAY_BLOCK,
                    max_cand: int | None = None, t_max=None,
                    extra_mask=None):
    """Per-ray-block candidate cluster lists, near-first.

    Same conservative interval slab test as cull_mask, additionally
    keeping the LOWER bound of the entry distance so candidates are
    ordered front-to-back — the kernels visit them in this order and
    early-terminate on it. With per-ray `t_max` (shadow queries),
    clusters entirely beyond the block's farthest bound are culled too.
    `extra_mask` ((B, C) bool, e.g. ray_super_mask) is ANDed in.

    Returns (cand, count, tnear, overflow):
      cand: (B, K) i32 cluster ids, -1 padded, sorted by tnear_lo
      count: (B,) i32 number of valid candidates per block (uncapped)
      tnear: (B, K) f32 sorted entry-distance lower bounds (T_FAR padded)
      overflow: () bool — some block exceeded K (K < C only)
    """
    n_clusters = cl_lo.shape[0]
    K = n_clusters if max_cand is None else min(max_cand, n_clusters)
    tnear_lo, tfar_hi = _block_cluster_intervals(cl_lo, cl_hi, o, d, block)
    hit = tfar_hi >= jnp.maximum(tnear_lo, C.T_MIN)
    if t_max is not None:
        B = o.shape[0] // block
        block_tmax = jnp.asarray(t_max, jnp.float32).reshape(B, block)
        hit = hit & (tnear_lo < block_tmax.max(1)[:, None])
    if extra_mask is not None:
        hit = hit & extra_mask
    count = hit.sum(axis=1).astype(jnp.int32)  # (B,)
    key = jnp.where(hit, tnear_lo, jnp.inf)
    order = jnp.argsort(key, axis=1)[:, :K].astype(jnp.int32)  # (B, K)
    tkey = jnp.take_along_axis(key, order, axis=1).astype(jnp.float32)
    rank = jax.lax.broadcasted_iota(jnp.int32, order.shape, 1)
    in_range = rank < count[:, None]
    cand = jnp.where(in_range, order, -1)
    tnear = jnp.where(in_range, tkey, C.T_FAR)
    overflow = jnp.max(count) > K
    return cand, count, tnear, overflow


def _decode_winner(geom, slot, t_best):
    """(t, n, mat) from the winning padded cluster slot per ray.

    Uses the pre-joined (C*128, 8) cl_slot_nm row table when present —
    ONE well-shaped row gather instead of the cl_map -> tri_n ->
    tri_mat chain, which measured ~1.9ms per gather per intersect call
    on the v5e band trace (HLO fusion audit, PROFILE.md r4).
    """
    if geom.cl_slot_nm.shape[0] > 0:
        row_nm = jnp.asarray(geom.cl_slot_nm)[jnp.maximum(slot, 0)]
        hit = (slot >= 0) & (row_nm[:, 4] > 0.0)
        n_best = jnp.where(hit[:, None], row_nm[:, 0:3], 0.0)
        m_best = jnp.where(hit, row_nm[:, 3].astype(jnp.int32), 0)
    else:
        hit = slot >= 0
        best = jnp.where(
            hit, jnp.asarray(geom.cl_map)[jnp.maximum(slot, 0)], -1
        )
        hit = best >= 0  # padding slots never win, but be safe
        safe = jnp.maximum(best, 0)
        n_best = jnp.where(hit[:, None],
                           jnp.asarray(geom.tri_n)[safe], 0.0)
        m_best = jnp.where(hit, jnp.asarray(geom.tri_mat)[safe], 0)
    t_out = jnp.where(hit, t_best, C.T_FAR)
    return t_out, n_best, m_best


def _pad_rays(o, d, t_max, block):
    """Pad ray arrays to 8 whole blocks (Mosaic SMEM row windowing)."""
    R0 = o.shape[0]
    pad = (-R0) % (8 * block)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
        if t_max is not None:
            # Pad lanes share the final partial block with real rays and
            # the ordered early exit uses the block-wide max of best-t, so
            # pad with T_MIN (the engine's dead-lane canonicalization):
            # a T_FAR pad lane would pin that block's exit bound at its
            # scene-box exit and defeat the shadow distance cap.
            t_max = jnp.concatenate(
                [jnp.asarray(t_max, jnp.float32),
                 jnp.full((pad,), C.T_MIN, jnp.float32)]
            )
    return o, d, t_max


def exit_bound(cl_lo, cl_hi, o, d):
    """Per-ray scene-box exit distance — a universal t upper bound.

    Every cluster (hence every triangle) lies inside the union AABB of
    the cluster boxes, so no ray can hit anything beyond the point where
    it exits that box. Initializing best-t at this bound lets rays that
    MISS the scene resolve their ordered walk after the near candidates
    instead of scanning to T_FAR (the dominant cost of open scenes —
    PROFILE.md big_mesh finding). The small relative+absolute epsilon
    keeps boundary triangles (exactly on a box face) strictly inside the
    bound. Rays that miss the box entirely get ~0 => zero walk work.
    """
    lo = jnp.min(cl_lo, axis=0)
    hi = jnp.max(cl_hi, axis=0)
    tiny = 1e-20
    dd = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dd
    t0 = (lo[None, :] - o) * inv
    t1 = (hi[None, :] - o) * inv
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    # Clamp to T_FAR: a bound above T_FAR would let an all-miss cluster
    # visit (tc == T_FAR) read as an "improvement" and return slot >= 0
    # with stale normal/material for direct API callers (ADVICE r2).
    return jnp.minimum(jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-3, C.T_FAR)


def closest_hit_cluster(geom, o, d, interpret: bool | None = None,
                        use_cull: bool = True, t_max=None,
                        visit_group: int = VISIT_GROUP):
    """Drop-in closest hit via the dense cluster kernel.

    Same contract as engine/intersect.py:brute / accel/traverse.py:
    (t, n_geom, mat) with t == T_FAR on miss. Requires cluster tables on
    the Geometry (accel/clusters.py:with_clusters). Sphere primitives are
    merged via the brute sphere path (spheres are few).

    t_max: optional (R,) per-ray t upper bound; hits at t >= t_max[i] MAY
    be reported as misses (exactly right for shadow/visibility queries —
    see _ray_features). Hits strictly nearer are always found.
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
    # Cap every ray at its scene-box exit (see exit_bound): miss rays
    # then early-terminate the ordered walk instead of scanning to T_FAR.
    t_exit = exit_bound(jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi),
                        o_p, d_p)
    t_max_p = t_exit if t_max_p is None else jnp.minimum(
        jnp.asarray(t_max_p, jnp.float32), t_exit
    )

    rayf = _ray_features(o_p, d_p, t_max_p)
    B = o_p.shape[0] // block
    if use_cull:
        # Per-ray line cull: exact cluster granularity when the scene
        # is small enough for the dense (R, C) test (every VMEM-routed
        # scene is — see RAY_CULL_MAX_C), else super granularity.
        extra = None
        if 1 < n_clusters <= RAY_CULL_MAX_C:
            extra = ray_cluster_mask(
                jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi),
                o_p, d_p, t_max_p, block,
            )
        elif geom.su_lo.shape[0] > 1:
            extra = ray_super_mask(
                jnp.asarray(geom.su_lo), jnp.asarray(geom.su_hi),
                jnp.asarray(geom.cl_super), o_p, d_p, t_max_p, block,
            )
        # K = C: the dense candidate list can never overflow — exact.
        cand, count, tnear, _ = cull_candidates(
            jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi), o_p, d_p,
            block, t_max=t_max_p, extra_mask=extra,
        )
    else:
        # Visit everything in index order with early exit disabled
        # (tnear = -inf): the pure-performance filter off switch.
        cand = jnp.broadcast_to(
            jnp.arange(n_clusters, dtype=jnp.int32)[None, :],
            (B, n_clusters),
        )
        count = jnp.full((B,), n_clusters, jnp.int32)
        tnear = jnp.full((B, n_clusters), -jnp.inf, jnp.float32)
    t_best, slot = _cluster_pallas(cand, count, tnear, rayf,
                                   jnp.asarray(geom.cl_feat), interpret,
                                   visit_group)
    t_best = t_best[:R0]
    slot = slot[:R0]
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
