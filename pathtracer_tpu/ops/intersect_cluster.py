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

  coarse cull (XLA, this file):  conservative interval-arithmetic slab
      test per (ray block, cluster) -> (B, C) int32 mask. Dense, fused,
      no gathers. Plays with engine/wavefront.py's coherence compaction:
      sorted rays give tight block intervals, so the mask gets sparser
      exactly when it matters.

  fine test (Pallas, this file): per ray block, loop the C clusters;
      clusters whose mask bit is 0 are branch-skipped (scalar cond).
      Each visited cluster is ONE matmul on the MXU

          q = feat_block(16, 512)^T . rayF(16, RB)  ->  (512, RB)

      yielding det, u*det, v*det, t*det for all 128 cluster triangles
      against all RB rays at once (feature algebra: accel/clusters.py),
      then a short VPU epilogue (sign-canonical Möller-Trumbore predicate
      in multiply form) and a sublane min/argmin reduction. Zero gathers,
      every memory access 128-aligned and static-size by construction —
      the two Mosaic constraints that broke the round-1 packet kernel
      (VERDICT.md "What's missing" 2) are unviolable here.

Correctness contract: same hit set as engine/intersect.py:brute (same
DET_EPS/T_MIN/T_FAR predicate, evaluated in multiply-by-|det| form).
t values agree to f32 tolerance, not bit-exactly (different association);
tie-breaks between equal-t triangles may differ in *index* but tests pin
t/material/normal agreement (tests/unit/test_cluster.py).

Capacity: the feature table lives VMEM-resident, replicated per grid
step => C*512*16*4 bytes must fit comfortably in VMEM (~<=512 clusters,
~65k triangles). Larger scenes currently fall back to the jnp path at the
engine level; the HBM-streaming variant (scalar-prefetched per-block
cluster lists + double-buffered DMA) is the planned config-5 path
(SURVEY.md §5.7 mechanism 4).
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

RAY_BLOCK = 512  # rays per grid step (lanes; 4 f32 vregs per row)

# VMEM budget for the resident feature table; above this the engine
# should not select this backend (see fits_vmem()).
_VMEM_FEAT_BYTES = 10 * 1024 * 1024


def fits_vmem(n_clusters: int) -> bool:
    return n_clusters * CLUSTER_COLS * FEAT_ROWS * 4 <= _VMEM_FEAT_BYTES


def _cluster_kernel(mask_ref, rayf_ref, feat_ref, t_ref, idx_ref, *,
                    n_clusters):
    """One grid step = one RAY_BLOCK-ray block vs all clusters.

    mask_ref: (8, C) i32 SMEM — cull mask rows for 8 ray blocks (Mosaic
        requires sublane-dim blocks divisible by 8, so the mask is
        windowed 8 rows at a time and this block's row is program_id % 8)
    rayf_ref: (16, RB) f32 — rows [d(3), o x d(3), o(3), 1, 0...]
    feat_ref: (16, C*512) f32 — per-cluster feature columns
    t_ref:   (8, RB) f32 out — row 0 = closest t (T_FAR miss)
    idx_ref: (8, RB) i32 out — row 0 = padded cluster slot (-1 miss)
    """
    RB = rayf_ref.shape[1]
    rayf = rayf_ref[:, :]  # (16, RB)
    mask_row = pl.program_id(0) % 8
    # bf16 hi/lo split of the ray features (see the matmul note below).
    rayf_hi = rayf.astype(jnp.bfloat16)
    rayf_lo = (rayf - rayf_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def visit(k, carry):
        t_best, best = carry  # (1, RB) f32, (1, RB) i32

        def hit(carry):
            t_best, best = carry
            col0 = pl.multiple_of(k * CLUSTER_COLS, CLUSTER_COLS)
            blk = feat_ref[:, pl.ds(col0, CLUSTER_COLS)]  # (16, 512)
            # (512, RB) = sum_f blk[f, tq] * rayf[f, r] on the MXU.
            # Near-f32 matmul from three native bf16 MXU passes. The
            # MXU's single-pass f32 dot rounds multiplicands to bf16,
            # which flips near-edge hit predicates (~2% of rays wrong vs
            # brute — verified on v5e), and Precision.HIGHEST sent the
            # remote Mosaic compile into a >20-minute stall. The manual
            # hi/lo error split keeps the known-fast lowering:
            #   x*y ~= hi(x)hi(y) + hi(x)lo(y) + lo(x)hi(y),
            # dropping only the ~2^-18-relative lo*lo term.
            b_hi = blk.astype(jnp.bfloat16)
            b_lo = (blk - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((0,), (0,)), ((), ()))
            q = (
                jax.lax.dot_general(
                    b_hi, rayf_hi, dims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    b_hi, rayf_lo, dims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    b_lo, rayf_hi, dims,
                    preferred_element_type=jnp.float32)
            )
            n = CLUSTER_TRIS
            det = q[0 * n:1 * n, :]
            un = q[1 * n:2 * n, :]
            vn = q[2 * n:3 * n, :]
            tn = q[3 * n:4 * n, :]
            # Sign-canonical multiply-form MT predicate: dividing by det
            # flips inequality directions when det < 0, so fold the sign
            # into the numerators and compare against |det|.
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
            tc = jnp.where(
                valid, tn / jnp.where(eps_ok, adet, 1.0), C.T_FAR
            )
            tmin = jnp.min(tc, axis=0, keepdims=True)  # (1, RB)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, RB), 0)
            jstar = jnp.min(
                jnp.where(tc == tmin, row, n), axis=0, keepdims=True
            )
            better = tmin < t_best
            best = jnp.where(better, k * CLUSTER_TRIS + jstar, best)
            t_best = jnp.where(better, tmin, t_best)
            return t_best, best

        return jax.lax.cond(mask_ref[mask_row, k] > 0, hit, lambda c: c,
                            carry)

    init = (
        jnp.full((1, RB), C.T_FAR, jnp.float32),
        jnp.full((1, RB), -1, jnp.int32),
    )
    t_best, best = jax.lax.fori_loop(0, n_clusters, visit, init)
    t_ref[:, :] = jnp.broadcast_to(t_best, (8, RB))
    idx_ref[:, :] = jnp.broadcast_to(best, (8, RB))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _cluster_pallas(mask, rayf, feat, n_clusters, interpret):
    """custom_vjp boundary (same detach policy as ops/traverse_pallas.py:
    traversal outputs are piecewise-constant in the differentiable
    parameters, so the VJP returns zero cotangents — SURVEY.md §3.4/T9)."""
    return _cluster_impl(mask, rayf, feat, n_clusters, interpret)


def _cluster_fwd(mask, rayf, feat, n_clusters, interpret):
    out = _cluster_impl(mask, rayf, feat, n_clusters, interpret)
    return out, (mask.shape, rayf.shape, feat.shape)


def _cluster_bwd(n_clusters, interpret, res, g):
    m_shape, r_shape, f_shape = res
    return (
        np.zeros(m_shape, jax.dtypes.float0),  # int input -> float0
        jnp.zeros(r_shape, jnp.float32),
        jnp.zeros(f_shape, jnp.float32),
    )


_cluster_pallas.defvjp(_cluster_fwd, _cluster_bwd)


@functools.partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def _cluster_impl(mask, rayf, feat, n_clusters, interpret):
    R = rayf.shape[1]
    block = min(R, RAY_BLOCK)
    assert R % block == 0, (R, block)
    grid = (R // block,)
    kernel = functools.partial(_cluster_kernel, n_clusters=n_clusters)
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, mask.shape[1]), lambda i: (i // 8, 0),
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
    )(mask, rayf, feat)
    return t_out[0], idx_out[0]


def _ray_features(o, d):
    """(R, 3) origins/directions -> planar (16, R) ray feature rows."""
    R = o.shape[0]
    oxd = jnp.cross(o, d)
    rows = jnp.concatenate(
        [d.T, oxd.T, o.T, jnp.ones((1, R), jnp.float32),
         jnp.zeros((FEAT_ROWS - 10, R), jnp.float32)],
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


def cull_mask(cl_lo, cl_hi, o, d, block: int = RAY_BLOCK):
    """Conservative (n_blocks, C) i32 mask: 0 => no ray in block i can hit
    cluster c. Interval-arithmetic slab test over the block's origin box
    and inverse-direction range — pure dense jnp, the 'coarse BVH' of the
    two-phase intersector."""
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
    hit = tfar_hi >= jnp.maximum(tnear_lo, C.T_MIN)
    return hit.astype(jnp.int32)


def closest_hit_cluster(geom, o, d, interpret: bool | None = None,
                        use_cull: bool = True):
    """Drop-in closest hit via the dense cluster kernel.

    Same contract as engine/intersect.py:brute / accel/traverse.py:
    (t, n_geom, mat) with t == T_FAR on miss. Requires cluster tables on
    the Geometry (accel/clusters.py:with_clusters). Sphere primitives are
    merged via the brute sphere path (spheres are few).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_clusters = geom.cl_lo.shape[0]
    assert n_clusters > 0, "no cluster tables: call with_clusters(scene)"
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R0 = o.shape[0]
    block = RAY_BLOCK
    # Pad to 8 whole blocks so the SMEM mask window is (8, C)-aligned.
    pad = (-R0) % (8 * block)
    if pad:
        o_p = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d_p = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    else:
        o_p, d_p = o, d

    rayf = _ray_features(o_p, d_p)
    if use_cull:
        mask = cull_mask(jnp.asarray(geom.cl_lo), jnp.asarray(geom.cl_hi),
                         o_p, d_p, block)
    else:
        mask = jnp.ones((o_p.shape[0] // block, n_clusters), jnp.int32)
    t_best, slot = _cluster_pallas(mask, rayf, jnp.asarray(geom.cl_feat),
                                   n_clusters, interpret)
    t_best = t_best[:R0]
    slot = slot[:R0]

    hit = slot >= 0
    best = jnp.where(hit, geom.cl_map[jnp.maximum(slot, 0)], -1)
    hit = best >= 0  # padding slots never win (det == 0), but be safe
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
