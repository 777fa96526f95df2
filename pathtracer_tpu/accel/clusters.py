"""Triangle clustering for the dense MXU intersector (SURVEY.md §1.3-T2).

Round-2 redesign of the hot path. The round-1 microbenchmark
(scripts/microbench_traverse.py, VERDICT.md "What's weak" 3) showed that
every gather-based BVH walk — jnp `lax.while_loop` with per-ray node
gathers, chunked or not — runs 2-4 orders of magnitude below the machine:
TPUs hate data-dependent gathers and long scalar-bounded loops, and love
dense aligned blocks. So instead of translating the reference's per-thread
stack traversal (SURVEY.md §2.1 R2) we re-pose intersection the TPU way:

  1. HOST (this module): partition triangles into clusters of <= 128 by
     recursive median split (same policy as accel/build.py), pad each
     cluster to exactly 128 with degenerate triangles, compute one AABB
     per cluster, and precompute per-triangle *feature columns* such that
     every Möller-Trumbore quantity is a dot product with a shared
     per-ray feature vector (see below) — i.e. intersection becomes a
     matmul.
  2. XLA (ops/intersect_cluster.py): a conservative per-(ray-block,
     cluster) cull mask from interval arithmetic — plain vectorized jnp,
     fused by XLA, no gathers.
  3. PALLAS (ops/intersect_cluster.py): for each ray block, loop clusters
     that survive the cull; each visit is one (RAYS x 16) @ (16 x 512)
     MXU matmul + a short VPU epilogue + a sublane min-reduction. Zero
     gathers, zero dynamic shapes, every load 128-aligned by construction.

Feature algebra (derivation in ops/intersect_cluster.py docstring):
with ray features F = [d, o x d, o, 1, 0...] (16) and per-triangle columns

  det column: [e2 x e1, 0, 0, 0]            -> det   = e1 . (d x e2)
  u   column: [v0 x e2, e2, 0, 0]           -> u_num = tvec . (d x e2)
  v   column: [-(v0 x e1), -e1, 0, 0]       -> v_num = d . (tvec x e1)
  t   column: [0, 0, e1 x e2, -v0 . n]      -> t_num = e2 . (tvec x e1)

so  q = F @ cols  gives (det, u*det, v*det, t*det) for all 128 triangles
of a cluster at once. Degenerate padding triangles have all-zero columns
(det = 0 -> never hit), exactly like the brute-force predicate treats
zero-det triangles.

Unlike accel/build.py:with_bvh, clustering does NOT permute the caller's
triangle arrays: `cl_map` maps padded cluster slots back to original
triangle indices, so lights/materials/goldens are untouched.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..scene.model import Scene

CLUSTER_TRIS = 128  # triangles per padded cluster (one lane tile)
FEAT_ROWS = 16  # ray-feature rows (2 f32 sublane tiles)
QUANTITIES = 4  # det, u_num, v_num, t_num
CLUSTER_COLS = CLUSTER_TRIS * QUANTITIES  # feature columns per cluster
# Stacked bf16 triangle-feature rows: [hi(16); hi(16); lo(16)]. Paired
# with ray rows stacked [hi; lo; hi], ONE K=48 bf16 matmul computes
# hi*hi + hi*lo + lo*hi — the exact three error-split passes the
# kernels used to issue as separate K=16 dots (intersect_cluster.
# split_bf16), with the same dropped ~2^-18 lo*lo term, but one MXU
# issue and no per-visit split. Same bytes/col as the old f32 table
# x1.5; precomputed once at build instead of re-split every visit.
FEAT_STACK = 3 * FEAT_ROWS


def stack_feat(feat32: np.ndarray) -> np.ndarray:
    """(16, N) f32 feature table -> (48, N) bf16 [hi; hi; lo] stack."""
    import ml_dtypes

    hi = feat32.astype(ml_dtypes.bfloat16)
    lo = (feat32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.concatenate([hi, hi, lo], axis=0)


def empty_feat() -> np.ndarray:
    import ml_dtypes

    return np.zeros((FEAT_STACK, 0), ml_dtypes.bfloat16)


@dataclasses.dataclass
class ClusterSet:
    lo: np.ndarray  # (C, 3) f32 cluster AABB min
    hi: np.ndarray  # (C, 3) f32 cluster AABB max
    feat: np.ndarray  # (48, C*512) bf16 stacked feature columns
    tri_map: np.ndarray  # (C*128,) i32 padded slot -> original tri (-1 pad)


def _median_split_clusters(tri_lo, tri_hi, max_tris: int) -> list[np.ndarray]:
    """Partition triangle ids into spatial clusters of <= max_tris.

    Same median-split-on-longest-centroid-axis policy as
    accel/build.py:build_bvh, but terminating at cluster granularity —
    the tree above clusters is implicit (the cull mask replaces it).
    """
    T = len(tri_lo)
    centroid = (tri_lo + tri_hi) * 0.5
    out: list[np.ndarray] = []
    stack = [np.arange(T, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if len(ids) <= max_tris:
            out.append(ids)
            continue
        c = centroid[ids]
        ext = c.max(0) - c.min(0)
        axis = int(np.argmax(ext))
        if ext[axis] <= 0.0:
            mid = len(ids) // 2
            stack.append(ids[mid:])
            stack.append(ids[:mid])
            continue
        part = np.argsort(c[:, axis], kind="stable")
        mid = len(ids) // 2
        stack.append(ids[part[mid:]])
        stack.append(ids[part[:mid]])
    return out


def cluster_tables(groups: list[np.ndarray], v0, e1, e2) -> ClusterSet:
    """Feature-column tables for an EXPLICIT cluster decomposition.

    `groups` is any list of triangle-id arrays, each of length
    <= CLUSTER_TRIS; ids MAY repeat across groups (the uniform-grid
    builder in accel/grid.py duplicates triangles into every cell they
    overlap — duplicate hits are idempotent under the closest-hit min).
    Shared by build_clusters (median-split groups) and the grid builder.
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    p1 = v0 + e1
    p2 = v0 + e2
    tri_lo = np.minimum(np.minimum(v0, p1), p2)
    tri_hi = np.maximum(np.maximum(v0, p1), p2)
    clusters = groups
    C = len(clusters)

    lo = np.empty((C, 3), np.float32)
    hi = np.empty((C, 3), np.float32)
    tri_map = np.full((C * CLUSTER_TRIS,), -1, np.int32)
    # Per-triangle feature pieces (float64 cross products for accuracy,
    # rounded once at the end).
    v0d, e1d, e2d = v0.astype(np.float64), e1.astype(np.float64), \
        e2.astype(np.float64)
    n = np.cross(e1d, e2d)  # e1 x e2
    det_col = np.cross(e2d, e1d)  # = -n
    u_d = np.cross(v0d, e2d)
    v_d = -np.cross(v0d, e1d)
    t_c = -(v0d * n).sum(-1)

    feat = np.zeros((FEAT_ROWS, C * CLUSTER_COLS), np.float32)
    for ci, ids in enumerate(clusters):
        lo[ci] = tri_lo[ids].min(0)
        hi[ci] = tri_hi[ids].max(0)
        k = len(ids)
        assert k <= CLUSTER_TRIS, k
        tri_map[ci * CLUSTER_TRIS: ci * CLUSTER_TRIS + k] = ids
        base = ci * CLUSTER_COLS
        # det block: rows 0:3 <- e2 x e1
        feat[0:3, base: base + k] = det_col[ids].T
        # u block: rows 0:3 <- v0 x e2 ; rows 3:6 <- e2
        ub = base + CLUSTER_TRIS
        feat[0:3, ub: ub + k] = u_d[ids].T
        feat[3:6, ub: ub + k] = e2d[ids].T
        # v block: rows 0:3 <- -(v0 x e1) ; rows 3:6 <- -e1
        vb = base + 2 * CLUSTER_TRIS
        feat[0:3, vb: vb + k] = v_d[ids].T
        feat[3:6, vb: vb + k] = -e1d[ids].T
        # t block: rows 6:9 <- e1 x e2 ; row 9 <- -(v0 . n)
        tb = base + 3 * CLUSTER_TRIS
        feat[6:9, tb: tb + k] = n[ids].T
        feat[9, tb: tb + k] = t_c[ids]
    return ClusterSet(lo=lo, hi=hi, feat=stack_feat(feat),
                      tri_map=tri_map)


def build_clusters(v0, e1, e2, max_tris: int = CLUSTER_TRIS) -> ClusterSet:
    """Cluster triangles (v0, v0+e1, v0+e2) and precompute feature columns."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    if len(v0) == 0:
        return ClusterSet(
            lo=np.zeros((0, 3), np.float32),
            hi=np.zeros((0, 3), np.float32),
            feat=empty_feat(),
            tri_map=np.zeros((0,), np.int32),
        )
    p1 = v0 + e1
    p2 = v0 + e2
    tri_lo = np.minimum(np.minimum(v0, p1), p2)
    tri_hi = np.maximum(np.maximum(v0, p1), p2)
    groups = _median_split_clusters(tri_lo, tri_hi, max_tris)
    return cluster_tables(groups, v0, e1, e2)


SUPER_GROUP = 32  # clusters per super-cluster (<= 4096 triangles)


def build_supers(cl_lo: np.ndarray, cl_hi: np.ndarray,
                 group: int = SUPER_GROUP):
    """Group clusters into super-clusters for the per-ray line cull.

    The round-2 big_mesh failure (PROFILE.md "round-3 analysis"): the
    per-BLOCK interval cull keeps every cluster inside the block's
    origin-direction CONE, but a ray only crosses the clusters on its
    LINE — at 16k clusters the cone holds thousands, the line ~dozens.
    The per-ray fix must stay dense to be TPU-native, so it runs at a
    coarser granularity: clusters are grouped into supers of <= `group`
    by the same median-split policy, every RAY is slab-tested against
    every SUPER box ((R, S) dense — S is ~C/group, small enough to
    afford), and a cluster survives for a ray block only if SOME ray in
    the block crosses its super within that ray's own t bounds
    (ops/intersect_cluster.py:ray_super_mask).

    Returns (su_lo, su_hi, cl_super):
      su_lo/su_hi: (S, 3) f32 super AABBs = union of member cluster
          boxes, inflated by a hair so f32 rounding in the per-ray slab
          test can never exclude a boundary crossing (conservative).
      cl_super: (C,) i32 cluster -> super id.
    """
    C = len(cl_lo)
    if C == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                np.zeros((0,), np.int32))
    groups = _median_split_clusters(cl_lo, cl_hi, group)
    S = len(groups)
    su_lo = np.empty((S, 3), np.float32)
    su_hi = np.empty((S, 3), np.float32)
    cl_super = np.empty((C,), np.int32)
    for si, ids in enumerate(groups):
        lo = cl_lo[ids].min(0)
        hi = cl_hi[ids].max(0)
        pad = 1e-6 * np.maximum(np.abs(lo), np.abs(hi)) + 1e-7
        su_lo[si] = lo - pad
        su_hi[si] = hi + pad
        cl_super[ids] = si
    return su_lo, su_hi, cl_super


def with_clusters(scene: Scene, max_tris: int = CLUSTER_TRIS,
                  super_group: int = SUPER_GROUP) -> Scene:
    """Scene with cluster tables attached to its Geometry (non-permuting)."""
    g = scene.geometry
    cs = build_clusters(
        np.asarray(g.tri_v0), np.asarray(g.tri_e1), np.asarray(g.tri_e2),
        max_tris,
    )
    su_lo, su_hi, cl_super = build_supers(cs.lo, cs.hi, super_group)
    g2 = dataclasses.replace(
        g, cl_lo=cs.lo, cl_hi=cs.hi, cl_feat=cs.feat, cl_map=cs.tri_map,
        su_lo=su_lo, su_hi=su_hi, cl_super=cl_super,
    )
    return dataclasses.replace(scene, geometry=g2)


def check_cluster_invariants(cs: ClusterSet, n_tris: int,
                             max_tris: int = CLUSTER_TRIS) -> None:
    """Structural invariants; raises AssertionError on violation."""
    C = len(cs.lo)
    assert cs.feat.shape == (FEAT_STACK, C * CLUSTER_COLS)
    assert cs.tri_map.shape == (C * CLUSTER_TRIS,)
    real = cs.tri_map[cs.tri_map >= 0]
    assert sorted(real.tolist()) == list(range(n_tris)), (
        "every triangle in exactly one cluster slot"
    )
    per_cluster = (cs.tri_map.reshape(C, CLUSTER_TRIS) >= 0).sum(1)
    assert (per_cluster >= 1).all() and (per_cluster <= max_tris).all()
    assert (cs.lo <= cs.hi).all()
