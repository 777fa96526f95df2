"""Closest-hit intersection, pure-jnp paths.

Mirrors oracle/tracer.py intersection math (Möller–Trumbore + analytic
spheres; the reference's R2/R3, SURVEY.md §2.1) in vectorized jnp. Two
strategies are exposed behind one interface:

  * brute(geom, o, d)     — all rays × all primitives; O(R·T) memory/work,
                            right for the analytic config-1 scene and as
                            the correctness anchor for traversal tests.
  * (accel/traverse.py)   — stackless BVH traversal, same return contract.

Return contract (shared with the oracle): (t, n_geom, mat) where
t == T_FAR means miss and n_geom/mat are then arbitrary-but-valid.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C


def intersect_tris_brute(o, d, v0, e1, e2):
    """Möller–Trumbore over every (ray, triangle) pair → t (R, T)."""
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])  # (R,T,3)
    det = jnp.sum(e1[None, :, :] * pvec, -1)
    safe = jnp.where(det == 0, 1.0, det)
    inv = jnp.where(jnp.abs(det) > C.DET_EPS, 1.0 / safe, 0.0)
    tvec = o[:, None, :] - v0[None, :, :]
    uu = jnp.sum(tvec * pvec, -1) * inv
    qvec = jnp.cross(tvec, e1[None, :, :])
    vv = jnp.sum(d[:, None, :] * qvec, -1) * inv
    t = jnp.sum(e2[None, :, :] * qvec, -1) * inv
    ok = (
        (jnp.abs(det) > C.DET_EPS)
        & (uu >= 0.0)
        & (vv >= 0.0)
        & (uu + vv <= 1.0)
        & (t > C.T_MIN)
        & (t < C.T_FAR)
    )
    return jnp.where(ok, t, C.T_FAR)


def intersect_spheres(o, d, c, r):
    """Analytic sphere hits → t (R, S)."""
    oc = o[:, None, :] - c[None, :, :]
    b = jnp.sum(oc * d[:, None, :], -1)
    c0 = jnp.sum(oc * oc, -1) - (r**2)[None, :]
    disc = b * b - c0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > C.T_MIN, t0, t1)
    ok = (disc > 0.0) & (t > C.T_MIN) & (t < C.T_FAR)
    return jnp.where(ok, t, C.T_FAR)


def brute(geom, o, d):
    """Closest hit over all triangles + spheres. Shapes are static, so the
    presence of each primitive class is resolved at trace time."""
    R = o.shape[0]
    t_best = jnp.full((R,), C.T_FAR, jnp.float32)
    n_best = jnp.zeros((R, 3), jnp.float32)
    m_best = jnp.zeros((R,), jnp.int32)
    if geom.tri_v0.shape[0] > 0:
        tt = intersect_tris_brute(o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2)
        ti = jnp.argmin(tt, axis=1)
        tv = jnp.take_along_axis(tt, ti[:, None], axis=1)[:, 0]
        better = tv < t_best
        t_best = jnp.where(better, tv, t_best)
        n_best = jnp.where(better[:, None], geom.tri_n[ti], n_best)
        m_best = jnp.where(better, geom.tri_mat[ti], m_best)
    if geom.sph_c.shape[0] > 0:
        ts = intersect_spheres(o, d, geom.sph_c, geom.sph_r)
        si = jnp.argmin(ts, axis=1)
        sv = jnp.take_along_axis(ts, si[:, None], axis=1)[:, 0]
        better = sv < t_best
        p = o + sv[:, None] * d
        ns = (p - geom.sph_c[si]) / geom.sph_r[si][:, None]
        t_best = jnp.where(better, sv, t_best)
        n_best = jnp.where(better[:, None], ns, n_best)
        m_best = jnp.where(better, geom.sph_mat[si], m_best)
    return t_best, n_best, m_best
