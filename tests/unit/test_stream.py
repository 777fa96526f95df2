"""HBM-streaming cluster intersector tests (ops/intersect_stream.py),
Pallas interpret mode on CPU.

Contract: identical hit set to engine/intersect.py:brute (same multiply-
form predicate as the dense cluster kernel), for scenes of any size —
exactness comes from the wrapper's lax.while_loop over K-candidate
ROUNDS with a per-block resolution test (worst case ceil(C/K) rounds ==
visiting every culled cluster; no fallback path). These tests exercise
small round windows explicitly so multi-round resolution is covered.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_tpu import constants as C
from pathtracer_tpu.accel.build import with_bvh
from pathtracer_tpu.accel.clusters import CLUSTER_TRIS, with_clusters
from pathtracer_tpu.engine import intersect as isect
from pathtracer_tpu.ops.intersect_cluster import cull_candidates
from pathtracer_tpu.ops.intersect_stream import closest_hit_stream
from pathtracer_tpu.scene import builder


@pytest.fixture(scope="module")
def mesh_scene():
    return with_clusters(with_bvh(builder.cornell_mesh()))


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 0.9 + 0.05).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_stream_matches_brute(mesh_scene):
    g = mesh_scene.geometry
    o, d = _random_rays(1500)
    t_b, n_b, m_b = isect.brute(g, o, d)
    t_s, n_s, m_s = closest_hit_stream(g, o, d, interpret=True)
    t_b, t_s = np.asarray(t_b), np.asarray(t_s)
    hit_b = t_b < C.T_FAR * 0.5
    hit_s = t_s < C.T_FAR * 0.5
    np.testing.assert_array_equal(hit_b, hit_s)
    # Same bf16 hi/lo matmul tolerance rationale as test_cluster.py.
    np.testing.assert_allclose(t_s[hit_b], t_b[hit_b], rtol=4e-3,
                               atol=2e-4)
    assert (np.asarray(m_b) == np.asarray(m_s)).mean() > 0.999
    close_n = np.abs(np.asarray(n_b) - np.asarray(n_s)).max(-1) < 1e-4
    assert close_n[hit_b].mean() > 0.999


def test_stream_matches_dense(mesh_scene):
    """Streaming and dense kernels implement the same predicate — on a
    VMEM-sized scene their outputs must agree exactly on hits/materials
    (both run the identical matmul/epilogue; only data movement differs)."""
    from pathtracer_tpu.ops.intersect_cluster import closest_hit_cluster

    g = mesh_scene.geometry
    o, d = _random_rays(1024, seed=11)
    t_c, _, m_c = closest_hit_cluster(g, o, d, interpret=True)
    t_s, _, m_s = closest_hit_stream(g, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_c))


def test_cull_candidates_complete(mesh_scene):
    """Every cluster the dense cull keeps must appear in the candidate
    list (no overflow at default cap), ordered near-first."""
    from pathtracer_tpu.ops.intersect_cluster import cull_mask

    g = mesh_scene.geometry
    o, d = _random_rays(512, seed=5)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    lo, hi = jnp.asarray(g.cl_lo), jnp.asarray(g.cl_hi)
    mask = np.asarray(cull_mask(lo, hi, o_j, d_j, block=512))
    cand, count, tnear, overflow = cull_candidates(
        lo, hi, o_j, d_j, block=512, max_cand=256
    )
    cand, count, tnear = map(np.asarray, (cand, count, tnear))
    assert not bool(overflow)
    assert count[0] == mask[0].sum()
    kept = set(cand[0][cand[0] >= 0].tolist())
    assert kept == set(np.nonzero(mask[0])[0].tolist())
    # Near-first ordering: tnear rows are non-decreasing over valid slots.
    valid = cand[0] >= 0
    tv = tnear[0][valid]
    assert (np.diff(tv) >= -1e-6).all()


def test_small_round_window_is_exact(mesh_scene):
    """A round window far smaller than the candidate lists must not
    change any result — the round loop keeps walking until every block
    resolves (module docstring: the exactness mechanism). max_cand=8 on
    a 64-cluster scene forces up to 8 rounds per call."""
    g = mesh_scene.geometry
    o, d = _random_rays(768, seed=9)
    t_ref, _, m_ref = closest_hit_stream(g, o, d, interpret=True)
    t_8, _, m_8 = closest_hit_stream(g, o, d, interpret=True, max_cand=8)
    np.testing.assert_allclose(np.asarray(t_8), np.asarray(t_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_8), np.asarray(m_ref))


def test_spheres_merge_stream():
    scene = with_clusters(with_bvh(builder.cornell_spheres()))
    g = scene.geometry
    o, d = _random_rays(512, seed=7)
    t_b, _, m_b = isect.brute(g, o, d)
    t_s, _, m_s = closest_hit_stream(g, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_b),
                               rtol=4e-3, atol=2e-4)
    assert (np.asarray(m_b) == np.asarray(m_s)).mean() > 0.999


def test_stream_in_engine_when_vmem_overflows(mesh_scene, monkeypatch):
    """Engine picks the streaming path when fits_vmem says no, and the
    image matches the jnp backend."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.engine import wavefront
    from pathtracer_tpu.ops import intersect_cluster

    cfg = RenderConfig(width=48, height=48, spp=1, max_depth=2,
                       scene="cornell_mesh", backend="jnp")
    img_j = np.asarray(wavefront.render(mesh_scene, cfg))
    monkeypatch.setattr(intersect_cluster, "fits_vmem", lambda n: False)
    img_s = np.asarray(
        wavefront.render(mesh_scene, cfg.replace(backend="cluster"))
    )
    # Near-first visit order can tie-break grazing hits onto a different
    # (equal-t) triangle than the jnp walk; a changed hit flips the whole
    # downstream path for that pixel. Allow a <0.2% pixel tail.
    bad = np.abs(img_s - img_j) > 2e-3 + 2e-3 * np.abs(img_j)
    assert bad.any(-1).mean() < 0.002, bad.any(-1).mean()
