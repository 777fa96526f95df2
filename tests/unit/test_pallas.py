"""Pallas traversal kernel vs jnp traversal vs brute (SURVEY.md §4.2).

On the CPU test backend the kernel runs in interpreter mode (which also
catches OOB indexing, SURVEY.md §5.2); the same assertions run compiled on
real TPU via scripts/tpu_checks.py.
"""

import numpy as np
import pytest

from pathtracer_tpu.accel.build import with_bvh
from pathtracer_tpu.accel.traverse import closest_hit
from pathtracer_tpu.engine import intersect as isect
from pathtracer_tpu.ops.traverse_pallas import closest_hit_pallas
from pathtracer_tpu.scene import builder


@pytest.fixture(scope="module")
def mesh_scene():
    return with_bvh(builder.cornell_mesh(mesh_tris=builder.procedural_bunny(2)))


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.random((n, 3)).astype(np.float32) * 0.9 + 0.05
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_pallas_equals_jnp_traversal(mesh_scene):
    g = mesh_scene.geometry
    o, d = _random_rays(512)
    t_j, n_j, m_j = closest_hit(g, o, d)
    t_p, n_p, m_p = closest_hit_pallas(g, o, d)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_j))
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_j), atol=1e-5)


def test_pallas_equals_brute(mesh_scene):
    g = mesh_scene.geometry
    o, d = _random_rays(256, seed=3)
    t_b, _, m_b = isect.brute(g, o, d)
    t_p, _, m_p = closest_hit_pallas(g, o, d)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_b))


def test_pallas_non_multiple_batch(mesh_scene):
    g = mesh_scene.geometry
    o, d = _random_rays(173, seed=4)  # odd size → padding path
    t_j, _, m_j = closest_hit(g, o, d)
    t_p, _, m_p = closest_hit_pallas(g, o, d)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_j), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_j))


def test_pallas_with_spheres():
    scene = with_bvh(builder.cornell_spheres())
    g = scene.geometry
    o, d = _random_rays(256, seed=5)
    t_b, _, m_b = isect.brute(g, o, d)
    t_p, _, m_p = closest_hit_pallas(g, o, d)
    np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_b))


def test_pallas_engine_render_matches_jnp(mesh_scene):
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.engine import wavefront

    cfg = RenderConfig(
        width=24, height=24, spp=1, max_depth=2, scene="cornell_mesh",
        use_bvh=True, backend="jnp",
    )
    img_j = np.asarray(wavefront.render(mesh_scene, cfg))
    img_p = np.asarray(
        wavefront.render(mesh_scene, cfg.replace(backend="pallas"))
    )
    np.testing.assert_allclose(img_p, img_j, atol=1e-5)


def test_grad_flows_through_pallas_backend(mesh_scene):
    """jax.grad through a render whose intersector is the Pallas kernel:
    the custom_vjp boundary returns zero cotangents for traversal while
    material grads flow through the shading chain."""
    import jax
    import jax.numpy as jnp
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.engine.wavefront import trace_sample

    cfg = RenderConfig(
        width=16, height=16, spp=1, max_depth=2, scene="cornell_mesh",
        use_bvh=True, backend="pallas",
    )

    def f(mats):
        ids = jnp.arange(cfg.n_pixels, dtype=jnp.uint32)
        out = trace_sample(
            mesh_scene.geometry, mats, mesh_scene.camera,
            mesh_scene.lights, cfg, ids, jnp.uint32(0),
        )
        return jnp.mean(out)

    grads = jax.grad(f)(mesh_scene.materials)
    a = np.asarray(grads.albedo)
    assert np.isfinite(a).all()
    assert np.abs(a).sum() > 0
