"""Large-scene backend auto-routing (VERDICT r3 items 4/5).

backend="cluster" on a scene whose dense cluster table overflows VMEM
must land on the per-ray DDA grid path (25x the streaming kernel on the
2M-triangle scene, PROFILE.md r3), not silently on the stream kernel.
The VMEM boundary is simulated by shrinking the budget constant — the
routing logic is what's under test, not a 2M-triangle build.
"""

import numpy as np
import pytest

from pathtracer_tpu.accel.auto import prepare_accel
from pathtracer_tpu.accel.build import with_bvh
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.engine import wavefront
from pathtracer_tpu.scene import builder


def _cfg(**kw):
    base = dict(width=16, height=16, spp=1, max_depth=2,
                scene="cornell_mesh", use_bvh=True, backend="cluster")
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def mesh_scene():
    return with_bvh(builder.cornell_mesh())


def test_small_scene_stays_on_cluster(mesh_scene):
    cfg = _cfg()
    scene = prepare_accel(mesh_scene, cfg)
    assert scene.geometry.cl_lo.shape[0] > 0
    assert scene.geometry.gr_cell_start.shape[0] <= 1  # no grid tables
    hit = wavefront._intersector(scene.geometry, cfg)
    assert hit.impl == "cluster"


def test_overflow_scene_routes_to_grid(mesh_scene, monkeypatch):
    from pathtracer_tpu.ops import intersect_cluster as ic

    # Simulate a table too big for VMEM: every cluster count overflows.
    monkeypatch.setattr(ic, "_VMEM_FEAT_BYTES", 0)
    cfg = _cfg()
    scene = prepare_accel(mesh_scene, cfg)
    # prepare_accel built GRID tables for the default backend...
    assert scene.geometry.gr_cell_start.shape[0] > 1
    # ...and the engine routes the cluster backend onto the grid path.
    hit = wavefront._intersector(scene.geometry, cfg)
    assert hit.impl == "grid"


def test_overflow_without_grid_tables_warns_and_streams(mesh_scene,
                                                        monkeypatch):
    from pathtracer_tpu.accel.clusters import with_clusters
    from pathtracer_tpu.ops import intersect_cluster as ic

    scene = with_clusters(mesh_scene)  # cluster tables, no grid tables
    monkeypatch.setattr(ic, "_VMEM_FEAT_BYTES", 0)
    cfg = _cfg()
    with pytest.warns(UserWarning, match="falling back"):
        hit = wavefront._intersector(scene.geometry, cfg)
    assert hit.impl == "stream"


def test_routed_render_equals_explicit_grid(mesh_scene, monkeypatch):
    """The auto-routed render is the grid render, bit for bit."""
    from pathtracer_tpu.ops import intersect_cluster as ic

    grid_scene = prepare_accel(mesh_scene, _cfg(backend="grid"))
    explicit = np.asarray(
        wavefront.render(grid_scene, _cfg(backend="grid"))
    )
    monkeypatch.setattr(ic, "_VMEM_FEAT_BYTES", 0)
    routed_scene = prepare_accel(mesh_scene, _cfg())
    routed = np.asarray(wavefront.render(routed_scene, _cfg()))
    np.testing.assert_array_equal(routed, explicit)


def test_grid_backend_without_tables_warns(mesh_scene):
    """backend="grid" with no grid tables must warn, not silently
    degrade to the BVH/brute walk (VERDICT r4 weak 4)."""
    cfg = _cfg(backend="grid")
    with pytest.warns(UserWarning, match="no grid tables"):
        hit = wavefront._intersector(mesh_scene.geometry, cfg)
    assert hit.impl in ("bvh", "brute")  # fallback still renders
