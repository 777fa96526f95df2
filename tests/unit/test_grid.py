"""Uniform-grid DDA intersector tests (accel/grid.py +
ops/intersect_grid.py), Pallas interpret mode on CPU.

The grid path is the round-3 large-scene hot path: per-ray traversal
order and per-ray termination from dense lockstep math (module
docstrings). Contract: identical hit set to engine/intersect.py:brute
(t to bf16 hi/lo matmul tolerance, same as the cluster kernels); the
per-lane early exit and the triangle cell-duplication must never lose
a hit, for any grid resolution, ray distribution, or per-ray t_max.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_tpu import constants as C
from pathtracer_tpu.accel.grid import (
    build_grid,
    check_grid_invariants,
    with_grid,
)
from pathtracer_tpu.engine import intersect as isect
from pathtracer_tpu.ops.intersect_grid import (
    closest_hit_grid,
    dda_cells,
    grid_axis,
)
from pathtracer_tpu.scene import builder


@pytest.fixture(scope="module")
def mesh_scene():
    return with_grid(builder.cornell_mesh(), axis=8)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 0.9 + 0.05).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _tri_bounds(g):
    v0 = np.asarray(g.tri_v0)
    p1 = v0 + np.asarray(g.tri_e1)
    p2 = v0 + np.asarray(g.tri_e2)
    return (np.minimum(np.minimum(v0, p1), p2),
            np.maximum(np.maximum(v0, p1), p2))


def test_grid_invariants(mesh_scene):
    g = mesh_scene.geometry
    tri_lo, tri_hi = _tri_bounds(g)
    gs = build_grid(np.asarray(g.tri_v0), np.asarray(g.tri_e1),
                    np.asarray(g.tri_e2), axis=8)
    check_grid_invariants(gs, tri_lo, tri_hi)


def test_grid_matches_brute(mesh_scene):
    g = mesh_scene.geometry
    o, d = _random_rays(1500)
    t_b, n_b, m_b = isect.brute(g, o, d)
    t_g, n_g, m_g = closest_hit_grid(g, o, d, interpret=True)
    t_b, t_g = np.asarray(t_b), np.asarray(t_g)
    hit_b = t_b < C.T_FAR * 0.5
    hit_g = t_g < C.T_FAR * 0.5
    np.testing.assert_array_equal(hit_b, hit_g)
    err = np.abs(t_g[hit_b] - t_b[hit_b])
    assert np.quantile(err, 0.99) < 2e-5, np.quantile(err, 0.99)
    np.testing.assert_allclose(t_g[hit_b], t_b[hit_b], rtol=4e-3,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(m_g)[hit_b],
                                  np.asarray(m_b)[hit_b])
    close_n = np.abs(np.asarray(n_g) - np.asarray(n_b)).max(-1) < 1e-4
    assert close_n[hit_b].mean() > 0.999


@pytest.mark.parametrize("axis", [2, 4, 16])
def test_grid_resolution_never_changes_results(axis):
    """Any grid resolution gives the same hit set (coverage is exact at
    every granularity; only performance differs)."""
    scene = with_grid(builder.cornell_mesh(), axis=axis)
    g = scene.geometry
    o, d = _random_rays(768, seed=axis)
    t_b, _, m_b = isect.brute(g, o, d)
    t_g, _, m_g = closest_hit_grid(g, o, d, interpret=True)
    t_b, t_g = np.asarray(t_b), np.asarray(t_g)
    hit = t_b < C.T_FAR * 0.5
    np.testing.assert_array_equal(hit, t_g < C.T_FAR * 0.5)
    np.testing.assert_allclose(t_g[hit], t_b[hit], rtol=4e-3, atol=2e-4)
    assert (np.asarray(m_g) == np.asarray(m_b))[hit].all()


def test_grid_shadow_tmax_contract(mesh_scene):
    """Per-ray t_max: hits strictly nearer always found; the dead-lane
    canonicalization (t_max == T_MIN) yields guaranteed misses."""
    g = mesh_scene.geometry
    o, d = _random_rays(1024, seed=7)
    t_ref, _, _ = isect.brute(g, o, d)
    t_ref = np.asarray(t_ref)
    rng = np.random.default_rng(3)
    t_max = np.where(
        rng.random(len(o)) < 0.4,
        t_ref * (1.0 + rng.random(len(o))),
        np.float32(C.T_FAR),
    ).astype(np.float32)
    dead = rng.random(len(o)) < 0.1
    t_max[dead] = C.T_MIN
    t_g, _, _ = closest_hit_grid(g, o, d, interpret=True, t_max=t_max)
    t_g = np.asarray(t_g)
    assert (t_g[dead] >= C.T_FAR * 0.5).all(), "dead lanes must miss"
    near = ~dead & (t_ref < C.T_FAR * 0.5) & (t_ref < t_max * 0.999)
    np.testing.assert_allclose(t_g[near], t_ref[near], rtol=4e-3,
                               atol=2e-4)


def test_dda_covers_brute_hit_cells(mesh_scene):
    """The DDA path of every hitting ray contains the cell of its brute
    hit point (the coverage half of the exactness argument)."""
    from pathtracer_tpu.accel.grid import morton3_np

    g = mesh_scene.geometry
    axis = grid_axis(g)
    bits = max(1, int(axis - 1).bit_length())
    o, d = _random_rays(512, seed=11)
    t_b, _, _ = isect.brute(g, o, d)
    t_b = np.asarray(t_b)
    cells, entry = dda_cells(
        jnp.asarray(o), jnp.asarray(d),
        jnp.full((len(o),), C.T_FAR, jnp.float32),
        jnp.asarray(g.gr_lo), jnp.asarray(g.gr_cell), axis,
    )
    cells = np.asarray(cells)
    entry = np.asarray(entry)
    lo = np.asarray(g.gr_lo)
    cell = np.asarray(g.gr_cell)
    hit = np.nonzero(t_b < C.T_FAR * 0.5)[0]
    for i in hit:
        p = o[i] + t_b[i] * d[i]
        cc = np.clip(np.floor((p - lo) / cell).astype(np.int64), 0,
                     axis - 1)
        m = int(morton3_np(cc[0], cc[1], cc[2], bits))
        path = cells[:, i]
        assert m in set(path[path >= 0].tolist()), (i, m, path)
    # Entries are nondecreasing along every ray (early-exit soundness);
    # invalid steps are a +INF sentinel and only ever follow valid ones.
    valid = entry < 1e37
    de = np.diff(entry, axis=0)
    both = valid[:-1] & valid[1:]
    assert (de[both] >= -1e-6).all()
    assert not (valid[1:] & ~valid[:-1]).any(), "invalid must be a suffix"


def test_grid_all_miss_rays(mesh_scene):
    """Era-ladder worst case: rays that cross the grid but hit nothing
    walk their full cell lists through multiple eras — all must report
    clean misses (t == T_FAR, idx-derived fields zeroed)."""
    g = mesh_scene.geometry
    rng = np.random.default_rng(13)
    # Rays skimming above the ceiling: inside the grid box's inflated
    # bounds for part of their length, but hitting no geometry.
    o = np.stack([
        rng.random(512) * 0.8 + 0.1,
        np.full(512, 2.0),
        rng.random(512) * 0.8 + 0.1,
    ], -1).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d[:, 1] = np.abs(d[:, 1])  # upward: away from the box
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_g, n_g, m_g = closest_hit_grid(g, o, d, interpret=True)
    assert (np.asarray(t_g) >= C.T_FAR * 0.5).all()
    assert (np.asarray(n_g) == 0.0).all()
    # Mixed batch: misses + interior hits in one call (multi-era path).
    o2, d2 = _random_rays(512, seed=14)
    om = np.concatenate([o, o2]).astype(np.float32)
    dm = np.concatenate([d, d2]).astype(np.float32)
    t_b, _, m_b = isect.brute(g, om, dm)
    t_m, _, m_m = closest_hit_grid(g, om, dm, interpret=True)
    t_b, t_m = np.asarray(t_b), np.asarray(t_m)
    hit = t_b < C.T_FAR * 0.5
    np.testing.assert_array_equal(hit, t_m < C.T_FAR * 0.5)
    np.testing.assert_allclose(t_m[hit], t_b[hit], rtol=4e-3, atol=2e-4)


def test_grid_backend_gradients(mesh_scene):
    """Reverse-mode grads flow through the grid backend (the
    _pair_pallas custom_vjp detach boundary): albedo grads finite and
    nonzero, matching the jnp backend's grads."""
    import jax

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.engine import wavefront

    cfg = RenderConfig(width=24, height=24, spp=1, max_depth=2,
                       scene="cornell_mesh", backend="grid")

    def loss(mats, backend):
        img = wavefront.render(mesh_scene, cfg.replace(backend=backend),
                               materials=mats)
        return jnp.mean(img ** 2)

    g_grid = jax.grad(loss)(mesh_scene.materials, "grid")
    g_jnp = jax.grad(loss)(mesh_scene.materials, "jnp")
    ga = np.asarray(g_grid.albedo)
    assert np.isfinite(ga).all() and (np.abs(ga) > 0).any()
    # Tie-broken grazing pixels can differ; grads must agree closely.
    np.testing.assert_allclose(ga, np.asarray(g_jnp.albedo), rtol=0.05,
                               atol=1e-4)


def test_grid_spheres_merge():
    scene = with_grid(builder.cornell_spheres(), axis=4)
    g = scene.geometry
    o, d = _random_rays(512, seed=5)
    t_b, _, m_b = isect.brute(g, o, d)
    t_g, _, m_g = closest_hit_grid(g, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(t_g), np.asarray(t_b),
                               rtol=4e-3, atol=2e-4)
    assert (np.asarray(m_b) == np.asarray(m_g)).mean() > 0.999


def test_grid_in_engine_matches_jnp_backend():
    """Full engine render with backend='grid' == backend='jnp'.

    max_depth=5 so bounces >= 3 run with the engine's sparse_hint
    (ladder-only grid mode) — the late-bounce fast path is exercised
    end-to-end, not just by the unit-level width-knob test."""
    from pathtracer_tpu.accel.build import with_bvh
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.engine import wavefront

    scene = with_grid(with_bvh(builder.cornell_mesh()), axis=8)
    cfg = RenderConfig(width=48, height=48, spp=1, max_depth=5,
                       scene="cornell_mesh", backend="jnp")
    img_j = np.asarray(wavefront.render(scene, cfg))
    img_g = np.asarray(
        wavefront.render(scene, cfg.replace(backend="grid"))
    )
    # Tie-broken grazing hits may pick a different equal-t triangle and
    # flip a whole path; allow the same small pixel tail as the other
    # kernel-backend equivalence tests.
    bad = np.abs(img_g - img_j) > 2e-3 + 2e-3 * np.abs(img_j)
    assert bad.any(-1).mean() < 0.002, bad.any(-1).mean()


@pytest.mark.parametrize("w0,we", [(1, 1), (2, 5), (7, 3), (0, 4)])
def test_grid_width_knobs_never_change_results(mesh_scene, w0, we):
    """first_steps / era_steps are pure performance knobs (round-4 era
    ladder: DDA-recompute windows + multi-level compaction). Tiny
    widths force many eras and the deeper ladder levels; first_steps=0
    is the ladder-ONLY mode (no full-R stage A — the engine selects it
    for sparse late bounces). Results must equal the default-width walk
    bit-for-bit (same kernel arithmetic, same retirement contract)."""
    g = mesh_scene.geometry
    o, d = _random_rays(1024, seed=11)
    t_0, n_0, m_0 = closest_hit_grid(g, o, d, interpret=True)
    t_1, n_1, m_1 = closest_hit_grid(g, o, d, interpret=True,
                                     first_steps=w0, era_steps=we)
    np.testing.assert_array_equal(np.asarray(t_0), np.asarray(t_1))
    np.testing.assert_array_equal(np.asarray(m_0), np.asarray(m_1))
    np.testing.assert_array_equal(np.asarray(n_0), np.asarray(n_1))


def test_grid_wide_pair_blocks_match_brute():
    """Coarse grids put >512 pairs in each cell, engaging the adaptive
    wide pair-kernel block (PB=1024, the deployed _PAIR_BLOCK_LADDER):
    one DMA + candidate walk serves the whole block. Exactness must be
    unchanged. Stage A: P = 4096*4 pairs over 8 cells, target >= 1024
    and P %% (8*1024) == 0 -> PB=1024; eras: P = 2048*4 = 8192,
    target 1024, 8192 %% 8192 == 0 -> PB=1024. Both instantiations
    run wide (asserted below, so a ladder change can't silently
    devolve this test to 512-wide coverage)."""
    scene = with_grid(builder.cornell_mesh(), axis=2)  # 8 cells
    g = scene.geometry
    o, d = _random_rays(1024, seed=3)
    t_b, _, m_b = isect.brute(g, o, d)
    from pathtracer_tpu.ops import intersect_grid as ig
    assert 1024 in ig._PAIR_BLOCK_LADDER
    t_g, _, m_g = closest_hit_grid(g, o, d, interpret=True,
                                   first_steps=4, era_steps=4)
    t_b, t_g = np.asarray(t_b), np.asarray(t_g)
    hit = t_b < C.T_FAR * 0.5
    np.testing.assert_array_equal(hit, t_g < C.T_FAR * 0.5)
    np.testing.assert_allclose(t_g[hit], t_b[hit], rtol=4e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(m_g)[hit],
                                  np.asarray(m_b)[hit])


def test_grid_occupied_windows_and_ladder_never_change_results(mesh_scene):
    """Occupied-cell windowing (round 5) and the ladder-capacity knob
    are pure performance toggles: phases cover the next W OCCUPIED
    cells (empty cells hold no triangles, so skipping them cannot drop
    a hit) and era capacity only changes how many rays each era
    continues. Both settings must reproduce the default walk
    bit-for-bit. The auto-gate keys on the static clusters/cell ratio,
    so force BOTH settings explicitly here."""
    g = mesh_scene.geometry
    o, d = _random_rays(1024, seed=13)
    t_0, n_0, m_0 = closest_hit_grid(g, o, d, interpret=True,
                                     occupied_windows=False)
    t_1, n_1, m_1 = closest_hit_grid(g, o, d, interpret=True,
                                     occupied_windows=True)
    t_2, n_2, m_2 = closest_hit_grid(g, o, d, interpret=True,
                                     occupied_windows=True,
                                     ladder=(2, 8), first_steps=2)
    for t_x, n_x, m_x in ((t_1, n_1, m_1), (t_2, n_2, m_2)):
        np.testing.assert_array_equal(np.asarray(t_0), np.asarray(t_x))
        np.testing.assert_array_equal(np.asarray(m_0), np.asarray(m_x))
        np.testing.assert_array_equal(np.asarray(n_0), np.asarray(n_x))
