"""Backend-aware acceleration-table preparation (one source of truth).

Builds the host-side tables a RenderConfig's backend needs, and routes
LARGE scenes to the measured-fastest path automatically: a scene whose
dense cluster table cannot fit VMEM used to fall through to the
HBM-streaming kernel, which is 25x slower than the per-ray DDA grid on
the 2M-triangle config-5 scene (21k vs 528k rays/s, PROFILE.md r3 /
bench_metrics.jsonl). Users who just say backend="cluster" (the
default) now get grid tables — and engine/wavefront.py:_intersector
routes them to the grid kernel — instead of silently landing on the
known-slow path (VERDICT r3 items 4/5).

Measured crossover (TPU v5e; r5 rows of bench_metrics.jsonl /
BASELINE.md — the per-round source of truth for current numbers):

  | scene        | tris | cluster | stream | grid   |
  |--------------|------|---------|--------|--------|
  | cornell_mesh | ~5k  | 20.3M   |   —    | ~1.4M  |
  | big_mesh     | 2M   | (VMEM)  | 21.2k  | 1.06M  |

The dense cluster kernel wins whenever its table fits VMEM (~<=213
clusters / ~27k triangles with the 48-row stacked-bf16 table at 96
bytes/column, intersect_cluster.fits_vmem); beyond that the grid wins
by over an order of magnitude. That boundary IS the routing rule — no
tuning knob needed between the regimes.
"""

from __future__ import annotations

from ..config import RenderConfig
from ..scene.model import Scene
from .clusters import CLUSTER_TRIS


def prepare_accel(scene: Scene, cfg: RenderConfig,
                  grid_axis: int | None = None) -> Scene:
    """Attach the accel tables `cfg.backend` needs (host-side numpy).

    backend="cluster": dense cluster tables when they fit VMEM, else
        grid tables (the auto-route above). The engine's _intersector
        applies the same rule at trace time, so scene and engine agree.
    backend="stream": cluster tables (explicit streaming selection).
    backend="grid":   uniform-grid tables (grid_axis overrides the
        pick_axis heuristic).
    backend="jnp"/"pallas": BVH only (handled by cfg.use_bvh upstream).
    """
    g = scene.geometry
    n_tris = int(g.tri_v0.shape[0])
    if cfg.backend == "grid":
        from .grid import with_grid

        return with_grid(scene, axis=grid_axis)
    if cfg.backend == "stream":
        from .clusters import with_clusters

        return with_clusters(scene)
    if cfg.backend == "cluster":
        from ..ops.intersect_cluster import fits_vmem
        from .clusters import with_clusters

        # ceil(T/128) is a LOWER bound on the cluster count, so a
        # failing estimate is definitive — skip the cluster build.
        if not fits_vmem(-(-n_tris // CLUSTER_TRIS)):
            from .grid import with_grid

            return with_grid(scene, axis=grid_axis)
        scene = with_clusters(scene)
        if not fits_vmem(int(scene.geometry.cl_lo.shape[0])):
            from .grid import with_grid

            return with_grid(scene, axis=grid_axis)
        return scene
    return scene
