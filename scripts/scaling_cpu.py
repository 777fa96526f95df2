"""Fake-device scaling row (SURVEY.md §5.5 / VERDICT.md r1 item 5).

Real multi-chip hardware is not attached in this environment (one v5e
via the axon tunnel), so the ≥2-host scaling target (BASELINE.json:5,11)
cannot be wall-clock-measured here. What CAN be validated — and is, in
tests/dist/ — is the sharding maths: sharded render == single-device
render bit-for-bit and sharded grads == single-device grads.

This script records the accompanying §5.5 metrics row from the same
8-virtual-device CPU mesh the tests use: it times the sharded render vs
the single-device render on the SAME CPU, reporting the ratio as
`scaling_eff`. On shared host cores this measures XLA's sharded-program
overhead, not real scaling (the 8 "devices" compete for the same
silicon) — the row is labeled device="cpu-8-virtual" so nobody mistakes
it for an ICI measurement. Run: python scripts/scaling_cpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pathtracer_tpu.utils.cache import enable

    enable()
    import jax.numpy as jnp  # noqa: F401

    from pathtracer_tpu.accel.build import with_bvh
    from pathtracer_tpu.config import PRESETS
    from pathtracer_tpu.engine import wavefront
    from pathtracer_tpu.parallel import mesh as pmesh
    from pathtracer_tpu.scene.builder import build_scene
    from pathtracer_tpu.scene.model import scene_to_device
    from pathtracer_tpu.utils.logging import log, log_json

    assert jax.device_count() == 8, jax.devices()
    cfg = PRESETS["bench"].replace(
        width=256, height=256, backend="jnp", max_depth=2
    )
    scene = scene_to_device(with_bvh(build_scene(cfg.scene)))
    mesh = pmesh.make_mesh()

    def timed(fn, iters=3):
        out = fn()
        np.asarray(out)  # compile barrier
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_single = timed(lambda: wavefront.render(scene, cfg))
    t_shard = timed(lambda: pmesh.render_sharded(scene, cfg, mesh))
    img_a = np.asarray(wavefront.render(scene, cfg))
    img_b = np.asarray(pmesh.render_sharded(scene, cfg, mesh))
    bitexact = bool((img_a == img_b).all())
    eff = t_single / t_shard  # speedup of the 8-shard program, same CPU
    log("scaling (cpu fake devices)", t_single=round(t_single, 3),
        t_shard=round(t_shard, 3), speedup=round(eff, 3),
        bitexact=bitexact)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log_json(
        os.path.join(here, "bench_metrics.jsonl"),
        config=f"{cfg.scene} {cfg.width}x{cfg.height} depth{cfg.max_depth} "
               f"sharded-vs-single (8 virtual devices, SAME host CPU — "
               f"validates sharding overhead + bit-exactness, not ICI)",
        chips=8,
        hosts=1,
        rays_per_s_per_chip=None,
        # scaling_eff is null BY RULE for virtual-device rows: 8 fake
        # devices share one CPU, so a wall-clock ratio is noise (r2
        # recorded a nonsense 1.54 "efficiency"); the correctness result
        # is the sharded_equals_single boolean. The raw ratio is kept
        # under an honest name for the curious.
        scaling_eff=None,
        same_host_speedup=round(eff, 4),
        device="cpu-8-virtual",
        sharded_equals_single=bitexact,
    )
    return 0 if bitexact else 1


if __name__ == "__main__":
    sys.exit(main())
