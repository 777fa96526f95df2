import time, numpy as np, jax, jax.numpy as jnp
from pathtracer_tpu.utils.cache import enable; enable()
from pathtracer_tpu.scene import builder
from pathtracer_tpu.scene.model import scene_to_device
from pathtracer_tpu.accel.build import with_bvh
from pathtracer_tpu.accel.traverse import closest_hit
from pathtracer_tpu.ops.traverse_pallas import closest_hit_pallas
from pathtracer_tpu.engine.camera import camera_rays
from pathtracer_tpu.sampling import rng as rng_mod

scene = scene_to_device(with_bvh(builder.cornell_mesh()))
g = scene.geometry
W = H = 512
N = W*H
pix = jnp.arange(N, dtype=jnp.uint32)
jit_ = rng_mod.pixel_jitter(0, jnp.uint32(0), pix)
o, d = camera_rays(scene.camera, W, H, jit_, pix)
o, d = jax.block_until_ready((o, d))

def timeit(name, f, iters=5):
    r = f(); r = np.asarray(r[0])  # fetch = barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        r2 = f(); np.asarray(r2[0])
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} Mrays/s")

jnp_hit = jax.jit(lambda o,d: closest_hit(g,o,d))
pal_hit = jax.jit(lambda o,d: closest_hit_pallas(g,o,d))
timeit("jnp primary", lambda: jnp_hit(o,d))
timeit("pallas primary", lambda: pal_hit(o,d))

# incoherent rays
rng = np.random.default_rng(0)
oi = jnp.asarray((rng.random((N,3))*0.9+0.05).astype(np.float32))
di_ = rng.normal(size=(N,3)).astype(np.float32); di_/=np.linalg.norm(di_,axis=-1,keepdims=True)
di = jnp.asarray(di_)
timeit("jnp incoherent", lambda: jnp_hit(oi,di))
timeit("pallas incoherent", lambda: pal_hit(oi,di))
