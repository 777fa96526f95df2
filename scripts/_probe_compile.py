import sys, os; sys.path.insert(0, "/root/repo")
import sys, time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pathtracer_tpu.utils.cache import enable; enable()

variant = sys.argv[1]
C = 4; RB = 512; R = RB
mask = jnp.ones((8, C), jnp.int32)
rayf = jnp.asarray(np.random.rand(16, R), jnp.float32)
feat = jnp.asarray(np.random.rand(16, C*512), jnp.float32)
feat_hi = feat.astype(jnp.bfloat16)
feat_lo = (feat - feat_hi.astype(jnp.float32)).astype(jnp.bfloat16)
rayf_hi = rayf.astype(jnp.bfloat16)
rayf_lo = (rayf - rayf_hi.astype(jnp.float32)).astype(jnp.bfloat16)
dims = (((0,), (0,)), ((), ()))

def kern_f32(mask_ref, rayf_ref, feat_ref, t_ref):
    rf = rayf_ref[:, :]
    def visit(k, t_best):
        def hit(t_best):
            blk = feat_ref[:, pl.ds(k*512, 512)]
            q = jax.lax.dot_general(blk, rf, dims, preferred_element_type=jnp.float32)
            return jnp.minimum(t_best, jnp.min(q, axis=0, keepdims=True))
        return jax.lax.cond(mask_ref[pl.program_id(0) % 8, k] > 0, hit, lambda t: t, t_best)
    t = jax.lax.fori_loop(0, C, visit, jnp.full((1, RB), 1e9, jnp.float32))
    t_ref[:, :] = jnp.broadcast_to(t, (8, RB))

def kern_split_in(mask_ref, rayf_ref, feat_ref, t_ref):
    rf = rayf_ref[:, :]
    r_hi = rf.astype(jnp.bfloat16); r_lo = (rf - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    def visit(k, t_best):
        def hit(t_best):
            blk = feat_ref[:, pl.ds(k*512, 512)]
            b_hi = blk.astype(jnp.bfloat16); b_lo = (blk - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            q = (jax.lax.dot_general(b_hi, r_hi, dims, preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(b_hi, r_lo, dims, preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(b_lo, r_hi, dims, preferred_element_type=jnp.float32))
            return jnp.minimum(t_best, jnp.min(q, axis=0, keepdims=True))
        return jax.lax.cond(mask_ref[pl.program_id(0) % 8, k] > 0, hit, lambda t: t, t_best)
    t = jax.lax.fori_loop(0, C, visit, jnp.full((1, RB), 1e9, jnp.float32))
    t_ref[:, :] = jnp.broadcast_to(t, (8, RB))

def kern_split_pre(mask_ref, rhi_ref, rlo_ref, fhi_ref, flo_ref, t_ref):
    r_hi = rhi_ref[:, :]; r_lo = rlo_ref[:, :]
    def visit(k, t_best):
        def hit(t_best):
            b_hi = fhi_ref[:, pl.ds(k*512, 512)]
            b_lo = flo_ref[:, pl.ds(k*512, 512)]
            q = (jax.lax.dot_general(b_hi, r_hi, dims, preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(b_hi, r_lo, dims, preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(b_lo, r_hi, dims, preferred_element_type=jnp.float32))
            return jnp.minimum(t_best, jnp.min(q, axis=0, keepdims=True))
        return jax.lax.cond(mask_ref[pl.program_id(0) % 8, k] > 0, hit, lambda t: t, t_best)
    t = jax.lax.fori_loop(0, C, visit, jnp.full((1, RB), 1e9, jnp.float32))
    t_ref[:, :] = jnp.broadcast_to(t, (8, RB))

vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
sspec = pl.BlockSpec((8, C), lambda i: (0, 0), memory_space=pltpu.SMEM)
out_shape = jax.ShapeDtypeStruct((8, R), jnp.float32)
out_spec = pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM)

t0 = time.perf_counter()
if variant == "f32":
    r = pl.pallas_call(kern_f32, grid=(R//RB,), in_specs=[sspec, vspec, vspec], out_specs=out_spec, out_shape=out_shape)(mask, rayf, feat)
elif variant == "split_in":
    r = pl.pallas_call(kern_split_in, grid=(R//RB,), in_specs=[sspec, vspec, vspec], out_specs=out_spec, out_shape=out_shape)(mask, rayf, feat)
elif variant == "split_pre":
    r = pl.pallas_call(kern_split_pre, grid=(R//RB,), in_specs=[sspec, vspec, vspec, vspec, vspec], out_specs=out_spec, out_shape=out_shape)(mask, rayf_hi, rayf_lo, feat_hi, feat_lo)
np.asarray(r)
print(f"{variant}: compiled+ran in {time.perf_counter()-t0:.1f}s")
