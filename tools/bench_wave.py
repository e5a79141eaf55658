import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.models import pt as pt_mod
from bpt_tpu.core import rng as rng_mod

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
print("tris:", scene.num_tris, "use_bvh:", scene.use_bvh)
cc = camera_constants(cfg, scene.dtype)
W = H = 256
depth = 5
B = W * H
pix = jnp.arange(B, dtype=jnp.int32)
i = (pix % W).astype(jnp.float32); j = (pix // W).astype(jnp.float32)
key = jax.random.PRNGKey(0)
u_gen = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4, dtype=jnp.float32)
o, d = generate_rays(cc, i, j, i*0, j*0, u_gen)

@jax.jit
def wave(o, d):
    rad, stats = pt_mod.path_trace_radiance(
        scene, o, d, depth, pt_mod.default_uniforms_fn(jax.random.fold_in(key,1), pix, jnp.float32))
    return rad, stats.rays_traced

print("compiling...")
t0 = time.monotonic(); r, rays = wave(o, d); r.block_until_ready()
print("compile+first:", round(time.monotonic()-t0, 1), "s; rays:", int(rays))
for _ in range(3):
    t0 = time.monotonic(); r, rays = wave(o, d); r.block_until_ready()
    dt = time.monotonic()-t0
    print(f"wave: {dt*1000:.0f} ms  -> {int(rays)/dt/1e6:.2f} Mrays/s")
