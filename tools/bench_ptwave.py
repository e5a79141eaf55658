import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod, vec3 as v3
from bpt_tpu.ops.pallas.pt_wave import pt_wave

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
cc = camera_constants(cfg, scene.dtype)
W = H = 512; B = W*H
depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
pix = jnp.arange(B, dtype=jnp.int32)
i = (pix % W).astype(jnp.float32); j = (pix // W).astype(jnp.float32)
key = jax.random.PRNGKey(0)
u = rng_mod.wave_uniforms(jax.random.fold_in(key,0), pix, 0, 4, dtype=jnp.float32)
o3, d3 = generate_rays(cc, i, j, i*0, j*0, u)
o = v3.from_array(o3); d = v3.from_array(d3)
k_pt = jax.random.fold_in(key, 1)

cfgs = [(True, 16), (True, 16)]
if len(sys.argv) > 2:
    cfgs = [(True, int(r)) for r in sys.argv[2].split(",")]
for sort, trows in cfgs:
    r = pt_wave(scene, o, d, pix, k_pt, depth, sort=sort, tile_rows=trows)
    jax.block_until_ready(r)
    N = 3
    t0 = time.monotonic()
    acc = 0.0
    for k in range(N):
        r = pt_wave(scene, o, d, pix, jax.random.fold_in(k_pt, k), depth, sort=sort, tile_rows=trows)
        acc += float(np.asarray(r[0]).sum())   # force full D2H each iter
    dt = (time.monotonic()-t0)/N
    rays = float(r[3])
    print(f"sort={sort} rows={trows}: {dt*1000:.1f} ms/wave, rays={int(rays)}, {rays/dt/1e6:.2f} Mrays/s")
