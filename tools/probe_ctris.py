"""A/B: CLUSTER_TRIS granularity sweep on the coffee-91k wave.

Finer clusters halve the roll steps per visit but grow the visit count
(smaller AABBs hit less often but there are more of them) and triple
the DMA count.  Patches the module constants BEFORE the scene build so
the BVH-subtree splits re-segment at the new limit.

usage: python tools/probe_ctris.py [cluster_tris] [tile_rows]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

ctris = int(sys.argv[1]) if len(sys.argv) > 1 else 16
trows = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from bpt_tpu.ops.pallas import clusters as cl

cl.CLUSTER_TRIS = ctris
cl.REPL = cl.LANES // ctris
cl.MAX_CLUSTERS = 4096 * (32 // ctris) * 2  # keep cluster_ok true + headroom
cl.SUPER = 512 // ctris  # keep supers at ~512 tris

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod, vec3 as v3
from bpt_tpu.ops.pallas.pt_wave import pt_wave

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
print(f"ctris={ctris} splits: C={len(scene.cluster_splits)-1} "
      f"S={len(scene.super_splits)-1}")
cc = camera_constants(cfg, scene.dtype)
W = H = 512
B = W * H
depth = 10
pix = jnp.arange(B, dtype=jnp.int32)
i = (pix % W).astype(jnp.float32)
j = (pix // W).astype(jnp.float32)
key = jax.random.PRNGKey(0)
u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                          dtype=jnp.float32)
o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
o = v3.from_array(o3)
d = v3.from_array(d3)
k_pt = jax.random.fold_in(key, 1)

for rep in range(2):
    r = pt_wave(scene, o, d, pix, k_pt, depth, tile_rows=trows,
                entry_sort=False)
    jax.block_until_ready(r)
    N = 3
    t0 = time.monotonic()
    for k in range(N):
        r = pt_wave(scene, o, d, pix, jax.random.fold_in(k_pt, k), depth,
                    tile_rows=trows, entry_sort=False)
        float(np.asarray(r[0]).sum())
    dt = (time.monotonic() - t0) / N
    rays = float(r[3])
    print(f"ctris={ctris} rows={trows}: {dt*1000:.1f} ms/wave, "
          f"rays={int(rays)}, {rays/dt/1e6:.2f} Mrays/s")
