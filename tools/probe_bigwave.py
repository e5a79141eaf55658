"""Probe: spp-batched waves — does a 16x denser wave shrink tile unions?

The render loop drives pt_wave one stratum at a time (262k rays at
512^2).  Batching every stratum into ONE wave puts 16x more rays into
the same space; after the coherence sort, tiles should be much tighter
(the per-ray candidate floor is unchanged, but the union over a tile of
4096 NEARBY rays approaches it as density rises).

usage: python tools/probe_bigwave.py [spp_batch] [tile_rows] [depth]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod, vec3 as v3
from bpt_tpu.ops.pallas.pt_wave import pt_wave

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
trows = int(sys.argv[2]) if len(sys.argv) > 2 else 32
depth = int(sys.argv[3]) if len(sys.argv) > 3 else 10

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
cc = camera_constants(cfg, scene.dtype)
W = H = 512
npix = W * H
B = npix * spp
pix = jnp.arange(npix, dtype=jnp.int32)
i = jnp.tile((pix % W).astype(jnp.float32), spp)
j = jnp.tile((pix // W).astype(jnp.float32), spp)
S = int(np.sqrt(spp))
s_lin = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
s_i = (s_lin % S).astype(jnp.float32)
s_j = (s_lin // S).astype(jnp.float32)
rid = jnp.tile(pix, spp) * spp + s_lin
key = jax.random.PRNGKey(0)
u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), rid, 0, 4,
                          dtype=jnp.float32)
o3, d3 = generate_rays(cc, i, j, s_i, s_j, u)
o = v3.from_array(o3)
d = v3.from_array(d3)
k_pt = jax.random.fold_in(key, 1)

print(f"wave: {B} rays ({spp} strata batched), rows={trows}, depth={depth}")
for rep in range(2):
    r = pt_wave(scene, o, d, rid, k_pt, depth, tile_rows=trows,
                entry_sort=False)
    jax.block_until_ready(r)
    N = 2
    t0 = time.monotonic()
    for k in range(N):
        r = pt_wave(scene, o, d, rid, jax.random.fold_in(k_pt, k), depth,
                    tile_rows=trows, entry_sort=False)
        float(np.asarray(r[0]).sum())
    dt = (time.monotonic() - t0) / N
    rays = float(r[3])
    print(f"spp_batch={spp} rows={trows}: {dt*1000:.1f} ms/wave, "
          f"rays={int(rays)}, {rays/dt/1e6:.2f} Mrays/s")
