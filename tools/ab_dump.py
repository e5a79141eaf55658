import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
from bpt_tpu.ops.pallas.cluster_wave import clustered_closest_pallas
from bpt_tpu.ops.pallas.plucker import pack_plucker_clusters, plucker_closest_pallas
from bpt_tpu.ops.intersect import T_MIN

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
cc = camera_constants(cfg, scene.dtype)
W = H = 256; B = W*H
pix = jnp.arange(B, dtype=jnp.int32)
i = (pix % W).astype(jnp.float32); j = (pix // W).astype(jnp.float32)
key = jax.random.PRNGKey(0)
u = rng_mod.wave_uniforms(jax.random.fold_in(key,0), pix, 0, 4, dtype=jnp.float32)
o3, d3 = generate_rays(cc, i, j, i*0, j*0, u)
ox, oy, oz = o3[:,0], o3[:,1], o3[:,2]
dx, dy, dz = d3[:,0], d3[:,1], d3[:,2]
tmin = jnp.full((B,), T_MIN, jnp.float32)
tmax = jnp.full((B,), np.inf, jnp.float32)
_c, aabb_r, blocks_r = pack_clusters_rolled(scene)
_c, aabb_p, blocks_p = pack_plucker_clusters(scene)
rr = clustered_closest_pallas(aabb_r, blocks_r, ox, oy, oz, dx, dy, dz, tmin, tmax)
rp = plucker_closest_pallas(aabb_p, blocks_p, ox, oy, oz, dx, dy, dz, tmin, tmax)
np.savez("/tmp/ab_dump.npz",
         o=np.asarray(o3), d=np.asarray(d3),
         t_r=np.asarray(rr[0]), tri_r=np.asarray(rr[1]),
         t_p=np.asarray(rp[0]), tri_p=np.asarray(rp[1]),
         u_p=np.asarray(rp[2]), v_p=np.asarray(rp[3]))
print("dumped")
