import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, CLUSTER_TRIS
from bpt_tpu.ops.pallas.cluster_wave import morton_octant_key
from bpt_tpu.core import rng as rng_mod

ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene, cfg = ls.scene, ls.camera
cc = camera_constants(cfg, scene.dtype)
W = H = 256; B = W*H
pix = jnp.arange(B, dtype=jnp.int32)
i = (pix % W).astype(jnp.float32); j = (pix // W).astype(jnp.float32)
key = jax.random.PRNGKey(0)
u = rng_mod.wave_uniforms(jax.random.fold_in(key,0), pix, 0, 4, dtype=jnp.float32)
o, d = generate_rays(cc, i, j, i*0, j*0, u)
C = int(np.ceil(scene.num_tris / CLUSTER_TRIS))
aabb = np.asarray(_cluster_aabbs(scene, C)).reshape(C, 6)
lo_c, hi_c = aabb[:, :3], aabb[:, 3:]

O3 = np.asarray(o); D3 = np.asarray(d)
ox, oy, oz = O3[:,0], O3[:,1], O3[:,2]
dx, dy, dz = D3[:,0], D3[:,1], D3[:,2]

lo = np.asarray(scene.bvh_min[0]); hi = np.asarray(scene.bvh_max[0])
keys = np.asarray(morton_octant_key(jnp.asarray(lo), jnp.asarray(hi),
                                    jnp.asarray(ox), jnp.asarray(oy), jnp.asarray(oz), jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dz)))
for label, perm in [("unsorted", np.arange(B)), ("sorted", np.argsort(keys))]:
    O = np.stack([ox,oy,oz],1)[perm]; D = np.stack([dx,dy,dz],1)[perm]
    tile = 2048
    touched = []
    for t0 in range(0, B, tile):
        Ot, Dt = O[t0:t0+tile], D[t0:t0+tile]
        inv = 1.0/Dt  # [n,3]
        t0s = (lo_c[None,:,:] - Ot[:,None,:]) * inv[:,None,:]
        t1s = (hi_c[None,:,:] - Ot[:,None,:]) * inv[:,None,:]
        enter = np.maximum(np.minimum(t0s,t1s).max(2), 1e-3)
        exit_ = np.maximum(t0s,t1s).min(2)
        hit = (exit_ > enter).any(0)  # [C]
        touched.append(hit.sum())
    touched = np.array(touched)
    print(f"{label}: C={C} tiles={len(touched)} touched/tile mean={touched.mean():.0f} "
          f"p50={np.percentile(touched,50):.0f} max={touched.max()}")
