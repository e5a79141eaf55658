import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
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

def timeit(name, fn, *a):
    r = fn(*a); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); r = fn(*a); jax.block_until_ready(r)
        ts.append(time.monotonic()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms  ({B/min(ts)/1e6:.1f} Mrays/s closest-only)")
    return r

rr = timeit("rolled ", clustered_closest_pallas, aabb_r, blocks_r, ox, oy, oz, dx, dy, dz, tmin, tmax)
rp = timeit("plucker", plucker_closest_pallas, aabb_p, blocks_p, ox, oy, oz, dx, dy, dz, tmin, tmax)
tr, trir = np.asarray(rr[0]), np.asarray(rr[1])
tp, trip = np.asarray(rp[0]), np.asarray(rp[1])
hit_r, hit_p = np.isfinite(tr), np.isfinite(tp)
print("hits rolled:", hit_r.sum(), " plucker:", hit_p.sum(), " disagree:", (hit_r!=hit_p).sum())
m = hit_r & hit_p
print("tri match:", (trir[m]==trip[m]).mean(), " max|dt|:", np.abs(tr[m]-tp[m]).max())
bad = np.where(hit_r != hit_p)[0][:5]
for b in bad:
    print("lane", b, "t_r", tr[b], "t_p", tp[b], "tri_r", trir[b], "tri_p", trip[b])
