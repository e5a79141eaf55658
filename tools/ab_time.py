import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
from bpt_tpu.ops.pallas.cluster_wave import clustered_closest_pallas
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

r = clustered_closest_pallas(aabb_r, blocks_r, ox, oy, oz, dx, dy, dz, tmin, tmax)
jax.block_until_ready(r)
N = 20
t0 = time.monotonic()
for _ in range(N):
    r = clustered_closest_pallas(aabb_r, blocks_r, ox, oy, oz, dx, dy, dz, tmin, tmax)
jax.block_until_ready(r)
dt = (time.monotonic()-t0)/N
print(f"rolled primary closest: {dt*1000:.2f} ms/launch -> {B/dt/1e6:.0f} Mrays/s")
# incoherent rays: random origins in scene bounds, random dirs
rng = np.random.default_rng(5)
lo = np.asarray(scene.bvh_min[0]); hi = np.asarray(scene.bvh_max[0])
O = rng.uniform(lo, hi, (B,3)).astype(np.float32)
D = rng.normal(size=(B,3)).astype(np.float32)
a = [jnp.asarray(O[:,0]), jnp.asarray(O[:,1]), jnp.asarray(O[:,2]),
     jnp.asarray(D[:,0]), jnp.asarray(D[:,1]), jnp.asarray(D[:,2])]
r = clustered_closest_pallas(aabb_r, blocks_r, *a, tmin, tmax); jax.block_until_ready(r)
t0 = time.monotonic()
for _ in range(N):
    r = clustered_closest_pallas(aabb_r, blocks_r, *a, tmin, tmax)
jax.block_until_ready(r)
dt = (time.monotonic()-t0)/N
print(f"rolled incoherent closest: {dt*1000:.2f} ms/launch -> {B/dt/1e6:.1f} Mrays/s")

from bpt_tpu.ops.pallas.plucker import pack_plucker_clusters, plucker_closest_pallas
_c, aabb_p, blocks_p = pack_plucker_clusters(scene)
r = plucker_closest_pallas(aabb_p, blocks_p, *a, tmin, tmax); jax.block_until_ready(r)
t0 = time.monotonic()
for _ in range(N):
    r = plucker_closest_pallas(aabb_p, blocks_p, *a, tmin, tmax)
jax.block_until_ready(r)
dt = (time.monotonic()-t0)/N
print(f"plucker incoherent closest: {dt*1000:.2f} ms/launch -> {B/dt/1e6:.1f} Mrays/s")
# sorted incoherent
from bpt_tpu.ops.pallas.cluster_wave import morton_octant_key
lo_j = jnp.asarray(lo); hi_j = jnp.asarray(hi)
key2 = morton_octant_key(lo_j, hi_j, *a)
p = jnp.argsort(key2)
asort = [x[p] for x in a]
for nm, fn, aab, blk in [("rolled", clustered_closest_pallas, aabb_r, blocks_r),
                          ("plucker", plucker_closest_pallas, aabb_p, blocks_p)]:
    r = fn(aab, blk, *asort, tmin, tmax); jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(N):
        r = fn(aab, blk, *asort, tmin, tmax)
    jax.block_until_ready(r)
    dt = (time.monotonic()-t0)/N
    print(f"{nm} SORTED incoherent: {dt*1000:.2f} ms/launch -> {B/dt/1e6:.1f} Mrays/s")
