import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.ops.pallas.plucker import pack_plucker_clusters, plucker_closest_pallas
from bpt_tpu.ops.intersect import T_MIN

z = np.load("/tmp/ab_dump.npz")
lanes = [230, 490, 491, 745, 996]
o = z["o"][lanes]; d = z["d"][lanes]
ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene = ls.scene
_C, aabb, blocks = pack_plucker_clusters(scene)
n = len(lanes)
t, tri, u, v = plucker_closest_pallas(
    aabb, blocks,
    jnp.asarray(o[:,0]), jnp.asarray(o[:,1]), jnp.asarray(o[:,2]),
    jnp.asarray(d[:,0]), jnp.asarray(d[:,1]), jnp.asarray(d[:,2]),
    jnp.full((n,), T_MIN, jnp.float32), jnp.full((n,), np.inf, jnp.float32),
    interpret=True)
for k, lane in enumerate(lanes):
    print(f"lane {lane}: interpret t={float(t[k]):.5f} tri={int(tri[k])} | tpu t={z['t_p'][lane]:.5f} tri={z['tri_p'][lane]}")
