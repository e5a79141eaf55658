import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.ops import soa
from bpt_tpu.core import vec3 as v3
from bpt_tpu.ops.intersect import T_MIN

z = np.load("/tmp/ab_dump.npz")
t_r, t_p, tri_r, tri_p = z["t_r"], z["t_p"], z["tri_r"], z["tri_p"]
hit_r, hit_p = np.isfinite(t_r), np.isfinite(t_p)
dis = np.where(hit_r != hit_p)[0]
both = np.where(hit_r & hit_p & (tri_r != tri_p))[0]
pick = np.concatenate([dis[:24], both[:24]])
print(f"disagree hit: {len(dis)}, tri-mismatch both-hit: {len(both)}, checking {len(pick)}")
ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene = ls.scene
o = v3.from_array(jnp.asarray(z["o"][pick], jnp.float32))
d = v3.from_array(jnp.asarray(z["d"][pick], jnp.float32))
n = len(pick)
ref = soa.brute_closest(scene, o, d,
                        jnp.full((n,), T_MIN, jnp.float32),
                        jnp.full((n,), np.inf, jnp.float32))
rt, rtri, rhit = np.asarray(ref.t), np.asarray(ref.tri), np.asarray(ref.hit)
r_ok = p_ok = 0
for k, lane in enumerate(pick):
    ok_r = (rhit[k] == hit_r[lane]) and (not rhit[k] or (abs(rt[k]-t_r[lane]) < 1e-3*max(1,abs(rt[k])) and rtri[k]==tri_r[lane]))
    ok_p = (rhit[k] == hit_p[lane]) and (not rhit[k] or (abs(rt[k]-t_p[lane]) < 1e-3*max(1,abs(rt[k])) and rtri[k]==tri_p[lane]))
    r_ok += ok_r; p_ok += ok_p
    if k < 12:
        print(f"lane {lane}: brute t={rt[k]:.5f} tri={rtri[k]} hit={rhit[k]} | roll t={t_r[lane]:.5f} tri={tri_r[lane]} ok={ok_r} | plk t={t_p[lane]:.5f} tri={tri_p[lane]} ok={ok_p}")
print(f"brute agrees: rolled {r_ok}/{n}, plucker {p_ok}/{n}")
