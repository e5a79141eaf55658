import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from bpt_tpu.scene.loader import load_scene_from_yaml

z = np.load("/tmp/ab_dump.npz")
ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
scene = ls.scene
v0 = np.asarray(scene.v0); e1 = np.asarray(scene.e1); e2 = np.asarray(scene.e2)

for lane, tri in [(230, 5681), (490, 2668), (745, 2634)]:
    o = z["o"][lane].astype(np.float64); d = z["d"][lane].astype(np.float64)
    a = v0[tri].astype(np.float64); b = a + e1[tri]; c = a + e2[tri]
    n = np.cross(e1[tri], e2[tri]).astype(np.float64)
    area2 = np.linalg.norm(n)
    emax = max(np.linalg.norm(e1[tri]), np.linalg.norm(e2[tri]))
    print(f"lane {lane} tri {tri}: |n|={area2:.3e} maxedge={emax:.3e} "
          f"sliver_ratio={area2/max(emax**2,1e-30):.2e}")
    # cluster center
    cl = tri // 128
    lo = v0.reshape(-1,3)  # not exact cluster aabb; approximate with tri verts of cluster
    tris = slice(cl*128, min((cl+1)*128, len(v0)))
    pts = np.concatenate([v0[tris], v0[tris]+e1[tris], v0[tris]+e2[tris]])
    ctr = (pts.min(0) + pts.max(0)) / 2
    oo = (o - ctr)
    print(f"  |o-ctr|={np.linalg.norm(oo):.1f} |d|={np.linalg.norm(d):.2f}")
    for dt, lbl in [(np.float32, "f32"), (np.float64, "f64")]:
        at, bt, ct_, ot, dd, nn = [x.astype(dt) for x in (a-ctr, b-ctr, c-ctr, oo, d, n)]
        m = np.cross(ot, dd)
        w_ab = dd @ np.cross(at, bt) + m @ (bt - at)
        w_bc = dd @ np.cross(bt, ct_) + m @ (ct_ - bt)
        w_ca = dd @ np.cross(ct_, at) + m @ (at - ct_)
        den = w_ab + w_bc + w_ca
        pn = nn @ at - nn @ ot
        t = pn / den if den != 0 else np.inf
        print(f"  {lbl}: w=({w_ab:.3e},{w_bc:.3e},{w_ca:.3e}) den={den:.3e} t={t:.4f}")
