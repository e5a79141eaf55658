"""Per-RAY cluster/supercluster entry statistics for the coffee stand-in.

The tile-granularity traversal pays for the UNION of the tile's entries;
this probe measures the per-ray candidate-set sizes that a binned
(ray,cluster) work-item scheme would pay for instead, with and without
first-hit t-culling — the data that decides whether binning can reach
the 10 Mrays/s large-scene target.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas.clusters import (
    pack_clusters_rolled, SUPER, CLUSTER_TRIS)
from bpt_tpu.ops.intersect import T_MIN


def slab_enter_exit(box, ox, oy, oz, inx, iny, inz):
    """box: [N,6]; rays: [B].  Returns enter/exit [B,N]."""
    lo = box[None, :, :3]
    hi = box[None, :, 3:]
    o = jnp.stack([ox, oy, oz], -1)[:, None, :]
    inv = jnp.stack([inx, iny, inz], -1)[:, None, :]
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    enter = jnp.maximum(jnp.minimum(t0, t1).max(-1), T_MIN)
    exit_ = jnp.maximum(t0, t1).min(-1)
    return enter, exit_


@jax.jit
def count_entries(box, ox, oy, oz, dx, dy, dz, tbest):
    enter, exit_ = slab_enter_exit(box, ox, oy, oz, 1/dx, 1/dy, 1/dz)
    open_ = exit_ > enter
    n_all = jnp.sum(open_, axis=1, dtype=jnp.int32)
    n_cull = jnp.sum(open_ & (enter < tbest[:, None]), axis=1,
                     dtype=jnp.int32)
    return n_all, n_cull


def brute_t(scene, o, d, chunk=8192):
    """Closest-hit t via the jnp brute path (small chunks)."""
    from bpt_tpu.ops import soa
    from bpt_tpu.core import vec3 as v3
    B = o.shape[0]
    ts = []
    f = jax.jit(lambda o3, d3: soa.brute_closest(
        scene, v3.from_array(o3), v3.from_array(d3),
        jnp.full((o3.shape[0],), T_MIN, jnp.float32),
        jnp.full((o3.shape[0],), jnp.inf, jnp.float32)).t)
    for i in range(0, B, chunk):
        ts.append(np.asarray(f(o[i:i+chunk], d[i:i+chunk])))
    return np.concatenate(ts)


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = H = 256
    B = W * H
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i*0, j*0, u)
    o3 = np.asarray(o3); d3 = np.asarray(d3)

    C, aabb_comb, _blocks = pack_clusters_rolled(scene)
    S = (int(aabb_comb.shape[0]) - C * 7) // 8
    sc_box = np.asarray(aabb_comb[:S*6]).reshape(S, 6)
    cl_box = np.asarray(aabb_comb[S*8:]).reshape(C, 7)[:, :6]
    print(f"T={scene.num_tris} C={C} S={S}")

    t1 = brute_t(scene, jnp.asarray(o3), jnp.asarray(d3))
    hit = np.isfinite(t1)
    print(f"primary hit% = {100*hit.mean():.0f}")

    # bounce-1 rays: cosine-ish random lobes from primary hit points
    rng = np.random.default_rng(7)
    p = o3 + np.where(hit, t1, 1.0)[:, None] * d3
    u1, u2 = rng.random(B), rng.random(B)
    phi = 2*np.pi*u1; r_ = np.sqrt(u2)
    dirs = np.stack([r_*np.cos(phi), r_*np.sin(phi),
                     np.sqrt(1-u2)*np.where(rng.random(B) < 0.5, 1, -1)],
                    1).astype(np.float32)
    t2 = brute_t(scene, jnp.asarray(p), jnp.asarray(dirs))
    t2 = np.where(np.isfinite(t2), t2, 3.4e38).astype(np.float32)

    for name, (oo, dd, tb, mask) in {
        "primary": (o3, d3, np.where(hit, t1, 3.4e38).astype(np.float32),
                    np.ones(B, bool)),
        "bounce1": (p, dirs, t2, hit),
    }.items():
        for lvl, box in (("super", sc_box), ("cluster", cl_box)):
            n_all_l, n_cull_l = [], []
            ch = 16384
            for k in range(0, B, ch):
                na, nc = count_entries(
                    jnp.asarray(box), *[jnp.asarray(x[k:k+ch]) for x in
                    (oo[:, 0], oo[:, 1], oo[:, 2],
                     dd[:, 0], dd[:, 1], dd[:, 2])],
                    jnp.asarray(tb[k:k+ch]))
                n_all_l.append(np.asarray(na)); n_cull_l.append(np.asarray(nc))
            n_all = np.concatenate(n_all_l)[mask]
            n_cull = np.concatenate(n_cull_l)[mask]
            print(f"{name:8s} {lvl:8s}: all-entries/ray mean={n_all.mean():7.1f} "
                  f"p50={np.percentile(n_all, 50):6.0f} p95={np.percentile(n_all, 95):6.0f} "
                  f"| t-culled mean={n_cull.mean():7.1f} p95={np.percentile(n_cull, 95):6.0f}")


if __name__ == "__main__":
    main()
