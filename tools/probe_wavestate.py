"""Time the probe intersect kernel on pt_wave's ACTUAL bounce-1 state
(origins/dirs/alive after bounce 0 + the real coherence sort), to split
wave bounce cost into intersect vs everything else."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod, vec3 as v3
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders
from bpt_tpu.ops.intersect import T_MIN
from probe_traversal import probe


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    B = W * W
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
    k_pt = jax.random.fold_in(key, 1)

    depth = 4
    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)

    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, state,
                              16, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f) = outs
    jax.block_until_ready(outs)
    print("live after bounce 0:", int(jnp.sum(alive_f)))

    lo_b = jnp.stack([jnp.min(jnp.where(alive_f > 0.5, v, 3.4e38))
                      for v in (ox, oy, oz)])
    hi_b = jnp.stack([jnp.max(jnp.where(alive_f > 0.5, v, -3.4e38))
                      for v in (ox, oy, oz)])
    p = ptw._coherence_perm(lo_b, hi_b, ox, oy, oz, dx, dy, dz, alive_f)
    oxs, oys, ozs, dxs, dys, dzs, als = (
        ox[p], oy[p], oz[p], dx[p], dy[p], dz[p], alive_f[p])
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.where(als > 0.5, jnp.inf, -1.0)

    for rows in (16, 8):
        a = [oxs, oys, ozs, dxs, dys, dzs]
        r = probe(cl_aabb, order_t, tri_hbm, *a, tmin, tmax, tile_rows=rows)
        jax.block_until_ready(r)
        N = 5
        t0 = time.monotonic()
        for _ in range(N):
            r = probe(cl_aabb, order_t, tri_hbm, *a, tmin, tmax,
                      tile_rows=rows)
        jax.block_until_ready(r)
        dt = (time.monotonic() - t0) / N
        t, sc, cl = r
        live = float(jnp.sum(als))
        print(f"wave-b1 rows={rows}: {dt*1000:7.1f} ms  "
              f"{live/dt/1e6:5.2f} Mlive-rays/s  "
              f"sc/tile={float(np.mean(np.asarray(sc))):6.1f} "
              f"dma/tile={float(np.mean(np.asarray(cl))):7.1f}")


def bench_launch_bounce():
    """Time the full bounce kernel (intersect + payload + shade) on the
    same bounce-1 state, to separate intersect from the rest."""
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    B = W * W
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
    k_pt = jax.random.fold_in(key, 1)
    depth = 4
    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, state,
                              16, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f) = outs
    lo_b = jnp.stack([jnp.min(jnp.where(alive_f > 0.5, v, 3.4e38))
                      for v in (ox, oy, oz)])
    hi_b = jnp.stack([jnp.max(jnp.where(alive_f > 0.5, v, -3.4e38))
                      for v in (ox, oy, oz)])
    p = ptw._coherence_perm(lo_b, hi_b, ox, oy, oz, dx, dy, dz, alive_f)
    st1 = (ox[p], oy[p], oz[p], dx[p], dy[p], dz[p],
           tr[p], tg[p], tb[p], alive_f[p], pix[p])

    @jax.jit
    def run(st):
        return ptw._launch_bounce(meta0.at[4].set(1), tri_tab, mat_tab,
                                  lgt_tab, keys_flat, cl_aabb, order_t,
                                  tri_hbm, st, 16, False, True)

    r = run(st1)
    jax.block_until_ready(r)
    N = 5
    t0 = time.monotonic()
    for _ in range(N):
        r = run(st1)
    jax.block_until_ready(r)
    dt = (time.monotonic() - t0) / N
    live = float(jnp.sum(st1[9]))
    print(f"full bounce kernel rows=16: {dt*1000:7.1f} ms "
          f"({live/dt/1e6:5.2f} Mlive-rays/s)")


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "bounce":
        bench_launch_bounce()
    else:
        main()
