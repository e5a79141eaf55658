"""Would a t-PRIMING pre-pass pay?  Times the instrumented traversal
(probe_traversal.probe) on the same sorted bounce-1 wave twice: with
tmax = infinity (what the kernel faces today — t shrinks progressively
during traversal) vs tmax = the ray's FINAL hit t (a perfect oracle
prime).  The gap bounds what ANY two-pass scheme (cheap t-bound pass ->
primed full pass) could recover; if it's small, progressive in-kernel
t-shrink is already capturing it.

Usage: python tools/probe_tprime.py [rows [spp]]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders
from bpt_tpu.ops.intersect import T_MIN
from probe_traversal import probe


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    npix = W * W
    B = npix * spp
    pix = jnp.arange(npix, dtype=jnp.int32)
    i = jnp.tile((pix % W).astype(jnp.float32), spp)
    j = jnp.tile((pix // W).astype(jnp.float32), spp)
    S = max(1, int(np.sqrt(spp)))
    s_lin = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    rid = jnp.tile(pix, spp) * spp + s_lin
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), rid, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, (s_lin % S).astype(jnp.float32),
                           (s_lin // S).astype(jnp.float32), u)
    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(jax.random.fold_in(key, 1), NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab,
                              lgt_tab, keys_flat, cl_aabb, order_t,
                              tri_hbm,
                              (ox, oy, oz, dx, dy, dz, one, one, one,
                               one, rid), rows, False, True)
    (ox1, oy1, oz1, dx1, dy1, dz1) = outs[:6]
    alive1 = outs[12]
    # proxy sort
    live = alive1 > 0.5
    big = jnp.float32(3.4e38)
    lo_b = jnp.stack([jnp.min(jnp.where(live, v, big))
                      for v in (ox1, oy1, oz1)])
    hi_b = jnp.stack([jnp.max(jnp.where(live, v, -big))
                      for v in (ox1, oy1, oz1)])
    keyv = ptw._coherence_key(lo_b, hi_b, ox1, oy1, oz1, dx1, dy1, dz1,
                              alive1)
    srt = jax.lax.sort((keyv, ox1, oy1, oz1, dx1, dy1, dz1, alive1),
                       num_keys=1)
    ox1, oy1, oz1, dx1, dy1, dz1, alive1 = srt[1:]
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax_inf = jnp.where(alive1 > 0.5, jnp.inf, -1.0)

    def run(tmax, n=3):
        t, sc, cl = probe(cl_aabb, order_t, tri_hbm, ox1, oy1, oz1,
                          dx1, dy1, dz1, tmin, tmax, tile_rows=rows)
        float(jnp.sum(t))
        t0 = time.monotonic()
        for _ in range(n):
            t, sc, cl = probe(cl_aabb, order_t, tri_hbm, ox1, oy1, oz1,
                              dx1, dy1, dz1, tmin, tmax, tile_rows=rows)
        float(jnp.sum(t))
        dt = (time.monotonic() - t0) / n
        return dt, t, float(jnp.sum(sc)), float(jnp.sum(cl))

    # interleaved: inf, primed, inf, primed ...
    dt0, t_fin, sc0, cl0 = run(tmax_inf)
    t_prime = jnp.where(jnp.isfinite(t_fin) & (alive1 > 0.5),
                        t_fin * 1.0001, tmax_inf)
    res = {"inf": [], "primed": []}
    stats = {}
    for _ in range(4):
        d, _, sc, cl = run(tmax_inf)
        res["inf"].append(d)
        stats["inf"] = (sc, cl)
        d, _, sc, cl = run(t_prime)
        res["primed"].append(d)
        stats["primed"] = (sc, cl)
    for k, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{k:7s} intersect {med*1000:7.1f} ms "
              f"sc={stats[k][0]:.0f} cl={stats[k][1]:.0f} "
              f"(runs {[round(t*1000) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
