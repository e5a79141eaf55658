"""Per-stage time breakdown of the spp-batched pt_wave bounce loop.

The binned-targeted-traversal simulation (tools/probe_binned.py) showed
the tile-union pass is ~7x MORE visit-efficient than per-ray targeted
rounds — so if end-to-end (1.76 Mrays/s) sits far below the
visits-model prediction, the missing time is in orchestration (sort
key + argsort + packed gather) or in later-bounce union growth, not in
the traversal scheme.  This measures each stage at the production batch
size (16 spp x 512^2 = 4.2M rays, 32-row tiles).

Usage: python tools/probe_stages.py [spp [rows]]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders

LANES = 128


def sync(x):
    return float(jnp.sum(x if isinstance(x, jnp.ndarray) else x[0]))


def timeit(name, fn, *args, n=5):
    fn(*args)  # compile + warm
    sync(fn(*args))
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.monotonic() - t0) / n
    print(f"{name:28s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 32
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
    s_i = (s_lin % S).astype(jnp.float32)
    s_j = (s_lin // S).astype(jnp.float32)
    rid = jnp.tile(pix, spp) * spp + s_lin
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), rid, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, s_i, s_j, u)
    k_pt = jax.random.fold_in(key, 1)

    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    print(f"B={B} rows={rows} C={C}", flush=True)

    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)

    # one real bounce to get SECONDARY-ray state (the sorted regime)
    state0 = (ox, oy, oz, dx, dy, dz, one, one, one, one, rid)
    launch = jax.jit(functools.partial(
        ptw._launch_bounce, tile_rows=rows, interpret=False,
        clustered=True), static_argnames=())
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab,
                              lgt_tab, keys_flat, cl_aabb, order_t,
                              tri_hbm, state0, rows, False, True)
    (ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1, tb1, ir, ig, ib,
     alive1) = outs[:13]
    print("live after bounce 0:", int(jnp.sum(alive1)), flush=True)

    # ---- stage: sort key + argsort + packed gather (bounce-loop body)
    idx = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def stage_sortkey(ox, oy, oz, dx, dy, dz, alive_f):
        live = alive_f > 0.5
        big = jnp.float32(3.4e38)
        lo_b = jnp.stack([jnp.min(jnp.where(live, v, big))
                          for v in (ox, oy, oz)])
        hi_b = jnp.stack([jnp.max(jnp.where(live, v, -big))
                          for v in (ox, oy, oz)])
        return ptw._coherence_perm(lo_b, hi_b, ox, oy, oz, dx, dy, dz,
                                   alive_f)

    @jax.jit
    def stage_gather(p, ox, oy, oz, dx, dy, dz, tr, tg, tb, alive_f, rid,
                     idx):
        as_f32 = functools.partial(jax.lax.bitcast_convert_type,
                                   new_dtype=jnp.float32)
        packed = jnp.stack(
            [ox, oy, oz, dx, dy, dz, tr, tg, tb, tr, tg, tb,
             alive_f, as_f32(rid), as_f32(idx)], axis=1)[p]
        return packed

    p = stage_sortkey(ox1, oy1, oz1, dx1, dy1, dz1, alive1)
    t_key = timeit("sortkey+argsort", stage_sortkey,
                   ox1, oy1, oz1, dx1, dy1, dz1, alive1)
    t_gat = timeit("packed gather [B,15]", stage_gather, p,
                   ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1, tb1, alive1,
                   rid, idx)

    # ---- stage: the bounce kernel on sorted secondary state
    pk = np.asarray(p)
    srt = [jnp.asarray(np.asarray(v)[pk]) for v in
           (ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1, tb1, alive1)]
    state1 = tuple(srt[:9]) + (srt[9], jnp.asarray(np.asarray(rid)[pk]))

    def stage_kernel(state):
        return ptw._launch_bounce(meta0.at[4].set(1), tri_tab, mat_tab,
                                  lgt_tab, keys_flat, cl_aabb, order_t,
                                  tri_hbm, state, rows, False, True)

    t_k1 = timeit("bounce kernel (sorted b1)", stage_kernel, state1)

    # unsorted comparison (what bounce 1 would cost with sort=False)
    state1u = (ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1, tb1, alive1, rid)
    t_k1u = timeit("bounce kernel (UNsorted b1)", stage_kernel, state1u)

    # primary-ray kernel (raster order)
    t_k0 = timeit("bounce kernel (primary b0)", stage_kernel, state0)

    # ---- full wave for reference
    from bpt_tpu.core import vec3 as v3
    o_v = v3.Vec3(ox, oy, oz)
    d_v = v3.Vec3(dx, dy, dz)

    def full(key):
        return ptw.pt_wave(scene, o_v, d_v, rid, key, 10,
                           tile_rows=rows)

    t_full = timeit("full pt_wave depth-10", full, k_pt, n=3)
    r = full(k_pt)
    rays = float(r[3])
    print(f"rays={rays:.0f}  full={rays / t_full / 1e6:.2f} Mrays/s",
          flush=True)
    print(f"model: 9 x (key {t_key * 1e3:.0f} + gather {t_gat * 1e3:.0f}) "
          f"+ ~{t_k0 * 1e3:.0f} + decaying kernels "
          f"(b1 sorted {t_k1 * 1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
