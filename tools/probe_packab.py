"""A/B the packing-aware BVH split against the reference median split
IN ONE PROCESS (same chip conditions): bounce-1 kernel time + the
in-kernel visit counters (nv) for both scene builds.

The union simulation (probe_packsplit) predicted -23% tile-union visits
for packed splits, but the first on-chip measurement showed the SORTED
bounce kernel 1.7x SLOWER (and the unsorted one faster) — this pins
down whether the regression is real and where the extra visits come
from (nv counts actual supers+clusters processed per tile).

Usage: python tools/probe_packab.py [rows [spp]]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bpt_tpu.scene import bvh as bvh_mod
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders


def load(packed: bool):
    old = bvh_mod._PACK_TRIS
    bvh_mod._PACK_TRIS = 32 if packed else (1 << 60)
    # the native builder has packing baked in; force the numpy builder
    # for the A/B so the flag takes effect (build_bvh calls
    # native.build_bvh_native directly)
    import bpt_tpu.native as nat
    old_nb = nat.build_bvh_native
    if not packed:
        nat.build_bvh_native = lambda *a, **k: None
    try:
        from bpt_tpu.scene.loader import load_scene_from_yaml
        ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    finally:
        bvh_mod._PACK_TRIS = old
        nat.build_bvh_native = old_nb
    return ls


def bounce_state(scene, cfg, spp, rows):
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
    state0 = (ox, oy, oz, dx, dy, dz, one, one, one, one, rid)
    args = (meta0, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb,
            order_t, tri_hbm)

    def launch(st, b):
        return ptw._launch_bounce(meta0.at[4].set(b), tri_tab, mat_tab,
                                  lgt_tab, keys_flat, cl_aabb, order_t,
                                  tri_hbm, st, rows, False, True)

    outs = launch(state0, 0)
    (ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1, tb1) = outs[:9]
    alive1 = outs[12]
    # proxy-sort the b1 state (the production regime)
    live = alive1 > 0.5
    big = jnp.float32(3.4e38)
    lo_b = jnp.stack([jnp.min(jnp.where(live, v, big))
                      for v in (ox1, oy1, oz1)])
    hi_b = jnp.stack([jnp.max(jnp.where(live, v, -big))
                      for v in (ox1, oy1, oz1)])
    keyv = ptw._coherence_key(lo_b, hi_b, ox1, oy1, oz1, dx1, dy1, dz1,
                              alive1)
    srt = jax.lax.sort((keyv, ox1, oy1, oz1, dx1, dy1, dz1, tr1, tg1,
                        tb1, alive1, rid), num_keys=1)
    st1 = tuple(srt[1:10]) + (srt[10], srt[11])
    return launch, st1


def timed(launch, st, b, n=5):
    outs = launch(st, b)
    float(jnp.sum(outs[0]))
    t0 = time.monotonic()
    for _ in range(n):
        outs = launch(st, b)
    float(jnp.sum(outs[0]))
    dt = (time.monotonic() - t0) / n
    st4 = np.asarray(outs[-1])
    return dt, st4


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    setups = {}
    for name, packed in (("median", False), ("packed", True)):
        ls = load(packed)
        scene = ls.scene
        C = len(scene.cluster_splits) - 1
        S = len(scene.super_splits) - 1
        print(f"{name}: C={C} S={S}", flush=True)
        setups[name] = bounce_state(scene, ls.camera, spp, rows)
    # interleaved rounds cancel the chip's minutes-scale drift
    times = {k: [] for k in setups}
    for r in range(5):
        for name, (launch, st1) in setups.items():
            dt, st4 = timed(launch, st1, 1, n=2)
            times[name].append(dt)
            if r == 0:
                print(f"{name}: stats(nv,ah,tt,th)={st4.tolist()}",
                      flush=True)
    for name, ts in times.items():
        ms = sorted(ts)[len(ts) // 2] * 1000
        print(f"{name}: b1-kernel median {ms:7.1f} ms "
              f"(runs {[round(t*1000) for t in ts]})", flush=True)

    # ---- full-wave e2e A/B (the number that matters)
    from bpt_tpu.core import vec3 as v3
    waves = {}
    for name, packed in (("median", False), ("packed", True)):
        ls = load(packed)
        scene = ls.scene
        cc = camera_constants(ls.camera, scene.dtype)
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
        o = v3.Vec3(*[jnp.asarray(o3[:, a], jnp.float32) for a in range(3)])
        d = v3.Vec3(*[jnp.asarray(d3[:, a], jnp.float32) for a in range(3)])
        waves[name] = (scene, o, d, rid, jax.random.fold_in(key, 1))

    def run_wave(args):
        scene, o, d, rid, k = args
        r = ptw.pt_wave(scene, o, d, rid, k, 10, tile_rows=rows)
        float(jnp.sum(r[0]))
        return float(r[3])

    for name in waves:
        run_wave(waves[name])  # compile+warm
    wt = {k: [] for k in waves}
    for r in range(5):
        for name in waves:
            t0 = time.monotonic()
            rays = run_wave(waves[name])
            wt[name].append(time.monotonic() - t0)
    for name, ts in wt.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: full-wave median {med:6.2f} s = "
              f"{rays / med / 1e6:.2f} Mrays/s "
              f"(runs {[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
