"""Connect-stage internals on coffee-91k: per-slot any_hit cost vs pair
math, and a pre-compacted any_hit variant (sort valid-first, run the
FTB any kernel on a CAP prefix).

Usage: python tools/probe_connect_split.py [B_log2 [depth]]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.core import vec3 as v3
from bpt_tpu.models import bdpt as bdpt_mod
from bpt_tpu.models import pt as pt_mod
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.ops import soa
from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.scene.loader import load_scene_from_yaml


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, n=5):
    outs = fn(*args)
    sync(jax.tree_util.tree_leaves(outs)[0])
    t0 = time.monotonic()
    for _ in range(n):
        outs = fn(*args)
    sync(jax.tree_util.tree_leaves(outs)[0])
    return (time.monotonic() - t0) / n, outs


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    B = 1 << blog
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene = ls.scene
    cfg = dataclasses.replace(ls.camera, image_width=512, aspect_ratio=1.0,
                              samples_per_pixel=16, max_depth=depth)
    cc = camera_constants(cfg, jnp.float32)
    key = jax.random.PRNGKey(0)
    npix = 512 * 512
    pix = jnp.arange(B, dtype=jnp.int32) % npix
    s_lin = jnp.arange(B, dtype=jnp.int32) // npix
    i = (pix % 512).astype(jnp.float32)
    j = (pix // 512).astype(jnp.float32)
    ray_ids = pix * 16 + s_lin
    k_gen = jax.random.fold_in(key, 0)
    u_gen = rng_mod.wave_uniforms(k_gen, ray_ids, 0, 4, dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, (s_lin % 4).astype(jnp.float32),
                           (s_lin // 4).astype(jnp.float32), u_gen)
    k_cam = jax.random.fold_in(key, 2)
    k_ls = jax.random.fold_in(key, 3)
    k_lt = jax.random.fold_in(key, 4)
    ls_u = rng_mod.wave_uniforms(k_ls, ray_ids, 0, bdpt_mod.NLS,
                                 dtype=jnp.float32)
    ones = jnp.ones((B,), jnp.float32)

    @jax.jit
    def build(o3, d3):
        o = v3.from_array(o3)
        d = v3.from_array(d3)
        cam, bg, st_c, mis_c = bdpt_mod.trace_subpath(
            scene, o, d, v3.Vec3(ones, ones, ones), jnp.ones((B,), bool),
            depth, pt_mod.default_uniforms_fn(k_cam, ray_ids, jnp.float32),
            collect_background=True,
            mis_prev=dict(p=o, n=v3.normalize_safe(d),
                          delta=jnp.ones((B,), bool),
                          mtype=jnp.zeros((B,), jnp.int32), pfwd=ones))
        emitter, traced, path_ok, st_l, mis_l = bdpt_mod.build_light_subpath(
            scene, B, depth, [ls_u[:, k] for k in range(bdpt_mod.NLS)],
            pt_mod.default_uniforms_fn(k_lt, ray_ids, jnp.float32),
            jnp.float32, mis=True)
        light = bdpt_mod._concat_vertices(emitter, traced)
        return cam, light, mis_c, mis_l

    cam, light, mis_c, mis_l = build(o3, d3)

    # representative slot wave: s = 1 (first bounce vertices, most valid)
    s = 1
    import numpy as np
    S_l = light.valid.shape[0]
    cp = v3.Vec3(cam.p.x[s], cam.p.y[s], cam.p.z[s])
    diff = v3.Vec3(light.p.x - cp.x[None], light.p.y - cp.y[None],
                   light.p.z - cp.z[None])
    dist2 = v3.length_squared(diff)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    du = v3.Vec3(diff.x / dist, diff.y / dist, diff.z / dist)
    c_ok = cam.valid[s] & ~cam.delta[s]
    pair_ok = (c_ok[None] & light.valid & ~light.delta & (dist2 > 0.0)
               & (dist - 0.001 > 0.0))
    so = v3.Vec3(cp.x[None] + 0.001 * du.x, cp.y[None] + 0.001 * du.y,
                 cp.z[None] + 0.001 * du.z)
    t_vis = (dist - 0.001) * (1.0 - 1e-4)
    n_valid = int(jnp.sum(pair_ok))
    print(f"slot {s}: lanes {S_l * B}, valid {n_valid} "
          f"({100.0 * n_valid / (S_l * B):.1f}%)", flush=True)

    flat = lambda vv: v3.Vec3(*(c.reshape(-1) for c in vv))

    @jax.jit
    def any_wave(so, du, t_vis, pair_ok):
        return soa.any_hit(scene, flat(so), flat(du), T_MIN,
                           t_vis.reshape(-1), mask=pair_ok.reshape(-1))

    t_any, occ = timeit(any_wave, so, du, t_vis, pair_ok)
    print(f"soa.any_hit full wave: {t_any * 1e3:8.1f} ms "
          f"(occluded {int(jnp.sum(occ))})", flush=True)

    # variant: pre-compacted prefix any (exact when n_valid <= CAP)
    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled

    CAP = B

    @jax.jit
    def any_compact(so, du, t_vis, pair_ok):
        _C, aabb, blocks = pack_clusters_rolled(scene)
        ox, oy, oz = (c.reshape(-1) for c in so)
        dx, dy, dz = (c.reshape(-1) for c in du)
        tm = jnp.where(pair_ok.reshape(-1), t_vis.reshape(-1), 0.0)
        key = soa._ftb_sort_key(v3.Vec3(ox, oy, oz), v3.Vec3(dx, dy, dz),
                                pair_ok.reshape(-1))
        idx = jnp.arange(ox.shape[0], dtype=jnp.int32)
        (_, sox, soy, soz, sdx, sdy, sdz, stm, sidx) = jax.lax.sort(
            (key, ox, oy, oz, dx, dy, dz, tm, idx), num_keys=1)
        found = clustered_any_ftb_pallas(
            aabb, blocks, sox[:CAP], soy[:CAP], soz[:CAP],
            sdx[:CAP], sdy[:CAP], sdz[:CAP], stm[:CAP])
        found_full = jnp.zeros((ox.shape[0],), jnp.float32
                               ).at[:CAP].set(found.astype(jnp.float32))
        _, out = jax.lax.sort((sidx, found_full), num_keys=1)
        return out > 0.5

    t_cmp, occ2 = timeit(any_compact, so, du, t_vis, pair_ok)
    ok = bool(jnp.all(occ2.reshape(-1) == occ.reshape(-1)))
    print(f"compacted any (CAP=B): {t_cmp * 1e3:8.1f} ms  match={ok}",
          flush=True)

    # variant C: nonzero-compaction (no big sort) -> gather CAP -> FTB
    # sort at CAP -> kernel -> scatter back
    @jax.jit
    def any_nonzero(so, du, t_vis, pair_ok):
        _C, aabb, blocks = pack_clusters_rolled(scene)
        from bpt_tpu.ops.pallas.clusters import cluster_orders  # noqa: F401

        pk = pair_ok.reshape(-1)
        N = pk.shape[0]
        (sel,) = jnp.nonzero(pk, size=CAP, fill_value=N)
        in_range = sel < N
        seli = jnp.where(in_range, sel, 0)
        ox = jnp.where(in_range, so.x.reshape(-1)[seli], 0.0)
        oy = jnp.where(in_range, so.y.reshape(-1)[seli], 0.0)
        oz = jnp.where(in_range, so.z.reshape(-1)[seli], 0.0)
        dx = jnp.where(in_range, du.x.reshape(-1)[seli], 1.0)
        dy = jnp.where(in_range, du.y.reshape(-1)[seli], 0.0)
        dz = jnp.where(in_range, du.z.reshape(-1)[seli], 0.0)
        tm = jnp.where(in_range, t_vis.reshape(-1)[seli], 0.0)
        key = soa._ftb_sort_key(v3.Vec3(ox, oy, oz), v3.Vec3(dx, dy, dz),
                                in_range)
        (_, sox, soy, soz, sdx, sdy, sdz, stm, ssel) = jax.lax.sort(
            (key, ox, oy, oz, dx, dy, dz, tm, sel), num_keys=1)
        found = clustered_any_ftb_pallas(
            aabb, blocks, sox, soy, soz, sdx, sdy, sdz, stm)
        out = jnp.zeros((N + 1,), jnp.float32
                        ).at[ssel].set(found.astype(jnp.float32))[:N]
        return out > 0.5

    t_nz, occ3 = timeit(any_nonzero, so, du, t_vis, pair_ok)
    ok3 = bool(jnp.all(occ3 == occ.reshape(-1)))
    print(f"nonzero-compact any:   {t_nz * 1e3:8.1f} ms  match={ok3}",
          flush=True)
    if not ok3:
        mm = jnp.asarray(occ3 != occ.reshape(-1))
        pk = jnp.asarray(pair_ok.reshape(-1))
        print(f"  mismatches {int(jnp.sum(mm))} "
              f"(on valid lanes {int(jnp.sum(mm & pk))}); "
              f"full=True/nz=False "
              f"{int(jnp.sum(mm & occ.reshape(-1)))}", flush=True)

    # cost split: nonzero-only, gather-only, kernel-only
    @jax.jit
    def nz_only(pair_ok):
        pk = pair_ok.reshape(-1)
        (sel,) = jnp.nonzero(pk, size=CAP, fill_value=pk.shape[0])
        return sel

    t_s, sel = timeit(nz_only, pair_ok)
    print(f"  nonzero(5.2M):       {t_s * 1e3:8.1f} ms", flush=True)

    @jax.jit
    def kern_only(so, du, t_vis, pair_ok, sel):
        _C, aabb, blocks = pack_clusters_rolled(scene)
        N = pair_ok.reshape(-1).shape[0]
        in_range = sel < N
        seli = jnp.where(in_range, sel, 0)
        ox = jnp.where(in_range, so.x.reshape(-1)[seli], 0.0)
        oy = jnp.where(in_range, so.y.reshape(-1)[seli], 0.0)
        oz = jnp.where(in_range, so.z.reshape(-1)[seli], 0.0)
        dx = jnp.where(in_range, du.x.reshape(-1)[seli], 1.0)
        dy = jnp.where(in_range, du.y.reshape(-1)[seli], 0.0)
        dz = jnp.where(in_range, du.z.reshape(-1)[seli], 0.0)
        tm = jnp.where(in_range, t_vis.reshape(-1)[seli], 0.0)
        key = soa._ftb_sort_key(v3.Vec3(ox, oy, oz), v3.Vec3(dx, dy, dz),
                                in_range)
        (_, sox, soy, soz, sdx, sdy, sdz, stm, ssel) = jax.lax.sort(
            (key, ox, oy, oz, dx, dy, dz, tm, sel), num_keys=1)
        return clustered_any_ftb_pallas(
            aabb, blocks, sox, soy, soz, sdx, sdy, sdz, stm)

    t_k, _ = timeit(kern_only, so, du, t_vis, pair_ok, sel)
    print(f"  gather+sort+kernel:  {t_k * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
