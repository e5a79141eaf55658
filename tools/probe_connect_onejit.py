"""Decisive connect-compaction probe: build + pair math + any-hit
variants all inside ONE jit (like production), vs the eager-input form
that showed the gather anomaly (tools/dbg_gather_real.py).

Variants, each exact-compared against the full-wave soa.any_hit INSIDE
the same jit:
  A. nonzero(size=CAP) + gather -> FTB sort -> kernel -> scatter
  B. 2-column (key, idx) sort -> prefix gather -> FTB sort -> kernel

Usage: python tools/probe_connect_onejit.py [B_log2 [depth]]
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
    CAP = B

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
        return cam, light

    def pair_math(cam, light, s):
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
        return so, du, t_vis, pair_ok

    flat = lambda vv: v3.Vec3(*(c.reshape(-1) for c in vv))

    def full_any(so, du, t_vis, pair_ok):
        return soa.any_hit(scene, flat(so), flat(du), T_MIN,
                           t_vis.reshape(-1), mask=pair_ok.reshape(-1))

    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled

    def nz_any(so, du, t_vis, pair_ok):
        _C, aabb, blocks = pack_clusters_rolled(scene)
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

    def sort_any(so, du, t_vis, pair_ok):
        _C, aabb, blocks = pack_clusters_rolled(scene)
        pk = pair_ok.reshape(-1)
        N = pk.shape[0]
        idx = jnp.arange(N, dtype=jnp.int32)
        # validity-major 2-column sort, then cheap prefix gathers at CAP
        vkey = jnp.where(pk, idx, jnp.int32(0x7FFFFFFF))
        (_, sel_full) = jax.lax.sort((vkey, idx), num_keys=1)
        sel = sel_full[:CAP]
        in_range = pk[sel]
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
            (key, ox, oy, oz, dx, dy, dz, tm,
             jnp.where(in_range, sel, N)), num_keys=1)
        found = clustered_any_ftb_pallas(
            aabb, blocks, sox, soy, soz, sdx, sdy, sdz, stm)
        out = jnp.zeros((N + 1,), jnp.float32
                        ).at[ssel].set(found.astype(jnp.float32))[:N]
        return out > 0.5

    @jax.jit
    def onejit(o3, d3):
        cam, light = build(o3, d3)
        so, du, t_vis, pair_ok = pair_math(cam, light, 1)
        occ_full = full_any(so, du, t_vis, pair_ok)
        occ_nz = nz_any(so, du, t_vis, pair_ok)
        occ_sort = sort_any(so, du, t_vis, pair_ok)
        pk = pair_ok.reshape(-1)
        nv = jnp.sum(pk, dtype=jnp.int32)
        mm_nz = jnp.sum((occ_nz != occ_full) & pk, dtype=jnp.int32)
        mm_sort = jnp.sum((occ_sort != occ_full) & pk, dtype=jnp.int32)
        # off-mask disagreement too (contract: both must report False)
        off_nz = jnp.sum((occ_nz != occ_full) & ~pk, dtype=jnp.int32)
        off_sort = jnp.sum((occ_sort != occ_full) & ~pk, dtype=jnp.int32)
        return nv, mm_nz, mm_sort, off_nz, off_sort

    nv, mm_nz, mm_sort, off_nz, off_sort = onejit(o3, d3)
    print(f"one-jit: valid={int(nv)} mm_nz={int(mm_nz)} "
          f"mm_sort={int(mm_sort)} off_nz={int(off_nz)} "
          f"off_sort={int(off_sort)}", flush=True)

    # timing, separate jits per variant (build excluded: pass cam/light in)
    cam, light = jax.jit(build)(o3, d3)
    f_full = jax.jit(lambda c, l: full_any(*pair_math(c, l, 1)))
    f_nz = jax.jit(lambda c, l: nz_any(*pair_math(c, l, 1)))
    f_sort = jax.jit(lambda c, l: sort_any(*pair_math(c, l, 1)))
    t_full, occ_f = timeit(f_full, cam, light)
    t_nz, occ_n = timeit(f_nz, cam, light)
    t_sort, occ_s = timeit(f_sort, cam, light)
    print(f"full:    {t_full * 1e3:8.1f} ms", flush=True)
    mmn = int(jnp.sum(occ_n != occ_f.reshape(-1)))
    mms = int(jnp.sum(occ_s != occ_f.reshape(-1)))
    print(f"nz:      {t_nz * 1e3:8.1f} ms  (separate-jit mm={mmn})",
          flush=True)
    print(f"sort:    {t_sort * 1e3:8.1f} ms  (separate-jit mm={mms})",
          flush=True)


if __name__ == "__main__":
    main()
