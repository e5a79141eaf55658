"""Round-5 diagnostic: how do the bdpt_wave subpath stages scale with
depth?  Times cam/light subpath traces at depths 2/5/10 on the coffee
stand-in at a fixed wave width.  If wall scales ~linearly with depth the
per-bounce FIXED cost (sorts + full-width elementwise + dead-tile grid)
dominates — live-prefix compaction is the lever; if strongly sub-linear
the kernel already scales with live rays and the lever is per-op cost.

Usage: python tools/probe_bdpt_depthscale.py [B_log2]
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
from bpt_tpu.scene.loader import load_scene_from_yaml


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, *args, n=5):
    outs = fn(*args)
    sync(jax.tree_util.tree_leaves(outs)[0])
    t0 = time.monotonic()
    for _ in range(n):
        outs = fn(*args)
    for x in jax.tree_util.tree_leaves(outs):
        if hasattr(x, "dtype"):
            sync(x)
            break
    return (time.monotonic() - t0) / n, outs


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    B = 1 << blog
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene = ls.scene
    cfg = dataclasses.replace(ls.camera, image_width=512, aspect_ratio=1.0,
                              samples_per_pixel=16, max_depth=10)
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

    for depth in (2, 5, 10):
        from functools import partial

        @partial(jax.jit, static_argnums=())
        def cam_trace(o3, d3, depth=depth):
            o = v3.from_array(o3)
            d = v3.from_array(d3)
            return bdpt_mod.trace_subpath(
                scene, o, d, v3.Vec3(ones, ones, ones),
                jnp.ones((B,), bool), depth,
                pt_mod.default_uniforms_fn(k_cam, ray_ids, jnp.float32),
                collect_background=True,
                mis_prev=dict(p=o, n=v3.normalize_safe(d),
                              delta=jnp.ones((B,), bool),
                              mtype=jnp.zeros((B,), jnp.int32), pfwd=ones))

        t_cam, out = timeit(cam_trace, o3, d3)
        st = out[2]
        print(f"cam  d{depth:2d}: {t_cam*1e3:8.1f} ms  "
              f"ext={int(st.rays_traced)}  "
              f"ms/bounce={t_cam*1e3/depth:6.1f}", flush=True)

    # live-fraction scaling of ONE closest_hit call: if the FTB kernel +
    # sort + complete_hit pipeline is live-proportional, a 10%-alive wave
    # should cost ~10-20% of the all-alive wave; if it costs ~=100% the
    # per-bounce full-width overhead dominates and live-prefix narrowing
    # is the lever.
    from bpt_tpu.ops import soa

    o = v3.from_array(o3)
    d = v3.from_array(d3)

    for frac_pct in (100, 50, 10, 2):
        mask = (jnp.arange(B) % 100) < frac_pct

        @jax.jit
        def one_hit(o3, d3, mask):
            o = v3.from_array(o3)
            d = v3.from_array(d3)
            h = soa.closest_hit(scene, o, d, 1e-3, jnp.inf, mask=mask)
            return h.t

        t_h, _ = timeit(one_hit, o3, d3, mask)
        print(f"closest_hit alive={frac_pct:3d}%: {t_h*1e3:8.1f} ms",
              flush=True)

    # same, with complete_hit + a representative elementwise shade tail —
    # approximates one full bounce body minus vertex bookkeeping
    for frac_pct in (100, 10):
        mask = (jnp.arange(B) % 100) < frac_pct

        @jax.jit
        def one_bounce(o3, d3, mask):
            o = v3.from_array(o3)
            d = v3.from_array(d3)
            h = soa.closest_hit(scene, o, d, 1e-3, jnp.inf, mask=mask)
            rec = soa.complete_hit(scene, o, d, h)
            from bpt_tpu.ops import shade_soa as sh
            mtype = scene.materials.mtype[rec.mat]
            atten = sh.attenuation(scene, rec.mat, mtype, rec.u, rec.v, rec.p)
            em = sh.emitted(scene, rec.mat, rec.front_face, rec.u, rec.v, rec.p)
            return rec.t, atten.x + em.x

        t_b, _ = timeit(one_bounce, o3, d3, mask)
        print(f"bounce-ish  alive={frac_pct:3d}%: {t_b*1e3:8.1f} ms",
              flush=True)

    for depth in (2, 5, 10):
        @jax.jit
        def light_trace(depth=depth):
            return bdpt_mod.build_light_subpath(
                scene, B, depth, [ls_u[:, k] for k in range(bdpt_mod.NLS)],
                pt_mod.default_uniforms_fn(k_lt, ray_ids, jnp.float32),
                jnp.float32, mis=True)

        t_l, out = timeit(light_trace)
        st = out[3]
        nb = max(depth - 1, 1)
        print(f"light d{depth:2d}: {t_l*1e3:8.1f} ms  "
              f"ext={int(st.rays_traced)}  "
              f"ms/bounce={t_l*1e3/nb:6.1f}", flush=True)


if __name__ == "__main__":
    main()
