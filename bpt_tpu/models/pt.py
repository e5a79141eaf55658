"""Unidirectional path tracer with next-event estimation — wavefront form of
the reference's recursive path_trace_color (src/camera.h:255-292).

Per bounce, the whole ray batch moves through: intersect wave -> emission ->
delta-follow or 50/50 light/BSDF mixture sampling -> throughput update.
Dead lanes are masked (their traversal collapses via tmax = 0).  Estimator
semantics match the reference exactly: no Russian roulette, hard max_depth
cutoff, single-sample (attenuation * scattering_pdf * L) / mixture_pdf
estimator, emission dropped on delta bounces (skip_pdf early return,
camera.h:273-275).

Layout: the whole loop runs on component-SoA [B] arrays (see core.vec3);
[B,3] conversion happens only at the chunk boundary.  Randomness enters only
through ``uniforms_fn(bounce, n) -> n rows of [B]`` so tests can inject a
fixed tensor and compare against the NumPy oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.core import vec3 as v3
from bpt_tpu.core.vec3 import Vec3
from bpt_tpu.ops import shade_soa as sh
from bpt_tpu.ops import soa
from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.scene.types import MAT_LIGHT, SceneArrays

# uniform slot layout per bounce
U_MIX = 0  # mixture_pdf 50/50 choice (pdf.h:82-86)
U_LPICK = 1  # light triangle pick (triangle.h:187)
U_LU = 2  # light barycentric u
U_LV = 3  # light barycentric v
U_B1 = 4  # bsdf dir sample
U_B2 = 5
U_DIEL = 6  # dielectric reflect/refract choice (material.h:109)
U_FZ1 = 7  # metal fuzz sphere dir
U_FZ2 = 8
NU = 9


class PTStats(NamedTuple):
    rays_traced: jnp.ndarray  # scalar int32 — reference-parity counter
    node_visits: jnp.ndarray
    aabb_hits: jnp.ndarray
    tri_tests: jnp.ndarray
    tri_hits: jnp.ndarray


def path_trace_fast(scene: SceneArrays, origins, dirs, ray_ids, key, max_depth: int):
    """Dispatch: fused Pallas megakernel on TPU for SMEM-resident scenes
    (own threefry stream, ~26x the XLA wavefront), else the oracle-pinned
    jnp wavefront.  ray_ids < 0 marks inactive lanes (padding)."""
    import os

    import jax as _jax

    from bpt_tpu.ops.pallas.pt_kernel import megakernel_ok, pt_megakernel

    enabled = os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
    if enabled and _jax.default_backend() == "tpu" and megakernel_ok(scene):
        o = v3.from_array(origins)
        d = v3.from_array(dirs)
        rx, ry, rz, rays, extra = pt_megakernel(
            scene, o, d, ray_ids, key, max_depth)
        rad = jnp.stack([rx, ry, rz], axis=-1)
        # counters f32: they overflow int32 at high depth/spp (image
        # unaffected, but the stat would wrap)
        stats = PTStats(
            rays_traced=rays.astype(jnp.int32),
            node_visits=extra[0],
            aabb_hits=extra[1],
            tri_tests=extra[2],
            tri_hits=extra[3],
        )
        return rad, stats
    active = ray_ids >= 0
    rad, stats = path_trace_radiance(
        scene, origins, dirs, max_depth,
        default_uniforms_fn(key, jnp.maximum(ray_ids, 0), origins.dtype),
    )
    return jnp.where(active[..., None], rad, 0.0), stats


def path_trace_pixels_fast(scene: SceneArrays, i, j, sx, sy, ray_ids,
                           cc, key, max_depth: int):
    """Fully-fused dispatch: in-kernel ray generation + PT trace on TPU
    (the remaining XLA per-chunk work is index math + the framebuffer add).
    cc: CameraConstants (defocus must be off — YAML always forces it off;
    defocus scenes fall back).  key: the BASE render key (streams 0/1 fold
    in-kernel, mirroring the driver's stream split)."""
    import os

    import jax as _jax

    from bpt_tpu.models.camera import generate_rays
    from bpt_tpu.ops.pallas.pt_kernel import (
        camera_table,
        megakernel_ok,
        pt_megakernel_pixels,
    )

    enabled = os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
    if (enabled and _jax.default_backend() == "tpu" and megakernel_ok(scene)
            and not cc.defocus):
        rx, ry, rz, rays, extra = pt_megakernel_pixels(
            scene, i, j, sx, sy, ray_ids, camera_table(cc), key, max_depth
        )
        rad = jnp.stack([rx, ry, rz], axis=-1)
        # counters f32: int32 would overflow at high depth/spp
        stats = PTStats(
            rays_traced=rays.astype(jnp.int32),
            node_visits=extra[0],
            aabb_hits=extra[1],
            tri_tests=extra[2],
            tri_hits=extra[3],
        )
        return rad, stats
    # fallback: XLA raygen + the existing dispatch
    from bpt_tpu.core import rng as rng_mod

    ids = jnp.maximum(ray_ids, 0)
    k_gen = jax.random.fold_in(key, 0)
    u_gen = rng_mod.wave_uniforms(k_gen, ids, 0, 4, dtype=i.dtype)
    o, d = generate_rays(cc, i, j, sx, sy, u_gen)
    k_pt = jax.random.fold_in(key, 1)
    return path_trace_fast(scene, o, d, ray_ids, k_pt, max_depth)


def _shared_scatter() -> bool:
    """BPT_TPU_PT_SHARED_SCATTER=1: the mixture's bsdf branch reuses the
    light-point pair (U_LU, U_LV) instead of drawing (U_B1, U_B2) —
    statistically exact (see the call site), saves one threefry/bounce
    in the kernels.  Read at trace time like the other env toggles."""
    import os

    return os.environ.get("BPT_TPU_PT_SHARED_SCATTER", "") == "1"


def default_uniforms_fn(key, ray_ids, dtype):
    def fn(bounce, n, sel=None):
        # ``sel`` (optional int32 [W]): generate draws for the lanes at
        # these ORIGINAL positions only — the live-prefix narrowed
        # subpath trace (bdpt._trace_subpath_narrow) carries its wave in
        # sorted order and asks for uniforms per (gathered) ray id, so a
        # lane's stream is position-invariant by construction (the rid
        # RNG invariant, CLAUDE.md).
        ids = ray_ids if sel is None else ray_ids[sel]
        return rng_mod.uniform_rows(key, ids, bounce, n, dtype=dtype)

    fn.supports_sel = True
    return fn


def kernel_stream_uniforms_fn(key, ray_ids, dtype, n_vols: int = 0):
    """Replicates the Pallas kernels' in-kernel threefry stream for the
    jnp wavefront: per-slot subkeys (_subkeys), the bounce in the
    threefry COUNTER, and the round-2 PAIRED draws — even slot s takes
    x0 of threefry(keys[s], (rid, bounce)), odd slot s takes x1 of the
    s-1 call; the volume free-flight slots (NU..NU+V-1) are single
    draws.  Lets RNG-mode kernels (pt_wave has no injection buffer) be
    pinned against path_trace_radiance on the SAME stream."""
    from bpt_tpu.ops.pallas.pt_kernel import (
        NU,
        _bits_to_unit_float,
        _subkeys,
        _threefry2x32,
    )

    keys = _subkeys(key, NU + n_vols)
    ridu = ray_ids.astype(jnp.uint32)
    # the "odd tail" single-draw classification below assumes the last
    # surface slot has no draw2 partner, which holds only for odd NU; if
    # NU ever becomes even this helper would silently diverge from the
    # kernels' paired stream and mask the parity tests it supports
    assert NU % 2 == 1, "kernel_stream_uniforms_fn assumes odd NU"

    def fn(bounce, n, sel=None):
        ridw = ridu if sel is None else ridu[sel]
        ctr = (jnp.zeros_like(ridw) + bounce).astype(jnp.uint32)
        rows = []
        for s in range(n):
            single = s >= NU or s == NU - 1  # volume slots + odd tail
            if single:
                b0, _ = _threefry2x32(keys[2 * s], keys[2 * s + 1],
                                      ridw, ctr)
                rows.append(_bits_to_unit_float(b0).astype(dtype))
            elif s % 2 == 0:
                b0, b1 = _threefry2x32(keys[2 * s], keys[2 * s + 1],
                                       ridw, ctr)
                rows.append(_bits_to_unit_float(b0).astype(dtype))
                rows.append(_bits_to_unit_float(b1).astype(dtype))
            else:
                continue  # emitted by the even partner above
        return rows[:n]

    fn.supports_sel = True
    return fn


def array_uniforms_fn(uniforms):
    """uniforms: [B, D, NU] — the oracle-test injection path."""
    rows_all = jnp.moveaxis(uniforms, 0, -1)  # [D, NU, B]

    def fn(bounce, n, sel=None):
        step = jax.lax.dynamic_index_in_dim(rows_all, bounce, axis=0,
                                            keepdims=False)  # [NU, B]
        if sel is not None:
            step = step[:, sel]
        return [step[i] for i in range(n)]

    fn.supports_sel = True
    return fn


def path_trace_radiance(
    scene: SceneArrays,
    origins,
    dirs,
    max_depth: int,
    uniforms_fn,
):
    """Radiance for a batch of primary rays. origins/dirs: [B,3].

    Returns (radiance [B,3], PTStats).
    """
    B = origins.shape[0]
    dtype = origins.dtype
    o0 = v3.from_array(origins)
    d0 = v3.from_array(dirs)
    bg = Vec3(scene.background[0], scene.background[1], scene.background[2])

    nu_total = NU + scene.num_volumes

    def body(b, state):
        o, d, thr, rad, alive, stats = state
        u = uniforms_fn(b, nu_total)

        h = soa.closest_hit(scene, o, d, T_MIN, jnp.inf, mask=alive)
        rec = soa.complete_hit(scene, o, d, h)
        if scene.num_volumes:
            rec = soa.apply_volumes(scene, o, d, rec, u[NU:], alive)
        mtype = scene.materials.mtype[rec.mat]

        miss = alive & ~rec.hit
        rad = v3.scale_add(rad, miss, thr * bg)

        live_hit = alive & rec.hit
        emission = sh.emitted(scene, rec.mat, rec.front_face, rec.u, rec.v, rec.p)
        delta = sh.is_delta(mtype)
        can_scatter = mtype != MAT_LIGHT

        # non-delta lanes add emission (skip_pdf lanes drop it, camera.h:273)
        rad = v3.scale_add(rad, live_hit & ~delta, thr * emission)

        atten = sh.attenuation(scene, rec.mat, mtype, rec.u, rec.v, rec.p)

        # delta continuation (camera.h:273-275)
        d_delta = sh.delta_scatter_dir(
            scene, rec.mat, mtype, d, rec.normal, rec.front_face,
            u[U_DIEL], u[U_FZ1], u[U_FZ2],
        )

        # mixture sampling (camera.h:277-289).  BPT_TPU_PT_SHARED_SCATTER:
        # one uniform pair serves BOTH mixture branches — only the taken
        # branch's direction survives the pick, so each draw is consumed
        # at most once per bounce and the sampled-direction marginal is
        # exactly 0.5 p_light + 0.5 p_bsdf either way (the reference's
        # sequential RNG likewise never draws for the untaken branch).
        # Saves one threefry per bounce in the kernels; documented
        # stream deviation (docs/PARITY.md), default off.
        light_dir = sh.sample_light_dir(scene, rec.p, u[U_LPICK], u[U_LU], u[U_LV])
        if _shared_scatter():
            bsdf_dir = sh.sample_bsdf_dir(scene, mtype, rec.normal,
                                          u[U_LU], u[U_LV])
        else:
            bsdf_dir = sh.sample_bsdf_dir(scene, mtype, rec.normal,
                                          u[U_B1], u[U_B2])
        pick_light = u[U_MIX] < 0.5
        d_diff = v3.where(pick_light, light_dir, bsdf_dir)

        pdf_val = 0.5 * sh.light_pdf_value(scene, rec.p, d_diff) + \
            0.5 * sh.bsdf_pdf_value(mtype, rec.normal, d_diff)
        scat_pdf = sh.scattering_pdf(mtype, rec.normal, d_diff)

        diffuse_ok = live_hit & can_scatter & ~delta & (pdf_val > 0.0)
        delta_ok = live_hit & can_scatter & delta

        w = jnp.where(pdf_val > 0.0, scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)
        thr = v3.where(
            delta_ok,
            thr * atten,
            v3.where(diffuse_ok, thr * atten * w, thr),
        )

        alive_new = delta_ok | diffuse_ok
        o = v3.where(alive_new, rec.p, o)
        d = v3.where(alive_new, v3.where(delta_ok, d_delta, d_diff), d)

        stats = PTStats(
            rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32),
            node_visits=stats.node_visits + h.node_visits,
            aabb_hits=stats.aabb_hits + h.aabb_hits,
            tri_tests=stats.tri_tests + h.tri_tests,
            tri_hits=stats.tri_hits + h.tri_hits,
        )
        return (o, d, thr, rad, alive_new, stats)

    ones = jnp.ones((B,), dtype)
    zeros = jnp.zeros((B,), dtype)
    stats0 = PTStats(*(jnp.int32(0) for _ in range(5)))
    init = (
        o0, d0,
        Vec3(ones, ones, ones),
        Vec3(zeros, zeros, zeros),
        jnp.ones((B,), bool),
        stats0,
    )
    from bpt_tpu.models.bdpt import _loop

    o, d, thr, rad, alive, stats = _loop(max_depth, body, init)
    # depth-exhausted entry still bumps rays_traced (camera.h:256 runs before
    # the depth<=0 check)
    stats = stats._replace(
        rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32)
    )
    return v3.to_array(rad), stats
