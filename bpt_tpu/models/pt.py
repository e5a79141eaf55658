"""Unidirectional path tracer with next-event estimation — wavefront form of
the reference's recursive path_trace_color (src/camera.h:255-292).

Per bounce, the whole ray batch moves through: intersect wave -> emission ->
delta-follow or 50/50 light/BSDF mixture sampling -> throughput update.
Dead lanes are masked (no compaction yet).  Estimator semantics match the
reference exactly: no Russian roulette, hard max_depth cutoff, single-sample
(attenuation * scattering_pdf * L) / mixture_pdf estimator, emission dropped
on delta bounces (skip_pdf early return, camera.h:273-275).

Randomness enters only through ``uniforms_fn(bounce, n)`` so tests can inject
a fixed tensor and compare bit-for-bit against the NumPy oracle.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops import bsdf as bsdf_ops
from bpt_tpu.ops import lights as light_ops
from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.ops.traverse import closest_hit, complete_hit
from bpt_tpu.scene.types import SceneArrays

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


def default_uniforms_fn(key, ray_ids, dtype):
    def fn(bounce, n):
        return rng_mod.wave_uniforms(key, ray_ids, bounce, n, dtype=dtype)

    return fn


def array_uniforms_fn(uniforms):
    """uniforms: [B, D, NU] — the oracle-test injection path."""

    def fn(bounce, n):
        return jax.lax.dynamic_index_in_dim(
            uniforms, bounce, axis=1, keepdims=False
        )[..., :n]

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

    def body(b, state):
        o, d, thr, rad, alive, stats = state
        u = uniforms_fn(b, NU)

        hit_raw, tstats = closest_hit(scene, o, d, T_MIN, jnp.inf)
        rec = complete_hit(scene, o, d, hit_raw)

        miss = alive & ~rec.hit
        rad = rad + jnp.where(miss[..., None], thr * scene.background, 0.0)

        live_hit = alive & rec.hit
        emission = bsdf_ops.emitted(scene, rec.mat, rec.front_face, rec.u, rec.v, rec.p)

        delta = bsdf_ops.is_delta(scene, rec.mat)
        can_scatter = bsdf_ops.scatters(scene, rec.mat)

        # non-delta lanes add emission (skip_pdf lanes drop it, camera.h:273)
        add_emit = live_hit & ~delta
        rad = rad + jnp.where(add_emit[..., None], thr * emission, 0.0)

        atten = bsdf_ops.attenuation(scene, rec.mat, rec.u, rec.v, rec.p)

        # delta continuation (camera.h:273-275)
        d_delta = bsdf_ops.delta_scatter_dir(
            scene, rec.mat, d, rec.normal, rec.front_face,
            jnp.stack([u[:, U_DIEL], u[:, U_FZ1], u[:, U_FZ2], u[:, U_MIX]], axis=-1),
        )

        # mixture sampling (camera.h:277-289)
        light_dir = light_ops.sample_light_dir(
            scene, rec.p, u[:, U_LPICK], u[:, U_LU], u[:, U_LV]
        )
        bsdf_dir = bsdf_ops.sample_bsdf_dir(
            scene, rec.mat, rec.normal, u[:, U_B1:U_B2 + 1]
        )
        pick_light = u[:, U_MIX] < 0.5
        d_diff = jnp.where(pick_light[..., None], light_dir, bsdf_dir)

        pdf_val = 0.5 * light_ops.light_pdf_value(scene, rec.p, d_diff) + \
            0.5 * bsdf_ops.bsdf_pdf_value(scene, rec.mat, rec.normal, d_diff)
        scat_pdf = bsdf_ops.scattering_pdf(scene, rec.mat, rec.normal, d_diff)

        diffuse_ok = live_hit & can_scatter & ~delta & (pdf_val > 0.0)
        delta_ok = live_hit & can_scatter & delta

        w = jnp.where(pdf_val > 0.0, scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)
        thr_new = jnp.where(
            delta_ok[..., None],
            thr * atten,
            jnp.where(diffuse_ok[..., None], thr * atten * w[..., None], thr),
        )

        d_new = jnp.where(delta_ok[..., None], d_delta, d_diff)
        o_new = rec.p

        alive_new = delta_ok | diffuse_ok
        o = jnp.where(alive_new[..., None], o_new, o)
        d = jnp.where(alive_new[..., None], d_new, d)

        stats = PTStats(
            rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32),
            node_visits=stats.node_visits + jnp.sum(jnp.where(alive, tstats.node_visits, 0), dtype=jnp.int32),
            aabb_hits=stats.aabb_hits + jnp.sum(jnp.where(alive, tstats.aabb_hits, 0), dtype=jnp.int32),
            tri_tests=stats.tri_tests + jnp.sum(jnp.where(alive, tstats.tri_tests, 0), dtype=jnp.int32),
            tri_hits=stats.tri_hits + jnp.sum(jnp.where(alive, tstats.tri_hits, 0), dtype=jnp.int32),
        )
        return (o, d, thr_new, rad, alive_new, stats)

    stats0 = PTStats(*(jnp.int32(0) for _ in range(5)))
    init = (
        origins,
        dirs,
        jnp.ones((B, 3), dtype),
        jnp.zeros((B, 3), dtype),
        jnp.ones((B,), bool),
        stats0,
    )
    o, d, thr, rad, alive, stats = jax.lax.fori_loop(0, max_depth, body, init)
    # depth-exhausted entry still bumps rays_traced (camera.h:256 runs before
    # the depth<=0 check)
    stats = stats._replace(
        rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32)
    )
    return rad, stats
