"""Bidirectional integrator — wavefront form of bidirectional_color
(src/camera.h:294-475).

Three stages, each a full-batch wave:

1. camera subpath: trace_path (camera.h:325-370) storing a vertex SoA
   [B, depth, ...]; per-vertex emission accumulates for non-delta vertices
   (camera.h:305-309) plus background on miss (camera.h:336-339).
2. light subpath: area-weighted emitter sample (camera.h:381-405; CDF
   searchsorted), throughput 1/max(pdf_area, 1e-8), cosine exit direction
   with throughput emission * cos / max(cos/pi, 1e-8) (camera.h:407-415),
   then the same trace for depth-1 more vertices.
3. connections: the (s, t) outer product evaluated blockwise — a fori loop
   over camera-vertex slots, each step a [B, depth] wave of shadow rays —
   with the reference's exact rules: skip delta vertices, geometry term
   cos_c * cos_l / d^2, visibility epsilon 0.001 at both ends, light vertex
   contributes raw emission when it is an emitter (camera.h:440-475).
   NO MIS weights — faithful to the reference's (biased) all-pairs sum.

Randomness is injected via uniforms_fn callables for oracle testing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm
from bpt_tpu.core.sampling import cosine_direction_world
from bpt_tpu.ops import bsdf as bsdf_ops
from bpt_tpu.ops import lights as light_ops
from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.ops.traverse import any_hit, closest_hit, complete_hit
from bpt_tpu.scene.types import MAT_LIGHT, SceneArrays

# per-bounce uniform slots for trace_subpath
TU_B1 = 0  # bsdf dir sample
TU_B2 = 1
TU_DIEL = 2  # dielectric reflect choice
TU_FZ1 = 3  # metal fuzz sphere dir
TU_FZ2 = 4
NT = 5

# light-start uniform slots (one draw per sample)
LS_PICK = 0
LS_U = 1
LS_V = 2
LS_D1 = 3  # cosine exit dir
LS_D2 = 4
NLS = 5

# relative endpoint margin for connection visibility (see connect_paths)
SHADOW_EPS_REL = 1e-4


class Vertices(NamedTuple):
    """path_vertex SoA (camera.h:236-243). Slot axis is bounce index."""

    valid: jnp.ndarray  # [B,S] bool
    p: jnp.ndarray  # [B,S,3]
    normal: jnp.ndarray  # [B,S,3] (flipped for traced hits)
    wi: jnp.ndarray  # [B,S,3]
    thr: jnp.ndarray  # [B,S,3] throughput *arriving at* the vertex
    emit: jnp.ndarray  # [B,S,3]
    mat: jnp.ndarray  # [B,S] int32
    u: jnp.ndarray  # [B,S]
    v: jnp.ndarray  # [B,S]
    delta: jnp.ndarray  # [B,S] bool
    is_light: jnp.ndarray  # [B,S] bool


class BDPTStats(NamedTuple):
    rays_traced: jnp.ndarray  # reference-parity (trace_path entries only)
    shadow_rays: jnp.ndarray
    node_visits: jnp.ndarray
    aabb_hits: jnp.ndarray
    tri_tests: jnp.ndarray
    tri_hits: jnp.ndarray


def _empty_vertices(B, S, dtype):
    z3 = jnp.zeros((B, S, 3), dtype)
    z1 = jnp.zeros((B, S), dtype)
    zb = jnp.zeros((B, S), bool)
    zi = jnp.zeros((B, S), jnp.int32)
    return Vertices(
        valid=zb, p=z3, normal=z3, wi=z3, thr=z3, emit=z3,
        mat=zi, u=z1, v=z1, delta=zb, is_light=zb,
    )


def trace_subpath(
    scene: SceneArrays,
    o,
    d,
    thr0,
    alive0,
    steps: int,
    uniforms_fn,
    collect_background: bool,
):
    """trace_path (camera.h:325-370) for ``steps`` bounces.

    Returns (Vertices [B,steps], background_contrib [B,3], stats).
    """
    B = o.shape[0]
    dtype = o.dtype
    verts = _empty_vertices(B, steps, dtype)
    bg = jnp.zeros((B, 3), dtype)
    stats = BDPTStats(*(jnp.int32(0) for _ in range(6)))

    def body(b, state):
        o, d, thr, alive, verts, bg, stats = state
        u = uniforms_fn(b, NT)

        hit_raw, ts = closest_hit(scene, o, d, T_MIN, jnp.inf)
        rec = complete_hit(scene, o, d, hit_raw)

        miss = alive & ~rec.hit
        if collect_background:
            bg = bg + jnp.where(miss[..., None], thr * scene.background, 0.0)

        valid_v = alive & rec.hit
        mtype = scene.materials.mtype[rec.mat]
        delta = bsdf_ops.is_delta(scene, rec.mat)
        emission = bsdf_ops.emitted(scene, rec.mat, rec.front_face, rec.u, rec.v, rec.p)
        wi = vm.normalize_safe(-d)

        def put3(a, val):
            return a.at[:, b, :].set(jnp.where(valid_v[..., None], val, a[:, b, :]))

        def put1(a, val):
            return a.at[:, b].set(jnp.where(valid_v, val, a[:, b]))

        verts = Vertices(
            valid=put1(verts.valid, True),
            p=put3(verts.p, rec.p),
            normal=put3(verts.normal, rec.normal),
            wi=put3(verts.wi, wi),
            thr=put3(verts.thr, thr),
            emit=put3(verts.emit, emission),
            mat=put1(verts.mat, rec.mat),
            u=put1(verts.u, rec.u),
            v=put1(verts.v, rec.v),
            delta=put1(verts.delta, delta),
            is_light=put1(verts.is_light, mtype == MAT_LIGHT),
        )

        can_scatter = bsdf_ops.scatters(scene, rec.mat)
        atten = bsdf_ops.attenuation(scene, rec.mat, rec.u, rec.v, rec.p)

        d_delta = bsdf_ops.delta_scatter_dir(
            scene, rec.mat, d, rec.normal, rec.front_face,
            jnp.stack(
                [u[:, TU_DIEL], u[:, TU_FZ1], u[:, TU_FZ2], u[:, TU_B1]], axis=-1
            ),
        )
        d_bsdf = bsdf_ops.sample_bsdf_dir(
            scene, rec.mat, rec.normal, u[:, TU_B1:TU_B2 + 1]
        )
        pdf_val = bsdf_ops.bsdf_pdf_value(scene, rec.mat, rec.normal, d_bsdf)
        scat_pdf = bsdf_ops.scattering_pdf(scene, rec.mat, rec.normal, d_bsdf)

        delta_ok = valid_v & can_scatter & delta
        diff_ok = valid_v & can_scatter & ~delta & (pdf_val > 0.0)
        w = jnp.where(pdf_val > 0.0, scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)

        thr = jnp.where(
            delta_ok[..., None],
            thr * atten,
            jnp.where(diff_ok[..., None], thr * atten * w[..., None], thr),
        )
        alive_new = delta_ok | diff_ok
        o = jnp.where(alive_new[..., None], rec.p, o)
        d = jnp.where(alive_new[..., None], jnp.where(delta_ok[..., None], d_delta, d_bsdf), d)

        stats = BDPTStats(
            rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32),
            shadow_rays=stats.shadow_rays,
            node_visits=stats.node_visits + jnp.sum(jnp.where(alive, ts.node_visits, 0), dtype=jnp.int32),
            aabb_hits=stats.aabb_hits + jnp.sum(jnp.where(alive, ts.aabb_hits, 0), dtype=jnp.int32),
            tri_tests=stats.tri_tests + jnp.sum(jnp.where(alive, ts.tri_tests, 0), dtype=jnp.int32),
            tri_hits=stats.tri_hits + jnp.sum(jnp.where(alive, ts.tri_hits, 0), dtype=jnp.int32),
        )
        return (o, d, thr, alive_new, verts, bg, stats)

    if steps > 0:
        state = (o, d, thr0, alive0, verts, bg, stats)
        state = jax.lax.fori_loop(0, steps, body, state)
        _, _, _, _, verts, bg, stats = state
    return verts, bg, stats


def build_light_subpath(scene: SceneArrays, B, max_depth: int, start_u, uniforms_fn, dtype):
    """build_light_path (camera.h:372-418). start_u: [B, NLS].

    Returns (emitter Vertices slot [B,1], traced Vertices [B,max_depth-1],
    path_ok [B], stats).
    """
    s = light_ops.sample_surface(scene, start_u[:, LS_PICK], start_u[:, LS_U], start_u[:, LS_V])

    # emitter emission: forced front_face=true, u=v=0 (camera.h:385-394)
    zeros = jnp.zeros((B,), dtype)
    emission = bsdf_ops.emitted(
        scene, s.mat, jnp.ones((B,), bool), zeros, zeros, s.position
    )
    path_ok = s.valid & (vm.length_squared(emission) > 0.0)

    thr0 = jnp.ones((B, 3), dtype) / jnp.maximum(s.pdf, 1e-8)[..., None]

    emitter = Vertices(
        valid=path_ok[..., None],
        p=s.position[:, None, :],
        normal=s.normal[:, None, :],
        wi=s.normal[:, None, :],  # camera.h:401
        thr=thr0[:, None, :],
        emit=emission[:, None, :],
        mat=s.mat[:, None],
        u=jnp.zeros((B, 1), dtype),
        v=jnp.zeros((B, 1), dtype),
        delta=jnp.zeros((B, 1), bool),
        is_light=path_ok[:, None],
    )

    # cosine exit (camera.h:407-415)
    dir_unit = vm.normalize_safe(
        cosine_direction_world(s.normal, start_u[:, LS_D1], start_u[:, LS_D2])
    )
    cos_theta = jnp.maximum(0.0, vm.dot(s.normal, dir_unit))
    exit_ok = path_ok & (cos_theta > 0.0)
    pdf_dir = jnp.maximum(cos_theta / vm.PI, 1e-8)
    thr = thr0 * emission * (cos_theta / pdf_dir)[..., None]
    o = s.position + 0.001 * s.normal

    traced, _, stats = trace_subpath(
        scene, o, dir_unit, thr, exit_ok, max_depth - 1, uniforms_fn,
        collect_background=False,
    )
    return emitter, traced, path_ok, stats


def _concat_vertices(a: Vertices, b: Vertices) -> Vertices:
    return Vertices(*(jnp.concatenate([x, y], axis=1) for x, y in zip(a, b)))


def connect_paths(scene: SceneArrays, cam: Vertices, light: Vertices):
    """All-pairs connect_vertices (camera.h:316-320, 440-475).

    Blockwise over camera slots: fori s -> one [B, S_l] shadow-ray wave.
    Returns (radiance [B,3], shadow_ray_count).
    """
    B, S_c = cam.valid.shape
    S_l = light.valid.shape[1]
    dtype = cam.p.dtype

    # light-side factors, independent of s (evaluate once)
    f_light_bsdf = bsdf_ops.evaluate_bsdf(
        scene,
        light.mat.reshape(-1),
        light.u.reshape(-1),
        light.v.reshape(-1),
        light.p.reshape(B * S_l, 3),
    ).reshape(B, S_l, 3)
    # emitter vertices use raw emission as their "BSDF" (camera.h:462-467)
    f_light = jnp.where(light.is_light[..., None], light.emit, f_light_bsdf)
    light_factor = light.thr * f_light  # [B,S_l,3]
    light_ok = light.valid & ~light.delta & (vm.length_squared(f_light) > 0.0)

    def body(s, acc):
        total, n_shadow = acc
        cp = jax.lax.dynamic_index_in_dim(cam.p, s, axis=1, keepdims=False)
        cn = jax.lax.dynamic_index_in_dim(cam.normal, s, axis=1, keepdims=False)
        cthr = jax.lax.dynamic_index_in_dim(cam.thr, s, axis=1, keepdims=False)
        cmat = jax.lax.dynamic_index_in_dim(cam.mat, s, axis=1, keepdims=False)
        cu = jax.lax.dynamic_index_in_dim(cam.u, s, axis=1, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(cam.v, s, axis=1, keepdims=False)
        c_ok = (
            jax.lax.dynamic_index_in_dim(cam.valid, s, axis=1, keepdims=False)
            & ~jax.lax.dynamic_index_in_dim(cam.delta, s, axis=1, keepdims=False)
        )

        f_cam = bsdf_ops.evaluate_bsdf(scene, cmat, cu, cv, cp)  # [B,3]
        c_ok = c_ok & (vm.length_squared(f_cam) > 0.0)
        cam_factor = cthr * f_cam  # [B,3]

        diff = light.p - cp[:, None, :]  # [B,S_l,3]
        dist2 = vm.length_squared(diff)
        pair_ok = c_ok[:, None] & light_ok & (dist2 > 0.0)

        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        du = diff / dist[..., None]
        cos_cam = jnp.abs(vm.dot(cn[:, None, :], du))
        cos_light = jnp.abs(vm.dot(light.normal, -du))
        pair_ok = pair_ok & (cos_cam > 0.0) & (cos_light > 0.0)

        # visible(a, b) (camera.h:425-438).  The reference advances the origin
        # by 0.001*du AND sets max_t = dist - 0.001, which places the emitter
        # plane *exactly* at max_t — occlusion of emitter connections is then
        # decided by fp rounding.  We shrink the occlusion range by a relative
        # epsilon so the endpoint is excluded deterministically (the obvious
        # intent of the reference's epsilons).
        max_t = dist - 0.001
        pair_ok = pair_ok & (max_t > 0.0)
        so = cp[:, None, :] + 0.001 * du
        sd = du
        t_vis = max_t * (1.0 - SHADOW_EPS_REL)
        tmax = jnp.where(pair_ok, t_vis, 0.0)  # culled lanes terminate instantly
        occluded = any_hit(
            scene,
            so.reshape(B * S_l, 3),
            sd.reshape(B * S_l, 3),
            T_MIN,
            tmax.reshape(B * S_l),
        ).reshape(B, S_l)
        pair_ok = pair_ok & ~occluded

        g = (cos_cam * cos_light) / jnp.maximum(dist2, 1e-30)
        contrib = cam_factor[:, None, :] * light_factor * g[..., None]
        total = total + jnp.sum(jnp.where(pair_ok[..., None], contrib, 0.0), axis=1)
        n_shadow = n_shadow + jnp.sum(pair_ok, dtype=jnp.int32)
        return (total, n_shadow)

    total0 = jnp.zeros((B, 3), dtype)
    total, n_shadow = jax.lax.fori_loop(0, S_c, body, (total0, jnp.int32(0)))
    return total, n_shadow


def bdpt_radiance(
    scene: SceneArrays,
    origins,
    dirs,
    max_depth: int,
    cam_uniforms_fn,
    light_start_u,
    light_uniforms_fn,
):
    """bidirectional_color (camera.h:294-323) for a batch of primary rays."""
    B = origins.shape[0]
    dtype = origins.dtype

    cam, bg, stats_c = trace_subpath(
        scene,
        origins,
        dirs,
        jnp.ones((B, 3), dtype),
        jnp.ones((B,), bool),
        max_depth,
        cam_uniforms_fn,
        collect_background=True,
    )

    # camera-vertex emission (camera.h:305-309)
    emit_mask = cam.valid & ~cam.delta
    result = bg + jnp.sum(
        jnp.where(emit_mask[..., None], cam.thr * cam.emit, 0.0), axis=1
    )

    emitter, traced, path_ok, stats_l = build_light_subpath(
        scene, B, max_depth, light_start_u, light_uniforms_fn, dtype
    )
    light = _concat_vertices(emitter, traced) if max_depth > 1 else emitter

    connect, n_shadow = connect_paths(scene, cam, light)
    result = result + connect

    stats = BDPTStats(
        rays_traced=stats_c.rays_traced + stats_l.rays_traced,
        shadow_rays=n_shadow,
        node_visits=stats_c.node_visits + stats_l.node_visits,
        aabb_hits=stats_c.aabb_hits + stats_l.aabb_hits,
        tri_tests=stats_c.tri_tests + stats_l.tri_tests,
        tri_hits=stats_c.tri_hits + stats_l.tri_hits,
    )
    return result, stats
