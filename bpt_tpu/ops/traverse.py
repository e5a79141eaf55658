"""Scene intersection: threaded-BVH traversal (stackless) or brute force.

Device-side equivalent of bvh_node::hit (src/acceleration/bvh.h:50-59).
Traversal state per ray is one node cursor — an AABB hit at internal node i
descends to i+1, a miss jumps to skip[i]; leaves test 1-2 triangles and
shrink t-max, matching the reference's left-then-right visit order with
right-child t-max shrink.

Batched over rays with vmap: XLA lowers this to one while loop whose body
does batched gathers of node/triangle data — lanes that finish early idle
until the wave drains (wavefront semantics, no per-lane control flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm
from bpt_tpu.ops.intersect import (
    Hit,
    brute_force_any,
    brute_force_closest,
    moller_trumbore,
    slab_test,
)
from bpt_tpu.scene.types import SceneArrays


class TraceStats(NamedTuple):
    """Per-wave counters mirroring BvhStats (src/core/stats.h:8-16)."""

    node_visits: jnp.ndarray
    aabb_hits: jnp.ndarray
    tri_tests: jnp.ndarray
    tri_hits: jnp.ndarray


def _bvh_closest_one(scene: SceneArrays, o, d, tmin, tmax):
    """Single-ray closest hit via threaded traversal. Returns
    (hit, t, tri, u, v, stats tuple)."""
    num_nodes = scene.bvh_skip.shape[0]

    def cond(state):
        i = state[0]
        return i < num_nodes

    def body(state):
        i, t_best, tri_best, u_best, v_best, nv, ah, tt, th = state
        bmin = scene.bvh_min[i]
        bmax = scene.bvh_max[i]
        box_hit = slab_test(o, d, bmin, bmax, tmin, t_best)
        cnt = scene.bvh_count[i]
        is_leaf = cnt > 0
        first = scene.bvh_first[i]

        do_leaf = box_hit & is_leaf

        def test_tri(ti, active, t_best, tri_best, u_best, v_best, tt, th):
            valid, t, uu, vv = moller_trumbore(
                o, d, scene.v0[ti], scene.e1[ti], scene.e2[ti], tmin, t_best
            )
            take = active & valid
            tt = tt + active.astype(jnp.int32)
            th = th + take.astype(jnp.int32)
            t_best = jnp.where(take, t, t_best)
            tri_best = jnp.where(take, ti, tri_best)
            u_best = jnp.where(take, uu, u_best)
            v_best = jnp.where(take, vv, v_best)
            return t_best, tri_best, u_best, v_best, tt, th

        t_best, tri_best, u_best, v_best, tt, th = test_tri(
            first, do_leaf, t_best, tri_best, u_best, v_best, tt, th
        )
        t_best, tri_best, u_best, v_best, tt, th = test_tri(
            first + 1, do_leaf & (cnt > 1), t_best, tri_best, u_best, v_best, tt, th
        )

        nv = nv + 1
        ah = ah + box_hit.astype(jnp.int32)
        nxt = jnp.where(box_hit & ~is_leaf, i + 1, scene.bvh_skip[i])
        return (nxt, t_best, tri_best, u_best, v_best, nv, ah, tt, th)

    dtype = o.dtype
    init = (
        jnp.int32(0),
        jnp.asarray(tmax, dtype),
        jnp.int32(-1),
        jnp.zeros((), dtype),
        jnp.zeros((), dtype),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, t, tri, u, v, nv, ah, tt, th = jax.lax.while_loop(cond, body, init)
    hit = tri >= 0
    return hit, jnp.where(hit, t, jnp.inf), jnp.maximum(tri, 0), u, v, (nv, ah, tt, th)


def _bvh_any_one(scene: SceneArrays, o, d, tmin, tmax):
    """Single-ray any-hit with early exit (shadow rays)."""
    num_nodes = scene.bvh_skip.shape[0]

    def cond(state):
        i, found = state
        return (i < num_nodes) & (~found)

    def body(state):
        i, found = state
        box_hit = slab_test(o, d, scene.bvh_min[i], scene.bvh_max[i], tmin, tmax)
        cnt = scene.bvh_count[i]
        is_leaf = cnt > 0
        first = scene.bvh_first[i]
        do_leaf = box_hit & is_leaf

        h0, _, _, _ = moller_trumbore(
            o, d, scene.v0[first], scene.e1[first], scene.e2[first], tmin, tmax
        )
        second = first + 1
        h1, _, _, _ = moller_trumbore(
            o, d, scene.v0[second], scene.e1[second], scene.e2[second], tmin, tmax
        )
        found = found | (do_leaf & (h0 | (h1 & (cnt > 1))))
        nxt = jnp.where(box_hit & ~is_leaf, i + 1, scene.bvh_skip[i])
        return (nxt, found)

    _, found = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.array(False)))
    return found


def closest_hit(scene: SceneArrays, o, d, tmin, tmax):
    """Batched closest hit. o, d: [B,3]; tmin/tmax scalar or [B].

    Returns (Hit, TraceStats) — stats are per-ray int32 counts.
    """
    B = o.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, o.dtype), (B,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, o.dtype), (B,))
    if scene.use_bvh:
        hit, t, tri, u, v, (nv, ah, tt, th) = jax.vmap(
            lambda oo, dd, lo, hi: _bvh_closest_one(scene, oo, dd, lo, hi)
        )(o, d, tmin_b, tmax_b)
        return (
            Hit(hit=hit, t=t, tri=tri, u=u, v=v),
            TraceStats(node_visits=nv, aabb_hits=ah, tri_tests=tt, tri_hits=th),
        )
    h = brute_force_closest(scene.v0, scene.e1, scene.e2, o, d, tmin_b, tmax_b)
    T = scene.num_tris
    stats = TraceStats(
        node_visits=jnp.zeros((B,), jnp.int32),
        aabb_hits=jnp.zeros((B,), jnp.int32),
        tri_tests=jnp.full((B,), T, jnp.int32),
        tri_hits=h.hit.astype(jnp.int32),
    )
    return h, stats


def any_hit(scene: SceneArrays, o, d, tmin, tmax):
    """Batched occlusion test. Returns bool [B]."""
    B = o.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, o.dtype), (B,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, o.dtype), (B,))
    if scene.use_bvh:
        return jax.vmap(
            lambda oo, dd, lo, hi: _bvh_any_one(scene, oo, dd, lo, hi)
        )(o, d, tmin_b, tmax_b)
    return brute_force_any(scene.v0, scene.e1, scene.e2, o, d, tmin_b, tmax_b)


class HitRecord(NamedTuple):
    """Completed SoA hit record (hit_record, src/objects/hittable.h:10-27)."""

    hit: jnp.ndarray  # [B] bool
    t: jnp.ndarray  # [B]
    p: jnp.ndarray  # [B,3]
    normal: jnp.ndarray  # [B,3] — flipped against the ray (set_face_normal)
    front_face: jnp.ndarray  # [B] bool
    tri: jnp.ndarray  # [B] int32
    mat: jnp.ndarray  # [B] int32
    u: jnp.ndarray  # [B]
    v: jnp.ndarray  # [B]


def complete_hit(scene: SceneArrays, o, d, h: Hit) -> HitRecord:
    """Fill p / flipped normal / material id (hittable.h:20-26)."""
    t_safe = jnp.where(h.hit, h.t, 0.0)
    p = o + t_safe[..., None] * d
    outward = scene.normal[h.tri]
    front = vm.dot(d, outward) < 0.0
    normal = jnp.where(front[..., None], outward, -outward)
    return HitRecord(
        hit=h.hit,
        t=h.t,
        p=p,
        normal=normal,
        front_face=front,
        tri=h.tri,
        mat=scene.mat_id[h.tri],
        u=h.u,
        v=h.v,
    )
