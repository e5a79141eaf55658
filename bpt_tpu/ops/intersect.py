"""Batched ray-triangle intersection + AABB slab test.

Möller–Trumbore with the reference's epsilon and comparison order
(src/objects/primatives/triangle.h:41-74); the slab test matches
aabb::hit (src/acceleration/aabb.h:41-66) for all d!=0 axes; for the
measure-zero case "origin exactly on a slab with d==0 on that axis" the
reference's NaN propagation is order-dependent/arbitrary and we treat the
axis as unconstrained instead.  Directions may be unnormalized — t is in
units of |d|, exactly as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm

MT_EPSILON = 1e-8  # triangle.h:43
T_MIN = 1e-3  # interval(0.001, infinity) used by all scatter rays


class Hit(NamedTuple):
    """SoA hit record (reference hit_record, src/objects/hittable.h:10-27)."""

    hit: jnp.ndarray  # [B] bool
    t: jnp.ndarray  # [B]
    tri: jnp.ndarray  # [B] int32 (undefined when !hit)
    u: jnp.ndarray  # [B]
    v: jnp.ndarray  # [B]


def moller_trumbore(o, d, v0, e1, e2, tmin, tmax):
    """Intersect rays [..., 3] against triangles broadcast over the same
    batch shape. Returns (valid, t, u, v).

    Accepts any broadcastable combination, e.g. o,d: [B,1,3] with
    v0,e1,e2: [T,3] -> [B,T] results.
    """
    pvec = vm.cross(d, e2)
    det = vm.dot(e1, pvec)
    inv_det = 1.0 / det  # inf when det==0; masked by eps test below
    tvec = o - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det

    valid = (
        (jnp.abs(det) >= MT_EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)  # interval.contains: min <= t <= max (interval.h:22-24)
        & (t <= tmax)
    )
    return valid, t, u, v


def slab_test(o, d, bmin, bmax, tmin, tmax):
    """aabb::hit (aabb.h:41-66). All args broadcastable; returns bool [...]."""
    adinv = 1.0 / d
    t0 = (bmin - o) * adinv
    t1 = (bmax - o) * adinv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    # NaN (origin-on-slab with d==0) must not widen the interval: C++
    # comparisons with NaN are false, leaving ray_t unchanged. min/max in
    # XLA propagate NaN, so replace NaN with +-inf (no-op bounds).
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    enter = jnp.maximum(jnp.max(lo, axis=-1), tmin)
    exit_ = jnp.minimum(jnp.min(hi, axis=-1), tmax)
    return exit_ > enter  # aabb.h:61: max <= min -> miss


def brute_force_closest(v0, e1, e2, o, d, tmin, tmax) -> Hit:
    """Closest hit by testing every triangle — the test oracle
    (hittable_list::hit semantics, src/objects/hittable_list.h:27-41) and the
    fast path for small scenes where [B,T] broadcasting feeds the VPU
    directly."""
    valid, t, u, v = moller_trumbore(
        o[..., None, :], d[..., None, :], v0, e1, e2,
        jnp.asarray(tmin)[..., None], jnp.asarray(tmax)[..., None],
    )  # [B,T]
    t_masked = jnp.where(valid, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1)
    tb = jnp.take_along_axis(t_masked, idx[..., None], axis=-1)[..., 0]
    hit = jnp.isfinite(tb)
    ub = jnp.take_along_axis(u, idx[..., None], axis=-1)[..., 0]
    vb = jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]
    return Hit(hit=hit, t=jnp.where(hit, tb, jnp.inf), tri=idx.astype(jnp.int32),
               u=ub, v=vb)


def brute_force_any(v0, e1, e2, o, d, tmin, tmax):
    """Any-hit (shadow rays): bool [B]."""
    valid, _, _, _ = moller_trumbore(
        o[..., None, :], d[..., None, :], v0, e1, e2,
        jnp.asarray(tmin)[..., None], jnp.asarray(tmax)[..., None],
    )
    return jnp.any(valid, axis=-1)
