"""Light sampling and light-pdf evaluation.

TPU-native forms of the reference's light machinery:

* hittable_pdf over a triangle_collection (pdf.h:50-67 +
  triangle.h:170-189): ``value`` = uniform-weight mean of per-triangle
  solid-angle pdfs, each requiring an intersection test against that
  triangle; ``generate`` = uniform triangle pick + uniform area point,
  returning the *unnormalized* p - origin.
* triangle_collection::sample_surface (triangle.h:199-224): area-weighted
  pick with pdf 1/total_area — the O(n) linear CDF scan becomes a
  searchsorted over a prefix-sum CDF.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm
from bpt_tpu.core.sampling import triangle_barycentric
from bpt_tpu.ops.intersect import T_MIN, moller_trumbore
from bpt_tpu.scene.types import SceneArrays


def light_pdf_value(scene: SceneArrays, origin, direction):
    """triangle_collection::pdf_value (triangle.h:170-181) against the light
    set. origin/direction: [B,3] (direction may be unnormalized). -> [B].

    Per triangle (triangle.h:78-90): intersect in [0.001, inf); if hit,
    pdf = t^2 |d|^2 / (|cos| / |d| * area); zero when area or cosine is 0.
    """
    o = origin[..., None, :]
    d = direction[..., None, :]
    valid, t, _, _ = moller_trumbore(
        o, d, scene.light_v0, scene.light_e1, scene.light_e2, T_MIN, jnp.inf
    )  # [B,L]
    d_len2 = vm.length_squared(direction)[..., None]
    d_len = jnp.sqrt(d_len2)
    dist2 = t * t * d_len2
    cosine = jnp.abs(vm.dot(d, scene.light_normal)) / d_len
    area = scene.light_area
    ok = valid & (area > 0.0) & (cosine > 0.0)
    pdf = jnp.where(ok, dist2 / jnp.where(ok, cosine * area, 1.0), 0.0)
    L = scene.num_lights
    return jnp.sum(pdf, axis=-1) / L


def sample_light_dir(scene: SceneArrays, origin, u_pick, u1, u2):
    """triangle_collection::random (triangle.h:183-189): uniform triangle
    pick, uniform point via barycentric fold, returns p - origin
    (unnormalized, as the reference does)."""
    L = scene.num_lights
    idx = jnp.clip((u_pick * L).astype(jnp.int32), 0, L - 1)
    u, v = triangle_barycentric(u1, u2)
    p = (
        scene.light_v0[idx]
        + u[..., None] * scene.light_e1[idx]
        + v[..., None] * scene.light_e2[idx]
    )
    return p - origin


class SurfaceSample(NamedTuple):
    """surface_sample (triangle.h:9-14) + validity mask."""

    position: jnp.ndarray  # [B,3]
    normal: jnp.ndarray  # [B,3] geometric (unflipped)
    mat: jnp.ndarray  # [B] int32
    pdf: jnp.ndarray  # [B] = 1/total_area
    valid: jnp.ndarray  # [B] bool (total_area > 0)


def sample_surface(scene: SceneArrays, u_pick, u1, u2) -> SurfaceSample:
    """Area-weighted emitter-point sampling (triangle.h:199-224)."""
    total = scene.light_total_area
    pick = u_pick * total
    idx = jnp.searchsorted(scene.light_cdf, pick, side="left").astype(jnp.int32)
    idx = jnp.clip(idx, 0, scene.num_lights - 1)
    u, v = triangle_barycentric(u1, u2)
    p = (
        scene.light_v0[idx]
        + u[..., None] * scene.light_e1[idx]
        + v[..., None] * scene.light_e2[idx]
    )
    inv_total = jnp.where(total > 0.0, 1.0 / jnp.maximum(total, 1e-30), 0.0)
    return SurfaceSample(
        position=p,
        normal=scene.light_normal[idx],
        mat=scene.light_mat[idx],
        pdf=jnp.broadcast_to(inv_total, u_pick.shape),
        valid=jnp.broadcast_to(total > 0.0, u_pick.shape),
    )
