"""Batched direction/point sampling.

The reference's rejection loops (random_in_unit_disk src/core/vec3.h:113-119,
random_unit_vector src/core/vec3.h:121-128) become analytic polar sampling
here — identical distributions, zero divergence, fixed op count (required
inside jit).  The cosine-hemisphere sampler is the same closed form the
reference already uses (src/core/vec3.h:149-159).
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm
from bpt_tpu.core.onb import onb_from_w, onb_transform

PI = vm.PI


def cosine_direction_local(u1, u2):
    """Cosine-weighted direction in the local (z-up) frame.

    Exactly the reference's random_cosine_direction (src/core/vec3.h:149-159).
    u1, u2: uniforms shaped [...]; returns [..., 3].
    """
    phi = 2.0 * PI * u1
    x = jnp.cos(phi) * jnp.sqrt(u2)
    y = jnp.sin(phi) * jnp.sqrt(u2)
    z = jnp.sqrt(1.0 - u2)
    return jnp.stack([x, y, z], axis=-1)


def cosine_direction_world(normal, u1, u2):
    """Cosine-weighted direction about ``normal`` (cosine_pdf.generate,
    src/acceleration/pdf.h:41-43)."""
    u, v, w = onb_from_w(normal)
    return onb_transform(u, v, w, cosine_direction_local(u1, u2))


def cosine_pdf_value(direction, w_axis):
    """cosine_pdf.value (src/acceleration/pdf.h:36-39): max(0, cos/pi) of the
    *normalized* direction against the basis w axis."""
    cos_t = vm.dot(vm.unit_vector(direction), w_axis)
    return jnp.maximum(0.0, cos_t / PI)


def uniform_sphere_direction(u1, u2):
    """Uniform direction on the unit sphere (analytic form of
    random_unit_vector, src/core/vec3.h:121-128)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


SPHERE_PDF = 1.0 / (4.0 * PI)  # sphere_pdf.value, src/acceleration/pdf.h:22-24


def unit_disk_point(u1, u2):
    """Uniform point in the unit disk (analytic form of random_in_unit_disk,
    src/core/vec3.h:113-119).  Returns [..., 2]."""
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def triangle_barycentric(u1, u2):
    """Uniform barycentric (u, v) with the fold trick the reference uses
    (triangle::sample, src/objects/primatives/triangle.h:107-119)."""
    flip = (u1 + u2) > 1.0
    u = jnp.where(flip, 1.0 - u1, u1)
    v = jnp.where(flip, 1.0 - u2, u2)
    return u, v
