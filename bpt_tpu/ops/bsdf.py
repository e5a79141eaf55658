"""Branchless batched materials.

Virtual dispatch on ``material`` subclasses (src/materials/material.h) becomes
per-lane type ids + masked evaluation: every lane computes the cheap common
terms and selects per material kind with jnp.where.  Semantics per kind:

* lambertian — cosine-pdf scatter, pdf cos/pi, BSDF albedo/pi
  (material.h:42-67)
* metal — delta: unit(reflect(d, n)) + fuzz * random_unit_vector; is_delta
  even with fuzz > 0 (material.h:69-90)
* dielectric — delta: Schlick-probability reflect vs refract with TIR, white
  attenuation, relative IOR by face side (material.h:92-131)
* diffuse_light — one-sided emitter, no scatter (material.h:133-147)
* isotropic — uniform-sphere phase, pdf 1/4pi, BSDF albedo/4pi
  (material.h:149-172)
"""

from __future__ import annotations

import jax.numpy as jnp

from bpt_tpu.core import vecmath as vm
from bpt_tpu.core.sampling import (
    SPHERE_PDF,
    cosine_direction_world,
    uniform_sphere_direction,
)
from bpt_tpu.scene.textures import texture_value
from bpt_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_ISOTROPIC,
    MAT_LAMBERTIAN,
    MAT_LIGHT,
    MAT_METAL,
    SceneArrays,
)

PI = vm.PI


def albedo_value(scene: SceneArrays, mat, u, v, p):
    """Albedo/emission color: solid column or texture fetch. [B] -> [B,3]."""
    base = scene.materials.albedo[mat]
    if not scene.has_textures:
        return base
    tid = scene.materials.tex_id[mat]
    tex = texture_value(
        scene.textures, jnp.maximum(tid, 0), u, v, p, with_noise=scene.has_noise
    )
    return jnp.where((tid >= 0)[..., None], tex, base)


def emitted(scene: SceneArrays, mat, front_face, u, v, p):
    """material::emitted — black except one-sided diffuse_light
    (material.h:20-24, 138-143)."""
    mtype = scene.materials.mtype[mat]
    emit = albedo_value(scene, mat, u, v, p)
    mask = (mtype == MAT_LIGHT) & front_face
    return jnp.where(mask[..., None], emit, 0.0)


def is_delta(scene: SceneArrays, mat):
    """metal + dielectric (material.h:85,118)."""
    mtype = scene.materials.mtype[mat]
    return (mtype == MAT_METAL) | (mtype == MAT_DIELECTRIC)


def scatters(scene: SceneArrays, mat):
    """material::scatter returns false only for lights (and the base class)."""
    mtype = scene.materials.mtype[mat]
    return mtype != MAT_LIGHT


def attenuation(scene: SceneArrays, mat, u, v, p):
    """srec.attenuation per kind: textured albedo (lambertian/isotropic),
    solid albedo (metal), white (dielectric)."""
    mtype = scene.materials.mtype[mat]
    alb = albedo_value(scene, mat, u, v, p)
    return jnp.where((mtype == MAT_DIELECTRIC)[..., None], 1.0, alb)


def delta_scatter_dir(scene: SceneArrays, mat, d_in, normal, front_face, uniforms):
    """skip_pdf ray direction for metal/dielectric lanes.

    uniforms: [B,4] — (reflect-choice, sphere u1, sphere u2, spare).
    """
    mtype = scene.materials.mtype[mat]

    # metal (material.h:73-83)
    fuzz = scene.materials.fuzz[mat]
    reflected = vm.reflect(d_in, normal)
    metal_dir = vm.normalize_safe(reflected) + fuzz[..., None] * uniform_sphere_direction(
        uniforms[..., 1], uniforms[..., 2]
    )

    # dielectric (material.h:96-116)
    ior = scene.materials.ior[mat]
    ri = jnp.where(front_face, 1.0 / ior, ior)
    ud = vm.normalize_safe(d_in)
    cos_t = jnp.minimum(vm.dot(-ud, normal), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot_refract = ri * sin_t > 1.0
    reflect_choice = cannot_refract | (
        vm.schlick_reflectance(cos_t, ri) > uniforms[..., 0]
    )
    diel_dir = jnp.where(
        reflect_choice[..., None], vm.reflect(ud, normal), vm.refract(ud, normal, ri)
    )

    return jnp.where((mtype == MAT_METAL)[..., None], metal_dir, diel_dir)


def sample_bsdf_dir(scene: SceneArrays, mat, normal, uniforms):
    """srec.pdf_ptr->generate(): cosine about the flipped normal for
    lambertian (pdf.h:41-43), uniform sphere for isotropic (pdf.h:26-28).

    uniforms: [B,2].
    """
    mtype = scene.materials.mtype[mat]
    cos_dir = cosine_direction_world(normal, uniforms[..., 0], uniforms[..., 1])
    sph_dir = uniform_sphere_direction(uniforms[..., 0], uniforms[..., 1])
    return jnp.where((mtype == MAT_ISOTROPIC)[..., None], sph_dir, cos_dir)


def bsdf_pdf_value(scene: SceneArrays, mat, normal, direction):
    """srec.pdf_ptr->value(dir): cosine pdf (pdf.h:36-39) or 1/4pi."""
    mtype = scene.materials.mtype[mat]
    cos_t = vm.dot(vm.normalize_safe(direction), normal)
    cos_pdf = jnp.maximum(0.0, cos_t / PI)
    return jnp.where(mtype == MAT_ISOTROPIC, SPHERE_PDF, cos_pdf)


def scattering_pdf(scene: SceneArrays, mat, normal, scattered_dir):
    """material::scattering_pdf (material.h:54-58, 161-164); 0 for
    delta/light lanes."""
    mtype = scene.materials.mtype[mat]
    cos_t = vm.dot(normal, vm.normalize_safe(scattered_dir))
    lam = jnp.where(cos_t < 0.0, 0.0, cos_t / PI)
    out = jnp.where(mtype == MAT_LAMBERTIAN, lam, 0.0)
    return jnp.where(mtype == MAT_ISOTROPIC, SPHERE_PDF, out)


def evaluate_bsdf(scene: SceneArrays, mat, u, v, p):
    """material::evaluate_bsdf (material.h:35-37, 60-63, 166-168).

    Note the reference implementations ignore wi/wo entirely: lambertian
    returns albedo/pi, isotropic albedo/4pi, everything else black.
    """
    mtype = scene.materials.mtype[mat]
    alb = albedo_value(scene, mat, u, v, p)
    out = jnp.where((mtype == MAT_LAMBERTIAN)[..., None], alb / PI, 0.0)
    out = jnp.where((mtype == MAT_ISOTROPIC)[..., None], alb / (4.0 * PI), out)
    return out
