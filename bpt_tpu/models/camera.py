"""Camera constants + vectorized primary-ray generation.

camera::initialize (src/camera.h:160-197) runs once on host into a small
pytree of device constants; get_ray / sample_square_stratified /
defocus_disk_sample (camera.h:199-234) become a pure batched function over
(pixel, stratum) grids.  Ray time (camera.h:210) is omitted — nothing in the
reference consumes it (no motion blur exists).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from bpt_tpu.core.sampling import unit_disk_point
from bpt_tpu.scene.types import CameraConfig, _register


@dataclass(frozen=True)
class CameraConstants:
    center: jax.Array  # [3]
    pixel00: jax.Array  # [3]
    du: jax.Array  # [3] pixel delta right
    dv: jax.Array  # [3] pixel delta down
    defocus_u: jax.Array  # [3]
    defocus_v: jax.Array  # [3]
    width: int = field(metadata=dict(static=True), default=0)
    height: int = field(metadata=dict(static=True), default=0)
    sqrt_spp: int = field(metadata=dict(static=True), default=1)
    defocus: bool = field(metadata=dict(static=True), default=False)
    # reference shadow-endpoint artifact emulation (CameraConfig.ref_vis)
    ref_vis: bool = field(metadata=dict(static=True), default=False)


_register(CameraConstants,
          meta_fields=("width", "height", "sqrt_spp", "defocus", "ref_vis"))


def camera_constants(cfg: CameraConfig, dtype=jnp.float32) -> CameraConstants:
    """camera::initialize (camera.h:160-197), float64 host math."""
    w = cfg.image_width
    h = cfg.image_height

    lookfrom = np.asarray(cfg.lookfrom, np.float64)
    lookat = np.asarray(cfg.lookat, np.float64)
    vup = np.asarray(cfg.vup, np.float64)

    theta = math.radians(cfg.vfov)
    hh = math.tan(theta / 2.0)
    viewport_height = 2.0 * hh * cfg.focus_dist
    viewport_width = viewport_height * (w / h)

    wv = lookfrom - lookat
    wv = wv / np.linalg.norm(wv)
    uv = np.cross(vup, wv)
    uv = uv / np.linalg.norm(uv)
    vv = np.cross(wv, uv)

    viewport_u = viewport_width * uv
    viewport_v = viewport_height * -vv
    du = viewport_u / w
    dv = viewport_v / h
    upper_left = lookfrom - cfg.focus_dist * wv - viewport_u / 2 - viewport_v / 2
    pixel00 = upper_left + 0.5 * (du + dv)

    defocus_radius = cfg.focus_dist * math.tan(math.radians(cfg.defocus_angle / 2.0))
    return CameraConstants(
        center=jnp.asarray(lookfrom, dtype),
        pixel00=jnp.asarray(pixel00, dtype),
        du=jnp.asarray(du, dtype),
        dv=jnp.asarray(dv, dtype),
        defocus_u=jnp.asarray(uv * defocus_radius, dtype),
        defocus_v=jnp.asarray(vv * defocus_radius, dtype),
        width=w,
        height=h,
        sqrt_spp=cfg.sqrt_spp,
        defocus=cfg.defocus_angle > 0.0,
        ref_vis=getattr(cfg, "ref_vis", False),
    )


def generate_rays(cc: CameraConstants, i, j, s_i, s_j, uniforms):
    """get_ray (camera.h:199-213) batched.

    i, j: pixel coords [N]; s_i, s_j: stratum indices [N];
    uniforms: [N,4] — (jitter x, jitter y, disk u1, disk u2).
    Returns (origins [N,3], directions [N,3] — unnormalized, as in the
    reference).
    """
    recip = 1.0 / cc.sqrt_spp
    ox = (s_i + uniforms[..., 0]) * recip - 0.5
    oy = (s_j + uniforms[..., 1]) * recip - 0.5
    pixel_sample = (
        cc.pixel00
        + (i + ox)[..., None] * cc.du
        + (j + oy)[..., None] * cc.dv
    )
    if cc.defocus:
        disk = unit_disk_point(uniforms[..., 2], uniforms[..., 3])
        origin = (
            cc.center
            + disk[..., 0:1] * cc.defocus_u
            + disk[..., 1:2] * cc.defocus_v
        )
    else:
        origin = jnp.broadcast_to(cc.center, pixel_sample.shape)
    return origin, pixel_sample - origin
