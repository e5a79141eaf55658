"""Exact-match test: jax wavefront PT vs the NumPy oracle transcription of
path_trace_color (camera.h:255-292), with identical injected uniforms."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from bpt_tpu.models import pt
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera


def _mixed_scene():
    """Cornell box + metal and glass boxes to exercise every material."""
    b = SceneBuilder()
    red = MaterialSpec.lambertian((0.65, 0.05, 0.05))
    white = MaterialSpec.lambertian((0.73, 0.73, 0.73))
    green = MaterialSpec.lambertian((0.12, 0.45, 0.15))
    light = MaterialSpec.diffuse_light((15.0, 15.0, 15.0))
    metal = MaterialSpec.metal((0.8, 0.85, 0.88), 0.1)
    glass = MaterialSpec.dielectric(1.5)

    b.add_quad((555, 0, 0), (0, 0, 555), (0, 555, 0), green)
    b.add_quad((0, 0, 555), (0, 0, -555), (0, 555, 0), red)
    b.add_quad((0, 555, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 0, -555), white)
    b.add_quad((555, 0, 555), (-555, 0, 0), (0, 555, 0), white)
    b.add_quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    # boxes lifted off the floor: coplanar faces make closest-hit ties that
    # both the reference and we break arbitrarily (untestable exactly)
    b.add_box((120, 0.01, 65), (285, 165, 230), metal, rotate_y_degrees=-18.0)
    b.add_box((265, 0.01, 295), (430, 330, 460), glass, rotate_y_degrees=15.0)
    return b


def _camera_rays(B, seed=0):
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=16, samples_per_pixel=1
    )
    cc = camera_constants(cfg, jnp.float64)
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=B)
    i = jnp.asarray(pix % 16, jnp.float64)
    j = jnp.asarray(pix // 16, jnp.float64)
    u = jnp.asarray(rng.uniform(size=(B, 4)), jnp.float64)
    z = jnp.zeros((B,), jnp.float64)
    return generate_rays(cc, i, j, z, z, u)


@pytest.mark.parametrize("use_bvh", [False, True])
@pytest.mark.parametrize("depth", [1, 4])
def test_pt_matches_oracle(use_bvh, depth):
    scene = _mixed_scene().build(dtype=jnp.float64, use_bvh=use_bvh)
    s_np = oracle.SceneNP(scene)
    B = 64
    o, d = _camera_rays(B)

    rng = np.random.default_rng(42)
    U = rng.uniform(size=(B, depth, pt.NU))

    rad, _ = pt.path_trace_radiance(
        scene, o, d, depth, pt.array_uniforms_fn(jnp.asarray(U, jnp.float64))
    )
    rad = np.asarray(rad)

    expected = np.stack(
        [
            oracle.pt_radiance(s_np, np.asarray(o)[k], np.asarray(d)[k], depth, U[k])
            for k in range(B)
        ]
    )
    np.testing.assert_allclose(rad, expected, rtol=1e-9, atol=1e-12)


def test_pt_background_on_miss():
    b = SceneBuilder()
    b.add_triangle((100, 100, 100), (101, 100, 100), (100, 101, 100),
                   MaterialSpec.lambertian((1, 1, 1)))
    scene = b.build(dtype=jnp.float64, background=(0.25, 0.5, 0.75))
    o = jnp.zeros((4, 3), jnp.float64)
    d = jnp.asarray([[0, 0, -1], [0, 1, 0], [1, 0, 0], [0, -1, 0]], jnp.float64)
    U = jnp.asarray(np.random.default_rng(0).uniform(size=(4, 2, pt.NU)), jnp.float64)
    rad, _ = pt.path_trace_radiance(scene, o, d, 2, pt.array_uniforms_fn(U))
    assert np.allclose(np.asarray(rad), [0.25, 0.5, 0.75])


def test_pt_direct_light_hit():
    """Camera ray straight into the emitter: radiance == emission exactly."""
    scene = cornell_box(dtype=jnp.float64)
    o = jnp.asarray([[230.0, 100.0, 240.0]], jnp.float64)  # clear of the box
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64)  # up into light quad
    U = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 3, pt.NU)), jnp.float64)
    rad, _ = pt.path_trace_radiance(scene, o, d, 3, pt.array_uniforms_fn(U))
    assert np.allclose(np.asarray(rad)[0], [15.0, 15.0, 15.0])
