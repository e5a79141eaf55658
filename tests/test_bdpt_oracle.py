"""Exact-match test: jax wavefront BDPT vs the NumPy oracle transcription of
bidirectional_color (camera.h:294-475), with identical injected uniforms."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from bpt_tpu.models import bdpt, pt
from test_pt_oracle import _camera_rays, _mixed_scene


@pytest.mark.parametrize("use_bvh", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 5])
def test_bdpt_matches_oracle(use_bvh, depth):
    scene = _mixed_scene().build(dtype=jnp.float64, use_bvh=use_bvh)
    s_np = oracle.SceneNP(scene)
    B = 48
    o, d = _camera_rays(B, seed=depth)

    rng = np.random.default_rng(depth * 7 + 1)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT))
    ls_U = rng.uniform(size=(B, bdpt.NLS))
    light_U = rng.uniform(size=(B, max(depth - 1, 1), bdpt.NT))

    rad, _ = bdpt.bdpt_radiance(
        scene, o, d, depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U, jnp.float64)),
        jnp.asarray(ls_U, jnp.float64),
        pt.array_uniforms_fn(jnp.asarray(light_U, jnp.float64)),
    )
    rad = np.asarray(rad)

    expected = np.stack(
        [
            oracle.bdpt_radiance(
                s_np, np.asarray(o)[k], np.asarray(d)[k], depth,
                cam_U[k], ls_U[k], light_U[k],
            )
            for k in range(B)
        ]
    )
    np.testing.assert_allclose(rad, expected, rtol=1e-9, atol=1e-12)


def test_bdpt_light_fallback_world():
    """No emissive surfaces: lights = world (main.cpp:67) -> sample_surface
    picks a non-emissive triangle -> light path fails -> camera-only result."""
    from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder

    b = SceneBuilder()
    b.add_quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), MaterialSpec.lambertian((0.5, 0.5, 0.5)))
    scene = b.build(dtype=jnp.float64, background=(1.0, 1.0, 1.0))
    assert scene.lights_are_world
    s_np = oracle.SceneNP(scene)

    B = 8
    o = jnp.zeros((B, 3), jnp.float64)
    d = jnp.asarray(np.random.default_rng(0).normal(size=(B, 3)) * [0.2, 0.2, 0]
                    + [0, 0, -1.0], jnp.float64)
    depth = 3
    rng = np.random.default_rng(1)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT))
    ls_U = rng.uniform(size=(B, bdpt.NLS))
    light_U = rng.uniform(size=(B, depth - 1, bdpt.NT))

    rad, _ = bdpt.bdpt_radiance(
        scene, o, d, depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U, jnp.float64)),
        jnp.asarray(ls_U, jnp.float64),
        pt.array_uniforms_fn(jnp.asarray(light_U, jnp.float64)),
    )
    expected = np.stack(
        [
            oracle.bdpt_radiance(
                s_np, np.asarray(o)[k], np.asarray(d)[k], depth,
                cam_U[k], ls_U[k], light_U[k],
            )
            for k in range(B)
        ]
    )
    np.testing.assert_allclose(np.asarray(rad), expected, rtol=1e-9, atol=1e-12)
