"""Volume (constant_medium) tests: exact oracle match for PT and BDPT on a
cornell box with a smoke box (the reference's cornell_smoke configuration,
constant_medium.h semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from bpt_tpu.models import bdpt, pt
from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder
from test_pt_oracle import _camera_rays


def _smoke_scene():
    b = SceneBuilder()
    red = MaterialSpec.lambertian((0.65, 0.05, 0.05))
    white = MaterialSpec.lambertian((0.73, 0.73, 0.73))
    green = MaterialSpec.lambertian((0.12, 0.45, 0.15))
    light = MaterialSpec.diffuse_light((7.0, 7.0, 7.0))

    b.add_quad((555, 0, 0), (0, 0, 555), (0, 555, 0), green)
    b.add_quad((0, 0, 555), (0, 0, -555), (0, 555, 0), red)
    b.add_quad((0, 555, 0), (555, 0, 0), (0, 0, 555), white)
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 0, -555), white)
    b.add_quad((555, 0, 555), (-555, 0, 0), (0, 555, 0), white)
    b.add_quad((113, 554, 127), (330, 0, 0), (0, 0, 305), light)
    # smoke box (cornell_smoke: dark box of density 0.01)
    b.add_volume_box((120, 0.01, 65), (285, 165, 230), density=0.01,
                     albedo=(0.0, 0.0, 0.0), rotate_y_degrees=-18.0)
    # lighter fog box
    b.add_volume_box((265, 0.01, 295), (430, 330, 460), density=0.005,
                     albedo=(1.0, 1.0, 1.0), rotate_y_degrees=15.0)
    return b.build(dtype=jnp.float64)


def test_volume_scene_builds():
    s = _smoke_scene()
    assert s.num_volumes == 2
    assert s.vol_v0.shape[0] == 24
    assert np.allclose(np.asarray(s.vol_neg_inv_density), [-100.0, -200.0])


@pytest.mark.parametrize("depth", [2, 5])
def test_pt_volumes_match_oracle(depth):
    scene = _smoke_scene()
    s_np = oracle.SceneNP(scene)
    B = 48
    o, d = _camera_rays(B, seed=depth + 50)
    NU = pt.NU + scene.num_volumes
    rng = np.random.default_rng(77)
    U = rng.uniform(size=(B, depth, NU))
    rad, _ = pt.path_trace_radiance(
        scene, o, d, depth, pt.array_uniforms_fn(jnp.asarray(U, jnp.float64))
    )
    expected = np.stack(
        [
            oracle.pt_radiance(s_np, np.asarray(o)[k], np.asarray(d)[k], depth, U[k])
            for k in range(B)
        ]
    )
    np.testing.assert_allclose(np.asarray(rad), expected, rtol=1e-9, atol=1e-12)


def test_bdpt_volumes_match_oracle():
    scene = _smoke_scene()
    s_np = oracle.SceneNP(scene)
    B = 32
    depth = 4
    o, d = _camera_rays(B, seed=99)
    NT = bdpt.NT + scene.num_volumes
    rng = np.random.default_rng(13)
    cam_U = rng.uniform(size=(B, depth, NT))
    ls_U = rng.uniform(size=(B, bdpt.NLS))
    light_U = rng.uniform(size=(B, depth - 1, NT))
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
