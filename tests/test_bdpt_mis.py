"""bdpt-mis: power-heuristic MIS over the (s, t) strategies — OUR upgrade
(the reference sums all pairs unweighted, camera.h:316-320, and overcounts).

Two independent implementations are cross-checked with identical injected
uniforms: the shipped recursive-ratio jnp form (models.bdpt, mis=True) vs
the oracle's brute-force strategy-pdf enumeration (tests/oracle.py).
A statistical test then checks the estimator is consistent with PT
(both unbiased for the same radiance) where no-MIS BDPT is not."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from bpt_tpu.models import bdpt, pt
from test_pt_oracle import _camera_rays, _mixed_scene


@pytest.mark.parametrize("use_bvh", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 5])
def test_bdpt_mis_matches_oracle(use_bvh, depth):
    scene = _mixed_scene().build(dtype=jnp.float64, use_bvh=use_bvh)
    s_np = oracle.SceneNP(scene)
    B = 48
    o, d = _camera_rays(B, seed=depth + 100)

    rng = np.random.default_rng(depth * 13 + 5)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT))
    ls_U = rng.uniform(size=(B, bdpt.NLS))
    light_U = rng.uniform(size=(B, max(depth - 1, 1), bdpt.NT))

    rad, _ = bdpt.bdpt_radiance(
        scene, o, d, depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U, jnp.float64)),
        jnp.asarray(ls_U, jnp.float64),
        pt.array_uniforms_fn(jnp.asarray(light_U, jnp.float64)),
        mis=True,
    )
    rad = np.asarray(rad)

    expected = np.stack(
        [
            oracle.bdpt_mis_radiance(
                s_np, np.asarray(o)[k], np.asarray(d)[k], depth,
                cam_U[k], ls_U[k], light_U[k],
            )
            for k in range(B)
        ]
    )
    np.testing.assert_allclose(rad, expected, rtol=1e-8, atol=1e-12)


def test_mis_weights_bounded():
    """Weighted contributions can never exceed the unweighted ones."""
    scene = _mixed_scene().build(dtype=jnp.float64, use_bvh=False)
    B = 64
    depth = 4
    o, d = _camera_rays(B, seed=3)
    rng = np.random.default_rng(11)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT))
    ls_U = rng.uniform(size=(B, bdpt.NLS))
    light_U = rng.uniform(size=(B, depth - 1, bdpt.NT))
    args = (
        pt.array_uniforms_fn(jnp.asarray(cam_U, jnp.float64)),
        jnp.asarray(ls_U, jnp.float64),
        pt.array_uniforms_fn(jnp.asarray(light_U, jnp.float64)),
    )
    r_mis, _ = bdpt.bdpt_radiance(scene, o, d, depth, *args, mis=True)
    r_raw, _ = bdpt.bdpt_radiance(scene, o, d, depth, *args, mis=False)
    assert np.all(np.asarray(r_mis) <= np.asarray(r_raw) + 1e-9)


def test_mis_energy_consistent_with_pt():
    """bdpt-mis and pt estimate the SAME radiance; no-MIS bdpt overcounts.
    Cornell box, small render: |mean(mis) - mean(pt)| must be far smaller
    than |mean(bdpt) - mean(pt)| and within MC noise of pt."""
    from bpt_tpu.models.render import render
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box()
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=24, samples_per_pixel=36,
        max_depth=5,
    )
    means = {}
    for integ in ("pt", "bdpt", "bdpt-mis"):
        r = render(scene, dataclasses.replace(cfg, integrator=integ), seed=3)
        means[integ] = float(r.framebuffer_sum.mean()) / r.samples_per_pixel
    err_mis = abs(means["bdpt-mis"] - means["pt"])
    err_raw = abs(means["bdpt"] - means["pt"])
    assert err_raw > 0.25 * means["pt"], means  # the overcount is real
    assert err_mis < 0.15 * means["pt"], means  # mis agrees with pt
    assert err_mis < 0.25 * err_raw, means
