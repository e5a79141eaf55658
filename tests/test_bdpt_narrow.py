"""Live-prefix narrowed subpath trace (round 5) == plain trace, bitwise.

The narrowed path (bdpt._trace_subpath_narrow) carries the wave in
live-compacted sorted order and runs each bounce body on a static
prefix width; per-lane math is the same sh./soa. calls on the same
inputs with uniforms drawn by ORIGINAL ray id, so every output that is
per-lane (vertices, background, MIS tables, radiance) must be
bit-identical to the plain trace.  BPT_TPU_SUBPATH_NARROW=force engages
it on any backend/scene size so the ladder machinery (switch levels,
packed scatters, re-sorts) is exercised at CPU-test scale.

Both sides run under jax.jit: eager dispatch and compiled XLA legitimately
differ in low-bit rounding (fusion/FMA), and production always runs the
trace inside a jitted step — bit-equality is a compiled-graph property
(measured: jit(plain) == jit(narrow) bitwise; eager(plain) != jit(plain)).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.core import vec3 as v3
from bpt_tpu.models import bdpt, pt
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera


@pytest.fixture()
def rays():
    import dataclasses

    scene = cornell_box()
    cfg = dataclasses.replace(cornell_box_camera(), image_width=8,
                              samples_per_pixel=1, max_depth=6)
    cc = camera_constants(cfg, jnp.float64)
    B = 64
    pix = jnp.arange(B, dtype=jnp.int32) % 64
    i = (pix % 8).astype(jnp.float64)
    j = (pix // 8).astype(jnp.float64)
    key = jax.random.PRNGKey(3)
    ray_ids = pix
    u_gen = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), ray_ids, 0, 4,
                                  dtype=jnp.float64)
    zeros = jnp.zeros((B,), jnp.float64)
    o3, d3 = generate_rays(cc, i, j, zeros, zeros, u_gen)
    return scene, o3, d3, ray_ids, key, B


def _toggle(value):
    old = os.environ.get("BPT_TPU_SUBPATH_NARROW")
    if value is None:
        os.environ.pop("BPT_TPU_SUBPATH_NARROW", None)
    else:
        os.environ["BPT_TPU_SUBPATH_NARROW"] = value
    return old


def _trace(scene, o3, d3, ray_ids, key, mis):
    B = o3.shape[0]
    o = v3.from_array(o3)
    d = v3.from_array(d3)
    ones = jnp.ones((B,), jnp.float64)
    mis_prev = None
    if mis:
        mis_prev = dict(p=o, n=v3.normalize_safe(d),
                        delta=jnp.ones((B,), bool),
                        mtype=jnp.zeros((B,), jnp.int32), pfwd=ones)
    ufn = pt.default_uniforms_fn(jax.random.fold_in(key, 2), ray_ids,
                                 jnp.float64)

    def f():
        # fresh jit per call: _narrow_ok reads the env toggle at trace time
        return bdpt.trace_subpath(
            scene, o, d, v3.Vec3(ones, ones, ones), jnp.ones((B,), bool), 6,
            ufn, collect_background=True, mis_prev=mis_prev)

    return jax.jit(f)()


@pytest.mark.parametrize("mis", [False, True])
def test_narrow_trace_matches_plain(rays, mis):
    scene, o3, d3, ray_ids, key, B = rays
    old = _toggle("0")
    try:
        plain = _trace(scene, o3, d3, ray_ids, key, mis)
        _toggle("force")
        narrow = _trace(scene, o3, d3, ray_ids, key, mis)
    finally:
        _toggle(old)

    vp, vn = plain[0], narrow[0]
    for name in vp._fields:
        a, b = getattr(vp, name), getattr(vn, name)
        if isinstance(a, v3.Vec3):
            for c in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(a, c)), np.asarray(getattr(b, c)),
                    err_msg=f"verts.{name}.{c}")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"verts.{name}")
    for c in "xyz":
        np.testing.assert_array_equal(
            np.asarray(getattr(plain[1], c)), np.asarray(getattr(narrow[1], c)),
            err_msg=f"bg.{c}")
    assert int(plain[2].rays_traced) == int(narrow[2].rays_traced)
    if mis:
        for name in plain[3]._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(plain[3], name)),
                np.asarray(getattr(narrow[3], name)),
                err_msg=f"mis.{name}")


@pytest.mark.parametrize("mis", [False, True])
def test_narrow_bdpt_radiance_matches_plain(rays, mis):
    """End-to-end: the full bdpt estimator (cam + light subpaths both
    narrowed, connections).  Subpath outputs are bitwise equal (tests
    above); the combined radiance is allowed last-bit rounding slack —
    the two programs place fusion boundaries differently around the
    connection stage, and XLA's FMA/fusion choices legitimately move
    the last ulp (measured: 3/192 elements at ~1e-16 abs)."""
    scene, o3, d3, ray_ids, key, B = rays

    def run():
        k_cam = jax.random.fold_in(key, 2)
        k_ls = jax.random.fold_in(key, 3)
        k_lt = jax.random.fold_in(key, 4)
        ls_u = rng_mod.wave_uniforms(k_ls, ray_ids, 0, bdpt.NLS,
                                     dtype=jnp.float64)

        def f():
            return bdpt.bdpt_radiance(
                scene, o3, d3, 6,
                pt.default_uniforms_fn(k_cam, ray_ids, jnp.float64), ls_u,
                pt.default_uniforms_fn(k_lt, ray_ids, jnp.float64), mis=mis)

        return jax.jit(f)()

    old = _toggle("0")
    try:
        rad_p, st_p = run()
        _toggle("force")
        rad_n, st_n = run()
    finally:
        _toggle(old)
    np.testing.assert_allclose(np.asarray(rad_p), np.asarray(rad_n),
                               rtol=1e-12, atol=1e-14)
    assert int(st_p.rays_traced) == int(st_n.rays_traced)
    assert int(st_p.shadow_rays) == int(st_n.shadow_rays)


def test_narrow_light_subpath_matches_plain(rays):
    scene, o3, d3, ray_ids, key, B = rays
    k_ls = jax.random.fold_in(key, 3)
    k_lt = jax.random.fold_in(key, 4)
    ls_u = rng_mod.wave_uniforms(k_ls, ray_ids, 0, bdpt.NLS,
                                 dtype=jnp.float64)

    def run():
        def f():
            return bdpt.build_light_subpath(
                scene, B, 6, [ls_u[:, k] for k in range(bdpt.NLS)],
                pt.default_uniforms_fn(k_lt, ray_ids, jnp.float64),
                jnp.float64, mis=True)

        return jax.jit(f)()

    old = _toggle("0")
    try:
        em_p, tr_p, ok_p, st_p, mis_p = run()
        _toggle("force")
        em_n, tr_n, ok_n, st_n, mis_n = run()
    finally:
        _toggle(old)
    for vp, vn, tag in ((em_p, em_n, "emitter"), (tr_p, tr_n, "traced")):
        for name in vp._fields:
            a, b = getattr(vp, name), getattr(vn, name)
            if isinstance(a, v3.Vec3):
                for c in "xyz":
                    np.testing.assert_array_equal(
                        np.asarray(getattr(a, c)),
                        np.asarray(getattr(b, c)),
                        err_msg=f"{tag}.{name}.{c}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{tag}.{name}")
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_n))
    for name in mis_p._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(mis_p, name)), np.asarray(getattr(mis_n, name)),
            err_msg=f"mis.{name}")


def test_narrow_levels_monotone():
    lv = bdpt._narrow_levels(1 << 19)
    assert lv[0] == 1 << 19
    assert all(a > b for a, b in zip(lv, lv[1:]))
    assert lv[-1] >= (1 << 19) >> 4
    # tiny waves still get a valid (possibly single-level) ladder
    assert bdpt._narrow_levels(16)[0] == 16
