"""Unit tests for core math (vec ops, ONB, sampling distributions, RNG)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core import onb, sampling, vecmath as vm
from bpt_tpu.core.rng import wave_uniforms


def test_dot_cross_length():
    u = jnp.array([1.0, 2.0, 3.0])
    v = jnp.array([-2.0, 0.5, 4.0])
    assert np.isclose(float(vm.dot(u, v)), 1 * -2 + 2 * 0.5 + 3 * 4)
    assert np.allclose(np.asarray(vm.cross(u, v)), np.cross(np.asarray(u), np.asarray(v)))
    assert np.isclose(float(vm.length(u)), np.sqrt(14.0))


def test_reflect():
    v = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    r = vm.reflect(v, n)
    assert np.allclose(np.asarray(r), [1.0, 1.0, 0.0])


def test_refract_matches_snell():
    # 45-degree incidence into eta=1/1.5
    uv = vm.unit_vector(jnp.array([1.0, -1.0, 0.0], jnp.float64))
    n = jnp.array([0.0, 1.0, 0.0], jnp.float64)
    eta = 1.0 / 1.5
    r = np.asarray(vm.refract(uv, n, eta))
    sin_in = np.sqrt(0.5)
    sin_out = eta * sin_in
    assert np.isclose(r[0], sin_out, atol=1e-12)
    assert np.isclose(np.linalg.norm(r), 1.0, atol=1e-12)


def test_schlick_limits():
    # normal incidence -> r0; grazing -> 1
    assert np.isclose(float(vm.schlick_reflectance(1.0, 1.5)), ((1 - 1.5) / (1 + 1.5)) ** 2)
    assert np.isclose(float(vm.schlick_reflectance(0.0, 1.5)), 1.0, atol=1e-9)


def test_onb_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(128, 3))
    u, v, w = onb.onb_from_w(jnp.asarray(n, jnp.float64))
    for a, b in [(u, v), (u, w), (v, w)]:
        assert np.allclose(np.asarray(vm.dot(a, b)), 0.0, atol=1e-12)
    for a in (u, v, w):
        assert np.allclose(np.asarray(vm.length(a)), 1.0, atol=1e-12)
    # w aligned with n
    assert np.allclose(np.asarray(vm.dot(w, jnp.asarray(n))), np.linalg.norm(n, axis=-1), atol=1e-9)


def test_cosine_direction_distribution():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (20000, 2), jnp.float64)
    d = sampling.cosine_direction_local(u[:, 0], u[:, 1])
    z = np.asarray(d[:, 2])
    # E[cos theta] under cosine-weighted sampling = 2/3
    assert abs(z.mean() - 2.0 / 3.0) < 0.01
    assert np.allclose(np.asarray(vm.length(d)), 1.0, atol=1e-12)


def test_uniform_sphere_distribution():
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (20000, 2), jnp.float64)
    d = np.asarray(sampling.uniform_sphere_direction(u[:, 0], u[:, 1]))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
    assert np.abs(d.mean(axis=0)).max() < 0.02
    # z uniform in [-1,1]: variance 1/3
    assert abs((d[:, 2] ** 2).mean() - 1.0 / 3.0) < 0.01


def test_unit_disk():
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (20000, 2), jnp.float64)
    p = np.asarray(sampling.unit_disk_point(u[:, 0], u[:, 1]))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0
    # E[r^2] for uniform disk = 1/2
    assert abs(r2.mean() - 0.5) < 0.01


def test_triangle_fold_uniform():
    key = jax.random.PRNGKey(4)
    uu = jax.random.uniform(key, (20000, 2), jnp.float64)
    u, v = sampling.triangle_barycentric(uu[:, 0], uu[:, 1])
    u, v = np.asarray(u), np.asarray(v)
    assert (u + v <= 1.0 + 1e-12).all()
    # uniform over the unit right triangle: E[u] = E[v] = 1/3
    assert abs(u.mean() - 1.0 / 3.0) < 0.01
    assert abs(v.mean() - 1.0 / 3.0) < 0.01


def test_wave_uniforms_deterministic_and_chunk_invariant():
    key = jax.random.PRNGKey(5)
    ids = jnp.arange(100, dtype=jnp.int32)
    a = wave_uniforms(key, ids, 3, 4)
    b = wave_uniforms(key, ids, 3, 4)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # per-ray values depend only on absolute id, not position in the batch
    sub = wave_uniforms(key, ids[40:60], 3, 4)
    assert np.array_equal(np.asarray(a[40:60]), np.asarray(sub))
    # different bounce -> different stream
    c = wave_uniforms(key, ids, 4, 4)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
