"""Intersection + BVH tests: Möller–Trumbore cases, slab tests, and the
BVH == brute-force property test on random triangle soups."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.ops.intersect import (
    brute_force_any,
    brute_force_closest,
    moller_trumbore,
    slab_test,
)
from bpt_tpu.ops.traverse import any_hit, closest_hit
from bpt_tpu.scene.builder import MaterialSpec, SceneBuilder


def _tri(v0, v1, v2, dtype=jnp.float64):
    v0 = jnp.asarray(v0, dtype)
    v1 = jnp.asarray(v1, dtype)
    v2 = jnp.asarray(v2, dtype)
    return v0, v1 - v0, v2 - v0


class TestMollerTrumbore:
    def test_hit_center(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.25, 0.25, 1.0], jnp.float64)
        d = jnp.array([0.0, 0.0, -1.0], jnp.float64)
        ok, t, u, v = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert bool(ok) and np.isclose(float(t), 1.0)
        assert np.isclose(float(u), 0.25) and np.isclose(float(v), 0.25)

    def test_miss_outside(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.8, 0.8, 1.0], jnp.float64)  # u+v > 1
        d = jnp.array([0.0, 0.0, -1.0], jnp.float64)
        ok, *_ = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert not bool(ok)

    def test_parallel_ray(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.0, 0.0, 1.0], jnp.float64)
        d = jnp.array([1.0, 0.0, 0.0], jnp.float64)  # det ~ 0
        ok, *_ = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert not bool(ok)

    def test_edge_hit(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.5, 0.0, 1.0], jnp.float64)  # on v=0 edge
        d = jnp.array([0.0, 0.0, -1.0], jnp.float64)
        ok, _, u, v = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert bool(ok) and np.isclose(float(v), 0.0)

    def test_tmin_excludes(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.25, 0.25, 0.0005], jnp.float64)
        d = jnp.array([0.0, 0.0, -1.0], jnp.float64)
        ok, *_ = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert not bool(ok)  # t = 0.0005 < 1e-3

    def test_unnormalized_direction_t_scaling(self):
        v0, e1, e2 = _tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
        o = jnp.array([0.25, 0.25, 2.0], jnp.float64)
        d = jnp.array([0.0, 0.0, -4.0], jnp.float64)
        ok, t, _, _ = moller_trumbore(o, d, v0, e1, e2, 1e-3, jnp.inf)
        assert bool(ok) and np.isclose(float(t), 0.5)


class TestSlab:
    def test_hit_and_miss(self):
        bmin = jnp.array([0.0, 0.0, 0.0], jnp.float64)
        bmax = jnp.array([1.0, 1.0, 1.0], jnp.float64)
        o = jnp.array([0.5, 0.5, -1.0], jnp.float64)
        assert bool(slab_test(o, jnp.array([0.0, 0.0, 1.0], jnp.float64), bmin, bmax, 1e-3, jnp.inf))
        assert not bool(slab_test(o, jnp.array([0.0, 0.0, -1.0], jnp.float64), bmin, bmax, 1e-3, jnp.inf))

    def test_negative_direction(self):
        bmin = jnp.array([0.0, 0.0, 0.0], jnp.float64)
        bmax = jnp.array([1.0, 1.0, 1.0], jnp.float64)
        o = jnp.array([0.5, 0.5, 2.0], jnp.float64)
        d = jnp.array([0.0, 0.0, -1.0], jnp.float64)
        assert bool(slab_test(o, d, bmin, bmax, 1e-3, jnp.inf))

    def test_zero_component_inside_slab(self):
        bmin = jnp.array([0.0, 0.0, 0.0], jnp.float64)
        bmax = jnp.array([1.0, 1.0, 1.0], jnp.float64)
        o = jnp.array([0.5, 0.5, -1.0], jnp.float64)
        d = jnp.array([0.0, 0.0, 1.0], jnp.float64)  # dx = dy = 0, inside slabs
        assert bool(slab_test(o, d, bmin, bmax, 1e-3, jnp.inf))
        # outside the x slab with dx = 0 -> never hits
        o2 = jnp.array([2.0, 0.5, -1.0], jnp.float64)
        assert not bool(slab_test(o2, d, bmin, bmax, 1e-3, jnp.inf))

    def test_tmax_limits(self):
        bmin = jnp.array([0.0, 0.0, 0.0], jnp.float64)
        bmax = jnp.array([1.0, 1.0, 1.0], jnp.float64)
        o = jnp.array([0.5, 0.5, -2.0], jnp.float64)
        d = jnp.array([0.0, 0.0, 1.0], jnp.float64)
        assert not bool(slab_test(o, d, bmin, bmax, 1e-3, 1.0))  # box at t in [2,3]


def _random_soup_scene(n_tris, seed, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = MaterialSpec.lambertian((0.5, 0.5, 0.5))
    centers = rng.uniform(-5, 5, size=(n_tris, 3))
    for c in centers:
        ofs = rng.normal(size=(3, 3)) * rng.uniform(0.05, 1.0)
        b.add_triangle(c + ofs[0], c + ofs[1], c + ofs[2], mat)
    return b.build(dtype=dtype, use_bvh=True, light_fallback_to_world=False)


@pytest.mark.parametrize("n_tris,seed", [(3, 0), (17, 1), (64, 2), (257, 3)])
def test_bvh_matches_brute_force(n_tris, seed):
    scene = _random_soup_scene(n_tris, seed)
    rng = np.random.default_rng(seed + 100)
    B = 256
    o = jnp.asarray(rng.uniform(-8, 8, size=(B, 3)), jnp.float64)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float64)

    bvh_hit, _ = closest_hit(scene, o, d, 1e-3, jnp.inf)
    brute = brute_force_closest(scene.v0, scene.e1, scene.e2, o, d,
                                jnp.full((B,), 1e-3), jnp.full((B,), jnp.inf))

    assert np.array_equal(np.asarray(bvh_hit.hit), np.asarray(brute.hit))
    m = np.asarray(brute.hit)
    assert np.allclose(np.asarray(bvh_hit.t)[m], np.asarray(brute.t)[m], rtol=1e-12)
    assert np.array_equal(np.asarray(bvh_hit.tri)[m], np.asarray(brute.tri)[m])
    assert np.allclose(np.asarray(bvh_hit.u)[m], np.asarray(brute.u)[m], rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
def test_any_hit_matches_brute(seed):
    scene = _random_soup_scene(40, seed)
    rng = np.random.default_rng(seed + 7)
    B = 256
    o = jnp.asarray(rng.uniform(-8, 8, size=(B, 3)), jnp.float64)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float64)
    tmax = jnp.asarray(rng.uniform(0.5, 20.0, size=(B,)), jnp.float64)

    a = any_hit(scene, o, d, 1e-3, tmax)
    bf = brute_force_any(scene.v0, scene.e1, scene.e2, o, d,
                         jnp.full((B,), 1e-3), tmax)
    assert np.array_equal(np.asarray(a), np.asarray(bf))


def test_bvh_structure_invariants():
    scene = _random_soup_scene(100, 5)
    skip = np.asarray(scene.bvh_skip)
    count = np.asarray(scene.bvh_count)
    first = np.asarray(scene.bvh_first)
    N = len(skip)
    # skip links monotone and in range
    idx = np.arange(N)
    assert (skip > idx).all() and (skip <= N).all()
    # leaves cover all triangles exactly once, in order
    leaves = count > 0
    spans = [(f, f + c) for f, c in zip(first[leaves], count[leaves])]
    spans.sort()
    covered = []
    for a, b in spans:
        covered.extend(range(a, b))
    assert covered == list(range(scene.num_tris))
    # node bboxes contain their leaf triangles
    v0 = np.asarray(scene.v0)
    e1 = np.asarray(scene.e1)
    e2 = np.asarray(scene.e2)
    bmin = np.asarray(scene.bvh_min)
    bmax = np.asarray(scene.bvh_max)
    for ni in np.nonzero(leaves)[0]:
        for ti in range(first[ni], first[ni] + count[ni]):
            pts = np.stack([v0[ti], v0[ti] + e1[ti], v0[ti] + e2[ti]])
            assert (pts >= bmin[ni] - 1e-9).all()
            assert (pts <= bmax[ni] + 1e-9).all()


def test_clustered_sorted_dispatch_matches_bvh_oracle(monkeypatch):
    """The TPU clustered dispatch (payload-sorted wave kernels, round-3
    lax.sort form) == the jnp BVH oracle — exercised on CPU by forcing
    the TPU predicate and interpret-mode kernels, so the sort-in /
    sort-out bookkeeping in _clustered_sorted_closest / any_hit is
    pinned by the suite (it otherwise only runs on real TPU)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN
    from bpt_tpu.ops.pallas.cluster_wave import (
        clustered_any_pallas, clustered_closest_pallas)
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
    from bpt_tpu.scene.builder import MaterialSpec as M, SceneBuilder

    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.7, 0.3, 0.2)),
                    lat_steps=24, lon_steps=48)  # 2208 tris > 512
    b.add_quad((-6, 0, -6), (12, 0, 0), (0, 0, 12),
               M.lambertian((0.6, 0.6, 0.6)))
    scene = b.build(dtype=jnp.float32)
    assert scene.num_tris > 512

    monkeypatch.setattr(soa, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        soa, "_wave_impls",
        lambda: (pack_clusters_rolled,
                 functools.partial(clustered_closest_pallas, interpret=True),
                 functools.partial(clustered_any_pallas, interpret=True)))
    # the round-4 FTB dispatch branch imports these at call time —
    # rebind to interpret mode so the (T_MIN, inf) production shape
    # rides the FTB kernels here exactly as it does on TPU
    from bpt_tpu.ops.pallas import cluster_wave

    _ftb_closest = cluster_wave.clustered_closest_ftb_pallas
    _ftb_any = cluster_wave.clustered_any_ftb_pallas
    monkeypatch.setattr(cluster_wave, "clustered_closest_ftb_pallas",
                        functools.partial(_ftb_closest, interpret=True))
    monkeypatch.setattr(cluster_wave, "clustered_any_ftb_pallas",
                        functools.partial(_ftb_any, interpret=True))

    B = 257  # deliberately not a tile multiple
    rng = np.random.default_rng(3)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) * [1, 0.5, 1] + [0, 2.5, 0],
        jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))

    got = soa.closest_hit(scene, o, d, T_MIN, jnp.inf)
    ref = soa.bvh_closest(scene, o, d, T_MIN,
                          jnp.full((B,), jnp.inf, jnp.float32))
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t)[np.asarray(got.hit)],
                               np.asarray(ref.t)[np.asarray(ref.hit)],
                               rtol=1e-6)

    found = soa.any_hit(scene, o, d, T_MIN, 2.0)
    # oracle: any hit with t <= 2 exists iff bvh closest t <= 2
    ref_any = np.asarray(ref.hit) & (np.asarray(ref.t) <= 2.0)
    got_any = np.asarray(found)
    # any-hit may differ from closest-hit near the boundary only through
    # the exact tmax comparison; require equality
    np.testing.assert_array_equal(got_any, ref_any)


def test_paged_clustered_dispatch_matches_single_table(monkeypatch):
    """Round-4 paging (VERDICT item 7): scenes past the single-table
    SMEM budget split on super boundaries; the FTB kernels run per page
    and the dispatch merges min-t / OR.  Forced here with a tiny
    BPT_TPU_PAGE_F32 budget on a scene that normally fits one table:
    paged results == unpaged results == the jnp BVH oracle."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN
    from bpt_tpu.ops.pallas import cluster_wave
    from bpt_tpu.ops.pallas.clusters import n_pages
    from bpt_tpu.scene.builder import MaterialSpec as M, SceneBuilder

    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.7, 0.3, 0.2)),
                    lat_steps=24, lon_steps=48)
    b.add_quad((-6, 0, -6), (12, 0, 0), (0, 0, 12),
               M.lambertian((0.6, 0.6, 0.6)))
    scene = b.build(dtype=jnp.float32)

    monkeypatch.setattr(soa, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        cluster_wave, "clustered_closest_ftb_pallas",
        functools.partial(cluster_wave.clustered_closest_ftb_pallas,
                          interpret=True))
    monkeypatch.setattr(
        cluster_wave, "clustered_any_ftb_pallas",
        functools.partial(cluster_wave.clustered_any_ftb_pallas,
                          interpret=True))

    B = 257
    rng = np.random.default_rng(5)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) * [1, 0.5, 1] + [0, 2.5, 0],
        jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmax_any = jnp.asarray(rng.uniform(0.5, 6.0, B), jnp.float32)

    assert n_pages(scene) == 1
    one_c = soa.closest_hit(scene, o, d, T_MIN, jnp.inf)
    one_a = np.asarray(soa.any_hit(scene, o, d, T_MIN, tmax_any))

    monkeypatch.setenv("BPT_TPU_PAGE_F32", "150")  # >= 1 super (120 f32)
    assert n_pages(scene) >= 3
    paged_c = soa.closest_hit(scene, o, d, T_MIN, jnp.inf)
    paged_a = np.asarray(soa.any_hit(scene, o, d, T_MIN, tmax_any))

    np.testing.assert_array_equal(np.asarray(paged_c.hit),
                                  np.asarray(one_c.hit))
    np.testing.assert_array_equal(np.asarray(paged_c.t),
                                  np.asarray(one_c.t))
    np.testing.assert_array_equal(np.asarray(paged_c.tri),
                                  np.asarray(one_c.tri))
    # barycentric payload too: the textured jnp wavefront on past-budget
    # scenes rides this path (complete_hit's UV interpolation)
    np.testing.assert_array_equal(np.asarray(paged_c.u),
                                  np.asarray(one_c.u))
    np.testing.assert_array_equal(np.asarray(paged_c.v),
                                  np.asarray(one_c.v))
    np.testing.assert_array_equal(paged_a, one_a)

    ref = soa.bvh_closest(scene, o, d, T_MIN,
                          jnp.full((B,), jnp.inf, jnp.float32))
    np.testing.assert_array_equal(np.asarray(paged_c.hit),
                                  np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(paged_c.t)[np.asarray(ref.hit)],
                               np.asarray(ref.t)[np.asarray(ref.hit)],
                               rtol=1e-6)

    # the sparse any path pages too
    mask = jnp.asarray(rng.uniform(size=B) < 0.15)
    ref_s = np.asarray(soa.brute_any(
        scene, o, d, jnp.full((B,), T_MIN, jnp.float32), tmax_any))
    got_s = np.asarray(soa.any_hit_sparse(
        scene, o, d, T_MIN, tmax_any, mask=mask, cap=128, interpret=True))
    m = np.asarray(mask)
    np.testing.assert_array_equal(got_s[m], ref_s[m])
    assert not got_s[~m].any()
