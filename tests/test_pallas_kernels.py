"""Pallas kernel tests (interpret mode on CPU): the brute intersect kernels
and the PT megakernel against their oracle-pinned jnp equivalents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core import vec3 as v3
from bpt_tpu.scene.builder import SceneBuilder
from bpt_tpu.models import pt
from bpt_tpu.ops import soa
from bpt_tpu.ops.pallas.intersect import any_pallas, closest_pallas
from bpt_tpu.ops.pallas.pt_kernel import megakernel_ok, pt_megakernel
from bpt_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box()  # f32


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(50, 500, (B, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    return v3.from_array(o), v3.from_array(d)


def _tri_flat(scene):
    return jnp.concatenate([scene.v0, scene.e1, scene.e2], axis=1).reshape(-1)


def test_closest_kernel_matches_brute(scene):
    B = 777  # non-multiple of tile: exercises padding
    o, d = _rays(B)
    tmin = jnp.full((B,), 1e-3, jnp.float32)
    tmax = jnp.full((B,), jnp.inf, jnp.float32)
    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    t, tri, u, v = closest_pallas(
        _tri_flat(scene), o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True,
    )
    m = np.asarray(ref.hit)
    assert np.array_equal(m, np.isfinite(np.asarray(t)))
    assert np.array_equal(np.asarray(ref.tri)[m], np.asarray(tri)[m])
    np.testing.assert_allclose(np.asarray(ref.t)[m], np.asarray(t)[m], rtol=2e-5)


def test_any_kernel_matches_brute(scene):
    B = 500
    o, d = _rays(B, seed=3)
    tmin = jnp.full((B,), 1e-3, jnp.float32)
    rng = np.random.default_rng(4)
    tmax = jnp.asarray(rng.uniform(10, 2000, B), jnp.float32)
    ref = soa.brute_any(scene, o, d, tmin, tmax)
    got = any_pallas(_tri_flat(scene), o.x, o.y, o.z, d.x, d.y, d.z,
                     tmin, tmax, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_megakernel_ok(scene):
    assert megakernel_ok(scene)


@pytest.mark.parametrize("depth", [1, 4])
def test_megakernel_matches_jnp_with_injected_uniforms(scene, depth):
    B = 300
    o, d = _rays(B, seed=depth)
    rng = np.random.default_rng(depth)
    U = rng.uniform(size=(B, depth, pt.NU)).astype(np.float32)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * pt.NU, B)
    rx, ry, rz, rays, *_ = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-6)
    assert int(rays) == int(stats_ref.rays_traced)


def test_megakernel_stats_smem_match_jnp(scene):
    """In-kernel counters on the SMEM path == the jnp wavefront's stats
    (VERDICT r2 item 5): tri_tests = alive*T per bounce, tri_hits =
    alive surface hits per bounce; node/aabb are 0 on the brute path."""
    B = 300
    depth = 4
    o, d = _rays(B, seed=31)
    rng = np.random.default_rng(31)
    U = rng.uniform(size=(B, depth, pt.NU)).astype(np.float32)
    _, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * pt.NU, B)
    _, _, _, rays, extra = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    nv, ah, tt, th = (float(x) for x in extra)
    assert nv == 0.0 and ah == 0.0
    assert int(tt) == int(stats_ref.tri_tests)
    assert int(th) == int(stats_ref.tri_hits)


def test_megakernel_stats_clustered_populated():
    """Clustered-path counters: node_visits/aabb_hits/tri_tests counted
    inside the traversal provider (VERDICT r2 item 5 — previously
    hardcoded 0), tri_hits pinned against the jnp oracle."""
    scene = _big_scene()
    B = 256
    depth = 3
    rng = np.random.default_rng(33)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    U = rng.uniform(size=(B, depth, pt.NU)).astype(np.float32)
    _, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * pt.NU, B)
    _, _, _, rays, extra = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    nv, ah, tt, th = (float(x) for x in extra)
    # counters are traversal-structure-dependent (the CPU oracle walks a
    # BVH and counts per-TEST improving hits; the kernel streams clusters
    # and reports per-RAY alive-masked hits — docs/PARITY.md), so pin
    # structure, not equality:
    from bpt_tpu.ops.pallas.clusters import CLUSTER_TRIS

    assert nv > 0 and ah > 0 and tt > 0
    # per-ray hits: positive, bounded by rays traced, and nonzero here
    # (primaries aimed at the scene)
    assert 0 < th <= float(rays)
    assert int(tt) % CLUSTER_TRIS == 0
    # at least one M-T roll per counted lane-visit of a CLUSTER (supers
    # add visits but no tests, so tt/32 < nv)
    assert int(tt) // CLUSTER_TRIS <= int(nv)


def test_cluster_capacity_gate_and_clean_error(monkeypatch):
    """Round-3 capacity gate + round-4 paging: the single-table gate
    (cluster_ok) admits the measured-good 480 KB class (C=16384/S=1024,
    a 434k-tri dense sphere ran on the chip — tools/probe_capacity.py)
    and rejects past it; past-budget scenes are now accepted by the
    PAGED FTB dispatch (cluster_pages_ok, VERDICT item 7) with
    budget-respecting super-aligned page bounds, and raise the clean
    error only when the paged path is unavailable (env-disabled FTB)."""
    from types import SimpleNamespace

    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.clusters import (
        MAX_CLUSTERS, MAX_TABLE_F32, _page_bounds, _splits_of, cluster_ok,
        cluster_pages_ok, n_pages)

    def fake_scene(C, S, T):
        # super boundaries must be a SUBSET of cluster boundaries (real
        # builds guarantee it — supers are parent subtrees)
        cs = tuple(min(((k * T) // C), T) for k in range(C + 1))
        step = max(1, C // S)
        ss = cs[::step]
        if ss[-1] != T:
            ss = ss + (T,)
        return SimpleNamespace(
            num_tris=T, cluster_splits=cs, super_splits=ss, use_bvh=True)

    assert cluster_ok(fake_scene(16384, 1024, 434284))
    assert not cluster_ok(fake_scene(25000, 1600, 660000))

    big = fake_scene(25000, 1600, 660000)
    # the paged dispatch accepts it: every page within the budget,
    # page bounds contiguous on super boundaries, full coverage
    assert cluster_pages_ok(big) and n_pages(big) >= 2
    cs, ss = _splits_of(big)
    pages = _page_bounds(cs, ss)
    assert pages[0][0] == 0 and pages[-1][1] == len(ss) - 1
    for (s0, s1, c0, c1), nxt in zip(pages, pages[1:] + [None]):
        assert (s1 - s0) * 8 + (c1 - c0) * 7 <= MAX_TABLE_F32
        assert c1 - c0 <= MAX_CLUSTERS
        if nxt is not None:
            assert nxt[0] == s1 and nxt[2] == c1

    # a fake 30M-tri scene exceeds the MAX_PAGES backstop -> clean error
    huge = fake_scene(1_100_000, 68_750, 30_000_000)
    assert not cluster_pages_ok(huge)
    o = v3.from_array(jnp.zeros((4, 3), jnp.float32))
    d = v3.from_array(jnp.ones((4, 3), jnp.float32))
    monkeypatch.setattr(soa, "_on_tpu", lambda: True)
    with pytest.raises(RuntimeError, match="no TPU clustered path"):
        soa.closest_hit(huge, o, d, 1e-4, jnp.inf)

    # FTB disabled on a multi-page scene: the single-table error fires
    # before an over-budget table reaches Mosaic
    monkeypatch.setenv("BPT_TPU_NO_FTB", "1")
    with pytest.raises(RuntimeError, match="single-table"):
        soa.closest_hit(big, o, d, 1e-4, jnp.inf)


def test_megakernel_rng_mode_runs_and_is_deterministic(scene):
    B = 200
    o, d = _rays(B, seed=9)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    r1 = pt_megakernel(scene, o, d, ids, key, 3, interpret=True)
    r2 = pt_megakernel(scene, o, d, ids, key, 3, interpret=True)
    for a, b in zip(r1, r2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(r1[0])).all()
    # inactive lanes (negative ids) contribute nothing and aren't counted
    ids2 = ids.at[:50].set(-1)
    r3 = pt_megakernel(scene, o, d, ids2, key, 3, interpret=True)
    assert float(r3[3]) < float(r1[3])
    assert np.all(np.asarray(r3[0])[:50] == 0.0)


def test_bdpt_megakernel_matches_jnp_with_injected_uniforms(scene):
    from bpt_tpu.models import bdpt
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel, n_uniform_slots

    B = 96
    depth = 4
    o, d = _rays(B, seed=11)
    rng = np.random.default_rng(11)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT)).astype(np.float32)
    ls_U = rng.uniform(size=(B, bdpt.NLS)).astype(np.float32)
    light_U = rng.uniform(size=(B, depth - 1, bdpt.NT)).astype(np.float32)
    rad_ref, stats_ref = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
    )
    rows = []
    for b in range(depth):
        for s in range(bdpt.NT):
            rows.append(cam_U[:, b, s])
    for s in range(bdpt.NLS):
        rows.append(ls_U[:, s])
    for b in range(depth - 1):
        for s in range(bdpt.NT):
            rows.append(light_U[:, b, s])
    ubuf = jnp.asarray(np.stack(rows))
    assert ubuf.shape[0] == n_uniform_slots(depth)
    rx, ry, rz, rays, shadow, extra = bdpt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)
    # in-kernel counters: per-ray hits equal the jnp trace subpaths
    # exactly; tri_tests additionally charge connection occlusion sweeps
    # (the jnp wavefront's stats omit those — docs/PARITY.md)
    assert int(extra[3]) == int(stats_ref.tri_hits)
    assert int(extra[2]) >= int(stats_ref.tri_tests)


def test_bdpt_mis_megakernel_matches_jnp_with_injected_uniforms(scene):
    """bdpt-mis (power-heuristic weighted connections) on the megakernel
    against the jnp wavefront — same injected-uniform harness as the
    no-MIS test above; the MIS weights draw no uniforms."""
    from bpt_tpu.models import bdpt
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel, n_uniform_slots

    B = 96
    depth = 4
    o, d = _rays(B, seed=13)
    rng = np.random.default_rng(13)
    cam_U = rng.uniform(size=(B, depth, bdpt.NT)).astype(np.float32)
    ls_U = rng.uniform(size=(B, bdpt.NLS)).astype(np.float32)
    light_U = rng.uniform(size=(B, depth - 1, bdpt.NT)).astype(np.float32)
    rad_ref, stats_ref = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
        mis=True,
    )
    rows = []
    for b in range(depth):
        for s in range(bdpt.NT):
            rows.append(cam_U[:, b, s])
    for s in range(bdpt.NLS):
        rows.append(ls_U[:, s])
    for b in range(depth - 1):
        for s in range(bdpt.NT):
            rows.append(light_U[:, b, s])
    ubuf = jnp.asarray(np.stack(rows))
    assert ubuf.shape[0] == n_uniform_slots(depth)
    rx, ry, rz, rays, shadow, *_ = bdpt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
        mis=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)
    # MIS can only damp: per-lane radiance never exceeds the unweighted sum
    rad_plain, _ = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
    )
    assert np.all(got <= np.asarray(rad_plain) + 1e-5)


def test_bdpt_megakernel_rng_mode_deterministic(scene):
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel

    B = 64
    o, d = _rays(B, seed=21)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(5)
    r1 = bdpt_megakernel(scene, o, d, ids, key, 3, interpret=True)
    r2 = bdpt_megakernel(scene, o, d, ids, key, 3, interpret=True)
    for a, b in zip(r1, r2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(r1[0])).all()


def _big_scene():
    """> MAX_TRIS triangles -> clustered streaming mode."""
    b = SceneBuilder()
    from bpt_tpu.scene.builder import MaterialSpec as M

    b.add_uv_sphere((0, 1, 0), 1.0, M.metal((0.8, 0.8, 0.8), 0.05))
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20), M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4), M.diffuse_light((10, 10, 10)))
    return b.build(dtype=jnp.float32)


def test_clustered_pt_matches_jnp():
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters
    from bpt_tpu.scene.builder import SceneBuilder  # noqa: F401

    scene = _big_scene()
    assert use_clusters(scene) and megakernel_ok(scene)
    B = 128
    depth = 3
    o, d = _rays(B, seed=31)
    # aim at the sphere/floor region
    import numpy as _np

    rng = _np.random.default_rng(31)
    o = v3.from_array(jnp.asarray(_np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = _np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)), _np.zeros((B, 1))], 1
    )
    d = v3.from_array(jnp.asarray(tgt - _np.array([0.0, 2.0, 6.0]), jnp.float32))
    U = rng.uniform(size=(B, depth, pt.NU)).astype(_np.float32)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * pt.NU, B)
    rx, ry, rz, rays, *_ = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


def test_clustered_bdpt_matches_jnp():
    from bpt_tpu.models import bdpt
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel, n_uniform_slots

    scene = _big_scene()
    import numpy as _np

    rng = _np.random.default_rng(41)
    B = 64
    depth = 3
    o = v3.from_array(jnp.asarray(_np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = _np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)), _np.zeros((B, 1))], 1
    )
    d = v3.from_array(jnp.asarray(tgt - _np.array([0.0, 2.0, 6.0]), jnp.float32))
    cam_U = rng.uniform(size=(B, depth, bdpt.NT)).astype(_np.float32)
    ls_U = rng.uniform(size=(B, bdpt.NLS)).astype(_np.float32)
    light_U = rng.uniform(size=(B, depth - 1, bdpt.NT)).astype(_np.float32)
    rad_ref, stats_ref = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
    )
    rows = []
    for b_ in range(depth):
        for s in range(bdpt.NT):
            rows.append(cam_U[:, b_, s])
    for s in range(bdpt.NLS):
        rows.append(ls_U[:, s])
    for b_ in range(depth - 1):
        for s in range(bdpt.NT):
            rows.append(light_U[:, b_, s])
    ubuf = jnp.asarray(np.stack(rows))
    assert ubuf.shape[0] == n_uniform_slots(depth)
    r = bdpt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(r[0]), np.asarray(r[1]), np.asarray(r[2])], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(r[3]) == int(stats_ref.rays_traced)


def test_pt_spp_fusion_bitwise(scene):
    """Fused-spp kernel == sum of per-stratum single-sample launches."""
    import dataclasses

    from bpt_tpu.models.camera import camera_constants
    from bpt_tpu.ops.pallas.pt_kernel import camera_table, pt_megakernel_pixels
    from bpt_tpu.scene.presets import cornell_box_camera

    W, S, spp = 8, 2, 4
    cfg = dataclasses.replace(cornell_box_camera(), image_width=W,
                              samples_per_pixel=spp)
    cc = camera_constants(cfg, jnp.float32)
    key = jax.random.PRNGKey(7)
    npx = W * W
    pixids = jnp.arange(npx, dtype=jnp.int32)
    i = (pixids % W).astype(jnp.float32)
    j = (pixids // W).astype(jnp.float32)
    rf = pt_megakernel_pixels(scene, i, j, i * 0, j * 0, pixids,
                              camera_table(cc), key, 3, interpret=True,
                              spp_loop=spp, sqrt_spp=S)
    fused = np.stack([np.asarray(rf[k]) for k in range(3)], -1)
    acc = np.zeros((npx, 3), np.float32)
    rays = 0.0
    for s in range(spp):
        rid = pixids * spp + s
        sx = jnp.full((npx,), float(s % S))
        sy = jnp.full((npx,), float(s // S))
        r1 = pt_megakernel_pixels(scene, i, j, sx, sy, rid,
                                  camera_table(cc), key, 3, interpret=True)
        acc += np.stack([np.asarray(r1[k]) for k in range(3)], -1)
        rays += float(r1[3])
    np.testing.assert_array_equal(fused, acc)
    assert float(rf[3]) == rays


def test_bdpt_pixels_fused_deterministic(scene):
    import dataclasses

    from bpt_tpu.models.camera import camera_constants
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel_pixels
    from bpt_tpu.ops.pallas.pt_kernel import camera_table
    from bpt_tpu.scene.presets import cornell_box_camera

    W, S = 8, 2
    cfg = dataclasses.replace(cornell_box_camera(), image_width=W,
                              samples_per_pixel=S * S)
    cc = camera_constants(cfg, jnp.float32)
    key = jax.random.PRNGKey(9)
    npx = W * W
    pixids = jnp.arange(npx, dtype=jnp.int32)
    i = (pixids % W).astype(jnp.float32)
    j = (pixids // W).astype(jnp.float32)
    r1 = bdpt_megakernel_pixels(scene, i, j, pixids, camera_table(cc), key,
                                3, S, interpret=True)
    r2 = bdpt_megakernel_pixels(scene, i, j, pixids, camera_table(cc), key,
                                3, S, interpret=True)
    for a, b in zip(r1, r2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(r1[0])).all()
    assert float(r1[4]) > 0  # connections fire


def test_cluster_wave_closest_matches_brute():
    """Standalone wavefront clustered kernel == jnp brute on a >512-tri
    scene: t/u/v allclose, tri index equal, misses equal."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.cluster_wave import clustered_closest_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(77)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)

    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_clusters_rolled(scene)
    t, tri, u, v = clustered_closest_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(t) < np.inf)
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(tri)[m], np.asarray(ref.tri)[m])
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(ref.v)[m],
                               rtol=1e-4, atol=1e-5)


def test_cluster_wave_any_matches_brute():
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(78)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), 4.0, jnp.float32)

    ref = soa.brute_any(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_clusters_rolled(scene)
    got = clustered_any_pallas(aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z,
                               tmin, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_cluster_wave_sorted_matches_unsorted():
    """Morton-permuted launch + inverse permutation == direct launch
    (what ops.soa's TPU dispatch does)."""
    from bpt_tpu.ops.pallas.cluster_wave import (
        clustered_closest_pallas, morton_octant_key)
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 384
    rng = np.random.default_rng(79)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)
    _C, aabb, blocks = pack_clusters_rolled(scene)

    direct = clustered_closest_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True)
    lo = scene.bvh_min[0].astype(jnp.float32)
    hi = scene.bvh_max[0].astype(jnp.float32)
    key = morton_octant_key(lo, hi, o.x, o.y, o.z, d.x, d.y, d.z)
    p = jnp.argsort(key)
    inv = jnp.argsort(p)
    sorted_r = clustered_closest_pallas(
        aabb, blocks, o.x[p], o.y[p], o.z[p], d.x[p], d.y[p], d.z[p],
        tmin[p], tmax[p], interpret=True)
    for a, b in zip(direct, sorted_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b[inv]))


def test_plucker_closest_matches_brute():
    """MXU Plücker kernel == jnp brute Möller–Trumbore on a >512-tri
    scene (u/v/t to fp-rearrangement tolerance, tri index exact)."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.plucker import (
        pack_plucker_clusters, plucker_closest_pallas)
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(81)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)

    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_plucker_clusters(scene)
    t, tri, u, v = plucker_closest_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(t) < np.inf)
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(tri)[m], np.asarray(ref.tri)[m])
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(ref.v)[m],
                               rtol=1e-3, atol=1e-4)


def test_plucker_any_matches_brute():
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.plucker import (
        pack_plucker_clusters, plucker_any_pallas)
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(82)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), 4.0, jnp.float32)

    ref = soa.brute_any(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_plucker_clusters(scene)
    got = plucker_any_pallas(aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z,
                             tmin, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_plucker_small_scene_closest(scene):
    """One partial cluster (34 tris): padding must never report hits."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.plucker import (
        pack_plucker_clusters, plucker_closest_pallas)
    from bpt_tpu.ops.intersect import T_MIN

    B = 256
    o, d = _rays(B, seed=83)
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)
    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_plucker_clusters(scene)
    t, tri, u, v = plucker_closest_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(t) < np.inf)
    m = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(tri)[m], np.asarray(ref.tri)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)


def test_plucker_large_coordinate_scale():
    """Cluster-center translation keeps Plücker numerically sane at
    mm-style coordinate scales (raw moments cancel catastrophically)."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.pallas.plucker import (
        pack_plucker_clusters, plucker_closest_pallas)
    from bpt_tpu.ops.intersect import T_MIN
    from bpt_tpu.scene.builder import MaterialSpec as M, SceneBuilder

    S = 500.0
    b = SceneBuilder()
    b.add_uv_sphere((0, S, 0), S, M.metal((0.8, 0.8, 0.8), 0.05))
    b.add_quad((-10 * S, 0, -10 * S), (20 * S, 0, 0), (0, 0, 20 * S),
               M.lambertian((0.6, 0.6, 0.6)))
    scene = b.build(dtype=jnp.float32)

    B = 512
    rng = np.random.default_rng(91)
    o = v3.from_array(jnp.asarray(
        (rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0])) * S,
        jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)

    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_plucker_clusters(scene)
    t, tri, u, v = plucker_closest_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmin, tmax,
        interpret=True)
    hit_ref = np.asarray(ref.hit)
    hit_got = np.asarray(t) < np.inf
    # allow a tiny silhouette-edge disagreement budget at fp32
    assert (hit_ref != hit_got).mean() < 0.01, (hit_ref != hit_got).mean()
    m = hit_ref & hit_got
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-3)
    assert (np.asarray(tri)[m] == np.asarray(ref.tri)[m]).mean() > 0.99


def test_pt_wave_matches_megakernel_clustered():
    """Per-bounce wavefront kernel == fused megakernel, bitwise (same
    RNG streams, same bounce body via make_bounce, sort undone)."""
    from bpt_tpu.ops.pallas.pt_kernel import pt_megakernel
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _big_scene()
    B = 256
    depth = 4
    rng = np.random.default_rng(41)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(12)
    mk = pt_megakernel(scene, o, d, ids, key, depth, interpret=True)
    wv = pt_wave(scene, o, d, ids, key, depth, interpret=True)
    for a, b in zip(mk[:3], wv[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(mk[3]) == int(wv[3])


def test_pt_wave_sort_invariance():
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _big_scene()
    B = 256
    rng = np.random.default_rng(42)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-2, 2, (B, 3)) + np.array([0.0, 2.0, 5.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(13)
    r1 = pt_wave(scene, o, d, ids, key, 3, interpret=True, sort=True)
    r2 = pt_wave(scene, o, d, ids, key, 3, interpret=True, sort=False)
    r3 = pt_wave(scene, o, d, ids, key, 3, interpret=True, sort=True,
                 entry_sort=True)  # round-3 entry-pattern key
    # radiance + ray count only: traversal COUNTERS (element 4) are
    # tile-composition-dependent, so sorting legitimately changes them
    for a, b in zip(r1[:4], r2[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(r1[:4], r3[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pt_wave_batch_composition_invariance():
    """render's spp-batched waves (_make_step_pt_wave batch>1) are
    bitwise equal to sequential per-stratum waves: every draw is keyed
    by the absolute ray id, so the COMPOSITION of a wave cannot change
    any sample's radiance (VERDICT r2 item 1 productionization)."""
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _big_scene()
    B = 192
    rng = np.random.default_rng(47)
    o_np = rng.uniform(-2, 2, (2 * B, 3)) + np.array([0.0, 2.0, 5.0])
    d_np = rng.normal(size=(2 * B, 3))
    key = jax.random.PRNGKey(15)
    ids = jnp.arange(2 * B, dtype=jnp.int32)

    def run(sl):
        o = v3.from_array(jnp.asarray(o_np[sl], jnp.float32))
        d = v3.from_array(jnp.asarray(d_np[sl], jnp.float32))
        return pt_wave(scene, o, d, ids[sl], key, 3, interpret=True)

    both = run(slice(None))
    h1 = run(slice(0, B))
    h2 = run(slice(B, 2 * B))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(both[k])[:B],
                                      np.asarray(h1[k]))
        np.testing.assert_array_equal(np.asarray(both[k])[B:],
                                      np.asarray(h2[k]))
    assert int(both[3]) == int(h1[3]) + int(h2[3])


def _textured_scene(big: bool):
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.textures import TextureSpec

    b = SceneBuilder()
    tex = TextureSpec.checker(0.35, (0.9, 0.3, 0.2), (0.1, 0.8, 0.3))
    kw = dict(lat_steps=16, lon_steps=32) if big else dict(
        lat_steps=4, lon_steps=6)
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((1, 1, 1), texture=tex),
                    **kw)
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((10, 10, 10)))
    s = b.build(dtype=jnp.float32)
    assert s.has_textures
    return s


@pytest.mark.parametrize("big", [False, True])
def test_pt_wave_textured_matches_jnp(big):
    """Textured pt_wave (VERDICT r2 item 7): the kernel reports (u, v,
    tri), the texel multiplies the throughput in XLA between bounces —
    vs the jnp wavefront fed the SAME in-kernel threefry stream
    (pt.kernel_stream_uniforms_fn).  big=True exercises the clustered
    roll's uv tracking, big=False the extended SMEM sweep."""
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _textured_scene(big)
    assert use_clusters(scene) == big
    B = 192
    depth = 4
    rng = np.random.default_rng(61 + int(big))
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(19)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32),
    )
    rx, ry, rz, rays, _st = pt_wave(scene, o, d, ids, key, depth,
                                    interpret=True)
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4,
                               atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


@pytest.mark.parametrize("big", [False, True])
def test_pt_wave_textured_light_matches_jnp(big):
    """Round 4 (VERDICT item 6): textured LIGHT emission on the wave
    kernel path — the kernel emits throughput * 1.0 (neutralized table
    albedo) and the XLA texel stage scales the dying lane's radiance by
    the emission texel at the hit's (u, v, p), matching the jnp
    wavefront (material.h:138-143, textures/texture.h:52-74).  The
    spatial checker pins the hit-point p of lanes that died in-kernel."""
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters, wave_reject_reason
    from bpt_tpu.ops.pallas.pt_wave import pt_wave
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.textures import TextureSpec

    b = SceneBuilder()
    ltex = TextureSpec.checker(0.5, (12.0, 10.0, 4.0), (2.0, 2.0, 10.0))
    tex = TextureSpec.checker(0.35, (0.9, 0.3, 0.2), (0.1, 0.8, 0.3))
    kw = dict(lat_steps=16, lon_steps=32) if big else dict(
        lat_steps=4, lon_steps=6)
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((1, 1, 1), texture=tex),
                    **kw)
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    # y = 6.03: NOT on a checker-cell boundary of ltex (scale 0.5) — a
    # light plane exactly on a cell boundary makes the parity depend on
    # the last bit of t (XLA fusion differences legitimately flip it)
    b.add_quad((-2, 6.03, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((1, 1, 1), texture=ltex))
    scene = b.build(dtype=jnp.float32)
    assert use_clusters(scene) == big
    assert wave_reject_reason(scene) == ""
    B = 192
    depth = 4
    rng = np.random.default_rng(63 + int(big))
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 6, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(23)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32),
    )
    assert float(jnp.max(jnp.asarray(rad_ref))) > 0.0  # light is seen
    rx, ry, rz, rays, _st = pt_wave(scene, o, d, ids, key, depth,
                                    interpret=True)
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4,
                               atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


@pytest.mark.parametrize("big", [False, True])
def test_pt_wave_textured_volume_matches_jnp(big):
    """Round 4 (VERDICT item 6): textured VOLUME scenes on the wave
    kernel path — where the constant_medium free-flight override wins,
    the kernel zeroes the uv payload and encodes the phase material as
    ti = -2 - mat; the XLA stage restores the isotropic texture albedo
    at (0, 0, p), matching soa.apply_volumes' uv zeroing.  Also covers
    plain surface texels coexisting with volumes in one scene."""
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters, wave_reject_reason
    from bpt_tpu.ops.pallas.pt_wave import pt_wave
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.textures import TextureSpec

    b = SceneBuilder()
    tex = TextureSpec.checker(0.35, (0.9, 0.3, 0.2), (0.1, 0.8, 0.3))
    vtex = TextureSpec.checker(0.8, (0.95, 0.6, 0.3), (0.2, 0.5, 0.9))
    kw = dict(lat_steps=16, lon_steps=32) if big else dict(
        lat_steps=4, lon_steps=6)
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((1, 1, 1), texture=tex),
                    **kw)
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((9, 9, 9)))
    b.add_volume_box((-3, 0, -3), (3, 4, 3), 0.35, texture=vtex)
    scene = b.build(dtype=jnp.float32)
    assert scene.num_volumes == 1 and scene.has_textures
    assert use_clusters(scene) == big
    assert wave_reject_reason(scene) == ""
    B = 192
    depth = 5
    rng = np.random.default_rng(67 + int(big))
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(29)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32,
                                     n_vols=scene.num_volumes),
    )
    rx, ry, rz, rays, _st = pt_wave(scene, o, d, ids, key, depth,
                                    interpret=True)
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4,
                               atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


def test_shared_scatter_flag_parity(scene, monkeypatch):
    """BPT_TPU_PT_SHARED_SCATTER (round 4, cornell estimator cut): the
    mixture's bsdf branch reuses the light-point draw pair — one fewer
    threefry per bounce.  Kernel (megakernel + pt_wave) == jnp wavefront
    on the shared stream, and the flag actually changes the stream
    (differs from the default render)."""
    from bpt_tpu.ops.pallas.pt_kernel import pt_megakernel
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    B = 160
    depth = 4
    o, d = _rays(B, seed=53)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(31)

    base = np.asarray(pt_megakernel(scene, o, d, ids, key, depth,
                                    interpret=True)[0])
    monkeypatch.setenv("BPT_TPU_PT_SHARED_SCATTER", "1")
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32),
    )
    mk = pt_megakernel(scene, o, d, ids, key, depth, interpret=True)
    wv = pt_wave(scene, o, d, ids, key, depth, interpret=True)
    got = np.stack([np.asarray(mk[0]), np.asarray(mk[1]),
                    np.asarray(mk[2])], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4,
                               atol=1e-5)
    for a, b in zip(mk[:3], wv[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(mk[3]) == int(stats_ref.rays_traced)
    assert not np.array_equal(np.asarray(mk[0]), base)


def test_pt_wave_small_scene(scene):
    """Non-clustered (SMEM tri table) path of the bounce kernel."""
    from bpt_tpu.ops.pallas.pt_kernel import pt_megakernel
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    B = 128
    o, d = _rays(B, seed=44)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(14)
    mk = pt_megakernel(scene, o, d, ids, key, 3, interpret=True)
    wv = pt_wave(scene, o, d, ids, key, 3, interpret=True)
    for a, b in zip(mk[:3], wv[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(mk[3]) == int(wv[3])


def test_coherence_perm_is_grouping_permutation():
    """pt_wave's coherence sort: output is a true permutation, dead rays
    land at the tail, and the live section is grouped octant-major
    (the fine key's top bits)."""
    from bpt_tpu.ops.pallas.pt_wave import _coherence_perm

    B = 4096
    rng = np.random.default_rng(7)
    lo = jnp.zeros((3,), jnp.float32)
    hi = jnp.ones((3,), jnp.float32)
    ox, oy, oz = (jnp.asarray(rng.uniform(0, 1, B), jnp.float32)
                  for _ in range(3))
    dx, dy, dz = (jnp.asarray(rng.normal(size=B), jnp.float32)
                  for _ in range(3))
    alive = jnp.asarray((rng.uniform(size=B) < 0.7), jnp.float32)
    p = np.asarray(_coherence_perm(lo, hi, ox, oy, oz, dx, dy, dz, alive))
    assert sorted(p) == list(range(B))  # permutation
    a_sorted = np.asarray(alive)[p]
    first_dead = np.argmax(a_sorted < 0.5) if (a_sorted < 0.5).any() else B
    assert (a_sorted[first_dead:] < 0.5).all()  # dead rays contiguous tail
    # live section octant-major (recompute the key's top 3 bits)
    octant = ((np.asarray(dx) > 0).astype(np.int64)
              | ((np.asarray(dy) > 0).astype(np.int64) << 1)
              | ((np.asarray(dz) > 0).astype(np.int64) << 2))
    live_oct = octant[p][:first_dead]
    assert (np.diff(live_oct) >= 0).all()


def _smoke_scene_f32():
    """Cornell smoke (two constant_medium boxes), f32 — the in-kernel
    volume path (constant_medium.h:24-56 free-flight override)."""
    from bpt_tpu.scene.builder import MaterialSpec as M

    b = SceneBuilder()
    b.add_quad((555, 0, 0), (0, 0, 555), (0, 555, 0),
               M.lambertian((0.12, 0.45, 0.15)))
    b.add_quad((0, 0, 555), (0, 0, -555), (0, 555, 0),
               M.lambertian((0.65, 0.05, 0.05)))
    b.add_quad((0, 555, 0), (555, 0, 0), (0, 0, 555),
               M.lambertian((0.73, 0.73, 0.73)))
    b.add_quad((0, 0, 555), (555, 0, 0), (0, 0, -555),
               M.lambertian((0.73, 0.73, 0.73)))
    b.add_quad((555, 0, 555), (-555, 0, 0), (0, 555, 0),
               M.lambertian((0.73, 0.73, 0.73)))
    b.add_quad((113, 554, 127), (330, 0, 0), (0, 0, 305),
               M.diffuse_light((7.0, 7.0, 7.0)))
    b.add_volume_box((120, 0.01, 65), (285, 165, 230), density=0.01,
                     albedo=(0.0, 0.0, 0.0), rotate_y_degrees=-18.0)
    b.add_volume_box((265, 0.01, 295), (430, 330, 460), density=0.005,
                     albedo=(1.0, 1.0, 1.0), rotate_y_degrees=15.0)
    return b.build(dtype=jnp.float32)


def _box_rays(B, seed):
    """Rays from the cornell camera position into the box interior."""
    rng = np.random.default_rng(seed)
    o = v3.from_array(jnp.asarray(
        np.tile([[278.0, 278.0, -800.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(50, 500, (B, 2)), rng.uniform(50, 500, (B, 1))], 1)
    d = v3.from_array(jnp.asarray(
        tgt - np.array([278.0, 278.0, -800.0]), jnp.float32))
    return o, d


def test_megakernel_volumes_ok_gate():
    s = _smoke_scene_f32()
    assert s.num_volumes == 2
    assert megakernel_ok(s, "pt")
    # round 3: volumes run in-kernel on the BDPT megakernel too
    assert megakernel_ok(s, "bdpt")
    assert megakernel_ok(s, "bdpt-mis")


@pytest.mark.parametrize("depth", [2, 5])
def test_megakernel_volumes_match_jnp_injected(depth):
    scene = _smoke_scene_f32()
    B = 160
    o, d = _box_rays(B, seed=depth + 60)
    nu = pt.NU + scene.num_volumes
    rng = np.random.default_rng(depth + 7)
    U = rng.uniform(size=(B, depth, nu)).astype(np.float32)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * nu, B)
    rx, ry, rz, rays, *_ = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-6)
    assert int(rays) == int(stats_ref.rays_traced)


@pytest.mark.parametrize("mis", [False, True])
def test_bdpt_megakernel_volumes_match_jnp_injected(mis):
    """BDPT megakernel with in-kernel constant_medium tables == the jnp
    wavefront (injected uniforms; trace bounces carry NT+V slots, the
    free-flight draws last — models.bdpt nt_total layout).  VERDICT r2
    item 9."""
    from bpt_tpu.models import bdpt
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel, n_uniform_slots

    scene = _smoke_scene_f32()
    V = scene.num_volumes
    ntv = bdpt.NT + V
    B = 96
    depth = 4
    o, d = _box_rays(B, seed=23 + int(mis))
    rng = np.random.default_rng(29 + int(mis))
    cam_U = rng.uniform(size=(B, depth, ntv)).astype(np.float32)
    ls_U = rng.uniform(size=(B, bdpt.NLS)).astype(np.float32)
    light_U = rng.uniform(size=(B, depth - 1, ntv)).astype(np.float32)
    rad_ref, stats_ref = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
        mis=mis,
    )
    rows = []
    for b in range(depth):
        for s in range(ntv):
            rows.append(cam_U[:, b, s])
    for s in range(bdpt.NLS):
        rows.append(ls_U[:, s])
    for b in range(depth - 1):
        for s in range(ntv):
            rows.append(light_U[:, b, s])
    ubuf = jnp.asarray(np.stack(rows))
    assert ubuf.shape[0] == n_uniform_slots(depth, V)
    rx, ry, rz, rays, shadow, *_ = bdpt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
        mis=mis,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)
    # shadow counts are eps-boundary-sensitive: the jnp estimator's
    # UNROLLED connect loop (round 4, models.bdpt._loop) lets XLA fuse
    # FMAs differently than the fori_loop form, flipping a handful of
    # knife-edge visibility predicates (measured 747 vs 744 of ~750 on
    # this scene, tools/dbg_unroll_shadow.py — radiance agrees to 1e-6).
    # Pin the count to a tight window instead of bit equality.
    assert abs(int(shadow) - int(stats_ref.shadow_rays)) <= max(
        5, int(stats_ref.shadow_rays) // 100)


def test_pt_wave_volumes_match_megakernel():
    """RNG-mode bitwise equality between the fused megakernel and the
    per-bounce wavefront on a volume scene (same draw slots NU..NU+V-1)."""
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _smoke_scene_f32()
    B = 128
    o, d = _box_rays(B, seed=71)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(17)
    mk = pt_megakernel(scene, o, d, ids, key, 4, interpret=True)
    wv = pt_wave(scene, o, d, ids, key, 4, interpret=True)
    for a, b in zip(mk[:3], wv[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(mk[3]) == int(wv[3])


def test_pt_spp_fusion_bitwise_volumes():
    """Fused-spp pixels kernel == per-stratum launches on a volume scene
    (jitter keys live after depth*(NU+V) bounce slots)."""
    import dataclasses

    from bpt_tpu.models.camera import camera_constants
    from bpt_tpu.ops.pallas.pt_kernel import camera_table, pt_megakernel_pixels
    from bpt_tpu.scene.presets import cornell_box_camera

    scene = _smoke_scene_f32()
    W, S, spp = 8, 2, 4
    cfg = dataclasses.replace(cornell_box_camera(), image_width=W,
                              samples_per_pixel=spp)
    cc = camera_constants(cfg, jnp.float32)
    key = jax.random.PRNGKey(23)
    npx = W * W
    pixids = jnp.arange(npx, dtype=jnp.int32)
    i = (pixids % W).astype(jnp.float32)
    j = (pixids // W).astype(jnp.float32)
    rf = pt_megakernel_pixels(scene, i, j, i * 0, j * 0, pixids,
                              camera_table(cc), key, 3, interpret=True,
                              spp_loop=spp, sqrt_spp=S)
    fused = np.stack([np.asarray(rf[k]) for k in range(3)], -1)
    acc = np.zeros((npx, 3), np.float32)
    rays = 0.0
    for s in range(spp):
        rid = pixids * spp + s
        sx = jnp.full((npx,), float(s % S))
        sy = jnp.full((npx,), float(s // S))
        r1 = pt_megakernel_pixels(scene, i, j, sx, sy, rid,
                                  camera_table(cc), key, 3, interpret=True)
        acc += np.stack([np.asarray(r1[k]) for k in range(3)], -1)
        rays += float(r1[3])
    np.testing.assert_array_equal(fused, acc)
    assert float(rf[3]) == rays


@pytest.mark.parametrize("depth", [3])
def test_clustered_megakernel_with_volumes(depth):
    """Clustered streaming scene (>512 tris) + constant_medium volumes:
    the in-kernel volume override composes with the clustered closest-hit
    provider (orthogonal code paths, previously only covered separately)."""
    scene_b = SceneBuilder()
    from bpt_tpu.scene.builder import MaterialSpec as M

    scene_b.add_uv_sphere((0, 1, 0), 1.0, M.metal((0.8, 0.8, 0.8), 0.05))
    scene_b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
                     M.lambertian((0.6, 0.6, 0.6)))
    scene_b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
                     M.diffuse_light((10, 10, 10)))
    scene_b.add_volume_box((-1.5, 0.01, -1.5), (1.5, 2.5, 1.5),
                           density=0.2, albedo=(0.9, 0.9, 0.9))
    scene = scene_b.build(dtype=jnp.float32)
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters

    assert use_clusters(scene) and scene.num_volumes == 1
    assert megakernel_ok(scene, "pt")

    B = 128
    rng = np.random.default_rng(55)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    nu = pt.NU + scene.num_volumes
    U = rng.uniform(size=(B, depth, nu)).astype(np.float32)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(U)),
    )
    ubuf = jnp.asarray(U).transpose(1, 2, 0).reshape(depth * nu, B)
    rx, ry, rz, rays, *_ = pt_megakernel(
        scene, o, d, jnp.arange(B, dtype=jnp.int32),
        jax.random.PRNGKey(0), depth, uniforms=ubuf, interpret=True,
    )
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4, atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


def test_cluster_wave_ftb_closest_matches_brute():
    """Round-4 FTB standalone closest (front-to-back order table, paired
    DMA, active-mask lanes) == jnp brute; dead lanes return miss after
    the dispatch-level mask."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN
    from bpt_tpu.ops.pallas.cluster_wave import clustered_closest_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import cluster_orders, pack_clusters_rolled

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(78)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)
    active = jnp.asarray(rng.uniform(size=B) > 0.25)

    ref = soa.brute_closest(scene, o, d, tmin, tmax)
    C, aabb, blocks = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    t, tri, u, v = clustered_closest_ftb_pallas(
        aabb, order_t, blocks, o.x, o.y, o.z, d.x, d.y, d.z, active,
        interpret=True)
    m = np.asarray(ref.hit) & np.asarray(active)
    np.testing.assert_array_equal(
        (np.asarray(t) < np.inf)[np.asarray(active)],
        np.asarray(ref.hit)[np.asarray(active)])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(tri)[m], np.asarray(ref.tri)[m])
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(ref.v)[m],
                               rtol=1e-4, atol=1e-5)


def test_cluster_wave_ftb_any_matches_brute():
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN
    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(79)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    # mix of finite ranges and dead (tmax <= 0) lanes
    tmax = jnp.asarray(
        np.where(rng.uniform(size=B) > 0.3,
                 rng.uniform(0.5, 50.0, B), 0.0), jnp.float32)

    ref = soa.brute_any(scene, o, d, tmin, tmax)
    _C, aabb, blocks = pack_clusters_rolled(scene)
    got = clustered_any_ftb_pallas(
        aabb, blocks, o.x, o.y, o.z, d.x, d.y, d.z, tmax, interpret=True)
    live = np.asarray(tmax) > 0
    np.testing.assert_array_equal(np.asarray(got)[live],
                                  np.asarray(ref)[live])
    assert not np.asarray(got)[~live].any()


def test_any_hit_sparse_compact_matches_brute():
    """any_hit_sparse (round 4): valid lanes compacted to a cap prefix
    before the FTB any kernel == brute any under the mask contract
    (masked lanes report False)."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 768
    rng = np.random.default_rng(81)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmax = jnp.asarray(rng.uniform(0.5, 50.0, B), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=B) < 0.1)  # ~10% valid

    ref = np.asarray(soa.brute_any(scene, o, d,
                                   jnp.full((B,), T_MIN, jnp.float32), tmax))
    got = np.asarray(soa.any_hit_sparse(scene, o, d, T_MIN, tmax,
                                        mask=mask, cap=256, interpret=True))
    m = np.asarray(mask)
    np.testing.assert_array_equal(got[m], ref[m])
    assert not got[~m].any()


def test_any_hit_sparse_overflow_falls_back():
    """Valid count above cap: the lax.cond fallback (full-wave any_hit)
    keeps the result exact at any density."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 512
    rng = np.random.default_rng(82)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    tmax = jnp.asarray(rng.uniform(0.5, 50.0, B), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=B) < 0.7)  # ~70% valid > cap

    assert int(jnp.sum(mask)) > 128
    ref = np.asarray(soa.brute_any(scene, o, d,
                                   jnp.full((B,), T_MIN, jnp.float32), tmax))
    got = np.asarray(soa.any_hit_sparse(scene, o, d, T_MIN, tmax,
                                        mask=mask, cap=128, interpret=True))
    m = np.asarray(mask)
    np.testing.assert_array_equal(got[m], ref[m])
    assert not got[~m].any()


def test_soa_dispatch_ftb_matches_generic(monkeypatch):
    """closest_hit/any_hit through the soa dispatch: FTB on vs off gives
    identical results for masked waves (the round-4 routing must be a
    pure perf change)."""
    import os

    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    B = 384
    rng = np.random.default_rng(80)
    o = v3.from_array(jnp.asarray(
        rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]), jnp.float32))
    d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    mask = jnp.asarray(rng.uniform(size=B) > 0.4)

    # CPU backend: _wave_cluster_ok is False, so exercise the internal
    # paths directly in interpret mode via the kernel wrappers above —
    # here we check the MASKED jnp reference behavior that the dispatch
    # promises: culled lanes report miss
    h = soa.closest_hit(scene, o, d, T_MIN, jnp.inf, mask=mask)
    assert not np.asarray(h.hit)[~np.asarray(mask)].any()


def test_any_hit_sparse_multi_matches_per_wave():
    """Round 5: the cross-wave batched sparse any-hit (one FTB launch
    over every wave's compacted survivors) == per-wave brute any under
    the mask contract, including an overflow wave that must take the
    full-wave cond fallback."""
    from bpt_tpu.ops import soa
    from bpt_tpu.ops.intersect import T_MIN

    scene = _big_scene()
    rng = np.random.default_rng(83)
    waves = []
    refs = []
    masks = []
    for i, (B, density) in enumerate([(768, 0.05), (512, 0.7), (640, 0.1)]):
        o = v3.from_array(jnp.asarray(
            rng.uniform(-3, 3, (B, 3)) + np.array([0.0, 2.0, 4.0]),
            jnp.float32))
        d = v3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
        tmax = jnp.asarray(rng.uniform(0.5, 50.0, B), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=B) < density)
        waves.append((o, d, tmax, mask))
        masks.append(np.asarray(mask))
        refs.append(np.asarray(soa.brute_any(
            scene, o, d, jnp.full((B,), T_MIN, jnp.float32), tmax)))
    # cap 128: wave 1 (~70% valid of 512) overflows and must fall back
    assert int(jnp.sum(waves[1][3])) > 128
    got = soa.any_hit_sparse_multi(scene, waves, T_MIN, cap=128,
                                   interpret=True)
    for g, ref, m in zip(got, refs, masks):
        g = np.asarray(g)
        np.testing.assert_array_equal(g[m], ref[m])
        assert not g[~m].any()


@pytest.mark.parametrize("mis", [False, True])
def test_connect_paths_batched_matches_per_slot(monkeypatch, mis):
    """Round 5: connect_paths' cross-slot batched occlusion mode must be
    bit-identical to the per-slot path (the contribution sums keep the
    exact per-slot reduction order; any-hit predicates are
    tile-composition-independent)."""
    import functools

    import bpt_tpu.models.bdpt as bdpt_mod
    import bpt_tpu.models.pt as pt_mod
    from bpt_tpu.core import rng as rng_mod
    from bpt_tpu.ops import soa

    scene = _big_scene()
    B = 256
    depth = 5
    key = jax.random.PRNGKey(5)
    pix = jnp.arange(B, dtype=jnp.int32)
    # primaries toward the geometry
    rng = np.random.default_rng(90)
    o = jnp.asarray(np.tile(np.array([[0.0, 2.0, 6.0]]), (B, 1)), jnp.float32)
    tgt = rng.uniform(-2, 2, (B, 3)) + np.array([0.0, 1.0, 0.0])
    d = jnp.asarray(tgt - np.asarray(o), jnp.float32)
    ls_u = rng_mod.wave_uniforms(jax.random.fold_in(key, 3), pix, 0,
                                 bdpt_mod.NLS, dtype=jnp.float32)

    def run(mis):
        return bdpt_mod.bdpt_radiance(
            scene, o, d, depth,
            pt_mod.default_uniforms_fn(jax.random.fold_in(key, 2), pix,
                                       jnp.float32),
            ls_u,
            pt_mod.default_uniforms_fn(jax.random.fold_in(key, 4), pix,
                                       jnp.float32),
            mis=mis)

    # reference: the per-slot path on the plain CPU any_hit
    ref_rad, ref_stats = run(mis)

    # batched mode (round-5 OPT-IN study option), FTB kernels in
    # interpret mode
    monkeypatch.setenv("BPT_TPU_CONNECT_BATCH", "1")
    monkeypatch.setattr(soa, "sparse_any_ok", lambda *a, **k: True)
    monkeypatch.setattr(
        soa, "any_hit_sparse_multi",
        functools.partial(soa.any_hit_sparse_multi, interpret=True))
    got_rad, got_stats = run(mis)
    np.testing.assert_array_equal(np.asarray(ref_rad), np.asarray(got_rad))
    assert int(ref_stats.shadow_rays) == int(got_stats.shadow_rays)


def test_pt_wave_paged_matches_single_table(monkeypatch):
    """Round 5 (VERDICT r4 item 4): paged pt_wave — per-bounce closest
    via the paged standalone FTB kernels + a shade-only precomp launch
    — is bitwise equal to the single-table in-kernel-closest pt_wave
    (same RNG streams, same shade body, exact M-T either way; winner
    identity can differ only on exact t ties, absent here)."""
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _big_scene()
    B = 320  # distinct shape: paged traces must not reuse cached ones
    depth = 4
    rng = np.random.default_rng(71)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(23)
    base = pt_wave(scene, o, d, ids, key, depth, interpret=True)
    monkeypatch.setenv("BPT_TPU_PAGE_F32", "150")  # >= 1 super (120 f32)
    from bpt_tpu.ops.pallas.clusters import n_pages

    assert n_pages(scene) >= 2
    paged = pt_wave(scene, o, d, ids, key, depth, interpret=True,
                    paged=True)
    # radiance + ray count; traversal counters follow the jnp
    # wavefront's paged-dispatch conventions (nv = ah = 0) instead of
    # the in-kernel counts, so element 4 legitimately differs
    for a, b in zip(base[:4], paged[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pt_wave_paged_textured_matches_jnp(monkeypatch):
    """Paged pt_wave on a TEXTURED clustered scene: the precomp launch
    must carry the (u, v, tri) payload through to the XLA texel stage —
    vs the jnp wavefront on the same in-kernel threefry stream."""
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    scene = _textured_scene(True)
    B = 224
    depth = 4
    rng = np.random.default_rng(73)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate(
        [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 3, (B, 1)),
         np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(29)
    rad_ref, stats_ref = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32),
    )
    monkeypatch.setenv("BPT_TPU_PAGE_F32", "150")
    rx, ry, rz, rays, _st = pt_wave(scene, o, d, ids, key, depth,
                                    interpret=True, paged=True)
    got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
    np.testing.assert_allclose(got, np.asarray(rad_ref), rtol=1e-4,
                               atol=1e-5)
    assert int(rays) == int(stats_ref.rays_traced)


def test_wave_reject_reason_allows_paged():
    """Round 5: wave_reject_reason keeps only the SMEM shade-table
    limits + the MAX_PAGES backstop — the single-table clause is gone
    (paged pt_wave serves past-budget scenes)."""
    from unittest import mock

    from bpt_tpu.ops.pallas import pt_kernel

    scene = _big_scene()
    assert pt_kernel.wave_reject_reason(scene) == ""
    with mock.patch("bpt_tpu.ops.pallas.clusters.cluster_ok",
                    return_value=False):
        # past the single-table budget: megakernel rejects, wave accepts
        assert "single-table" in pt_kernel.megakernel_reject_reason(scene)
        assert pt_kernel.wave_reject_reason(scene) == ""
        with mock.patch("bpt_tpu.ops.pallas.clusters.cluster_pages_ok",
                        return_value=False):
            assert "MAX_PAGES" in pt_kernel.wave_reject_reason(scene)
