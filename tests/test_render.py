"""End-to-end render driver tests: determinism, chunk invariance,
resume/checkpoint equivalence."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.models.render import render
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera


@pytest.fixture(scope="module")
def small_scene():
    return cornell_box(dtype=jnp.float32)


def _cfg(**kw):
    base = dict(image_width=16, samples_per_pixel=4, max_depth=3, integrator="pt")
    base.update(kw)
    return dataclasses.replace(cornell_box_camera(), **base)


def test_same_seed_same_image(small_scene):
    r1 = render(small_scene, _cfg(), seed=7)
    r2 = render(small_scene, _cfg(), seed=7)
    assert np.array_equal(r1.framebuffer_sum, r2.framebuffer_sum)


def test_different_seed_differs(small_scene):
    r1 = render(small_scene, _cfg(), seed=7)
    r2 = render(small_scene, _cfg(), seed=8)
    assert not np.array_equal(r1.framebuffer_sum, r2.framebuffer_sum)


def test_chunk_size_invariance(small_scene):
    r1 = render(small_scene, _cfg(), seed=3, chunk_size=256)
    r2 = render(small_scene, _cfg(), seed=3, chunk_size=100)  # padded tail
    np.testing.assert_allclose(r1.framebuffer_sum, r2.framebuffer_sum, atol=1e-5)


def test_resume_matches_straight_run(small_scene):
    cfg = _cfg()
    states = []
    full = render(small_scene, cfg, seed=5,
                  stratum_callback=lambda s: states.append(s))
    assert len(states) == cfg.effective_spp
    mid = states[1]  # after 2 of 4 strata
    resumed = render(small_scene, cfg, seed=5, resume=mid)
    np.testing.assert_allclose(
        full.framebuffer_sum, resumed.framebuffer_sum, atol=1e-5
    )


def test_bdpt_runs_and_is_deterministic(small_scene):
    cfg = _cfg(integrator="bdpt", image_width=8, samples_per_pixel=1)
    r1 = render(small_scene, cfg, seed=1)
    r2 = render(small_scene, cfg, seed=1)
    assert np.array_equal(r1.framebuffer_sum, r2.framebuffer_sum)
    assert r1.stats.shadow_rays > 0
    assert np.isfinite(r1.framebuffer_sum).all()


def test_stats_populated(small_scene):
    r = render(small_scene, _cfg(), seed=0)
    assert r.stats.rays_traced > 0
    assert r.stats.triangle_tests > 0
    assert r.stats.wall_seconds > 0
    npix = 16 * 16
    # every primary ray enters at least once
    assert r.stats.rays_traced >= npix * 4


def test_rgb8_shape_and_range(small_scene):
    r = render(small_scene, _cfg(), seed=0)
    img = r.rgb8()
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8


def test_checkpoint_roundtrip(tmp_path, small_scene):
    from bpt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    state = dict(
        framebuffer_sum=np.ones((4, 4, 3), np.float32) * 2.5,
        strata_done=3,
        seed=9,
    )
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state)
    back = load_checkpoint(p)
    assert back["strata_done"] == 3 and back["seed"] == 9
    np.testing.assert_array_equal(back["framebuffer_sum"], state["framebuffer_sum"])


def test_checkpoint_records_chunk_size_and_stream(tmp_path):
    from bpt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, dict(framebuffer_sum=np.zeros((2, 2, 3)),
                            units_done=1, unit_kind="chunk",
                            chunk_size=4096, seed=1))
    back = load_checkpoint(p)
    assert back["chunk_size"] == 4096
    save_checkpoint(p, dict(framebuffer_sum=np.zeros((2, 2, 3)),
                            units_done=2, unit_kind="stratum",
                            stream="jnp", seed=1))
    assert load_checkpoint(p)["stream"] == "jnp"


def test_chunk_resume_rejects_mismatched_chunk_size(small_scene):
    """Resuming a chunk-kind checkpoint with a different chunk_size would
    silently mis-place pixel chunks — must raise instead."""
    resume = dict(framebuffer_sum=np.zeros((16, 16, 3), np.float32),
                  strata_done=1, units_done=1, unit_kind="chunk",
                  chunk_size=128, seed=0)
    # the fused path only exists on TPU; off-TPU the chunk kind raises
    # the loop-shape error, which also guards the mismatch. On either
    # path the render must NOT proceed silently.
    with pytest.raises(ValueError):
        render(small_scene, _cfg(), seed=0, resume=resume, chunk_size=64)


def test_stratum_resume_rejects_foreign_stream(small_scene):
    """A stratum checkpoint written by the pt_wave/fused-parity jitter
    stream must not silently continue on the jnp wavefront loop (the two
    streams differ; mixing breaks bitwise-identical resume)."""
    resume = dict(framebuffer_sum=np.zeros((16, 16, 3), np.float32),
                  strata_done=1, units_done=1, unit_kind="stratum",
                  stream="wave", seed=0)
    with pytest.raises(ValueError, match="stream"):
        render(small_scene, _cfg(), seed=0, resume=resume)


def test_ref_vis_mode_dims_connections(small_scene):
    """CameraConfig.ref_vis emulates the reference binary's endpoint
    artifact (docs/PARITY.md dev. 2): connection transport must drop
    substantially versus the default estimator, and the emission-only
    strategies must be unaffected (identical RNG stream)."""
    cfg = _cfg(integrator="bdpt", image_width=8, samples_per_pixel=4)
    base = render(small_scene, cfg, seed=0).framebuffer_sum
    emul = render(small_scene, dataclasses.replace(cfg, ref_vis=True),
                  seed=0).framebuffer_sum
    assert np.isfinite(emul).all()
    # globally dimmer by a large factor on this connection-dominated scene
    assert emul.sum() < 0.8 * base.sum()


def test_wave_raygen_jitter_parity():
    """The pt_wave driver's host-side jitter (_raygen_jitter_host) must
    equal the fused megakernel's in-kernel raygen stream: the kernel
    reads the two u32 key halves at the tail of _subkeys_with_raygen and
    takes BOTH outputs of one threefry call (pt_kernel._pt_kernel_impl).
    Round 1 shipped a drift here (two separate jitter keys host-side);
    this pins the invariant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.models.render import _raygen_jitter_host
    from bpt_tpu.ops.pallas.pt_kernel import (
        NU,
        _bits_to_unit_float,
        _subkeys_with_raygen,
        _threefry2x32,
    )

    key = jax.random.PRNGKey(42)
    ray_ids = jnp.arange(1000, dtype=jnp.int32) * 7 + 3
    u0_host, u1_host = _raygen_jitter_host(key, ray_ids)

    # kernel-side: exactly what _pt_kernel_impl does with the prefetched
    # key table (nj = nu_eff; k1a/k1b at nj*2, one call, both outputs)
    keys_flat = _subkeys_with_raygen(key, NU)
    nj = NU
    k1a = keys_flat[nj * 2]
    k1b = keys_flat[nj * 2 + 1]
    ridu = ray_ids.astype(jnp.uint32)
    b0, b1 = _threefry2x32(k1a, k1b, ridu, jnp.zeros_like(ridu))
    np.testing.assert_array_equal(np.asarray(u0_host),
                                  np.asarray(_bits_to_unit_float(b0)))
    np.testing.assert_array_equal(np.asarray(u1_host),
                                  np.asarray(_bits_to_unit_float(b1)))


def test_wave_raygen_defocus_stream():
    """Round 4 (defocus on the wave fast path): the defocus=True variant
    of _raygen_jitter_host keeps the base jitter pair BIT-IDENTICAL
    (checkpoint/stream compatibility) and draws the disk pair from an
    independent threefry counter (no reuse of the jitter bits)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.models.render import _raygen_jitter_host

    key = jax.random.PRNGKey(13)
    ids = jnp.arange(4096, dtype=jnp.int32) * 3 + 1
    u0, u1 = _raygen_jitter_host(key, ids)
    d0, d1, d2, d3 = _raygen_jitter_host(key, ids, defocus=True)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(d1))
    for extra in (d2, d3):
        e = np.asarray(extra)
        assert ((0.0 <= e) & (e < 1.0)).all()
        assert not np.array_equal(e, np.asarray(d0))
        assert not np.array_equal(e, np.asarray(d1))
    # distinct streams decorrelate: matching values are coincidences
    assert (np.asarray(d2) == np.asarray(d0)).mean() < 0.01


def test_distributed_wave_defocus_runs_and_blurs():
    """Round 4: defocus rides the wave fast path (mesh use_wave no
    longer gates on cc.defocus; shard_step_wave draws the disk pair).
    The defocus render must differ from the pinhole render (the disk
    draws reach generate_rays) while conserving overall energy
    approximately, and be mesh-shape invariant."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.parallel.mesh import make_mesh, render_distributed
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box(dtype=jnp.float32)
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=16, aspect_ratio=1.0,
        samples_per_pixel=4, max_depth=3, integrator="pt",
        defocus_angle=8.0, focus_dist=300.0)
    devs = jax.devices()
    fb8, _ = render_distributed(
        scene, cfg, mesh=make_mesh(devices=devs), seed=3, fast="wave")
    fb4, _ = render_distributed(
        scene, cfg, mesh=make_mesh(devices=devs[:4]), seed=3, fast="wave")
    np.testing.assert_array_equal(fb8, fb4)

    pin = dataclasses.replace(cfg, defocus_angle=0.0)
    fb_pin, _ = render_distributed(
        scene, pin, mesh=make_mesh(devices=devs), seed=3, fast="wave")
    assert not np.array_equal(fb8, fb_pin)
    assert np.isfinite(fb8).all()
    # blur redistributes, it does not create/destroy much energy
    assert abs(fb8.mean() / max(fb_pin.mean(), 1e-9) - 1.0) < 0.25


def test_render_resilient_resumes_after_failure():
    """Elastic render (SURVEY §5 failure-detection analog): a failure
    mid-render resumes from the last completed stratum and the final
    image is bitwise identical to an uninterrupted render."""
    import dataclasses

    from bpt_tpu.models.render import render, render_resilient
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box(dtype=jnp.float32)
    cfg = dataclasses.replace(cornell_box_camera(), image_width=12,
                              samples_per_pixel=9, max_depth=3,
                              integrator="pt")
    clean = render(scene, cfg, seed=21)

    fails = {"left": 2}
    seen = []

    def flaky_cb(snap):
        seen.append(int(snap["units_done"]))
        if fails["left"] > 0 and snap["units_done"] == 2:
            fails["left"] -= 1
            raise RuntimeError("injected device failure")

    r = render_resilient(scene, cfg, seed=21, retries=3,
                         stratum_callback=flaky_cb)
    np.testing.assert_array_equal(r.framebuffer_sum, clean.framebuffer_sum)
    # the injected failure fired exactly once (at unit 2) and the resume
    # continued AFTER the completed unit — no unit was re-rendered
    assert fails["left"] == 1
    assert seen == sorted(seen) and seen.count(2) == 1


def test_render_resilient_survives_many_spaced_failures():
    """The retry budget resets whenever progress was made, so a long
    render survives arbitrarily many WIDELY-SPACED transient failures
    (one per stratum here) with retries=1."""
    import dataclasses

    from bpt_tpu.models.render import render, render_resilient
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box(dtype=jnp.float32)
    cfg = dataclasses.replace(cornell_box_camera(), image_width=8,
                              samples_per_pixel=16, max_depth=2,
                              integrator="pt")
    clean = render(scene, cfg, seed=5)
    raised = set()

    def fail_once_per_unit(snap):
        u = int(snap["units_done"])
        if u not in raised:
            raised.add(u)
            raise RuntimeError("transient")

    r = render_resilient(scene, cfg, seed=5, retries=1,
                         stratum_callback=fail_once_per_unit)
    np.testing.assert_array_equal(r.framebuffer_sum, clean.framebuffer_sum)
    assert len(raised) == 16  # every stratum failed once, all recovered


def test_render_resilient_exhausts_retries(monkeypatch):
    """Failures with NO recorded progress exhaust the budget and raise."""
    import dataclasses

    import bpt_tpu.models.render as R
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box(dtype=jnp.float32)
    cfg = dataclasses.replace(cornell_box_camera(), image_width=8,
                              samples_per_pixel=4, max_depth=2,
                              integrator="pt")
    calls = {"n": 0}

    def bad_render(*a, **k):
        calls["n"] += 1
        raise RuntimeError("boom")

    monkeypatch.setattr(R, "render", bad_render)
    with pytest.raises(RuntimeError):
        R.render_resilient(scene, cfg, seed=1, retries=2)
    # no checkpoint state ever existed -> immediate raise, no retry loop
    assert calls["n"] == 1


def test_morton_pix_is_in_range_permutation():
    """_morton_pix (round 3): reorders a chunk's pixel ids Morton-wise
    for the fused clustered steps — must be a permutation that keeps
    every in-range pixel and parks out-of-range padding at the end."""
    import jax.numpy as jnp
    import numpy as np

    from bpt_tpu.models.render import _morton_pix

    npix, width, chunk = 300, 20, 512  # chunk overhangs npix
    pix = jnp.arange(chunk, dtype=jnp.int32)
    out = np.asarray(_morton_pix(pix, npix, width))
    assert sorted(out.tolist()) == list(range(chunk))
    assert set(out[:npix].tolist()) == set(range(npix))  # padding last
    # locality: consecutive Morton ids stay spatially close on average
    iv, jv = out[:npix] % width, out[:npix] // width
    d = np.abs(np.diff(iv)) + np.abs(np.diff(jv))
    raster = np.arange(npix)
    ri, rj = raster % width, raster // width
    dr = np.abs(np.diff(ri)) + np.abs(np.diff(rj))
    assert d.mean() <= dr.mean() + 1.0


def test_render_wave_branch_populates_traversal_stats(monkeypatch):
    """VERDICT r3 item 5: the pt_wave render branch must read back ALL
    six stats_acc slots — node visits / AABB hits / tri tests / tri hits
    were silently dropped on exactly the large/textured-scene renders
    where they diagnose traversal (models/render.py wave branch)."""
    import functools

    import bpt_tpu.models.render as R
    import bpt_tpu.ops.pallas.pt_wave as PW
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((10, 10, 10)))
    scene = b.build(dtype=jnp.float32)  # >512 tris -> clustered kernels

    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=20, samples_per_pixel=1,
        max_depth=2, integrator="pt",
        lookfrom=(0.0, 2.0, 6.0), lookat=(0.0, 1.0, 0.0), vfov=40.0,
    )
    # force the wave branch off-TPU, in interpret mode
    monkeypatch.setattr(R, "_can_use_pt_wave", lambda *a, **k: True)
    monkeypatch.setattr(PW, "pt_wave",
                        functools.partial(PW.pt_wave, interpret=True))
    R._make_step_pt_wave.cache_clear()
    try:
        res = R.render(scene, cfg, seed=3)
    finally:
        R._make_step_pt_wave.cache_clear()  # drop the interpret closure
    assert res.stats.rays_traced > 0
    assert res.stats.bvh_node_visits > 0
    assert res.stats.aabb_hits > 0
    assert res.stats.triangle_tests > 0
    assert res.stats.triangle_hits > 0


@pytest.mark.parametrize("integrator", ["bdpt", "bdpt-mis"])
def test_bdpt_wave_branch_bitwise_matches_stratum_loop(monkeypatch,
                                                       integrator):
    """Round 4: the spp-batched bdpt_wave render branch must be
    bit-identical to the jnp stratum loop (same streams, absolute ray
    ids, stratum-order left fold) — checkpoints interoperate on the
    strength of this."""
    import numpy as np

    import bpt_tpu.models.render as R
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.6, 0.5, 0.4)))
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((10, 10, 10)))
    scene = b.build(dtype=jnp.float32)

    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=12, samples_per_pixel=4,
        max_depth=3, integrator=integrator,
        lookfrom=(0.0, 2.0, 6.0), lookat=(0.0, 1.0, 0.0), vfov=40.0,
    )
    ref = R.render(scene, cfg, seed=11)  # CPU: bottom jnp stratum loop

    monkeypatch.setattr(R, "_can_use_bdpt_wave", lambda *a, **k: True)
    R._make_step_bdpt_wave.cache_clear()
    got = R.render(scene, cfg, seed=11)
    assert np.array_equal(ref.framebuffer_sum, got.framebuffer_sum)
    assert ref.stats.rays_traced == got.stats.rays_traced
    assert ref.stats.shadow_rays == got.stats.shadow_rays

    # and a mid-render stratum checkpoint from the jnp loop resumes on
    # the wave branch to the same image
    states = []
    monkeypatch.setattr(R, "_can_use_bdpt_wave", lambda *a, **k: False)
    R.render(scene, cfg, seed=11,
             stratum_callback=lambda s: states.append(dict(s)))
    monkeypatch.setattr(R, "_can_use_bdpt_wave", lambda *a, **k: True)
    resumed = R.render(scene, cfg, seed=11, resume=states[1])
    assert np.array_equal(ref.framebuffer_sum, resumed.framebuffer_sum)


def test_bdpt_wave_gate_rejects_past_unroll_depth(monkeypatch):
    """Round 5 (VERDICT r4 missing 3): past UNROLL_MAX the jnp
    estimator's loops fall back to fori_loop + dynamic row slicing —
    the minutes-to-compile XLA pathology — so _can_use_bdpt_wave must
    route deep clustered BDPT (the depth-80 glass class) to the fused
    megakernel instead."""
    import jax

    import bpt_tpu.models.render as R
    from bpt_tpu.models.bdpt import UNROLL_MAX
    from bpt_tpu.models.camera import camera_constants
    from bpt_tpu.scene.builder import MaterialSpec as M
    from bpt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.6, 0.5, 0.4)))  # 960 tris
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((10, 10, 10)))
    scene = b.build(dtype=jnp.float32)
    assert scene.num_tris > 512  # clustered class

    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=512, samples_per_pixel=16,
        integrator="bdpt-mis")
    cc = camera_constants(cfg, dtype=jnp.float32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert R._can_use_bdpt_wave(scene, cc, "bdpt-mis", None, UNROLL_MAX)
    assert not R._can_use_bdpt_wave(scene, cc, "bdpt-mis", None,
                                    UNROLL_MAX + 1)
    assert not R._can_use_bdpt_wave(scene, cc, "bdpt-mis", None, 80)
