"""Render driver: chunked wavefront loop over (pixel, stratum) grids.

The reference's thread pool + atomic row queue (src/camera.h:43-145) becomes
a host loop over sample strata and pixel chunks, each chunk one jit call on
a fixed shape (no recompiles; the tail chunk is padded + masked).  Stratum-
major ordering makes the framebuffer a pure running sum, which gives free
checkpoint/resume at stratum granularity.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.models import bdpt as bdpt_mod
from bpt_tpu.models import pt as pt_mod
from bpt_tpu.models.camera import CameraConstants, camera_constants, generate_rays
from bpt_tpu.ops.film import to_rgb8
from bpt_tpu.scene.types import CameraConfig, SceneArrays
from bpt_tpu.utils.stats import RenderStats

# RNG stream tags (fold_in indices off the render key)
STREAM_RAYGEN = 0
STREAM_PT = 1
STREAM_CAM_TRACE = 2
STREAM_LIGHT_START = 3
STREAM_LIGHT_TRACE = 4


@dataclass
class RenderResult:
    framebuffer_sum: np.ndarray  # [H,W,3] sum of per-sample radiance
    samples_per_pixel: int
    stats: RenderStats
    width: int
    height: int

    def rgb8(self, nan_scrub: bool = True) -> np.ndarray:
        return np.asarray(
            to_rgb8(jnp.asarray(self.framebuffer_sum), self.samples_per_pixel, nan_scrub)
        )


from functools import lru_cache

# On-device stats accumulator slots (read back once per render — per-chunk
# readbacks through the axon tunnel cost ~250ms each and dominated wall).
_S_RAYS, _S_SHADOW, _S_NODES, _S_AABB, _S_TRI_TESTS, _S_TRI_HITS = range(6)
_NSTATS = 6


def _trace_env_sig() -> tuple:
    """All BPT_TPU_* env vars as a hashable signature.  Several flags
    (BPT_TPU_CONNECT_SPARSE, BPT_TPU_PT_SHARED_SCATTER, BPT_TPU_WAVE_IMPL,
    ...) are read at TRACE time inside the jitted steps below; because
    the step makers are lru_cached, toggling such a flag between render()
    calls would otherwise silently reuse the executable traced under the
    OLD value (the round-4 advisor finding: every env A/B measured 1.00x
    by construction).  Passing this signature into each maker's cache key
    gives every env variant its own traced step — each compiles exactly
    once, so interleaved A/Bs stay recompile-free."""
    import os

    return tuple(sorted(
        (k, v) for k, v in os.environ.items() if k.startswith("BPT_TPU_")
    ))


@lru_cache(maxsize=64)
def _make_step(integrator: str, max_depth: int, sqrt_spp: int, width: int,
               npix: int, chunk: int, ref_vis: bool = False,
               env_sig: tuple = ()):
    spp_eff = sqrt_spp * sqrt_spp

    @partial(jax.jit, donate_argnums=(2, 3))
    def step(scene: SceneArrays, cc: CameraConstants, fb, stats_acc, key, pix0, s_lin):
        dtype = fb.dtype
        pix = pix0 + jnp.arange(chunk, dtype=jnp.int32)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        i = (pixc % width).astype(dtype)
        j = (pixc // width).astype(dtype)
        s_i = (s_lin % sqrt_spp).astype(dtype)
        s_j = (s_lin // sqrt_spp).astype(dtype)
        ray_ids = pixc * spp_eff + s_lin  # absolute: chunking-invariant RNG

        if integrator == "pt":
            rad, stats = pt_mod.path_trace_pixels_fast(
                scene, i, j,
                jnp.broadcast_to(s_i, i.shape), jnp.broadcast_to(s_j, j.shape),
                jnp.where(in_range, ray_ids, -1), cc, key, max_depth,
            )
        elif integrator in ("bdpt", "bdpt-mis"):
            k_gen = jax.random.fold_in(key, STREAM_RAYGEN)
            u_gen = rng_mod.wave_uniforms(k_gen, ray_ids, 0, 4, dtype=dtype)
            o, d = generate_rays(cc, i, j, jnp.broadcast_to(s_i, i.shape),
                                 jnp.broadcast_to(s_j, j.shape), u_gen)
            rad, stats = bdpt_mod.bdpt_fast(
                scene, o, d, jnp.where(in_range, ray_ids, -1), key, max_depth,
                mis=(integrator == "bdpt-mis"), ref_vis=ref_vis,
            )
        else:
            raise ValueError(f"unknown integrator: {integrator}")

        rad = jnp.where(in_range[..., None], rad, 0.0)
        fb = fb.at[pixc].add(rad)

        d = stats._asdict()
        inc = jnp.stack(
            [
                d.get("rays_traced", jnp.int32(0)).astype(jnp.float32),
                d.get("shadow_rays", jnp.int32(0)).astype(jnp.float32),
                d.get("node_visits", jnp.int32(0)).astype(jnp.float32),
                d.get("aabb_hits", jnp.int32(0)).astype(jnp.float32),
                d.get("tri_tests", jnp.int32(0)).astype(jnp.float32),
                d.get("tri_hits", jnp.int32(0)).astype(jnp.float32),
            ]
        )
        return fb, stats_acc + inc

    return step


def _morton_pix(pix, npix, width):
    """Morton-order a chunk's pixel ids (clustered scenes): the fused
    megakernels have no inter-bounce sorting, so tile coherence is
    whatever pixel order they are fed — raster rows wrap the image and
    a [rows,128] tile mixes distant pixels.  Morton assignment makes
    camera rays tile-local: measured +17% on the fused BDPT, coffee-91k
    (0.188 -> 0.221 ext-Mrays/s, tools/probe_bdpt_sortpix.py).  Results
    are bit-identical per pixel (absolute-ray-id RNG; the accumulate is
    a scatter by pixel id)."""
    iv = pix % width
    jv = pix // width

    def spread(x):
        x = (x | (x << 8)) & jnp.int32(0x00FF00FF)
        x = (x | (x << 4)) & jnp.int32(0x0F0F0F0F)
        x = (x | (x << 2)) & jnp.int32(0x33333333)
        x = (x | (x << 1)) & jnp.int32(0x55555555)
        return x

    mkey = (spread(jv) << 1) | spread(iv)
    mkey = jnp.where(pix < npix, mkey, jnp.int32(0x7FFFFFFF))
    _, pix_m = jax.lax.sort((mkey, pix), num_keys=1)
    return pix_m


@lru_cache(maxsize=64)
def _make_step_pt_fused(max_depth: int, sqrt_spp: int, width: int, npix: int,
                        chunk: int, env_sig: tuple = ()):
    """One call renders ALL sample strata for a chunk of pixels (the spp
    loop runs inside the megakernel; ~spp_eff fewer launches)."""
    spp_eff = sqrt_spp * sqrt_spp

    @partial(jax.jit, donate_argnums=(2, 3))
    def step(scene: SceneArrays, cc: CameraConstants, fb, stats_acc, key, pix0):
        from bpt_tpu.ops.pallas.pt_kernel import use_clusters

        dtype = fb.dtype
        pix = pix0 + jnp.arange(chunk, dtype=jnp.int32)
        if use_clusters(scene):
            pix = _morton_pix(pix, npix, width)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        i = (pixc % width).astype(dtype)
        j = (pixc // width).astype(dtype)

        from bpt_tpu.ops.pallas.pt_kernel import camera_table, pt_megakernel_pixels

        rx, ry, rz, rays, extra = pt_megakernel_pixels(
            scene, i, j, i * 0, j * 0, jnp.where(in_range, pixc, -1),
            camera_table(cc), key, max_depth,
            spp_loop=spp_eff, sqrt_spp=sqrt_spp,
        )
        rad = jnp.stack([rx, ry, rz], axis=-1)
        rad = jnp.where(in_range[..., None], rad, 0.0)
        fb = fb.at[pixc].add(rad)
        # counters (nv, ah, tt, th) now come from the kernel itself
        inc = jnp.concatenate(
            [jnp.stack([rays, jnp.float32(0)]), extra])
        return fb, stats_acc + inc

    return step


@lru_cache(maxsize=64)
def _make_step_bdpt_fused(max_depth: int, sqrt_spp: int, width: int,
                          npix: int, chunk: int, mis: bool = False,
                          env_sig: tuple = ()):
    @partial(jax.jit, donate_argnums=(2, 3))
    def step(scene: SceneArrays, cc: CameraConstants, fb, stats_acc, key, pix0):
        from bpt_tpu.ops.pallas.pt_kernel import use_clusters

        dtype = fb.dtype
        pix = pix0 + jnp.arange(chunk, dtype=jnp.int32)
        if use_clusters(scene):
            pix = _morton_pix(pix, npix, width)  # +17% (see _morton_pix)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        i = (pixc % width).astype(dtype)
        j = (pixc // width).astype(dtype)

        from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel_pixels
        from bpt_tpu.ops.pallas.pt_kernel import camera_table

        rx, ry, rz, rays, shadow, extra = bdpt_megakernel_pixels(
            scene, i, j, jnp.where(in_range, pixc, -1),
            camera_table(cc), key, max_depth, sqrt_spp, mis=mis,
        )
        rad = jnp.stack([rx, ry, rz], axis=-1)
        rad = jnp.where(in_range[..., None], rad, 0.0)
        fb = fb.at[pixc].add(rad)
        inc = jnp.concatenate([jnp.stack([rays, shadow]), extra])
        return fb, stats_acc + inc

    return step


def _resume_kind(resume) -> str:
    if not resume or int(resume.get("units_done",
                                    resume.get("strata_done", 0))) == 0:
        return ""  # fresh render: any loop shape may start it
    return resume.get("unit_kind", "stratum")


def _resume_stream(resume) -> str:
    """Which RNG stream wrote a stratum-kind checkpoint ("wave" = the
    fused-parity jitter used by pt_wave, "jnp" = the bottom wavefront
    loop); "" for fresh renders or checkpoints predating the field."""
    if _resume_kind(resume) != "stratum":
        return ""
    return resume.get("stream", "")


def _raygen_jitter_host(key, ray_ids, defocus: bool = False):
    """The fused megakernel's stratified-jitter stream, replicated
    host-side for the pt_wave driver: ONE threefry call off the
    STREAM_RAYGEN fold, BOTH 32-bit outputs (the round-2 paired-draw
    stream).  Must stay bit-identical to _pt_kernel_impl's raygen
    (pinned by tests/test_render.py::test_wave_raygen_jitter_parity).

    ``defocus=True`` returns 4 uniforms — the extra defocus-disk pair
    comes from a SECOND threefry call at counter 1 (round 4: defocus on
    the wave fast path, camera.h:230-234).  The base jitter pair is
    unchanged, so defocus-off renders are unaffected."""
    from bpt_tpu.ops.pallas.pt_kernel import (
        _bits_to_unit_float,
        _threefry2x32,
    )

    kg = jax.random.fold_in(key, STREAM_RAYGEN)
    k = jax.random.fold_in(kg, 0)
    kd = (k if k.dtype == jnp.uint32 else jax.random.key_data(k)).astype(
        jnp.uint32)
    ridu = ray_ids.astype(jnp.uint32)
    b0, b1 = _threefry2x32(kd[0], kd[1], ridu, jnp.zeros_like(ridu))
    if not defocus:
        return _bits_to_unit_float(b0), _bits_to_unit_float(b1)
    d0, d1 = _threefry2x32(kd[0], kd[1], ridu, jnp.ones_like(ridu))
    return (_bits_to_unit_float(b0), _bits_to_unit_float(b1),
            _bits_to_unit_float(d0), _bits_to_unit_float(d1))


def _can_use_pt_wave(scene, cc, integrator, resume, stratum_callback) -> bool:
    import os

    from bpt_tpu.ops.pallas.pt_kernel import use_clusters

    import jax as _jax

    from bpt_tpu.ops.pallas.pt_kernel import wave_reject_reason

    eligible = (
        integrator == "pt"
        and os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
        and os.environ.get("BPT_TPU_NO_WAVE", "") == ""
        and _jax.default_backend() == "tpu"
        # defocus runs here too (round 4): generate_rays is XLA-side on
        # this path, the disk draws ride _raygen_jitter_host(ctr=1)
        and not getattr(cc, "ref_vis", False)
        # pt_wave iterates strata, so it resumes stratum checkpoints —
        # but only ones written by its own (fused-parity) jitter stream
        and _resume_kind(resume) in ("", "stratum")
        and _resume_stream(resume) in ("", "wave")
        # per-bounce sorting has ~40 ms/bounce fixed cost: it beats the
        # fused in-kernel loop only when each wave is large enough to
        # amortize (measured: wins at 512^2, loses 4x at 128^2)
        and cc.width * cc.height >= (1 << 18)
    )
    if not eligible or wave_reject_reason(scene):
        return False
    # textured scenes route here at ANY triangle count (the fused
    # megakernel rejects textures entirely); untextured SMEM scenes
    # stay on the fused in-kernel bounce loop, which beats pt_wave there
    return use_clusters(scene) or bool(scene.has_textures)


def _wave_spp_batch(npix: int, spp_eff: int) -> int:
    """How many sample strata to batch into ONE pt_wave launch.  Denser
    waves shrink the post-sort tile cluster unions (16x more rays in the
    same space -> tighter cones): measured 0.99 -> 1.76 Mrays/s on the
    91k-tri coffee stand-in at 512^2/16 spp (tools/probe_bigwave.py).
    Bounded so the ~15-array f32 ray state stays ~250 MB (<= 2^22 rays)."""
    return max(1, min(spp_eff, (1 << 22) // max(1, npix)))


@lru_cache(maxsize=64)
def _make_step_pt_wave(max_depth: int, sqrt_spp: int, width: int, npix: int,
                       batch: int = 1, env_sig: tuple = ()):
    """``batch`` strata over the FULL image through ONE per-bounce
    wavefront megakernel pass (pt_wave); ray state is ~15 f32 arrays so
    no pixel chunking.

    RNG parity: the primary-ray jitter replicates the fused megakernel's
    in-kernel stream (_raygen_jitter_host) so this path renders
    bit-identically to the fused path — and therefore to
    render_distributed — for the same seed.  Batching is also bitwise
    invariant: every draw is keyed by the absolute ray id and the
    framebuffer accumulates the batch in stratum order (same left fold
    as the one-stratum loop)."""
    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.models.camera import generate_rays
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    spp_eff = sqrt_spp * sqrt_spp

    @partial(jax.jit, donate_argnums=(2, 3))
    def step(scene: SceneArrays, cc: CameraConstants, fb, stats_acc, key,
             s0):
        dtype = fb.dtype
        pix = jnp.arange(npix, dtype=jnp.int32)
        i = jnp.tile((pix % width).astype(dtype), batch)
        j = jnp.tile((pix // width).astype(dtype), batch)
        s_lin = s0 + jnp.repeat(jnp.arange(batch, dtype=jnp.int32), npix)
        s_i = (s_lin % sqrt_spp).astype(dtype)
        s_j = (s_lin // sqrt_spp).astype(dtype)
        ray_ids = jnp.tile(pix, batch) * spp_eff + s_lin
        if cc.defocus:  # static field: retraces per camera mode
            u0, u1, u2, u3 = _raygen_jitter_host(key, ray_ids, defocus=True)
        else:
            u0, u1 = _raygen_jitter_host(key, ray_ids)
            u2 = u3 = jnp.zeros_like(u0)
        u_gen = jnp.stack(
            [u0.astype(dtype), u1.astype(dtype),
             u2.astype(dtype), u3.astype(dtype)], axis=-1
        )
        o3, d3 = generate_rays(cc, i, j, s_i, s_j, u_gen)
        rx, ry, rz, rays, extra = pt_wave(
            scene, v3.from_array(o3), v3.from_array(d3), ray_ids,
            jax.random.fold_in(key, 1), max_depth,
        )
        rad = jnp.stack([rx, ry, rz], axis=-1).astype(dtype)
        rad = rad.reshape(batch, npix, 3)
        for k in range(batch):  # stratum-order left fold (bitwise parity)
            fb = fb + rad[k]
        inc = jnp.concatenate(
            [jnp.stack([rays, jnp.float32(0)]), extra])
        return fb, stats_acc + inc

    return step


def _can_use_bdpt_wave(scene, cc, integrator, resume,
                       max_depth: int = 0) -> bool:
    """Large-scene BDPT fast path (round 4): the oracle-pinned jnp
    estimator over spp-batched full-image waves, with every traversal
    riding the payload-sorted clustered Pallas kernels (mask-aware sort
    keys park dead/invalid lanes in contiguous tail tiles).  The fused
    BDPT megakernel keeps SMEM-resident scenes (where it wins ~500x);
    clustered scenes route here — its per-bounce re-sorting is what the
    fused kernel structurally lacks (docs/ROADMAP.md, round-3 status)."""
    import os

    import jax as _jax
    import jax.numpy as _jnp

    from bpt_tpu.ops.pallas.clusters import cluster_pages_ok
    from bpt_tpu.ops.pallas.pt_kernel import use_clusters

    from bpt_tpu.models.bdpt import UNROLL_MAX

    return (
        integrator in ("bdpt", "bdpt-mis")
        and os.environ.get("BPT_TPU_NO_BDPT_WAVE", "") == ""
        and os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
        and _jax.default_backend() == "tpu"
        and not getattr(cc, "ref_vis", False)
        # past UNROLL_MAX the jnp estimator's bounce/slot loops fall back
        # to fori_loop + dynamic row slicing, which compiles in MINUTES
        # on this XLA (CLAUDE.md); deep clustered BDPT (the depth-80
        # glass class at real mesh complexity) routes to the fused
        # megakernel instead — its in-kernel depth loops compile fine
        # (docs/PARITY.md deviation 10)
        and max_depth <= UNROLL_MAX
        and use_clusters(scene)
        # round 4: past-budget scenes PAGE the FTB kernels, so the BDPT
        # fast path serves them too (the jnp estimator is table-agnostic)
        and cluster_pages_ok(scene)
        and scene.dtype == _jnp.float32
        # wave density is the whole point: tiny sample counts can't fill
        # a wave even fully batched (the fused kernel wins there)
        and cc.width * cc.height * cc.sqrt_spp * cc.sqrt_spp >= (1 << 18)
        and _resume_kind(resume) in ("", "stratum")
        and _resume_stream(resume) in ("", "jnp")
    )


def _bdpt_wave_batch(npix: int, spp_eff: int, max_depth: int,
                     mis: bool) -> int:
    """Strata per bdpt_wave launch: denser waves sort into tighter
    kernel tiles (same lever as _wave_spp_batch), bounded so the live
    set — two [S, B] vertex SoAs, MIS tables [S, S, B], and the per-slot
    connection temporaries — stays ~<= 6 GB of HBM (measured: 1M-ray
    mis waves peak well under the 16 GB chip).  BPT_TPU_BDPT_BATCH
    overrides for probes."""
    import os

    ov = os.environ.get("BPT_TPU_BDPT_BATCH", "")
    if ov:
        return max(1, min(spp_eff, int(ov)))
    S = max(1, max_depth)
    words_per_ray = 36 * S + 60 + (6 * S + 8 * S * S if mis else 0)
    if os.environ.get("BPT_TPU_CONNECT_BATCH", "") != "":
        # the opt-in cross-slot batched connect holds every slot's
        # geometry + contribution terms live across the one occlusion
        # launch — ~11 [S_l, B] arrays per camera slot plus the 8
        # concatenated candidate arrays
        words_per_ray += 11 * S * S + 8 * S
    cap_rays = max(1, (6 << 30) // (4 * words_per_ray))
    return max(1, min(spp_eff, cap_rays // max(1, npix)))


@lru_cache(maxsize=64)
def _make_step_bdpt_wave(max_depth: int, sqrt_spp: int, width: int,
                         npix: int, batch: int, mis: bool,
                         env_sig: tuple = ()):
    """``batch`` strata over the FULL image through the jnp BDPT
    estimator (bdpt_radiance), whose every closest/any-hit dispatches to
    the payload-sorted clustered kernels on TPU (ops/soa.py).

    RNG parity: identical streams to the jnp stratum loop (_make_step ->
    bdpt_fast fallback) — every draw is keyed by the absolute ray id, so
    results are bit-identical to that loop for the same seed at any
    batch size, and checkpoints interoperate (stream="jnp")."""
    spp_eff = sqrt_spp * sqrt_spp

    @partial(jax.jit, donate_argnums=(2, 3))
    def step(scene: SceneArrays, cc: CameraConstants, fb, stats_acc, key,
             s0):
        from bpt_tpu.models import pt as pt_mod_

        dtype = fb.dtype
        pix = jnp.arange(npix, dtype=jnp.int32)
        i = jnp.tile((pix % width).astype(dtype), batch)
        j = jnp.tile((pix // width).astype(dtype), batch)
        s_lin = s0 + jnp.repeat(jnp.arange(batch, dtype=jnp.int32), npix)
        s_i = (s_lin % sqrt_spp).astype(dtype)
        s_j = (s_lin // sqrt_spp).astype(dtype)
        ray_ids = jnp.tile(pix, batch) * spp_eff + s_lin
        k_gen = jax.random.fold_in(key, STREAM_RAYGEN)
        u_gen = rng_mod.wave_uniforms(k_gen, ray_ids, 0, 4, dtype=dtype)
        o, d = generate_rays(cc, i, j, s_i, s_j, u_gen)
        k_cam = jax.random.fold_in(key, STREAM_CAM_TRACE)
        k_ls = jax.random.fold_in(key, STREAM_LIGHT_START)
        k_lt = jax.random.fold_in(key, STREAM_LIGHT_TRACE)
        ls_u = rng_mod.wave_uniforms(k_ls, ray_ids, 0, bdpt_mod.NLS,
                                     dtype=dtype)
        rad, stats = bdpt_mod.bdpt_radiance(
            scene, o, d, max_depth,
            pt_mod_.default_uniforms_fn(k_cam, ray_ids, dtype),
            ls_u,
            pt_mod_.default_uniforms_fn(k_lt, ray_ids, dtype),
            mis=mis,
        )
        rad = rad.reshape(batch, npix, 3)
        for k in range(batch):  # stratum-order left fold (bitwise parity)
            fb = fb + rad[k]
        d_st = stats._asdict()
        inc = jnp.stack([
            d_st["rays_traced"].astype(jnp.float32),
            d_st["shadow_rays"].astype(jnp.float32),
            d_st["node_visits"].astype(jnp.float32),
            d_st["aabb_hits"].astype(jnp.float32),
            d_st["tri_tests"].astype(jnp.float32),
            d_st["tri_hits"].astype(jnp.float32),
        ])
        return fb, stats_acc + inc

    return step


def _can_fuse_spp(scene, cc, integrator, resume, stratum_callback,
                  warn: bool = True) -> bool:
    import jax as _jax
    import os

    from bpt_tpu.ops.pallas.pt_kernel import megakernel_reject_reason

    eligible = (
        integrator in ("pt", "bdpt", "bdpt-mis")
        and os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
        and _jax.default_backend() == "tpu"
        and not cc.defocus
        # endpoint-artifact emulation is jnp-wavefront-only (f32 kernels
        # have a different fp tie profile)
        and not getattr(cc, "ref_vis", False)
    )
    if not eligible:
        return False
    reason = megakernel_reject_reason(scene, integrator)
    if reason:
        # capacity cliffs (MAX_MATS/MAX_LIGHTS/...) silently drop to the
        # much slower jnp path — tell the user why (once per reason:
        # this predicate is evaluated more than once per render).  The
        # chunk-sizing pre-call passes warn=False: scenes the pt_wave
        # path handles (e.g. textured) are not falling back at all.
        if warn:
            _warn_fallback_once(reason)
        return False
    return True


@lru_cache(maxsize=16)
def _warn_fallback_once(reason: str) -> None:
    import sys

    print(
        f"bpt_tpu: megakernel unavailable ({reason}); falling back to "
        "the slower XLA wavefront path",
        file=sys.stderr,
    )


def default_chunk_size(integrator: str, max_depth: int, npix: int,
                       fused: bool = False) -> int:
    """Size chunks so BDPT vertex tensors stay well under HBM.

    ``fused``: the Pallas megakernel path keeps its vertex SoAs in VMEM
    scratch per TILE — chunk size is pure launch granularity there, and
    BIGGER chunks both amortize launches and give the Morton pixel
    assignment a wider window (coffee-91k bdpt-mis at 512^2: 0.238 ->
    0.317 Mrays/s with 2^18 chunks + Morton, round 3)."""
    if fused:
        return int(min(1 << 18, max(1024, npix)))
    if integrator in ("bdpt", "bdpt-mis"):
        # ~46 floats/vertex-slot * 2 subpaths * depth; MIS adds two
        # [depth, depth, B] strategy tables
        budget = 256 << 20  # bytes of vertex storage
        per_ray = 46 * 4 * 2 * max(1, max_depth)
        if integrator == "bdpt-mis":
            per_ray += 8 * 4 * max(1, max_depth) ** 2
        c = budget // per_ray
    else:
        c = 1 << 18
    c = int(min(c, 1 << 18))
    c = max(1024, c)
    return int(min(c, max(1024, npix)))


def render_resilient(
    scene: SceneArrays,
    cfg: CameraConfig,
    seed: int = 0,
    retries: int = 2,
    stratum_callback=None,
    **kw,
) -> RenderResult:
    """Elastic render: on a device failure mid-render, resume from the
    last completed checkpoint unit instead of restarting (the SURVEY §5
    failure-detection analog — the reference's atomic row queue simply
    loses the whole job on a crash).  Completed work is never redone and
    the stratum/chunk-resume bitwise-invariance guarantees the final
    image is identical to an uninterrupted render.  TPU preemptions that
    poison the client still need a process restart + on-disk checkpoint
    (utils/checkpoint.py); this covers transient per-call failures."""
    last: dict = {}

    def cb(snap):
        last.clear()
        last.update(snap)
        if stratum_callback is not None:
            stratum_callback(snap)

    caller_resume = kw.pop("resume", None)
    attempt = 0
    done_at_last_failure = -1
    while True:
        try:
            return render(scene, cfg, seed=seed,
                          resume=dict(last) if last else caller_resume,
                          stratum_callback=cb, **kw)
        except Exception:
            done = int(last.get("units_done", 0)) if last else 0
            if done > done_at_last_failure:
                attempt = 0  # progress since the previous failure:
                # a long render survives any number of WIDELY-SPACED
                # transient failures; only repeated failures with no
                # progress exhaust the budget
            done_at_last_failure = done
            attempt += 1
            if attempt > retries or not last:
                raise


def render(
    scene: SceneArrays,
    cfg: CameraConfig,
    seed: int = 0,
    integrator: Optional[str] = None,
    chunk_size: Optional[int] = None,
    progress: bool = False,
    resume: Optional[dict] = None,
    stratum_callback=None,
) -> RenderResult:
    """camera::render (src/camera.h:43-145) minus the PNG write.

    ``resume``: optional dict(framebuffer_sum, strata_done) to continue an
    interrupted render (the estimator is a pure running sum, camera.h:117-124).
    ``stratum_callback(state_dict)`` fires after each completed stratum —
    checkpoint hook.
    """
    integrator = integrator or cfg.integrator
    cc = camera_constants(cfg, scene.dtype)
    W, H = cc.width, cc.height
    npix = W * H
    S = cfg.sqrt_spp
    spp_eff = S * S
    if chunk_size is None:
        chunk_size = default_chunk_size(
            integrator, cfg.max_depth, npix,
            fused=_can_fuse_spp(scene, cc, integrator, resume,
                                stratum_callback, warn=False))
    chunk_size = min(chunk_size, npix)
    n_chunks = int(np.ceil(npix / chunk_size))

    step = _make_step(integrator, cfg.max_depth, S, W, npix, chunk_size,
                      getattr(cfg, "ref_vis", False), _trace_env_sig())

    key = jax.random.PRNGKey(seed)
    stats = RenderStats()
    stats.bvh_nodes_built = int(scene.bvh_skip.shape[0]) if scene.use_bvh else 0

    strata_done = 0
    if resume:
        fb = jnp.asarray(resume["framebuffer_sum"].reshape(npix, 3), scene.dtype)
        strata_done = int(resume["strata_done"])
    else:
        fb = jnp.zeros((npix, 3), scene.dtype)

    bar = None
    if progress:
        from bpt_tpu.utils.progress import ProgressBar

        bar = ProgressBar((spp_eff - strata_done) * n_chunks)

    stats_acc = jnp.zeros((6,), jnp.float32)
    if _can_use_pt_wave(scene, cc, integrator, resume, stratum_callback):
        # large-scene PT: SPP-BATCHED per-bounce megakernel passes with
        # inter-bounce ray bucketing (ops/pallas/pt_wave.py) — denser
        # waves sort into tighter tiles (measured 0.99 -> 1.76 Mrays/s at
        # a 16-stratum batch on the 91k-tri stand-in vs the fused
        # in-kernel loop's 0.14)
        batch = _wave_spp_batch(npix, spp_eff)
        if bar:
            bar.total = spp_eff - strata_done
        t0 = time.monotonic()
        s_lin = strata_done
        while s_lin < spp_eff:
            b = min(batch, spp_eff - s_lin)
            step_w = _make_step_pt_wave(cfg.max_depth, S, W, npix, b,
                                        _trace_env_sig())
            fb, stats_acc = step_w(scene, cc, fb, stats_acc, key,
                                   jnp.int32(s_lin))
            s_lin += b
            if bar:
                bar.update(b)
            if stratum_callback is not None:
                stratum_callback(dict(
                    framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
                    strata_done=s_lin, units_done=s_lin,
                    unit_kind="stratum", seed=seed, stream="wave",
                ))
        # axon's block_until_ready returns before chunked pipelines
        # actually finish (measured: stats.wall 2.2s vs 13.3s real on a
        # warm 1080p render); a scalar readback is a true device sync
        # without the bulk D2H transfer
        float(jnp.sum(fb))
        stats.wall_seconds = time.monotonic() - t0
        acc = np.asarray(stats_acc)
        stats.rays_traced += int(acc[0])
        stats.shadow_rays += int(acc[1])
        stats.bvh_node_visits += int(acc[2])
        stats.aabb_hits += int(acc[3])
        stats.triangle_tests += int(acc[4])
        stats.triangle_hits += int(acc[5])
        if bar:
            bar.finish()
        return RenderResult(
            framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
            samples_per_pixel=spp_eff,
            stats=stats,
            width=W,
            height=H,
        )
    if _can_use_bdpt_wave(scene, cc, integrator, resume, cfg.max_depth):
        # large-scene BDPT (round 4): spp-batched jnp-estimator waves
        # over the sorted clustered kernels; bit-identical to (and
        # checkpoint-compatible with) the jnp stratum loop below
        mis = integrator == "bdpt-mis"
        batch = _bdpt_wave_batch(npix, spp_eff, cfg.max_depth, mis)
        if bar:
            bar.total = spp_eff - strata_done
        t0 = time.monotonic()
        s_lin = strata_done
        while s_lin < spp_eff:
            b = min(batch, spp_eff - s_lin)
            step_w = _make_step_bdpt_wave(cfg.max_depth, S, W, npix, b, mis,
                                          _trace_env_sig())
            fb, stats_acc = step_w(scene, cc, fb, stats_acc, key,
                                   jnp.int32(s_lin))
            s_lin += b
            if bar:
                bar.update(b)
            if stratum_callback is not None:
                stratum_callback(dict(
                    framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
                    strata_done=s_lin, units_done=s_lin,
                    unit_kind="stratum", seed=seed, stream="jnp",
                ))
        float(jnp.sum(fb))  # true device sync (see fused-path comment)
        stats.wall_seconds = time.monotonic() - t0
        acc = np.asarray(stats_acc)
        stats.rays_traced += int(acc[0])
        stats.shadow_rays += int(acc[1])
        stats.bvh_node_visits += int(acc[2])
        stats.aabb_hits += int(acc[3])
        stats.triangle_tests += int(acc[4])
        stats.triangle_hits += int(acc[5])
        if bar:
            bar.finish()
        return RenderResult(
            framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
            samples_per_pixel=spp_eff,
            stats=stats,
            width=W,
            height=H,
        )
    # the fused loop iterates pixel chunks (all spp in-kernel): it starts
    # fresh renders and resumes "chunk" checkpoints; a partial "stratum"
    # checkpoint falls back to the stratum loop below
    if (_can_fuse_spp(scene, cc, integrator, resume, stratum_callback)
            and _resume_kind(resume) in ("", "chunk")):
        if integrator == "pt":
            step_f = _make_step_pt_fused(cfg.max_depth, S, W, npix, chunk_size,
                                         _trace_env_sig())
        else:
            step_f = _make_step_bdpt_fused(cfg.max_depth, S, W, npix,
                                           chunk_size,
                                           mis=(integrator == "bdpt-mis"),
                                           env_sig=_trace_env_sig())
        chunks_done = 0
        if resume and _resume_kind(resume) == "chunk":
            chunks_done = int(resume.get("units_done",
                                         resume.get("strata_done", 0)))
            ck = int(resume.get("chunk_size", 0))
            if ck and ck != chunk_size:
                raise ValueError(
                    f"chunk-kind checkpoint was written with chunk_size={ck} "
                    f"but this run would use {chunk_size}; pass "
                    f"chunk_size={ck} to resume it")
        if bar:
            bar.total = n_chunks - chunks_done
        t0 = time.monotonic()
        for c in range(chunks_done, n_chunks):
            fb, stats_acc = step_f(
                scene, cc, fb, stats_acc, key, jnp.int32(c * chunk_size)
            )
            if bar:
                bar.update()
            if stratum_callback is not None:
                # chunk-granularity checkpoint at fused speed; the D2H
                # readback (~50-250 ms on axon) is the checkpoint cost
                stratum_callback(dict(
                    framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
                    strata_done=c + 1, units_done=c + 1,
                    unit_kind="chunk", seed=seed, chunk_size=chunk_size,
                ))
        # axon's block_until_ready returns before chunked pipelines
        # actually finish (measured: stats.wall 2.2s vs 13.3s real on a
        # warm 1080p render); a scalar readback is a true device sync
        # without the bulk D2H transfer
        float(jnp.sum(fb))
        stats.wall_seconds = time.monotonic() - t0
        acc = np.asarray(stats_acc)
        stats.rays_traced += int(acc[0])
        stats.shadow_rays += int(acc[1])
        stats.bvh_node_visits += int(acc[2])
        stats.aabb_hits += int(acc[3])
        stats.triangle_tests += int(acc[4])
        stats.triangle_hits += int(acc[5])
        if bar:
            bar.finish()
        return RenderResult(
            framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
            samples_per_pixel=spp_eff,
            stats=stats,
            width=W,
            height=H,
        )

    if _resume_kind(resume) == "chunk":
        raise ValueError(
            "chunk-kind checkpoint can only resume on the fused megakernel "
            "path (same backend/scene/config as the run that wrote it)")
    if _resume_stream(resume) == "wave":
        raise ValueError(
            "stratum checkpoint was written by the pt_wave/fused-parity RNG "
            "stream but this run would continue it on the jnp wavefront "
            "(different jitter stream) — resume on the configuration that "
            "wrote it, or restart")
    t0 = time.monotonic()
    for s_lin in range(strata_done, spp_eff):
        for c in range(n_chunks):
            fb, stats_acc = step(
                scene, cc, fb, stats_acc, key,
                jnp.int32(c * chunk_size), jnp.int32(s_lin),
            )
            if bar:
                bar.update()
        if stratum_callback is not None:
            stratum_callback(
                dict(
                    framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
                    strata_done=s_lin + 1,
                    units_done=s_lin + 1,
                    unit_kind="stratum",
                    seed=seed,
                    stream="jnp",
                )
            )
    float(jnp.sum(fb))  # true device sync (see fused-path comment)
    stats.wall_seconds = time.monotonic() - t0
    acc = np.asarray(stats_acc)
    stats.rays_traced += int(acc[0])
    stats.shadow_rays += int(acc[1])
    stats.bvh_node_visits += int(acc[2])
    stats.aabb_hits += int(acc[3])
    stats.triangle_tests += int(acc[4])
    stats.triangle_hits += int(acc[5])
    if bar:
        bar.finish()

    return RenderResult(
        framebuffer_sum=np.asarray(fb).reshape(H, W, 3),
        samples_per_pixel=spp_eff,
        stats=stats,
        width=W,
        height=H,
    )
