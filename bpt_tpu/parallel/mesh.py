"""Multi-chip rendering via jax.sharding + shard_map.

The reference's only parallelism is a shared-memory thread pool with an
atomic row queue (src/camera.h:57-134).  Here the image becomes data
parallelism over an ICI device mesh, two ways:

* **pixel sharding** (default): each device owns a contiguous pixel shard
  of the framebuffer; no collective is needed and the result is
  *bit-identical* to the single-device render (absolute ray ids drive the
  RNG, so each pixel's sample sequence is device-placement invariant).
* **sample (spp) sharding**: each device renders the full image for a
  subset of sample strata; partial framebuffers reduce with one psum over
  ICI.  Exact up to float addition order.

Scenes are tiny relative to HBM, so scene arrays are replicated (SURVEY
section 5: comm backend).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bpt_tpu.core import rng as rng_mod
from bpt_tpu.models import bdpt as bdpt_mod
from bpt_tpu.models import pt as pt_mod
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.scene.types import CameraConfig, SceneArrays

AXIS = "devices"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def _radiance_for(scene, cc, integrator, max_depth, sqrt_spp, key, pix, s_lin, dtype):
    """Shared per-shard radiance computation (mirrors models.render)."""
    spp_eff = sqrt_spp * sqrt_spp
    width = cc.width
    i = (pix % width).astype(dtype)
    j = (pix // width).astype(dtype)
    s_i = (s_lin % sqrt_spp).astype(dtype)
    s_j = (s_lin // sqrt_spp).astype(dtype)
    ray_ids = pix * spp_eff + s_lin

    k_gen = jax.random.fold_in(key, 0)
    u_gen = rng_mod.wave_uniforms(k_gen, ray_ids, 0, 4, dtype=dtype)
    o, d = generate_rays(cc, i, j, jnp.broadcast_to(s_i, i.shape),
                         jnp.broadcast_to(s_j, j.shape), u_gen)

    if integrator == "pt":
        k_pt = jax.random.fold_in(key, 1)
        rad, _ = pt_mod.path_trace_radiance(
            scene, o, d, max_depth, pt_mod.default_uniforms_fn(k_pt, ray_ids, dtype)
        )
    else:
        k_cam = jax.random.fold_in(key, 2)
        k_ls = jax.random.fold_in(key, 3)
        k_lt = jax.random.fold_in(key, 4)
        ls_u = rng_mod.wave_uniforms(k_ls, ray_ids, 0, bdpt_mod.NLS, dtype=dtype)
        rad, _ = bdpt_mod.bdpt_radiance(
            scene, o, d, max_depth,
            pt_mod.default_uniforms_fn(k_cam, ray_ids, dtype),
            ls_u,
            pt_mod.default_uniforms_fn(k_lt, ray_ids, dtype),
            mis=(integrator == "bdpt-mis"),
        )
    return rad


@lru_cache(maxsize=32)
def shard_step(mesh: Mesh, integrator: str, max_depth: int, sqrt_spp: int,
               npix: int, env_sig: tuple = ()):
    """One stratum over the whole image, pixels sharded across the mesh.

    Returned jitted fn: (scene, cc, fb [npix,3] sharded, key, s_lin) -> fb.
    npix must be a multiple of the mesh size (caller pads).
    """

    def local(scene, cc, fb_local, key, s_lin):
        # fb_local: [npix/n, 3] — this device's contiguous pixel shard
        n_local = fb_local.shape[0]
        dev = jax.lax.axis_index(AXIS)
        pix = dev * n_local + jnp.arange(n_local, dtype=jnp.int32)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        rad = _radiance_for(scene, cc, integrator, max_depth, sqrt_spp,
                            key, pixc, s_lin, fb_local.dtype)
        rad = jnp.where(in_range[..., None], rad, 0.0)
        return fb_local + rad

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(2,))


@lru_cache(maxsize=32)
def render_spp_sharded_step(mesh: Mesh, integrator: str, max_depth: int,
                            sqrt_spp: int, npix: int, env_sig: tuple = ()):
    """Sample-axis sharding: device d renders stratum (s0 + d) over all
    pixels; partial framebuffers psum-reduce across the mesh (the renderer's
    analog of gradient all-reduce).

    Returned jitted fn: (scene, cc, key, s0) -> fb_sum [npix, 3] replicated.
    """

    def local(scene, cc, key, s0):
        dev = jax.lax.axis_index(AXIS)
        s_lin = s0 + dev
        spp_eff = sqrt_spp * sqrt_spp
        pix = jnp.arange(npix, dtype=jnp.int32)
        rad = _radiance_for(scene, cc, integrator, max_depth, sqrt_spp,
                            key, pix, s_lin, scene.v0.dtype)
        rad = jnp.where(s_lin < spp_eff, rad, jnp.zeros_like(rad))
        return jax.lax.psum(rad, AXIS)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)


@lru_cache(maxsize=32)
def shard_step_fused(mesh: Mesh, integrator: str, max_depth: int,
                     sqrt_spp: int, npix: int, interpret: bool,
                     env_sig: tuple = ()):
    """Fully-fused distributed step: every device runs ONE megakernel
    launch over its pixel shard with ALL spp strata in-kernel (the
    multi-chip analog of models.render's fused path).  Bit-identical to
    the single-device fused render: ray ids are pixel-absolute, so the
    RNG stream is shard-placement invariant.

    Returned jitted fn: (scene, cc, fb [npad,3] sharded, key)
    -> (fb, rays_traced f32 replicated).
    """
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel_pixels
    from bpt_tpu.ops.pallas.pt_kernel import camera_table, pt_megakernel_pixels

    spp_eff = sqrt_spp * sqrt_spp

    def local(scene, cc, fb_local, key):
        from bpt_tpu.models.render import _morton_pix
        from bpt_tpu.ops.pallas.pt_kernel import use_clusters

        n_local = fb_local.shape[0]
        dev = jax.lax.axis_index(AXIS)
        pix = dev * n_local + jnp.arange(n_local, dtype=jnp.int32)
        clustered = use_clusters(scene)
        if clustered:
            # Morton pixel assignment within the shard (clustered
            # scenes): same +17% coherence win as the single-device
            # fused chunks (models/render._morton_pix); rad is
            # unpermuted below so the positional accumulate still
            # lines up
            pix = _morton_pix(pix, npix, cc.width)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        i = (pixc % cc.width).astype(jnp.float32)
        j = (pixc // cc.width).astype(jnp.float32)
        ids = jnp.where(in_range, pixc, -1)
        if integrator == "pt":
            rx, ry, rz, rays, _st = pt_megakernel_pixels(
                scene, i, j, i * 0, j * 0, ids, camera_table(cc), key,
                max_depth, interpret=interpret,
                spp_loop=spp_eff, sqrt_spp=sqrt_spp,
            )
        else:
            rx, ry, rz, rays, _sh, _st = bdpt_megakernel_pixels(
                scene, i, j, ids, camera_table(cc), key, max_depth,
                sqrt_spp, interpret=interpret,
                mis=(integrator == "bdpt-mis"),
            )
        rad = jnp.stack([rx, ry, rz], axis=-1).astype(fb_local.dtype)
        rad = jnp.where(in_range[..., None], rad, 0.0)
        if clustered:
            # restore shard-positional order (accumulate is aligned,
            # not a scatter): sort by the local offset of each row's
            # pixel id, radiance riding as payload
            loc = pix - dev * n_local
            _, r0, r1, r2 = jax.lax.sort(
                (loc, rad[:, 0], rad[:, 1], rad[:, 2]), num_keys=1)
            rad = jnp.stack([r0, r1, r2], axis=-1)
        return fb_local + rad, jax.lax.psum(rays, AXIS)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P()),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(2,))


def shard_step_wave(mesh: Mesh, max_depth: int, sqrt_spp: int, npix: int,
                    interpret: bool):
    """Pixel-sharded LARGE-SCENE step: every device runs the per-bounce
    pt_wave megakernel over its own pixel shard with all spp strata
    batched (<= 2^22 rays per launch, models.render._wave_spp_batch
    semantics).  Per-shard inter-bounce sorting is exactly the right
    granularity — ray movement never crosses shards, so no collective
    runs inside the bounce loop.  Bit-identical to the single-device
    pt_wave render (absolute ray ids + stratum-order left fold), which
    itself is bit-identical to the fused megakernel path (shared raygen
    jitter stream).

    Returned jitted fn: (scene, cc, fb [npad,3] sharded, key)
    -> (fb, rays_traced f32 replicated).
    """
    from bpt_tpu.core import vec3 as v3
    from bpt_tpu.models.camera import generate_rays
    from bpt_tpu.models.render import _raygen_jitter_host, _wave_spp_batch
    from bpt_tpu.ops.pallas.pt_wave import pt_wave

    spp_eff = sqrt_spp * sqrt_spp
    n = mesh.devices.size
    n_local = int(np.ceil(npix / n))
    batch = _wave_spp_batch(n_local, spp_eff)

    def local(scene, cc, fb_local, key):
        nl = fb_local.shape[0]
        dev = jax.lax.axis_index(AXIS)
        pix = dev * nl + jnp.arange(nl, dtype=jnp.int32)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        dtype = fb_local.dtype
        rays_total = jnp.float32(0.0)
        s0 = 0
        while s0 < spp_eff:
            b = min(batch, spp_eff - s0)
            i = jnp.tile((pixc % cc.width).astype(dtype), b)
            j = jnp.tile((pixc // cc.width).astype(dtype), b)
            s_lin = s0 + jnp.repeat(jnp.arange(b, dtype=jnp.int32), nl)
            s_i = (s_lin % sqrt_spp).astype(dtype)
            s_j = (s_lin // sqrt_spp).astype(dtype)
            ids = jnp.tile(pixc, b) * spp_eff + s_lin
            ids = jnp.where(jnp.tile(in_range, b), ids, -1)
            if cc.defocus:  # round 4: disk draws at raygen counter 1
                u0, u1, u2, u3 = _raygen_jitter_host(key, ids, defocus=True)
            else:
                u0, u1 = _raygen_jitter_host(key, ids)
                u2 = u3 = jnp.zeros_like(u0)
            u_gen = jnp.stack(
                [u0.astype(dtype), u1.astype(dtype),
                 u2.astype(dtype), u3.astype(dtype)],
                axis=-1)
            o3, d3 = generate_rays(cc, i, j, s_i, s_j, u_gen)
            rx, ry, rz, rays, _extra = pt_wave(
                scene, v3.from_array(o3), v3.from_array(d3), ids,
                jax.random.fold_in(key, 1), max_depth,
                interpret=interpret)
            rad = jnp.stack([rx, ry, rz], axis=-1).astype(dtype)
            rad = rad.reshape(b, nl, 3)
            for k in range(b):  # stratum-order left fold (bit parity)
                fb_local = fb_local + jnp.where(
                    in_range[..., None], rad[k], 0.0)
            rays_total = rays_total + rays
            s0 += b
        return fb_local, jax.lax.psum(rays_total, AXIS)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P()),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(2,))


def shard_step_bdpt_wave(mesh: Mesh, integrator: str, max_depth: int,
                         sqrt_spp: int, npix: int, batch: int = 0):
    """Pixel-sharded LARGE-SCENE BDPT step (round 5, VERDICT r4 item 8):
    every device runs the spp-BATCHED jnp BDPT estimator
    (models.render._make_step_bdpt_wave semantics) over its own pixel
    shard — on TPU each closest/any-hit inside dispatches to the
    payload-sorted clustered Pallas kernels (ops/soa.py), including the
    PAGED tables past the single-table budget.  Bit-identical to the
    single-device render: absolute ray ids drive every draw, strata fold
    in stratum order, and no collective runs inside the estimator.

    ``batch``: strata per launch (0 = all spp in one wave).
    Returned jitted fn: (scene, cc, fb [npad,3] sharded, key)
    -> (fb, rays_traced f32 replicated).
    """
    spp_eff = sqrt_spp * sqrt_spp
    batch = batch or spp_eff
    mis = integrator == "bdpt-mis"

    def local(scene, cc, fb_local, key):
        nl = fb_local.shape[0]
        dev = jax.lax.axis_index(AXIS)
        pix = dev * nl + jnp.arange(nl, dtype=jnp.int32)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        dtype = fb_local.dtype
        width = cc.width
        rays_total = jnp.float32(0.0)
        s0 = 0
        while s0 < spp_eff:
            b = min(batch, spp_eff - s0)
            i = jnp.tile((pixc % width).astype(dtype), b)
            j = jnp.tile((pixc // width).astype(dtype), b)
            s_lin = s0 + jnp.repeat(jnp.arange(b, dtype=jnp.int32), nl)
            s_i = (s_lin % sqrt_spp).astype(dtype)
            s_j = (s_lin // sqrt_spp).astype(dtype)
            ids = jnp.tile(pixc, b) * spp_eff + s_lin
            k_gen = jax.random.fold_in(key, 0)
            u_gen = rng_mod.wave_uniforms(k_gen, ids, 0, 4, dtype=dtype)
            o, d = generate_rays(cc, i, j, s_i, s_j, u_gen)
            k_cam = jax.random.fold_in(key, 2)
            k_ls = jax.random.fold_in(key, 3)
            k_lt = jax.random.fold_in(key, 4)
            ls_u = rng_mod.wave_uniforms(k_ls, ids, 0, bdpt_mod.NLS,
                                         dtype=dtype)
            rad, stats = bdpt_mod.bdpt_radiance(
                scene, o, d, max_depth,
                pt_mod.default_uniforms_fn(k_cam, ids, dtype),
                ls_u,
                pt_mod.default_uniforms_fn(k_lt, ids, dtype),
                mis=mis,
            )
            rad = rad.reshape(b, nl, 3)
            for k in range(b):  # stratum-order left fold (bit parity)
                fb_local = fb_local + jnp.where(
                    in_range[..., None], rad[k], 0.0)
            rays_total = rays_total + stats.rays_traced.astype(jnp.float32)
            s0 += b
        return fb_local, jax.lax.psum(rays_total, AXIS)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P()),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(2,))


HOST_AXIS = "host"
CHIP_AXIS = "chip"


def make_mesh_2d(n_hosts: int, chips_per_host: int, devices=None) -> Mesh:
    """('host', 'chip') mesh — the multi-host SHAPE: the chip axis maps
    to ICI within a slice, the host axis to DCN across slices.  In this
    environment both axes are cut from one local device list (no
    multi-process runtime exists here); the sharding/collective layout
    is exactly what a real multi-host mesh would compile."""
    if devices is None:
        devices = jax.devices()
    n = n_hosts * chips_per_host
    return Mesh(np.array(devices[:n]).reshape(n_hosts, chips_per_host),
                (HOST_AXIS, CHIP_AXIS))


@lru_cache(maxsize=16)
def shard_step_2d(mesh: Mesh, integrator: str, max_depth: int,
                  sqrt_spp: int, npix: int, env_sig: tuple = ()):
    """Multi-host-shaped step: pixels shard over the CHIP (ICI) axis —
    no collective needed, framebuffer shards stay put — and spp strata
    shard over the HOST (DCN) axis, reduced with ONE psum over 'host'
    per call (SURVEY §5 comm-backend plan: ICI within a slice, one DCN
    framebuffer reduction across slices).

    Returned jitted fn: (scene, cc, fb [npad,3] chip-sharded, key, s0)
    -> fb.  Renders strata s0+h for every host index h."""

    def local(scene, cc, fb_local, key, s0):
        n_local = fb_local.shape[0]
        chip = jax.lax.axis_index(CHIP_AXIS)
        host = jax.lax.axis_index(HOST_AXIS)
        s_lin = s0 + host
        spp_eff = sqrt_spp * sqrt_spp
        pix = chip * n_local + jnp.arange(n_local, dtype=jnp.int32)
        in_range = pix < npix
        pixc = jnp.minimum(pix, npix - 1)
        rad = _radiance_for(scene, cc, integrator, max_depth, sqrt_spp,
                            key, pixc, s_lin, fb_local.dtype)
        rad = jnp.where(in_range[..., None] & (s_lin < spp_eff), rad, 0.0)
        # the DCN-analog collective: one framebuffer reduction across
        # hosts; ICI (chip axis) needs no collective at all
        rad = jax.lax.psum(rad, HOST_AXIS)
        return fb_local + rad

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(CHIP_AXIS), P(), P()),
        out_specs=P(CHIP_AXIS),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(2,))


def render_distributed_2d(scene: SceneArrays, cfg: CameraConfig,
                          mesh: Mesh, seed: int = 0,
                          integrator: Optional[str] = None):
    """Full render over a ('host', 'chip') mesh: pixel shards per chip,
    strata batches per host, one psum over the host (DCN) axis per
    batch.  Matches render_distributed's pixel-sharded result up to
    float addition order of the strata (the psum changes the reduction
    tree)."""
    integrator = integrator or cfg.integrator
    n_hosts, n_chips = (mesh.devices.shape[0], mesh.devices.shape[1])
    cc = camera_constants(cfg, scene.dtype)
    npix = cc.width * cc.height
    npad = int(np.ceil(npix / n_chips) * n_chips)
    S = cfg.sqrt_spp
    spp_eff = S * S

    # fb is chip-sharded, host-replicated
    sharding = NamedSharding(mesh, P(CHIP_AXIS))
    fb = jax.device_put(jnp.zeros((npad, 3), scene.dtype), sharding)
    key = jax.random.PRNGKey(seed)
    from bpt_tpu.models.render import _trace_env_sig

    step = shard_step_2d(mesh, integrator, cfg.max_depth, S, npix,
                         _trace_env_sig())
    for s0 in range(0, spp_eff, n_hosts):
        fb = step(scene, cc, fb, key, jnp.int32(s0))
    fb = np.asarray(fb)[:npix].reshape(cc.height, cc.width, 3)
    return fb, spp_eff


def render_distributed(
    scene: SceneArrays,
    cfg: CameraConfig,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    integrator: Optional[str] = None,
    fast: str = "auto",
):
    """Full distributed render, pixel-sharded.  `fast="auto"` uses the
    fused megakernel per shard when the scene qualifies (one launch per
    device for the whole render) — except large-scene/textured PT, which
    prefers the per-bounce pt_wave shard step (`"wave"`; inter-bounce
    sorting per shard).  `"never"` forces the per-stratum jnp path;
    `"always"` forces the megakernel; `"wave"` forces the wave step —
    per-bounce pt_wave for PT (interpret-mode off-TPU), the spp-batched
    bdpt_wave estimator step for bdpt/bdpt-mis (round 5).  Bit-identical
    to models.render.render on one device."""
    if mesh is None:
        mesh = make_mesh()
    integrator = integrator or cfg.integrator
    n = mesh.devices.size
    cc = camera_constants(cfg, scene.dtype)
    npix = cc.width * cc.height
    npad = int(np.ceil(npix / n) * n)
    S = cfg.sqrt_spp
    spp_eff = S * S

    from bpt_tpu.ops.pallas.pt_kernel import (
        megakernel_ok,
        use_clusters,
        wave_reject_reason,
    )

    if fast not in ("auto", "always", "never", "wave"):
        raise ValueError(
            f"fast must be 'auto'|'always'|'never'|'wave', got {fast!r}")
    backend = jax.default_backend()
    use_wave = (
        fast == "wave"
        or (fast == "auto" and integrator == "pt" and backend == "tpu"
            and not getattr(cfg, "ref_vis", False)
            and wave_reject_reason(scene) == ""
            and (use_clusters(scene) or bool(scene.has_textures)))
    )
    if use_wave and integrator in ("bdpt", "bdpt-mis"):
        # round 5 (VERDICT r4 item 8): fast='wave' on a BDPT integrator
        # takes the spp-batched bdpt_wave shard step (the single-device
        # large-scene BDPT path under pixel sharding)
        from bpt_tpu.models.bdpt import UNROLL_MAX

        if cfg.max_depth > UNROLL_MAX:
            raise ValueError(
                "fast='wave' BDPT requires max_depth <= UNROLL_MAX "
                "(docs/PARITY.md deviation 10)")
        use_bdpt_wave = True
        use_wave = False
    else:
        use_bdpt_wave = (
            fast == "auto" and integrator in ("bdpt", "bdpt-mis")
            and backend == "tpu" and not getattr(cfg, "ref_vis", False)
            and use_clusters(scene) and wave_reject_reason(scene) == "")
        if use_bdpt_wave:
            from bpt_tpu.models.bdpt import UNROLL_MAX

            use_bdpt_wave = cfg.max_depth <= UNROLL_MAX
    use_fast = not use_wave and not use_bdpt_wave and (
        fast == "always"
        or (fast == "auto" and integrator in ("pt", "bdpt", "bdpt-mis")
            and backend == "tpu" and megakernel_ok(scene, integrator)
            and not cc.defocus)
    )

    sharding = NamedSharding(mesh, P(AXIS))
    fb = jax.device_put(jnp.zeros((npad, 3), scene.dtype), sharding)
    key = jax.random.PRNGKey(seed)
    if use_wave:
        if integrator != "pt":
            raise ValueError("fast='wave' is a PT-only path")
        step_w = shard_step_wave(mesh, cfg.max_depth, S, npix,
                                 backend != "tpu")
        fb, _rays = step_w(scene, cc, fb, key)
    elif use_bdpt_wave:
        step_bw = shard_step_bdpt_wave(mesh, integrator, cfg.max_depth,
                                       S, npix)
        fb, _rays = step_bw(scene, cc, fb, key)
    elif use_fast:
        from bpt_tpu.models.render import _trace_env_sig

        step_f = shard_step_fused(mesh, integrator, cfg.max_depth, S, npix,
                                  backend != "tpu", _trace_env_sig())
        fb, _rays = step_f(scene, cc, fb, key)
    else:
        from bpt_tpu.models.render import _trace_env_sig

        step = shard_step(mesh, integrator, cfg.max_depth, S, npix,
                          _trace_env_sig())
        for s_lin in range(spp_eff):
            fb = step(scene, cc, fb, key, jnp.int32(s_lin))
    if jax.process_count() > 1:
        # multi-controller run (parallel/multiprocess.py): the global
        # array is only partially addressable here — one collective
        # gather (gloo on CPU / DCN on pods) assembles the framebuffer
        # on every process
        from jax.experimental import multihost_utils

        fb = multihost_utils.process_allgather(fb, tiled=True)
    fb = np.asarray(fb)[:npix].reshape(cc.height, cc.width, 3)
    return fb, spp_eff
