"""Fused wavefront PT megakernel.

One Pallas kernel runs the ENTIRE path-trace loop for a ray tile: per-bounce
intersection (triangle constants streamed from SMEM), branchless shading,
NEE mixture sampling, and in-kernel threefry RNG.  The XLA formulation of the
same loop issues dozens of kernels per bounce (~45 ms/bounce at 262k rays on
the axon runtime); here the tile stays resident in VMEM and the only HBM
traffic is primary rays in, radiance out.

Semantics: identical to models.pt.path_trace_radiance (the oracle-pinned
reference estimator, src/camera.h:255-292) given the same uniforms.  The
fast path draws its own threefry stream:
    u(bounce, slot, ray) = bits_to_float(threefry2x32(
        fold_in(key, slot), (ray_id, bounce)))
— keys are per SLOT, the bounce index rides in the threefry COUNTER (so
per-LANE bounce indices work: the persistent-sample mode interleaves
strata per lane), and draws are taken in pairs using both 32-bit outputs.
Deterministic in absolute ray id (chunk/shard invariant) but a different
stream than the jnp path's wave_uniforms.  Tests inject an explicit
uniforms buffer instead (mode A), making the kernel bit-comparable to the
oracle.

Dispatch limits: small scenes only (SMEM-resident triangle soup; T, M, L
bounded by MAX_*; volumes in bounded SMEM tables), f32.  Larger scenes
use the clustered streaming mode (clusters.py) or the jnp/BVH path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN

LANES = 128
DEF_TILE_ROWS = 32  # 32 x 128 = 4096 rays per grid step (8:133, 32:220, 64:216 Mrays)

MAX_TRIS = 512  # SMEM budget: 512 * 13 floats = 26.6 KB (v5e SMEM holds it)
MAX_MATS = 16
MAX_LIGHTS = 16

PI = 3.1415926535897932385

# material type ids (scene.types)
M_LAM, M_METAL, M_DIEL, M_LIGHT, M_ISO = range(5)

# uniform slots (models.pt layout)
U_MIX, U_LPICK, U_LU, U_LV, U_B1, U_B2, U_DIEL, U_FZ1, U_FZ2 = range(9)
NU = 9

TRI_STRIDE = 13  # v0(3) e1(3) e2(3) n(3) mat(1)
MAT_STRIDE = 6  # mtype, albedo(3), fuzz, ior
LGT_STRIDE = 13  # v0(3) e1(3) e2(3) n(3) area(1)

# constant_medium boundaries (constant_medium.h:24-56): boundary triangles
# + per-volume (neg_inv_density, phase mat) in SMEM
MAX_VOLS = 4
MAX_VOL_TRIS = 64
VOL_STRIDE = 10  # v0(3) e1(3) e2(3) owning-volume id
VOLM_STRIDE = 2  # neg_inv_density, phase mat id


def _rotl(x, r):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _threefry2x32(k1, k2, x0, x1):
    """jax's threefry2x32 block (jax._src.prng._threefry2x32_lowering)."""
    ks2 = k1 ^ k2 ^ np.uint32(0x1BD11BDA)
    x0 = x0 + k1
    x1 = x1 + k2
    for r in (13, 15, 26, 6):
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    x0 = x0 + k2
    x1 = x1 + ks2 + np.uint32(1)
    for r in (17, 29, 16, 24):
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    x0 = x0 + ks2
    x1 = x1 + k1 + np.uint32(2)
    for r in (13, 15, 26, 6):
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    x0 = x0 + k1
    x1 = x1 + k2 + np.uint32(3)
    for r in (17, 29, 16, 24):
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    x0 = x0 + k2
    x1 = x1 + ks2 + np.uint32(4)
    for r in (13, 15, 26, 6):
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    x0 = x0 + ks2
    x1 = x1 + k1 + np.uint32(5)
    return x0, x1


def _bits_to_unit_float(bits):
    """uint32 -> f32 in [0,1): jax's mantissa trick."""
    f = jax.lax.bitcast_convert_type(
        (bits >> np.uint32(9)) | np.uint32(0x3F800000), jnp.float32
    )
    return f - 1.0


def _normalize_safe(x, y, z, eps=1e-20):
    n2 = x * x + y * y + z * z
    inv = jnp.where(n2 > eps, 1.0 / jnp.sqrt(jnp.maximum(n2, eps)), 0.0)
    return x * inv, y * inv, z * inv



def _vol_closest_smem(vol_f, vid, vt, cox, coy, coz, cdx, cdy, cdz,
                      lo_t, shape):
    """Closest boundary-tri hit of volume `vid` with t > lo_t (the
    reference's interval(-inf, inf) then (t1+1e-4, inf) passes,
    constant_medium.h:26-33).  vol_f: SMEM [MAX_VOL_TRIS*VOL_STRIDE]."""

    def body(k, t_best):
        base = k * VOL_STRIDE
        v0x = vol_f[base + 0]
        v0y = vol_f[base + 1]
        v0z = vol_f[base + 2]
        e1x = vol_f[base + 3]
        e1y = vol_f[base + 4]
        e1z = vol_f[base + 5]
        e2x = vol_f[base + 6]
        e2y = vol_f[base + 7]
        e2z = vol_f[base + 8]
        owner = vol_f[base + 9]
        px = cdy * e2z - cdz * e2y
        py = cdz * e2x - cdx * e2z
        pz = cdx * e2y - cdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / det
        tx = cox - v0x
        ty = coy - v0y
        tz = coz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (cdx * qx + cdy * qy + cdz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (
            (owner == vid)
            & (jnp.abs(det) >= MT_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t > lo_t) & (t < t_best)
        )
        return jnp.where(ok, t, t_best)

    return jax.lax.fori_loop(
        0, vt, body, jnp.full(shape, jnp.inf, jnp.float32))


def _shared_scatter_env() -> bool:
    """Mirror of models.pt._shared_scatter (no models import here)."""
    import os

    return os.environ.get("BPT_TPU_PT_SHARED_SCATTER", "") == "1"


def make_bounce(meta, tri_f, mat_f, lgt_f, draws, clustered, closest_fn,
                shape, vol_refs=None, mat_classes=(True, True),
                stat_refs=None, uv_refs=None):
    """One PT bounce (intersect + branchless shade + RNG), shared by the
    fused megakernel (_pt_kernel_impl) and the per-bounce wavefront
    kernel (pt_wave.py).  `draw(b, slot)` supplies the bounce uniforms;
    `closest_fn` is the clustered intersect provider when `clustered`.
    `vol_refs` = (vol_f, volm_f, num_volumes static) enables the
    constant_medium free-flight override (slots NU..NU+V-1 hold the
    per-volume exponential draws, matching models.pt).
    `uv_refs` = optional (u_ref, v_ref, ti_ref) VMEM f32 refs: the hit's
    barycentrics + global triangle id for the textured wavefront's XLA
    texel stage (pt_wave).  Clustered mode: the traversal provider fills
    them (pass the same refs to make_clustered_closest) and this bounce
    only applies the volume fixup below; SMEM mode: this bounce tracks
    them in extended intersect carries.  Volume scenes (round 4): where
    the constant_medium free-flight override wins, the payload becomes
    u = v = 0 and ti = -2 - phase_mat_id — matching the jnp path's uv
    zeroing (soa.apply_volumes, constant_medium.h:48-56) and letting the
    XLA stage restore the phase function's texture albedo (the table
    albedo is neutralized to 1 for every textured material).
    `stat_refs` = optional (tt_ref_or_None, th_ref) VMEM f32 accumulators
    (caller zeroes once per kernel): tt counts the SMEM brute sweep's
    T tests per alive lane (clustered scenes count tri tests inside the
    traversal provider instead, so pass tt_ref=None there); th counts
    per-lane surface closest-hits per bounce — BEFORE the volume
    override, matching the jnp path (ops/soa.py tri_hits) and the
    reference's triangle_hits source (src/core/stats.h:14).
    `mat_classes` = (has_delta, has_iso) STATIC flags: when a material
    class is absent from the scene its branchless machinery (and its RNG
    draw computations) is skipped entirely — the per-lane masks would be
    all-false anyway, so results are bitwise identical, and the draw
    SLOT layout never changes.  Diffuse-only scenes (the cornell bench)
    save the whole reflect/refract/Schlick chain per bounce.

    Estimator semantics pinned to the reference (camera.h:255-292):
    miss -> background, one-sided emitters, delta continuations, 50/50
    light/BSDF mixture with single-sample weight scatter_pdf/pdf."""
    T = meta[0]
    M = meta[1]
    L = meta[2]
    has_delta, has_iso = mat_classes
    draw, draw2 = draws
    zf = jnp.zeros(shape, jnp.float32)

    def mat_param(mat_id, offset):
        """Per-lane material scalar via masked accumulation over M."""
        def body(m, acc):
            val = mat_f[m * MAT_STRIDE + offset]
            return jnp.where(mat_id == m, val, acc)

        return jax.lax.fori_loop(0, M, body, jnp.zeros(shape, jnp.float32))

    def bounce(b, state):
        (cox, coy, coz, cdx, cdy, cdz,
         tr, tg, tb, ar, ag, ab, alive_f, rays_cnt) = state
        alive = alive_f > 0.5

        rays_cnt = rays_cnt + alive_f

        # ---- intersect: fori over triangles, SMEM scalar constants
        def isect_smem(ti, carry):
            # no u/v carries: the SMEM path has no textures, and two
            # fewer loop-carried selects per triangle matter at 24 tris
            t_best, mat_b, nx_b, ny_b, nz_b = carry
            base = ti * TRI_STRIDE
            v0x = tri_f[base + 0]
            v0y = tri_f[base + 1]
            v0z = tri_f[base + 2]
            e1x = tri_f[base + 3]
            e1y = tri_f[base + 4]
            e1z = tri_f[base + 5]
            e2x = tri_f[base + 6]
            e2y = tri_f[base + 7]
            e2z = tri_f[base + 8]
            nx = tri_f[base + 9]
            ny = tri_f[base + 10]
            nz = tri_f[base + 11]
            mid = tri_f[base + 12]

            px = cdy * e2z - cdz * e2y
            py = cdz * e2x - cdx * e2z
            pz = cdx * e2y - cdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / det
            tx = cox - v0x
            ty = coy - v0y
            tz = coz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (cdx * qx + cdy * qy + cdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (
                (jnp.abs(det) >= MT_EPSILON)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= T_MIN) & (t < t_best)
            )
            t_best = jnp.where(ok, t, t_best)
            mat_b = jnp.where(ok, mid, mat_b)
            nx_b = jnp.where(ok, nx, nx_b)
            ny_b = jnp.where(ok, ny, ny_b)
            nz_b = jnp.where(ok, nz, nz_b)
            return (t_best, mat_b, nx_b, ny_b, nz_b)

        zf = jnp.zeros(shape, jnp.float32)
        u_w = v_w = ti_w = None  # SMEM uv carries (written to refs below)
        if clustered:
            t_hit, mat_fl, gnx, gny, gnz = closest_fn(
                cox, coy, coz, cdx, cdy, cdz, alive
            )
        elif uv_refs is not None:
            # textured SMEM sweep: extended carries track the winning
            # hit's barycentrics + triangle id for the XLA texel stage
            u_ref, v_ref, ti_ref = uv_refs

            def isect_smem_uv(ti, carry):
                (t_best, mat_b, nx_b, ny_b, nz_b, u_b, v_b, ti_b) = carry
                base = ti * TRI_STRIDE
                v0x = tri_f[base + 0]
                v0y = tri_f[base + 1]
                v0z = tri_f[base + 2]
                e1x = tri_f[base + 3]
                e1y = tri_f[base + 4]
                e1z = tri_f[base + 5]
                e2x = tri_f[base + 6]
                e2y = tri_f[base + 7]
                e2z = tri_f[base + 8]
                nx = tri_f[base + 9]
                ny = tri_f[base + 10]
                nz = tri_f[base + 11]
                mid = tri_f[base + 12]
                px = cdy * e2z - cdz * e2y
                py = cdz * e2x - cdx * e2z
                pz = cdx * e2y - cdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / det
                tx = cox - v0x
                ty = coy - v0y
                tz = coz - v0z
                u = (tx * px + ty * py + tz * pz) * inv
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (cdx * qx + cdy * qy + cdz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = (
                    (jnp.abs(det) >= MT_EPSILON)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= T_MIN) & (t < t_best)
                )
                tif = ti.astype(jnp.float32) + jnp.zeros(shape, jnp.float32)
                return (jnp.where(ok, t, t_best),
                        jnp.where(ok, mid, mat_b),
                        jnp.where(ok, nx, nx_b),
                        jnp.where(ok, ny, ny_b),
                        jnp.where(ok, nz, nz_b),
                        jnp.where(ok, u, u_b),
                        jnp.where(ok, v, v_b),
                        jnp.where(ok, tif, ti_b))

            inf = jnp.full(shape, jnp.inf, jnp.float32)
            (t_hit, mat_fl, gnx, gny, gnz, u_w, v_w, ti_w) = (
                jax.lax.fori_loop(
                    0, T, isect_smem_uv,
                    (inf, jnp.full(shape, -1.0, jnp.float32), zf, zf, zf,
                     zf, zf, jnp.full(shape, -1.0, jnp.float32))))
        else:
            inf = jnp.full(shape, jnp.inf, jnp.float32)
            t_hit, mat_fl, gnx, gny, gnz = jax.lax.fori_loop(
                0, T, isect_smem,
                (inf, jnp.full(shape, -1.0, jnp.float32), zf, zf, zf)
            )
        if stat_refs is not None:
            tt_ref, th_ref = stat_refs
            if tt_ref is not None:  # SMEM brute sweep: T tests/alive lane
                tt_ref[:] = tt_ref[:] + alive_f * T.astype(jnp.float32)
            th_ref[:] = th_ref[:] + (
                alive & (t_hit < jnp.inf)).astype(jnp.float32)
        if vol_refs is not None:
            # constant_medium override (soa.apply_volumes semantics):
            # volumes behave as if appended last; t_surf shrinks across
            # volumes in order (constant_medium.h:24-56)
            vol_f, volm_f, n_vols, vt_count = vol_refs
            d_len = jnp.sqrt(cdx * cdx + cdy * cdy + cdz * cdz)
            t_cur = t_hit  # inf on miss == t_surf convention
            vhit = jnp.zeros(shape, jnp.float32)
            vmat = jnp.zeros(shape, jnp.float32)
            for v in range(n_vols):
                t1 = _vol_closest_smem(
                    vol_f, jnp.float32(v), vt_count, cox, coy, coz,
                    cdx, cdy, cdz, jnp.float32(-jnp.inf), shape)
                t2 = _vol_closest_smem(
                    vol_f, jnp.float32(v), vt_count, cox, coy, coz,
                    cdx, cdy, cdz, t1 + 1e-4, shape)
                tt1 = jnp.maximum(t1, jnp.float32(T_MIN))
                tt2 = jnp.minimum(t2, t_cur)
                ok = alive & (t1 < jnp.inf) & (t2 < jnp.inf) & (tt1 < tt2)
                tt1 = jnp.maximum(tt1, 0.0)
                dist_inside = (tt2 - tt1) * d_len
                hd = volm_f[v * VOLM_STRIDE] * jnp.log(
                    jnp.maximum(draw(b, NU + v), 1e-37))
                ok = ok & (hd <= dist_inside)
                tv = tt1 + hd / d_len
                t_cur = jnp.where(ok, tv, t_cur)
                vhit = jnp.where(ok, 1.0, vhit)
                vmat = jnp.where(ok, volm_f[v * VOLM_STRIDE + 1], vmat)
            took_vol = vhit > 0.5
            t_hit = jnp.where(took_vol, t_cur, t_hit)
            mat_fl = jnp.where(took_vol, vmat, mat_fl)
            # reference's arbitrary volume normal (1,0,0), front=true
            # (constant_medium.h:48-49): encode by aligning the geometric
            # normal AGAINST the ray so the front-flip below yields front
            gnx = jnp.where(took_vol, jnp.where(cdx < 0.0, 1.0, -1.0), gnx)
            gny = jnp.where(took_vol, 0.0, gny)
            gnz = jnp.where(took_vol, 0.0, gnz)
            if uv_refs is not None:
                # textured volume scenes (round 4): the free-flight
                # override zeroes the uv payload and encodes the phase
                # material as ti = -2 - mat so the XLA texel stage can
                # restore the isotropic texture albedo at (0, 0, p)
                u_ref, v_ref, ti_ref = uv_refs
                ti_enc = -2.0 - vmat
                if clustered:  # provider wrote the surface payload
                    u_ref[:] = jnp.where(took_vol, 0.0, u_ref[:])
                    v_ref[:] = jnp.where(took_vol, 0.0, v_ref[:])
                    ti_ref[:] = jnp.where(took_vol, ti_enc, ti_ref[:])
                else:
                    u_w = jnp.where(took_vol, 0.0, u_w)
                    v_w = jnp.where(took_vol, 0.0, v_w)
                    ti_w = jnp.where(took_vol, ti_enc, ti_w)
        if uv_refs is not None and not clustered:
            u_ref, v_ref, ti_ref = uv_refs
            u_ref[:] = u_w
            v_ref[:] = v_w
            ti_ref[:] = ti_w

        hit = t_hit < jnp.inf
        mat_id = mat_fl.astype(jnp.int32)

        front = (cdx * gnx + cdy * gny + cdz * gnz) < 0.0
        fsign = jnp.where(front, 1.0, -1.0)
        nx = gnx * fsign
        ny = gny * fsign
        nz = gnz * fsign

        px_ = cox + t_hit * cdx
        py_ = coy + t_hit * cdy
        pz_ = coz + t_hit * cdz
        px_ = jnp.where(hit, px_, cox)
        py_ = jnp.where(hit, py_, coy)
        pz_ = jnp.where(hit, pz_, coz)

        miss = alive & ~hit
        bgr = lgt_f[MAX_LIGHTS * LGT_STRIDE + 0]  # background at table tail
        bgg = lgt_f[MAX_LIGHTS * LGT_STRIDE + 1]
        bgb = lgt_f[MAX_LIGHTS * LGT_STRIDE + 2]
        ar = ar + jnp.where(miss, tr * bgr, 0.0)
        ag = ag + jnp.where(miss, tg * bgg, 0.0)
        ab = ab + jnp.where(miss, tb * bgb, 0.0)

        live_hit = alive & hit
        mtype = mat_param(mat_id, 0)
        alb_r = mat_param(mat_id, 1)
        alb_g = mat_param(mat_id, 2)
        alb_b = mat_param(mat_id, 3)
        if has_delta:
            fuzz = mat_param(mat_id, 4)
            ior = mat_param(mat_id, 5)

        false = jnp.zeros(shape, jnp.bool_)
        is_light = mtype == float(M_LIGHT)
        is_metal = (mtype == float(M_METAL)) if has_delta else false
        is_diel = (mtype == float(M_DIEL)) if has_delta else false
        is_iso = (mtype == float(M_ISO)) if has_iso else false
        is_lam = mtype == float(M_LAM)
        delta = is_metal | is_diel
        can_scatter = ~is_light

        # emission (one-sided; albedo doubles as emission for lights)
        emit_mask = live_hit & ~delta & is_light & front
        ar = ar + jnp.where(emit_mask, tr * alb_r, 0.0)
        ag = ag + jnp.where(emit_mask, tg * alb_g, 0.0)
        ab = ab + jnp.where(emit_mask, tb * alb_b, 0.0)

        # attenuation (dielectric -> white)
        if has_delta:
            at_r = jnp.where(is_diel, 1.0, alb_r)
            at_g = jnp.where(is_diel, 1.0, alb_g)
            at_b = jnp.where(is_diel, 1.0, alb_b)
        else:
            at_r, at_g, at_b = alb_r, alb_g, alb_b

        # ---- RNG draws for this bounce (paired: one threefry per
        # two slots, both 32-bit outputs used)
        u_mix, u_lp = draw2(b, U_MIX)
        u_lu, u_lv = draw2(b, U_LU)
        if _shared_scatter_env():
            # BPT_TPU_PT_SHARED_SCATTER: the bsdf branch reuses the
            # light-point pair — only the taken mixture branch's
            # direction survives, so each draw is consumed once per
            # bounce and the sampled-direction marginal is unchanged.
            # Saves one threefry per bounce (models/pt.py call site has
            # the full argument; documented deviation, default off).
            u_b1, u_b2 = u_lu, u_lv
        else:
            u_b1, u_b2 = draw2(b, U_B1)
        if has_delta:
            u_dl, u_f1 = draw2(b, U_DIEL)
            u_f2 = draw(b, U_FZ2)  # odd tail slot: single draw

            # ---- delta continuation (metal/dielectric)
            #   metal: unit(reflect(d, n)) + fuzz * sphere(u_f1, u_f2)
            dn = cdx * nx + cdy * ny + cdz * nz
            rfx = cdx - 2.0 * dn * nx
            rfy = cdy - 2.0 * dn * ny
            rfz = cdz - 2.0 * dn * nz
            rfx, rfy, rfz = _normalize_safe(rfx, rfy, rfz)
            sz = 1.0 - 2.0 * u_f1
            sr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sz * sz))
            sphi = 2.0 * PI * u_f2
            spx = sr * jnp.cos(sphi)
            spy = sr * jnp.sin(sphi)
            metal_x = rfx + fuzz * spx
            metal_y = rfy + fuzz * spy
            metal_z = rfz + fuzz * sz
            #   dielectric
            ri = jnp.where(front, 1.0 / ior, ior)
            udx, udy, udz = _normalize_safe(cdx, cdy, cdz)
            cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            r0 = (1.0 - ri) / (1.0 + ri)
            r0 = r0 * r0
            omc = 1.0 - cos_t
            schlick = r0 + (1.0 - r0) * omc * omc * omc * omc * omc
            do_reflect = (ri * sin_t > 1.0) | (schlick > u_dl)
            udn = udx * nx + udy * ny + udz * nz
            rux = udx - 2.0 * udn * nx
            ruy = udy - 2.0 * udn * ny
            ruz = udz - 2.0 * udn * nz
            perp_x = ri * (udx + cos_t * nx)
            perp_y = ri * (udy + cos_t * ny)
            perp_z = ri * (udz + cos_t * nz)
            par = -jnp.sqrt(
                jnp.abs(1.0 - (perp_x * perp_x + perp_y * perp_y
                               + perp_z * perp_z))
            )
            refr_x = perp_x + par * nx
            refr_y = perp_y + par * ny
            refr_z = perp_z + par * nz
            diel_x = jnp.where(do_reflect, rux, refr_x)
            diel_y = jnp.where(do_reflect, ruy, refr_y)
            diel_z = jnp.where(do_reflect, ruz, refr_z)
            ddx = jnp.where(is_metal, metal_x, diel_x)
            ddy = jnp.where(is_metal, metal_y, diel_y)
            ddz = jnp.where(is_metal, metal_z, diel_z)
        else:
            # no delta materials in the scene: delta masks are all-false,
            # so these values are never selected
            ddx = ddy = ddz = zf

        # ---- diffuse: 50/50 mixture of light dir and bsdf dir
        # light dir: uniform light pick + uniform point (unnormalized p - x)
        lidx = jnp.clip((u_lp * L.astype(jnp.float32)).astype(jnp.int32), 0, L - 1)

        def lparam(off):
            def body(li, acc):
                return jnp.where(lidx == li, lgt_f[li * LGT_STRIDE + off], acc)

            return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

        flip = (u_lu + u_lv) > 1.0
        bu = jnp.where(flip, 1.0 - u_lu, u_lu)
        bv = jnp.where(flip, 1.0 - u_lv, u_lv)
        ldx = lparam(0) + bu * lparam(3) + bv * lparam(6) - px_
        ldy = lparam(1) + bu * lparam(4) + bv * lparam(7) - py_
        ldz = lparam(2) + bu * lparam(5) + bv * lparam(8) - pz_

        # bsdf dir: cosine about n (lambertian) or uniform sphere (isotropic)
        #   reference ONB (onb.h:4-14)
        wx, wy, wz = _normalize_safe(nx, ny, nz)
        pick_axis = jnp.abs(wx) > 0.9
        axx = jnp.where(pick_axis, 0.0, 1.0)
        axy = jnp.where(pick_axis, 1.0, 0.0)
        vx_ = wy * 0.0 - wz * axy
        vy_ = wz * axx - wx * 0.0
        vz_ = wx * axy - wy * axx
        vx_, vy_, vz_ = _normalize_safe(vx_, vy_, vz_)
        ux_ = wy * vz_ - wz * vy_
        uy_ = wz * vx_ - wx * vz_
        uz_ = wx * vy_ - wy * vx_
        cphi = 2.0 * PI * u_b1
        csq = jnp.sqrt(u_b2)
        clx = jnp.cos(cphi) * csq
        cly = jnp.sin(cphi) * csq
        clz = jnp.sqrt(1.0 - u_b2)
        cosx = clx * ux_ + cly * vx_ + clz * wx
        cosy = clx * uy_ + cly * vy_ + clz * wy
        cosz = clx * uz_ + cly * vz_ + clz * wz
        if has_iso:
            isz = 1.0 - 2.0 * u_b1
            isr = jnp.sqrt(jnp.maximum(0.0, 1.0 - isz * isz))
            isphi = 2.0 * PI * u_b2
            bsx = jnp.where(is_iso, isr * jnp.cos(isphi), cosx)
            bsy = jnp.where(is_iso, isr * jnp.sin(isphi), cosy)
            bsz = jnp.where(is_iso, isz, cosz)
        else:
            bsx, bsy, bsz = cosx, cosy, cosz

        pick_light = u_mix < 0.5
        sdx = jnp.where(pick_light, ldx, bsx)
        sdy = jnp.where(pick_light, ldy, bsy)
        sdz = jnp.where(pick_light, ldz, bsz)

        # mixture pdf value: 0.5 * light_pdf + 0.5 * bsdf_pdf
        d_len2 = sdx * sdx + sdy * sdy + sdz * sdz
        d_len = jnp.sqrt(d_len2)

        def lpdf_body(li, acc):
            base = li * LGT_STRIDE
            v0x = lgt_f[base + 0]
            v0y = lgt_f[base + 1]
            v0z = lgt_f[base + 2]
            e1x = lgt_f[base + 3]
            e1y = lgt_f[base + 4]
            e1z = lgt_f[base + 5]
            e2x = lgt_f[base + 6]
            e2y = lgt_f[base + 7]
            e2z = lgt_f[base + 8]
            lnx = lgt_f[base + 9]
            lny = lgt_f[base + 10]
            lnz = lgt_f[base + 11]
            area = lgt_f[base + 12]
            ppx = sdy * e2z - sdz * e2y
            ppy = sdz * e2x - sdx * e2z
            ppz = sdx * e2y - sdy * e2x
            det = e1x * ppx + e1y * ppy + e1z * ppz
            inv = 1.0 / det
            tx = px_ - v0x
            ty = py_ - v0y
            tz = pz_ - v0z
            u = (tx * ppx + ty * ppy + tz * ppz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (sdx * qx + sdy * qy + sdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            valid = (
                (jnp.abs(det) >= MT_EPSILON)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= T_MIN)
            )
            dist2 = t * t * d_len2
            cosine = jnp.abs(sdx * lnx + sdy * lny + sdz * lnz) / d_len
            ok = valid & (area > 0.0) & (cosine > 0.0)
            pdf = jnp.where(ok, dist2 / jnp.where(ok, cosine * area, 1.0), 0.0)
            return acc + pdf

        lpdf = jax.lax.fori_loop(0, L, lpdf_body, zf) / L.astype(jnp.float32)

        ndx, ndy, ndz = _normalize_safe(sdx, sdy, sdz)
        cos_nd = ndx * nx + ndy * ny + ndz * nz
        cos_pdf = jnp.maximum(0.0, cos_nd / PI)
        bpdf = (jnp.where(is_iso, 1.0 / (4.0 * PI), cos_pdf)
                if has_iso else cos_pdf)
        pdf_val = 0.5 * lpdf + 0.5 * bpdf

        lamp = jnp.where(cos_nd < 0.0, 0.0, cos_nd / PI)
        scat_pdf = jnp.where(is_lam, lamp, 0.0)
        if has_iso:
            scat_pdf = jnp.where(is_iso, 1.0 / (4.0 * PI), scat_pdf)

        delta_ok = live_hit & can_scatter & delta
        diff_ok = live_hit & can_scatter & ~delta & (pdf_val > 0.0)
        w = jnp.where(pdf_val > 0.0, scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)

        tr = jnp.where(delta_ok, tr * at_r, jnp.where(diff_ok, tr * at_r * w, tr))
        tg = jnp.where(delta_ok, tg * at_g, jnp.where(diff_ok, tg * at_g * w, tg))
        tb = jnp.where(delta_ok, tb * at_b, jnp.where(diff_ok, tb * at_b * w, tb))

        alive_new = delta_ok | diff_ok
        # every live HIT writes the hit point (not just scatters): lanes
        # dying on an emitter leave p behind for the XLA texel stage's
        # textured-light emission lookup (dead-lane origins are otherwise
        # unread — contributions and sort keys are alive-gated)
        cox = jnp.where(live_hit, px_, cox)
        coy = jnp.where(live_hit, py_, coy)
        coz = jnp.where(live_hit, pz_, coz)
        cdx = jnp.where(alive_new, jnp.where(delta_ok, ddx, sdx), cdx)
        cdy = jnp.where(alive_new, jnp.where(delta_ok, ddy, sdy), cdy)
        cdz = jnp.where(alive_new, jnp.where(delta_ok, ddz, sdz), cdz)

        return (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb, ar, ag, ab,
                alive_new.astype(jnp.float32), rays_cnt)
    return bounce


def _pt_kernel_impl(depth, with_buffer, clustered, with_raygen, spp_loop,
                    n_vols, mat_classes, *refs):
    # scalar-prefetch refs
    nsc = 8 if with_raygen else 7 if clustered else 5
    if with_raygen:
        (meta, tri_f, mat_f, lgt_f, keys_u, cl_aabb, order_t, cam_f) = refs[:8]
    elif clustered:
        (meta, tri_f, mat_f, lgt_f, keys_u, cl_aabb, order_t) = refs[:7]
    else:
        (meta, tri_f, mat_f, lgt_f, keys_u) = refs[:5]
        cl_aabb = order_t = None
    if n_vols:
        vol_f, volm_f = refs[nsc:nsc + 2]
        nsc += 2
    ins = refs[nsc:]
    if with_raygen:
        (ii, jj, sx, sy, rid) = ins[:5]
        ins = ins[5:]
        ox = oy = oz = dx = dy = dz = None
    else:
        (ox, oy, oz, dx, dy, dz, rid) = ins[:7]
        ins = ins[7:]
    if clustered:
        tri_hbm = ins[0]
        ins = ins[1:]
    if with_buffer:
        ubuf = ins[0]
        ins = ins[1:]
    else:
        ubuf = None
    if clustered:
        (rr, rg, rb, rays_out, st_out,
         cl_smem, cl_smem2, cl_sem, cl_sem2,
         t_s, m_s, nx_s, ny_s, nz_s, nv_s, ah_s, tt_s, th_s) = ins
    else:
        (rr, rg, rb, rays_out, st_out, tt_s, th_s) = ins
        nv_s = ah_s = None
    shape = rid.shape
    T = meta[0]
    M = meta[1]
    L = meta[2]

    # traversal-counter accumulators (reference BvhStats analogs,
    # src/core/stats.h:8-16); zeroed per grid step, reduced to one
    # (1, LANES) row each in st_out at kernel end
    zst = jnp.zeros(shape, jnp.float32)
    tt_s[:] = zst
    th_s[:] = zst
    if clustered:
        nv_s[:] = zst
        ah_s[:] = zst

    if clustered:
        from bpt_tpu.ops.pallas.clusters import make_clustered_closest

        closest_fn = make_clustered_closest(
            meta, cl_aabb, tri_hbm, (cl_smem, cl_smem2),
            (cl_sem, cl_sem2),
            (t_s, m_s, nx_s, ny_s, nz_s), shape, order_tab=order_t,
            stat_refs=(nv_s, ah_s, tt_s),
        )

    # current per-sample absolute id (spp_loop mode rebinds per stratum)
    _ridu_cell = [rid[:].astype(jnp.uint32)]
    nu_eff = NU + n_vols  # volume free-flight draws at slots NU..NU+V-1

    def draw(b, slot):
        if with_buffer:
            return ubuf[b * nu_eff + slot]
        ru = _ridu_cell[0]
        k1 = keys_u[slot * 2]
        k2 = keys_u[slot * 2 + 1]
        # bounce index in the counter: works for scalar (lockstep) and
        # per-LANE vector b (persistent-sample mode)
        ctr = (jnp.zeros_like(ru) + b).astype(jnp.uint32)
        bits, _ = _threefry2x32(k1, k2, ru, ctr)
        return _bits_to_unit_float(bits)

    def draw2(b, slot):
        """Two uniforms (slot, slot+1) from ONE threefry call — both
        32-bit outputs used (the single-draw form discards x1)."""
        if with_buffer:
            return (ubuf[b * nu_eff + slot], ubuf[b * nu_eff + slot + 1])
        ru = _ridu_cell[0]
        k1 = keys_u[slot * 2]
        k2 = keys_u[slot * 2 + 1]
        ctr = (jnp.zeros_like(ru) + b).astype(jnp.uint32)
        x0, x1 = _threefry2x32(k1, k2, ru, ctr)
        return _bits_to_unit_float(x0), _bits_to_unit_float(x1)

    vol_refs = (vol_f, volm_f, n_vols, meta[7]) if n_vols else None
    bounce = make_bounce(meta, tri_f, mat_f, lgt_f, (draw, draw2), clustered,
                         closest_fn if clustered else None, shape,
                         vol_refs=vol_refs, mat_classes=mat_classes,
                         stat_refs=(None if clustered else tt_s, th_s))

    zf = jnp.zeros(shape, jnp.float32)
    of = jnp.ones(shape, jnp.float32)

    def trace_from(o0x, o0y, o0z, d0x, d0y, d0z, active_f):
        init = (
            o0x, o0y, o0z, d0x, d0y, d0z,
            of, of, of, zf, zf, zf,
            active_f, zf,
        )
        # early exit when every lane in the tile has terminated: a
        # bounce over an all-dead state is a no-op (every update is
        # alive-masked), so stopping early is bitwise identical and
        # saves the dead-tail compute of the unrolled depth loop
        # (~70% of lane-bounces at depth 10 on the cornell bench).
        def cond_fn(carry):
            bb, st = carry
            return (bb < depth) & (jnp.max(st[12]) > 0.5)

        def body_fn(carry):
            bb, st = carry
            return bb + 1, bounce(bb, st)

        _, state = jax.lax.while_loop(cond_fn, body_fn, (jnp.int32(0), init))
        (_, _, _, _, _, _, _, _, _, ar, ag, ab, alive_f, rays_cnt) = state
        # depth-exhausted entry still counts (camera.h:256)
        return ar, ag, ab, rays_cnt + alive_f

    if with_raygen:
        # get_ray (camera.h:199-213) in-kernel: stratified jitter from two
        # dedicated threefry rows (subkey tail), pixel sample from the
        # camera constants in SMEM, direction unnormalized.
        # spp_loop > 1: lanes hold PIXELS; all strata accumulate in-kernel
        # (the rid input is then the pixel id; per-sample absolute id =
        # pix * spp_eff + s, so the RNG stream matches single-sample mode).
        nj = nu_eff
        k1a = keys_u[nj * 2]
        k1b = keys_u[nj * 2 + 1]
        k2a = keys_u[nj * 2 + 2]
        k2b = keys_u[nj * 2 + 3]
        sqrt_spp = meta[3]
        active_f = (rid[:] >= 0).astype(jnp.float32)

        def one_sample(ridu, sxv, syv):
            _ridu_cell[0] = ridu  # bounce draws key off the per-sample id
            b1, b2 = _threefry2x32(k1a, k1b, ridu, jnp.zeros_like(ridu))
            u0 = _bits_to_unit_float(b1)
            u1 = _bits_to_unit_float(b2)
            recip = cam_f[12]
            offx = (sxv + u0) * recip - 0.5
            offy = (syv + u1) * recip - 0.5
            psx = cam_f[0] + (ii[:] + offx) * cam_f[3] + (jj[:] + offy) * cam_f[6]
            psy = cam_f[1] + (ii[:] + offx) * cam_f[4] + (jj[:] + offy) * cam_f[7]
            psz = cam_f[2] + (ii[:] + offx) * cam_f[5] + (jj[:] + offy) * cam_f[8]
            return trace_from(
                jnp.full(shape, cam_f[9], jnp.float32),
                jnp.full(shape, cam_f[10], jnp.float32),
                jnp.full(shape, cam_f[11], jnp.float32),
                psx - cam_f[9], psy - cam_f[10], psz - cam_f[11],
                active_f,
            )

        if spp_loop == 1:
            ar, ag, ab, rays_cnt = one_sample(
                rid[:].astype(jnp.uint32), sx[:], sy[:]
            )
        else:
            # PERSISTENT-SAMPLE lanes: each lane holds one PIXEL and
            # walks its spp strata sequentially, but a lane whose ray
            # terminates immediately regenerates its NEXT stratum sample
            # instead of idling until the whole tile finishes the
            # stratum.  Lockstep strata waste ~73% of lane-bounces on
            # the cornell bench (mean path length 2.7 of depth 10, but
            # some lane in the tile nearly always survives); here the
            # per-lane work is its OWN total path length.  Per-lane
            # bounce indices are fine for the RNG because the bounce
            # rides in the threefry counter (see _subkeys).
            spp_eff = sqrt_spp * sqrt_spp
            iz = jnp.zeros(shape, jnp.int32)

            def gen(s_vec):
                """Per-lane stratified sample s_vec (i32 [R,128]) ->
                (ridu, origin..., dir...) — same math as one_sample."""
                ridu = (rid[:] * spp_eff + s_vec).astype(jnp.uint32)
                b1, b2 = _threefry2x32(k1a, k1b, ridu, jnp.zeros_like(ridu))
                u0 = _bits_to_unit_float(b1)
                u1 = _bits_to_unit_float(b2)
                sxv = (s_vec % sqrt_spp).astype(jnp.float32)
                syv = (s_vec // sqrt_spp).astype(jnp.float32)
                recip = cam_f[12]
                offx = (sxv + u0) * recip - 0.5
                offy = (syv + u1) * recip - 0.5
                psx = (cam_f[0] + (ii[:] + offx) * cam_f[3]
                       + (jj[:] + offy) * cam_f[6])
                psy = (cam_f[1] + (ii[:] + offx) * cam_f[4]
                       + (jj[:] + offy) * cam_f[7])
                psz = (cam_f[2] + (ii[:] + offx) * cam_f[5]
                       + (jj[:] + offy) * cam_f[8])
                return (ridu,
                        jnp.full(shape, cam_f[9], jnp.float32),
                        jnp.full(shape, cam_f[10], jnp.float32),
                        jnp.full(shape, cam_f[11], jnp.float32),
                        psx - cam_f[9], psy - cam_f[10], psz - cam_f[11])

            ridu0, o0x, o0y, o0z, d0x, d0y, d0z = gen(iz)

            def cond_fn(carry):
                return jnp.max(carry[2][12]) > 0.5

            def body_fn(carry):
                s_vec, b_vec, st, ridu, totals = carry
                tot_r, tot_g, tot_b = totals
                _ridu_cell[0] = ridu
                st = bounce(b_vec, st)
                (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb,
                 sr, sg, sb, alive_f, rays_cnt) = st
                b_vec = b_vec + 1
                # depth-exhausted entries still count (camera.h:256)
                exhausted = (alive_f > 0.5) & (b_vec >= depth)
                rays_cnt = rays_cnt + exhausted.astype(jnp.float32)
                # sample done: flush its radiance into the pixel total —
                # per-sample partial sums keep the float-add order
                # identical to the per-stratum lockstep launches
                # (test_pt_spp_fusion_bitwise pins bit equality)
                finished = (alive_f <= 0.5) | exhausted
                tot_r = jnp.where(finished, tot_r + sr, tot_r)
                tot_g = jnp.where(finished, tot_g + sg, tot_g)
                tot_b = jnp.where(finished, tot_b + sb, tot_b)
                sr = jnp.where(finished, 0.0, sr)
                sg = jnp.where(finished, 0.0, sg)
                sb = jnp.where(finished, 0.0, sb)
                # recycle finished lanes onto their next stratum
                # (active_f, not `rid >= 0`: a loop-invariant i1 vector
                # gets hoisted into the while carry and Mosaic rejects
                # i1 vector loop carries at some tile/spp configs)
                nxt = s_vec + 1
                recycle = finished & (nxt < spp_eff) & (active_f > 0.5)
                s_vec = jnp.where(recycle, nxt, s_vec)
                nridu, nox, noy, noz, ndx, ndy, ndz = gen(s_vec)
                ridu = jnp.where(recycle, nridu, ridu)
                cox = jnp.where(recycle, nox, cox)
                coy = jnp.where(recycle, noy, coy)
                coz = jnp.where(recycle, noz, coz)
                cdx = jnp.where(recycle, ndx, cdx)
                cdy = jnp.where(recycle, ndy, cdy)
                cdz = jnp.where(recycle, ndz, cdz)
                tr = jnp.where(recycle, 1.0, tr)
                tg = jnp.where(recycle, 1.0, tg)
                tb = jnp.where(recycle, 1.0, tb)
                b_vec = jnp.where(recycle, 0, b_vec)
                alive_f = jnp.where(
                    recycle, 1.0,
                    jnp.where(finished, 0.0, alive_f))
                st = (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb,
                      sr, sg, sb, alive_f, rays_cnt)
                return (s_vec, b_vec, st, ridu, (tot_r, tot_g, tot_b))

            init = (iz, iz,
                    (o0x, o0y, o0z, d0x, d0y, d0z, of, of, of,
                     zf, zf, zf, active_f, zf),
                    ridu0, (zf, zf, zf))
            _, _, state, _, totals = jax.lax.while_loop(
                cond_fn, body_fn, init)
            ar, ag, ab = totals
            rays_cnt = state[13]
    else:
        ar, ag, ab, rays_cnt = trace_from(
            ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
            (rid[:] >= 0).astype(jnp.float32),
        )

    rr[:] = ar
    rg[:] = ag
    rb[:] = ab
    rays_out[:] = rays_cnt
    zrow = jnp.zeros((1, LANES), jnp.float32)
    st_out[0:1] = (jnp.sum(nv_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[1:2] = (jnp.sum(ah_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[2:3] = jnp.sum(tt_s[:], axis=0, keepdims=True)
    st_out[3:4] = jnp.sum(th_s[:], axis=0, keepdims=True)
    st_out[4:8] = jnp.zeros((4, LANES), jnp.float32)


# -------------------------------------------------------------- wrappers


def make_pt_kernel(depth: int, with_buffer: bool, clustered: bool = False,
                   with_raygen: bool = False, spp_loop: int = 1,
                   n_vols: int = 0, mat_classes=(True, True)):
    def kernel(*refs):
        return _pt_kernel_impl(depth, with_buffer, clustered, with_raygen,
                               spp_loop, n_vols, mat_classes, *refs)

    return kernel


def megakernel_ok(scene, integrator: str = "pt") -> bool:
    """Static dispatch check: SMEM-resident or clustered-streaming scene.
    Volumes run in-kernel on the PT **and** (round 3) BDPT megakernels
    (bounded SMEM tables).  Textured scenes use the wavefront path by
    design: per-lane texel gathers do not vectorize on the VPU —
    XLA-side gathers after the clustered intersect kernels are the
    TPU-native formulation (ops/soa.py dispatch).

    Single source of truth: megakernel_reject_reason — the dispatch
    decision and the user-facing fallback warning can never drift."""
    return megakernel_reject_reason(scene, integrator) == ""


def _capacity_reject_reason(scene, paged_ok: bool = False) -> str:
    """Capacity/dtype gates shared by every Pallas kernel path ('' if
    ok).  The texture gate is NOT here: the fused megakernels reject
    textures outright while pt_wave lifts that restriction (each path
    checks scene.has_textures structurally, never via these strings).
    ``paged_ok``: the caller can PAGE the FTB table (round 5: pt_wave
    runs the standalone paged closest per bounce), so only the
    MAX_PAGES backstop gates."""
    import jax.numpy as jnp_

    from bpt_tpu.ops.pallas.clusters import cluster_ok, cluster_pages_ok

    if not cluster_ok(scene):
        if not paged_ok:
            # the fused kernels need ONE combined SMEM table; past-budget
            # scenes still render via pt_wave's paged mode (round 5) or
            # the jnp wavefront's paged soa dispatch (round 4)
            return "scene exceeds the single-table clustered budget"
        if not cluster_pages_ok(scene):
            return "scene exceeds the paged FTB budget (MAX_PAGES)"
    if scene.num_lights > MAX_LIGHTS:
        return f"{scene.num_lights} lights > MAX_LIGHTS={MAX_LIGHTS}"
    m = int(scene.materials.mtype.shape[0])
    if m > MAX_MATS:
        return f"{m} materials > MAX_MATS={MAX_MATS}"
    if scene.num_volumes > MAX_VOLS:
        return f"{scene.num_volumes} volumes > MAX_VOLS={MAX_VOLS}"
    if scene.num_volumes and int(scene.vol_v0.shape[0]) > MAX_VOL_TRIS:
        return (f"{int(scene.vol_v0.shape[0])} volume boundary tris > "
                f"MAX_VOL_TRIS={MAX_VOL_TRIS}")
    if scene.dtype != jnp_.float32:
        return f"dtype {scene.dtype} != float32"
    return ""


def megakernel_reject_reason(scene, integrator: str = "pt") -> str:
    """Human-readable reason megakernel_ok(scene) is False ('' if ok) —
    the capacity limits are silent performance cliffs otherwise."""
    r = _capacity_reject_reason(scene)
    if r:
        return r
    if scene.has_textures:
        return ("scene has textures (uses the wavefront path: texel "
                "gathers run XLA-side)")
    return ""


def wave_reject_reason(scene) -> str:
    """Like megakernel_reject_reason but for the per-bounce wavefront
    (pt_wave), which ADDITIONALLY handles textured scenes: the kernel
    reports (u, v, tri) and the texel multiplies the throughput in XLA
    between bounces (round 3, VERDICT r2 item 7).  Round 4 extends the
    texel stage to textured LIGHT emission (radiance scale on dying
    lanes) and textured volumes (uv zeroing + phase-material encoding
    under the free-flight override); round 5 lifts the single-table
    budget (past-budget scenes run pt_wave's PAGED per-bounce closest),
    so only the SMEM shade-table limits and the MAX_PAGES backstop
    remain."""
    return _capacity_reject_reason(scene, paged_ok=True)


def use_clusters(scene) -> bool:
    return scene.num_tris > MAX_TRIS


def _pack_tables(scene):
    T = scene.num_tris
    M = int(scene.materials.mtype.shape[0])
    L = scene.num_lights

    if T <= MAX_TRIS:
        tri = jnp.concatenate(
            [scene.v0, scene.e1, scene.e2, scene.normal,
             scene.mat_id[:, None].astype(jnp.float32)],
            axis=1,
        ).astype(jnp.float32)  # [T,13]
        tri_tab = jnp.zeros((MAX_TRIS, TRI_STRIDE), jnp.float32).at[:T].set(tri)
    else:
        # clustered mode streams triangles from HBM; SMEM table unused
        tri_tab = jnp.zeros((1, TRI_STRIDE), jnp.float32)

    mats = scene.materials
    # textured materials: table albedo is neutralized to 1.0 — the jnp
    # oracle ignores it entirely (albedo_value returns the texel when
    # tex_id >= 0), and the textured wavefront (pt_wave) multiplies the
    # XLA-gathered texel into the throughput between bounces.  No fused
    # kernel accepts textured scenes, so this is never a behavior change
    # for them.
    alb = mats.albedo.astype(jnp.float32)
    if scene.has_textures:
        alb = jnp.where((mats.tex_id >= 0)[:, None], 1.0, alb)
    mat = jnp.stack(
        [mats.mtype.astype(jnp.float32), alb[:, 0], alb[:, 1],
         alb[:, 2], mats.fuzz, mats.ior], axis=1
    ).astype(jnp.float32)
    mat_tab = jnp.zeros((MAX_MATS, MAT_STRIDE), jnp.float32).at[:M].set(mat)

    lgt = jnp.concatenate(
        [scene.light_v0, scene.light_e1, scene.light_e2, scene.light_normal,
         scene.light_area[:, None]], axis=1
    ).astype(jnp.float32)
    lgt_tab = jnp.concatenate(
        [
            jnp.zeros((MAX_LIGHTS, LGT_STRIDE), jnp.float32).at[:L].set(lgt).reshape(-1),
            scene.background.astype(jnp.float32),
        ]
    )

    meta = jnp.array([T, M, L, 0, 0, 0, scene.num_volumes,
                      int(scene.vol_v0.shape[0]) if scene.num_volumes else 0],
                     jnp.int32)
    return meta, tri_tab.reshape(-1), mat_tab.reshape(-1), lgt_tab


def _pack_vol_tables(scene):
    """SMEM volume tables: boundary tris [MAX_VOL_TRIS*VOL_STRIDE] and
    per-volume (neg_inv_density, phase mat) [MAX_VOLS*VOLM_STRIDE]."""
    VT = int(scene.vol_v0.shape[0])
    vol = jnp.concatenate(
        [scene.vol_v0, scene.vol_e1, scene.vol_e2,
         scene.vol_tri_vol[:, None].astype(jnp.float32)], axis=1
    ).astype(jnp.float32)  # [VT,10]
    vol_tab = jnp.zeros((MAX_VOL_TRIS, VOL_STRIDE), jnp.float32)
    vol_tab = vol_tab.at[:VT].set(vol).at[VT:, 9].set(-1.0)
    volm = jnp.stack(
        [scene.vol_neg_inv_density.astype(jnp.float32),
         scene.vol_mat.astype(jnp.float32)], axis=1
    )
    V = volm.shape[0]
    volm_tab = jnp.zeros((MAX_VOLS, VOLM_STRIDE), jnp.float32).at[:V].set(volm)
    return vol_tab.reshape(-1), volm_tab.reshape(-1)


def _subkeys(key, nu: int = NU):
    """Per-SLOT threefry keys; the bounce index rides in the threefry
    COUNTER (draw: threefry(k_slot, (ray_id, bounce))) so per-LANE bounce
    indices work — the persistent-sample kernel mode needs them.  (Round
    1 folded the bounce into the key, which forces a lockstep scalar
    bounce; documented stream change, docs/PARITY.md.)"""
    ks = []
    for s in range(nu):
        k = jax.random.fold_in(key, s)
        kd = k if k.dtype == jnp.uint32 else jax.random.key_data(k)
        ks.append(kd.astype(jnp.uint32))
    return jnp.stack(ks).reshape(-1)  # [NU*2]


def pt_megakernel(
    scene,
    o,  # Vec3 of [B]
    d,  # Vec3 of [B]
    ray_ids,  # [B] int32; negative = inactive lane
    key,
    depth: int,
    uniforms=None,  # optional [depth*NU, B] f32 (testing)
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
):
    """Returns (rad_x, rad_y, rad_z each [B], rays_traced scalar f32,
    extra f32[4] = (node_visits, aabb_hits, tri_tests, tri_hits) — the
    reference's BvhStats analogs counted IN-KERNEL, src/core/stats.h)."""
    B = o.x.shape[0]
    # small batches (tests, tails) need no giant tile padding
    tile_rows = max(1, min(tile_rows, -(-B // LANES)))
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    G = Bp // tile

    def prep(x, fill=0.0):
        pad = Bp - B
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    n_vols = scene.num_volumes
    nu_eff = NU + n_vols
    meta, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(key, nu_eff)
    clustered = use_clusters(scene)

    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    ins = [
        prep(o.x), prep(o.y), prep(o.z),
        prep(d.x), prep(d.y), prep(d.z),
        prep(ray_ids, fill=-1),
    ]
    in_specs = [block] * 7
    scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat]
    scratch_shapes = []
    if clustered:
        from bpt_tpu.ops.pallas import clusters as cl

        n_c, cl_aabb, tri_hbm = cl.pack_clusters_rolled(scene)
        meta = meta.at[5].set(n_c)
        scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb,
                   cl.cluster_orders(scene, n_c)]
        ins.append(tri_hbm)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        scratch_shapes = [
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 9
    else:
        scratch_shapes = [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2
    if n_vols:
        scalars = scalars + list(_pack_vol_tables(scene))
    with_buffer = uniforms is not None
    if with_buffer:
        nslots = depth * nu_eff
        upad = jnp.zeros((nslots, Bp), uniforms.dtype).at[:, :B].set(uniforms)
        ins.append(upad.reshape(nslots, Bp // LANES, LANES))
        in_specs.append(
            pl.BlockSpec((nslots, tile_rows, LANES), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM)
        )

    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    st_block = pl.BlockSpec((8, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32)
    rr, rg, rb, rays, st = pl.pallas_call(
        make_pt_kernel(depth, with_buffer, clustered, n_vols=n_vols,
                       mat_classes=(scene.has_delta_mats,
                                    scene.has_iso_mats)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(G,),
            in_specs=in_specs,
            out_specs=[block, block, block, block, st_block],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[fshape, fshape, fshape, fshape, st_shape],
        interpret=interpret,
    )(*scalars, *ins)
    return (
        rr.reshape(Bp)[:B],
        rg.reshape(Bp)[:B],
        rb.reshape(Bp)[:B],
        jnp.sum(rays),
        jnp.sum(st.reshape(G, 8, LANES)[:, :4, :], axis=(0, 2)),
    )


def _subkeys_with_raygen(key, nu: int = NU):
    """Slot subkeys + two jitter rows (stream 0, matching the render
    driver's STREAM_RAYGEN fold)."""
    ks = [_subkeys(jax.random.fold_in(key, 1), nu)]  # STREAM_PT
    kg = jax.random.fold_in(key, 0)

    def kd(k):
        return (k if k.dtype == jnp.uint32 else jax.random.key_data(k)).astype(
            jnp.uint32
        )

    ks.append(kd(jax.random.fold_in(kg, 0)))
    ks.append(kd(jax.random.fold_in(kg, 1)))
    return jnp.concatenate([ks[0], ks[1], ks[2]])


def camera_table(cc) -> jnp.ndarray:
    """CameraConstants -> [13] f32 SMEM table (pixel00, du, dv, center,
    recip_sqrt_spp)."""
    return jnp.concatenate(
        [
            cc.pixel00.astype(jnp.float32),
            cc.du.astype(jnp.float32),
            cc.dv.astype(jnp.float32),
            cc.center.astype(jnp.float32),
            jnp.array([1.0 / cc.sqrt_spp], jnp.float32),
        ]
    )


def pt_megakernel_pixels(
    scene,
    i,  # [B] f32 pixel x
    j,  # [B] f32 pixel y
    sx,  # [B] f32 stratum x (ignored when spp_loop > 1)
    sy,  # [B] f32 stratum y (ignored when spp_loop > 1)
    ray_ids,  # [B] int32; negative = inactive. spp_loop == 1: absolute
    #           sample id (pix*spp+s); spp_loop > 1: PIXEL id
    cam16,  # [13] f32 from camera_table()
    key,  # base render key (streams 0/1 fold internally)
    depth: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    spp_loop: int = 1,
    sqrt_spp: int = 1,
):
    """Fully-fused PT: in-kernel ray generation + trace; spp_loop > 1 runs
    every sample stratum inside the kernel (one launch per pixel chunk).
    Returns (rad_x, rad_y, rad_z [B], rays_traced, extra f32[4] =
    (node_visits, aabb_hits, tri_tests, tri_hits) counted in-kernel)."""
    B = i.shape[0]
    tile_rows = max(1, min(tile_rows, -(-B // LANES)))
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    G = Bp // tile
    i, j, sx, sy = (jnp.asarray(x, jnp.float32) for x in (i, j, sx, sy))
    ray_ids = jnp.asarray(ray_ids, jnp.int32)
    cam16 = jnp.asarray(cam16, jnp.float32)

    def prep(x, fill=0.0):
        pad = Bp - B
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    n_vols = scene.num_volumes
    nu_eff = NU + n_vols
    meta, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    meta = meta.at[3].set(sqrt_spp)
    keys_flat = _subkeys_with_raygen(key, nu_eff)
    clustered = use_clusters(scene)

    block = pl.BlockSpec((tile_rows, LANES), lambda i_, *_: (i_, 0),
                         memory_space=pltpu.VMEM)
    ins = [prep(i), prep(j), prep(sx), prep(sy), prep(ray_ids, fill=-1)]
    in_specs = [block] * 5
    scratch_shapes = []
    cl_aabb = jnp.zeros((6,), jnp.float32)
    order_t = jnp.zeros((8,), jnp.int32)
    if clustered:
        from bpt_tpu.ops.pallas import clusters as cl

        n_c, cl_aabb, tri_hbm = cl.pack_clusters_rolled(scene)
        order_t = cl.cluster_orders(scene, n_c)
        meta = meta.at[5].set(n_c)
        ins.append(tri_hbm)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        scratch_shapes = [
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 9
    else:
        scratch_shapes = [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2
    scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb, order_t,
               cam16]
    if n_vols:
        scalars = scalars + list(_pack_vol_tables(scene))

    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    st_block = pl.BlockSpec((8, LANES), lambda i_, *_: (i_, 0),
                            memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32)
    rr, rg, rb, rays, st = pl.pallas_call(
        make_pt_kernel(depth, False, clustered, with_raygen=True,
                       spp_loop=spp_loop, n_vols=n_vols,
                       mat_classes=(scene.has_delta_mats,
                                    scene.has_iso_mats)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(G,),
            in_specs=in_specs,
            out_specs=[block, block, block, block, st_block],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[fshape, fshape, fshape, fshape, st_shape],
        interpret=interpret,
    )(*scalars, *ins)
    return (
        rr.reshape(Bp)[:B],
        rg.reshape(Bp)[:B],
        rb.reshape(Bp)[:B],
        jnp.sum(rays),
        jnp.sum(st.reshape(G, 8, LANES)[:, :4, :], axis=(0, 2)),
    )
