"""Fused BDPT megakernel.

bidirectional_color (src/camera.h:294-475) as ONE Pallas kernel per ray
tile: camera-subpath trace, light-subpath build + trace, and the all-pairs
connection double loop — with both vertex SoAs held in VMEM scratch, so the
only HBM traffic is primary rays in / radiance out.  Scene tables live in
SMEM (scalar prefetch), RNG is in-kernel threefry2x32 (see pt_kernel).

Per-slot vertex record (14 floats): p(3) n(3) thr(3) emit(3) mat(1)
flags(1: 1=valid, +2=delta, +4=is_light).  wi and u,v are NOT stored: the
reference's evaluate_bsdf ignores directions entirely (material.h:35-37,
60-63) and the megakernel excludes textured scenes, so connections never
need them.

Uniform layout (matching models.bdpt slot order):
  [0, D*NT)                camera trace, D bounces x NT
  [D*NT, D*NT+NLS)         light start (pick, bu, bv, d1, d2)
  [D*NT+NLS, ...)          light trace, (D-1) bounces x NT
Tests inject this as an explicit buffer; the fast path derives it from
per-(section,bounce,slot) subkeys + ray ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN
from bpt_tpu.ops.pallas.pt_kernel import (
    LANES,
    LGT_STRIDE,
    MAT_STRIDE,
    MAX_LIGHTS,
    MAX_MATS,
    MAX_TRIS,
    M_DIEL,
    M_ISO,
    M_LAM,
    M_LIGHT,
    M_METAL,
    PI,
    TRI_STRIDE,
    VOLM_STRIDE,
    _bits_to_unit_float,
    _normalize_safe,
    _pack_tables,
    _pack_vol_tables,
    _threefry2x32,
    _vol_closest_smem,
    megakernel_ok,
)

DEF_TILE_ROWS = 64  # tile sweep (cornell bench): 8:66, 16:108, 32:132,
# 64:162 Mrays/s; 128 fails to compile in reasonable time (VMEM-scale
# vertex SoAs).  Two depth*14-row vertex SoAs at 64 rows = 11.5 MB VMEM
# at depth 10.

# trace slots (models.bdpt)
TU_B1, TU_B2, TU_DIEL, TU_FZ1, TU_FZ2 = range(5)
NT = 5
LS_PICK, LS_U, LS_V, LS_D1, LS_D2 = range(5)
NLS = 5

VTX_STRIDE = 14
VTX_STRIDE_MIS = 16  # + pfwd (14), rat2 (15) — models.bdpt MisInfo in-SoA
F_VALID = 1.0
F_DELTA = 2.0
F_LIGHT = 4.0
F_MISCUT = 8.0  # MisInfo.valid: strategy cut at this vertex is connectable

SHADOW_EPS_REL = 1e-4  # see models.bdpt


def _clamp_rows_for_depth(tile_rows: int, depth: int,
                          stride: int = VTX_STRIDE) -> int:
    """Depth-aware VMEM clamp: the two vertex SoAs cost
    2 * depth * stride * rows * 128 * 4 B of scratch (~0.9 MB per
    unit of depth at 64 rows).  The 64-row sweep winner was measured at
    depth 10; at north-star depth 80 it would ask for 73 MB and fail to
    compile.  Budget ~12 MB, rows in multiples of 8."""
    budget = 12 << 20
    per_row = 2 * stride * LANES * 4 * max(1, depth)
    rows = max(8, (budget // per_row) // 8 * 8)
    return max(1, min(tile_rows, rows))


def n_uniform_slots(depth: int, n_vols: int = 0) -> int:
    """Trace bounces consume NT + n_vols slots each (the per-volume
    free-flight draws sit at NT..NT+V-1, models.bdpt nt_total)."""
    ntv = NT + n_vols
    return depth * ntv + NLS + max(depth - 1, 0) * ntv


def _bdpt_kernel_impl(depth, with_buffer, clustered, with_raygen, spp_loop,
                      mat_classes, mis, n_vols, *refs):
    has_delta, has_iso = mat_classes
    stride = VTX_STRIDE_MIS if mis else VTX_STRIDE
    NTV = NT + n_vols
    nsc = 8 if with_raygen else 7 if clustered else 5
    if with_raygen:
        (meta, tri_f, mat_f, lgt_f, keys_u, cl_aabb, order_t, cam_f) = refs[:8]
    elif clustered:
        (meta, tri_f, mat_f, lgt_f, keys_u, cl_aabb, order_t) = refs[:7]
    else:
        (meta, tri_f, mat_f, lgt_f, keys_u) = refs[:5]
        order_t = None
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
        (rr, rg, rb, rays_out, shadow_out, st_out,
         cam_vtx, lgt_vtx, _gate_unused,
         cl_smem, cl_smem2, cl_sem, cl_sem2,
         t_s, m_s, nx_s, ny_s, nz_s, found_s,
         nv_s, ah_s, tt_s, th_s) = ins
    else:
        (rr, rg, rb, rays_out, shadow_out, st_out,
         cam_vtx, lgt_vtx, found_s, tt_s, th_s) = ins
        nv_s = ah_s = None
    shape = rid.shape
    T = meta[0]
    M = meta[1]
    L = meta[2]

    _ridu_cell = [rid[:].astype(jnp.uint32)]
    zf = jnp.zeros(shape, jnp.float32)
    inff = jnp.full(shape, jnp.inf, jnp.float32)

    def draw(slot):
        """slot: global uniform slot index (traced)."""
        if with_buffer:
            return ubuf[slot]
        ru = _ridu_cell[0]
        k1 = keys_u[slot * 2]
        k2 = keys_u[slot * 2 + 1]
        bits, _ = _threefry2x32(k1, k2, ru, jnp.zeros_like(ru))
        return _bits_to_unit_float(bits)

    def mat_param(mat_id, offset):
        def body(m, acc):
            return jnp.where(mat_id == m, mat_f[m * MAT_STRIDE + offset], acc)

        return jax.lax.fori_loop(0, M, body, zf)

    # traversal-counter accumulators (reference BvhStats analogs,
    # src/core/stats.h:8-16); zeroed per grid step, reduced into st_out
    zst = jnp.zeros(shape, jnp.float32)
    tt_s[:] = zst
    th_s[:] = zst
    if clustered:
        from bpt_tpu.ops.pallas.clusters import (
            make_clustered_closest,
            make_rolled_any_hit,
        )

        nv_s[:] = zst
        ah_s[:] = zst
        _cl_isect = make_clustered_closest(
            meta, cl_aabb, tri_hbm, (cl_smem, cl_smem2),
            (cl_sem, cl_sem2),
            (t_s, m_s, nx_s, ny_s, nz_s), shape, order_tab=order_t,
            stat_refs=(nv_s, ah_s, tt_s),
        )
        _cl_any = make_rolled_any_hit(
            meta, cl_aabb, tri_hbm, cl_smem, cl_sem, found_s, shape,
            stat_refs=(nv_s, ah_s, tt_s),
        )

    def _intersect_smem(cox, coy, coz, cdx, cdy, cdz):
        """Closest hit; returns t (inf miss), mat_id, geometric normal."""

        def isect(ti, carry):
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
            return (
                jnp.where(ok, t, t_best),
                jnp.where(ok, mid, mat_b),
                jnp.where(ok, nx, nx_b),
                jnp.where(ok, ny, ny_b),
                jnp.where(ok, nz, nz_b),
            )

        return jax.lax.fori_loop(
            0, T, isect, (inff, jnp.full(shape, -1.0, jnp.float32), zf, zf, zf)
        )

    def intersect(cox, coy, coz, cdx, cdy, cdz, active):
        if clustered:
            res = _cl_isect(cox, coy, coz, cdx, cdy, cdz, active)
        else:
            # SMEM brute sweep: T tests per alive lane
            tt_s[:] = tt_s[:] + (active.astype(jnp.float32)
                                 * T.astype(jnp.float32))
            res = _intersect_smem(cox, coy, coz, cdx, cdy, cdz)
        # surface closest-hits, counted BEFORE any volume override
        # (matches ops/soa.py tri_hits / reference stats.h:14)
        th_s[:] = th_s[:] + (active & (res[0] < jnp.inf)).astype(jnp.float32)
        return res

    def _any_hit_smem(sox, soy, soz, sdx, sdy, sdz, tmax):
        def isect(ti, found):
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
            px = sdy * e2z - sdz * e2y
            py = sdz * e2x - sdx * e2z
            pz = sdx * e2y - sdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / det
            tx = sox - v0x
            ty = soy - v0y
            tz = soz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (sdx * qx + sdy * qy + sdz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = (
                (jnp.abs(det) >= MT_EPSILON)
                & (u >= 0.0) & (u <= 1.0)
                & (v >= 0.0) & (u + v <= 1.0)
                & (t >= T_MIN) & (t <= tmax)
            )
            return jnp.where(ok, 1.0, found)

        # tile-gate: most (s,t) connection pairs are all-dead in a tile
        # (subpaths are short, slots empty), and the T-triangle occlusion
        # loop is the dominant BDPT cost — skip it whole-tile
        found_s[:] = zf

        @pl.when(jnp.any(tmax > 0.0))
        def _():
            found_s[:] = jax.lax.fori_loop(0, T, isect, zf)

        return found_s[:] > 0.5

    def any_hit(sox, soy, soz, sdx, sdy, sdz, tmax):
        if clustered:
            return _cl_any(sox, soy, soz, sdx, sdy, sdz, tmax)
        # occlusion sweep: T tests per live (tmax>0) lane
        tt_s[:] = tt_s[:] + ((tmax > 0.0).astype(jnp.float32)
                             * T.astype(jnp.float32))
        return _any_hit_smem(sox, soy, soz, sdx, sdy, sdz, tmax)

    def store_vtx(ref, b, px, py, pz, nx, ny, nz, tr, tg, tb, er, eg, eb,
                  mat_fl, flags):
        base = b * stride
        ref[base + 0] = px
        ref[base + 1] = py
        ref[base + 2] = pz
        ref[base + 3] = nx
        ref[base + 4] = ny
        ref[base + 5] = nz
        ref[base + 6] = tr
        ref[base + 7] = tg
        ref[base + 8] = tb
        ref[base + 9] = er
        ref[base + 10] = eg
        ref[base + 11] = eb
        ref[base + 12] = mat_fl
        ref[base + 13] = flags

    def _remap0(x):
        """Veach remap: pdf 0 (delta) contributes ratio factor 1."""
        return jnp.where(x > 0.0, x, 1.0)

    def bsdf_pdf(mtf, nx_, ny_, nz_, dx_, dy_, dz_):
        """shade_soa.bsdf_pdf_value for a UNIT direction: iso -> 1/4pi,
        else max(0, cos)/pi (covers lambertian and the emitter's cos/pi
        exit pdf; delta callers mask to 0 outside)."""
        cp = jnp.maximum(0.0, (dx_ * nx_ + dy_ * ny_ + dz_ * nz_) / PI)
        if has_iso:
            return jnp.where(mtf == float(M_ISO), 1.0 / (4.0 * PI), cp)
        return cp

    def mis_suffix_sum(vtx, m, thr):
        """Sum_{i=thr..m} MisInfo.valid[i] * prod_{q=i+1..m} rat2[q] —
        the junction-independent strategy-table row sum
        (models.bdpt.mis_strategy_table), computed by one backward
        product scan over the lane's own (prefix-contiguous) slots.
        m, thr are scalars; returns [shape] f32."""
        def body(step, carry):
            s_, prod = carry
            i = m - step
            base = i * stride
            fl = vtx[base + 13]
            vcut = jnp.where((fl % 16.0) >= F_MISCUT, 1.0, 0.0)
            take = jnp.where(i >= thr, 1.0, 0.0)  # scalar realizability
            s_ = s_ + vcut * prod * take
            prod = prod * vtx[base + 15]
            return (s_, prod)

        s_, _ = jax.lax.fori_loop(
            0, m + 1, body, (zf, jnp.ones(shape, jnp.float32)))
        return s_

    def trace(vtx_ref, steps, slot0, o0, d0, thr0, alive0, collect_bg,
              ar, ag, ab, rays_cnt, store_off=0, mis_prev0=None):
        """trace_path (camera.h:325-370): store up to ``steps`` vertices
        at slots store_off..store_off+steps-1.  ``mis_prev0`` (when mis):
        (pnx, pny, pnz, pdelta_f, pmtype_f, ppfwd) describing the vertex
        preceding the first traced one (models.bdpt.trace_subpath's
        mis_prev); the previous POSITION is the ray origin carry."""
        bgr = lgt_f[MAX_LIGHTS * LGT_STRIDE + 0]
        bgg = lgt_f[MAX_LIGHTS * LGT_STRIDE + 1]
        bgb = lgt_f[MAX_LIGHTS * LGT_STRIDE + 2]

        def body(b, st):
            (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb, alive_f,
             ar, ag, ab, rays_cnt, mprev) = st
            alive = alive_f > 0.5
            rays_cnt = rays_cnt + alive_f

            t_hit, mat_fl, gnx, gny, gnz = intersect(
                cox, coy, coz, cdx, cdy, cdz, alive
            )
            if n_vols:
                # constant_medium override (soa.apply_volumes semantics,
                # same block as pt_kernel.make_bounce): per-volume
                # free-flight draws at slots NT..NT+V-1 of this bounce
                vt_count = meta[7]
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
                        jnp.maximum(draw(slot0 + b * NTV + NT + v), 1e-37))
                    ok = ok & (hd <= dist_inside)
                    tv = tt1 + hd / d_len
                    t_cur = jnp.where(ok, tv, t_cur)
                    vhit = jnp.where(ok, 1.0, vhit)
                    vmat = jnp.where(ok, volm_f[v * VOLM_STRIDE + 1], vmat)
                took_vol = vhit > 0.5
                t_hit = jnp.where(took_vol, t_cur, t_hit)
                mat_fl = jnp.where(took_vol, vmat, mat_fl)
                # reference's arbitrary volume normal (1,0,0), front=true
                # (constant_medium.h:48-49): align AGAINST the ray so the
                # front-flip below yields front; all downstream normal
                # uses for volume vertices are abs() or iso-guarded, so
                # the sign never reaches the radiance
                gnx = jnp.where(took_vol,
                                jnp.where(cdx < 0.0, 1.0, -1.0), gnx)
                gny = jnp.where(took_vol, 0.0, gny)
                gnz = jnp.where(took_vol, 0.0, gnz)
            hit = t_hit < jnp.inf
            mat_id = mat_fl.astype(jnp.int32)

            if collect_bg:
                miss = alive & ~hit
                ar = ar + jnp.where(miss, tr * bgr, 0.0)
                ag = ag + jnp.where(miss, tg * bgg, 0.0)
                ab = ab + jnp.where(miss, tb * bgb, 0.0)

            front = (cdx * gnx + cdy * gny + cdz * gnz) < 0.0
            fsign = jnp.where(front, 1.0, -1.0)
            nx = gnx * fsign
            ny = gny * fsign
            nz = gnz * fsign
            tsafe = jnp.where(hit, t_hit, 0.0)
            px_ = cox + tsafe * cdx
            py_ = coy + tsafe * cdy
            pz_ = coz + tsafe * cdz

            valid_v = alive & hit
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

            emit_on = is_light & front
            er = jnp.where(emit_on, alb_r, 0.0)
            eg = jnp.where(emit_on, alb_g, 0.0)
            eb = jnp.where(emit_on, alb_b, 0.0)

            flags = jnp.where(valid_v, F_VALID, 0.0)
            flags = flags + jnp.where(valid_v & delta, F_DELTA, 0.0)
            flags = flags + jnp.where(valid_v & is_light, F_LIGHT, 0.0)

            if mis:
                # per-vertex forward/reverse area-pdf bookkeeping
                # (models.bdpt.trace_subpath mis branch): the scattering
                # pdfs in this material set are incoming-independent, so
                # reverse pdfs are fixed at trace time
                (pnx, pny, pnz, pdelta_f, pmtype_f, ppfwd) = mprev
                segx = px_ - cox
                segy = py_ - coy
                segz = pz_ - coz
                d2m = jnp.maximum(
                    segx * segx + segy * segy + segz * segz, 1e-30)
                dinv = 1.0 / jnp.sqrt(d2m)
                dmx = segx * dinv
                dmy = segy * dinv
                dmz = segz * dinv
                cos_cur = jnp.abs(dmx * nx + dmy * ny + dmz * nz)
                cos_prev = jnp.abs(dmx * pnx + dmy * pny + dmz * pnz)
                pdf_sa_f = jnp.where(
                    pdelta_f > 0.5, 0.0,
                    bsdf_pdf(pmtype_f, pnx, pny, pnz, dmx, dmy, dmz))
                pfwd_cur = pdf_sa_f * cos_cur / d2m
                prev_rev = jnp.where(
                    delta, 1.0,
                    bsdf_pdf(mtype, nx, ny, nz, -dmx, -dmy, -dmz)
                    * cos_prev / d2m)
                rat = prev_rev / _remap0(ppfwd)
                base_m = (b + store_off) * stride
                vtx_ref[base_m + 14] = jnp.where(valid_v, pfwd_cur, 0.0)
                vtx_ref[base_m + 15] = jnp.where(valid_v, rat * rat, 0.0)
                flags = flags + jnp.where(
                    valid_v & ~delta & (pdelta_f < 0.5), F_MISCUT, 0.0)
                mprev = (
                    jnp.where(valid_v, nx, pnx),
                    jnp.where(valid_v, ny, pny),
                    jnp.where(valid_v, nz, pnz),
                    jnp.where(valid_v, delta.astype(jnp.float32), pdelta_f),
                    jnp.where(valid_v, mtype, pmtype_f),
                    jnp.where(valid_v, pfwd_cur, ppfwd),
                )
            store_vtx(vtx_ref, b + store_off, px_, py_, pz_, nx, ny, nz,
                      tr, tg, tb, er, eg, eb, mat_fl, flags)

            if has_delta:
                at_r = jnp.where(is_diel, 1.0, alb_r)
                at_g = jnp.where(is_diel, 1.0, alb_g)
                at_b = jnp.where(is_diel, 1.0, alb_b)
            else:
                at_r, at_g, at_b = alb_r, alb_g, alb_b

            u_b1 = draw(slot0 + b * NTV + TU_B1)
            u_b2 = draw(slot0 + b * NTV + TU_B2)

            if has_delta:
                u_dl = draw(slot0 + b * NTV + TU_DIEL)
                u_f1 = draw(slot0 + b * NTV + TU_FZ1)
                u_f2 = draw(slot0 + b * NTV + TU_FZ2)

                # delta continuation
                dn = cdx * nx + cdy * ny + cdz * nz
                rfx, rfy, rfz = _normalize_safe(
                    cdx - 2.0 * dn * nx, cdy - 2.0 * dn * ny,
                    cdz - 2.0 * dn * nz
                )
                sz = 1.0 - 2.0 * u_f1
                sr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sz * sz))
                sphi = 2.0 * PI * u_f2
                metal_x = rfx + fuzz * sr * jnp.cos(sphi)
                metal_y = rfy + fuzz * sr * jnp.sin(sphi)
                metal_z = rfz + fuzz * sz
                ri = jnp.where(front, 1.0 / ior, ior)
                udx, udy, udz = _normalize_safe(cdx, cdy, cdz)
                cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                r0 = (1.0 - ri) / (1.0 + ri)
                r0 = r0 * r0
                omc = 1.0 - cos_t
                schl = r0 + (1.0 - r0) * omc * omc * omc * omc * omc
                do_refl = (ri * sin_t > 1.0) | (schl > u_dl)
                udn = udx * nx + udy * ny + udz * nz
                rux = udx - 2.0 * udn * nx
                ruy = udy - 2.0 * udn * ny
                ruz = udz - 2.0 * udn * nz
                perp_x = ri * (udx + cos_t * nx)
                perp_y = ri * (udy + cos_t * ny)
                perp_z = ri * (udz + cos_t * nz)
                par = -jnp.sqrt(jnp.abs(
                    1.0 - (perp_x * perp_x + perp_y * perp_y
                           + perp_z * perp_z)))
                diel_x = jnp.where(do_refl, rux, perp_x + par * nx)
                diel_y = jnp.where(do_refl, ruy, perp_y + par * ny)
                diel_z = jnp.where(do_refl, ruz, perp_z + par * nz)
                ddx = jnp.where(is_metal, metal_x, diel_x)
                ddy = jnp.where(is_metal, metal_y, diel_y)
                ddz = jnp.where(is_metal, metal_z, diel_z)
            else:
                ddx = ddy = ddz = zf

            # bsdf-pdf sampling (camera.h:361-368)
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

            nbx, nby, nbz = _normalize_safe(bsx, bsy, bsz)
            cos_nd = nbx * nx + nby * ny + nbz * nz
            cos_pdf = jnp.maximum(0.0, cos_nd / PI)
            pdf_val = (jnp.where(is_iso, 1.0 / (4.0 * PI), cos_pdf)
                       if has_iso else cos_pdf)
            lamp = jnp.where(cos_nd < 0.0, 0.0, cos_nd / PI)
            scat_pdf = jnp.where(is_lam, lamp, 0.0)
            if has_iso:
                scat_pdf = jnp.where(is_iso, 1.0 / (4.0 * PI), scat_pdf)

            can_scatter = ~is_light
            delta_ok = valid_v & can_scatter & delta
            diff_ok = valid_v & can_scatter & ~delta & (pdf_val > 0.0)
            w = jnp.where(pdf_val > 0.0,
                          scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)

            tr = jnp.where(delta_ok, tr * at_r, jnp.where(diff_ok, tr * at_r * w, tr))
            tg = jnp.where(delta_ok, tg * at_g, jnp.where(diff_ok, tg * at_g * w, tg))
            tb = jnp.where(delta_ok, tb * at_b, jnp.where(diff_ok, tb * at_b * w, tb))
            alive_new = delta_ok | diff_ok
            cox = jnp.where(alive_new, px_, cox)
            coy = jnp.where(alive_new, py_, coy)
            coz = jnp.where(alive_new, pz_, coz)
            cdx = jnp.where(alive_new, jnp.where(delta_ok, ddx, bsx), cdx)
            cdy = jnp.where(alive_new, jnp.where(delta_ok, ddy, bsy), cdy)
            cdz = jnp.where(alive_new, jnp.where(delta_ok, ddz, bsz), cdz)
            return (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb,
                    alive_new.astype(jnp.float32), ar, ag, ab, rays_cnt,
                    mprev)

        mprev0 = mis_prev0 if mis else ()
        st = (o0[0], o0[1], o0[2], d0[0], d0[1], d0[2],
              thr0[0], thr0[1], thr0[2], alive0, ar, ag, ab, rays_cnt,
              mprev0)
        # early exit once every lane terminated (bitwise identical: a
        # bounce over an all-dead state is a no-op)
        _, st = jax.lax.while_loop(
            lambda c: (c[0] < steps) & (jnp.max(c[1][9]) > 0.5),
            lambda c: (c[0] + 1, body(c[0], c[1])),
            (jnp.int32(0), st))
        return st[10], st[11], st[12], st[13]

    # -------- clear vertex scratch (invalid slots must read as flags=0)
    def clear(b, _):
        store_vtx(cam_vtx, b, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf,
                  zf, zf)
        store_vtx(lgt_vtx, b, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf, zf,
                  zf, zf)
        if mis:
            for ref in (cam_vtx, lgt_vtx):
                ref[b * stride + 14] = zf
                ref[b * stride + 15] = zf
        return 0

    def bdpt_sample(o0, d0, active_f):
        jax.lax.fori_loop(0, depth, clear, 0)

        of = jnp.ones(shape, jnp.float32)

        # -------- camera subpath
        cam_prev0 = None
        if mis:
            # models.bdpt.bdpt_radiance mis_prev_cam: the camera "vertex"
            # is delta (pfwd 0 -> remap 1), its normal is the unit ray dir
            pdx, pdy, pdz = _normalize_safe(d0[0], d0[1], d0[2])
            cam_prev0 = (pdx, pdy, pdz, of, zf, of)  # n, delta=1, mt=0, pfwd=1
        ar, ag, ab, rays_cnt = trace(
            cam_vtx, depth, 0,
            o0, d0,
            (of, of, of), active_f, True, zf, zf, zf, zf,
            mis_prev0=cam_prev0,
        )
        rays_cnt = rays_cnt  # background + per-vertex emission accumulated below

        total_area = lgt_f[MAX_LIGHTS * LGT_STRIDE + 3]

        # -------- camera-vertex emission (camera.h:305-309); under MIS
        # the (s=0, t) strategy gets its power-heuristic weight
        # (models.bdpt.bdpt_radiance emission block)
        def emit_sum(b, acc):
            ar, ag, ab = acc
            base = b * stride
            flags = cam_vtx[base + 13]
            valid = (flags % 2.0) >= 1.0
            delta = (flags % 4.0) >= 2.0
            ok = valid & ~delta
            if mis:
                inv_area = jnp.where(
                    total_area > 0.0,
                    1.0 / jnp.maximum(total_area, 1e-30), 0.0)
                r_em = inv_area / _remap0(cam_vtx[base + 14])
                sums = mis_suffix_sum(cam_vtx, b, 0)  # k=b+1<=D: no clamp
                w_em = 1.0 / (1.0 + r_em * r_em * sums)
            else:
                w_em = 1.0
            ar = ar + jnp.where(
                ok, w_em * cam_vtx[base + 6] * cam_vtx[base + 9], 0.0)
            ag = ag + jnp.where(
                ok, w_em * cam_vtx[base + 7] * cam_vtx[base + 10], 0.0)
            ab = ab + jnp.where(
                ok, w_em * cam_vtx[base + 8] * cam_vtx[base + 11], 0.0)
            return (ar, ag, ab)

        ar, ag, ab = jax.lax.fori_loop(0, depth, emit_sum, (ar, ag, ab))

        # -------- light subpath start (camera.h:372-418)
        ls0 = depth * NTV
        u_pick = draw(ls0 + LS_PICK)
        u_lu = draw(ls0 + LS_U)
        u_lv = draw(ls0 + LS_V)
        u_d1 = draw(ls0 + LS_D1)
        u_d2 = draw(ls0 + LS_D2)

        total_area = lgt_f[MAX_LIGHTS * LGT_STRIDE + 3]
        pick = u_pick * total_area

        # CDF scan (reference linear scan, triangle.h:210-219)
        def cdf_body(li, carry):
            accum, idx_found = carry
            accum = accum + lgt_f[li * LGT_STRIDE + 12]
            take = (pick <= accum) & (idx_found < 0.0) & (li < L)
            idx_found = jnp.where(take, li.astype(jnp.float32), idx_found)
            return (accum, idx_found)

        _, lidx_f = jax.lax.fori_loop(0, L, cdf_body, (zf, jnp.full(shape, -1.0, jnp.float32)))
        # not found (fp rounding made the cdf sum < pick) -> last light, like
        # the reference's &tris.back() default (triangle.h:211)
        lidx_f = jnp.where(lidx_f < 0.0, (L - 1).astype(jnp.float32), lidx_f)
        lidx = jnp.clip(lidx_f.astype(jnp.int32), 0, L - 1)

        def lparam(off):
            def body(li, acc):
                return jnp.where(lidx == li, lgt_f[li * LGT_STRIDE + off], acc)

            return jax.lax.fori_loop(0, L, body, zf)

        flip = (u_lu + u_lv) > 1.0
        bu = jnp.where(flip, 1.0 - u_lu, u_lu)
        bv = jnp.where(flip, 1.0 - u_lv, u_lv)
        spx = lparam(0) + bu * lparam(3) + bv * lparam(6)
        spy = lparam(1) + bu * lparam(4) + bv * lparam(7)
        spz = lparam(2) + bu * lparam(5) + bv * lparam(8)
        snx = lparam(9)
        sny = lparam(10)
        snz = lparam(11)

        # light material ids live in a tail section of the light table
        # (packed by _pack_tables_bdpt): lgt_f[MAX_LIGHTS*LGT_STRIDE + 4 + li]
        def lmat_body(li, acc):
            return jnp.where(
                lidx == li, lgt_f[MAX_LIGHTS * LGT_STRIDE + 4 + li], acc
            )

        smat_f = jax.lax.fori_loop(0, L, lmat_body, zf)
        smat = smat_f.astype(jnp.int32)

        # emitter emission (front_face forced true)
        em_r = mat_param(smat, 1)
        em_g = mat_param(smat, 2)
        em_b = mat_param(smat, 3)
        em_type = mat_param(smat, 0)
        is_emitter = em_type == float(M_LIGHT)
        em_r = jnp.where(is_emitter, em_r, 0.0)
        em_g = jnp.where(is_emitter, em_g, 0.0)
        em_b = jnp.where(is_emitter, em_b, 0.0)

        path_ok = (
            (active_f > 0.5)
            & (total_area > 0.0)
            & ((em_r * em_r + em_g * em_g + em_b * em_b) > 0.0)
        )

        # reference: throughput = 1 / max(pdf, 1e-8), pdf = 1/total_area
        thr0 = 1.0 / jnp.maximum(jnp.where(total_area > 0.0, 1.0 / total_area, 0.0),
                                 1e-8)

        # area pdf of the emitter sample (sample_surface: 1/total_area)
        pdf0 = jnp.where(total_area > 0.0,
                         1.0 / jnp.maximum(total_area, 1e-30), 0.0) * of
        flags0 = jnp.where(path_ok, F_VALID + F_LIGHT, 0.0)
        if mis:
            # emitter slot MisInfo (models.bdpt.build_light_subpath):
            # pfwd = area pdf, rat2 unused, cut always connectable
            lgt_vtx[14] = pdf0
            lgt_vtx[15] = zf
            flags0 = flags0 + F_MISCUT
        store_vtx(lgt_vtx, 0, spx, spy, spz, snx, sny, snz,
                  thr0 * of, thr0 * of, thr0 * of, em_r, em_g, em_b,
                  smat.astype(jnp.float32), flags0)

        # cosine exit direction
        wx, wy, wz = _normalize_safe(snx, sny, snz)
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
        cphi = 2.0 * PI * u_d1
        csq = jnp.sqrt(u_d2)
        clx = jnp.cos(cphi) * csq
        cly = jnp.sin(cphi) * csq
        clz = jnp.sqrt(1.0 - u_d2)
        ldx, ldy, ldz = _normalize_safe(
            clx * ux_ + cly * vx_ + clz * wx,
            clx * uy_ + cly * vy_ + clz * wy,
            clx * uz_ + cly * vz_ + clz * wz,
        )
        cos_theta = jnp.maximum(0.0, snx * ldx + sny * ldy + snz * ldz)
        exit_ok = path_ok & (cos_theta > 0.0)
        pdf_dir = jnp.maximum(cos_theta / PI, 1e-8)
        scale = cos_theta / pdf_dir
        lt_r = thr0 * em_r * scale
        lt_g = thr0 * em_g * scale
        lt_b = thr0 * em_b * scale
        lox = spx + 0.001 * snx
        loy = spy + 0.001 * sny
        loz = spz + 0.001 * snz

        # -------- light subpath continuation into slots 1..depth-1
        # (same trace as the camera subpath; the reference duplicates the
        # loop only because of C++ call shape, camera.h:416)
        lgt_prev0 = None
        if mis:
            # models.bdpt.build_light_subpath mis_prev: emitter vertex is
            # the previous one — non-delta, MAT_LIGHT (cos/pi exit pdf),
            # pfwd = emitter area pdf
            lgt_prev0 = (snx, sny, snz, zf,
                         jnp.full(shape, float(M_LIGHT), jnp.float32), pdf0)
        _, _, _, rays_l = trace(
            lgt_vtx, depth - 1, depth * NTV + NLS,
            (lox, loy, loz), (ldx, ldy, ldz),
            (lt_r, lt_g, lt_b), exit_ok.astype(jnp.float32), False,
            zf, zf, zf, zf, store_off=1, mis_prev0=lgt_prev0,
        )
        rays_cnt = rays_cnt + rays_l

        # -------- connections (camera.h:316-320, 440-475); under MIS each
        # (s, t) pair gets the power-heuristic weight over every strategy
        # of the same path length (models.bdpt.connect_paths mis branch)
        def conn_s(s, acc):
            ar, ag, ab, shadow_cnt = acc
            cbase = s * stride
            cfl = cam_vtx[cbase + 13]
            c_valid = (cfl % 2.0) >= 1.0
            c_delta = (cfl % 4.0) >= 2.0
            cpx = cam_vtx[cbase + 0]
            cpy = cam_vtx[cbase + 1]
            cpz = cam_vtx[cbase + 2]
            cnx = cam_vtx[cbase + 3]
            cny = cam_vtx[cbase + 4]
            cnz = cam_vtx[cbase + 5]
            ctr = cam_vtx[cbase + 6]
            ctg = cam_vtx[cbase + 7]
            ctb = cam_vtx[cbase + 8]
            cmat = cam_vtx[cbase + 12].astype(jnp.int32)
            cmt = mat_param(cmat, 0)
            c_lam = cmt == float(M_LAM)
            c_iso = (cmt == float(M_ISO)) if has_iso \
                else jnp.zeros(shape, jnp.bool_)
            fc_scale = jnp.where(c_lam, 1.0 / PI,
                                 jnp.where(c_iso, 1.0 / (4.0 * PI), 0.0))
            fcr = mat_param(cmat, 1) * fc_scale
            fcg = mat_param(cmat, 2) * fc_scale
            fcb = mat_param(cmat, 3) * fc_scale
            c_ok = c_valid & ~c_delta & ((fcr * fcr + fcg * fcg + fcb * fcb) > 0.0)

            def conn_t(t, acc2):
                ar, ag, ab, shadow_cnt = acc2
                lbase = t * stride
                lfl = lgt_vtx[lbase + 13]
                l_valid = (lfl % 2.0) >= 1.0
                l_delta = (lfl % 4.0) >= 2.0
                l_light = (lfl % 8.0) >= 4.0
                lpx = lgt_vtx[lbase + 0]
                lpy = lgt_vtx[lbase + 1]
                lpz = lgt_vtx[lbase + 2]
                lnx = lgt_vtx[lbase + 3]
                lny = lgt_vtx[lbase + 4]
                lnz = lgt_vtx[lbase + 5]
                ltr = lgt_vtx[lbase + 6]
                ltg = lgt_vtx[lbase + 7]
                ltb = lgt_vtx[lbase + 8]
                ler = lgt_vtx[lbase + 9]
                leg = lgt_vtx[lbase + 10]
                leb = lgt_vtx[lbase + 11]
                lmat = lgt_vtx[lbase + 12].astype(jnp.int32)
                lmt = mat_param(lmat, 0)
                l_lam = lmt == float(M_LAM)
                l_iso = (lmt == float(M_ISO)) if has_iso \
                    else jnp.zeros(shape, jnp.bool_)
                fl_scale = jnp.where(l_lam, 1.0 / PI,
                                     jnp.where(l_iso, 1.0 / (4.0 * PI), 0.0))
                flr_b = mat_param(lmat, 1) * fl_scale
                flg_b = mat_param(lmat, 2) * fl_scale
                flb_b = mat_param(lmat, 3) * fl_scale
                flr = jnp.where(l_light, ler, flr_b)
                flg = jnp.where(l_light, leg, flg_b)
                flb = jnp.where(l_light, leb, flb_b)
                l_ok = l_valid & ~l_delta & ((flr * flr + flg * flg + flb * flb) > 0.0)

                dxx = lpx - cpx
                dyy = lpy - cpy
                dzz = lpz - cpz
                dist2 = dxx * dxx + dyy * dyy + dzz * dzz
                pair = c_ok & l_ok & (dist2 > 0.0)
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
                invd = 1.0 / dist
                dux = dxx * invd
                duy = dyy * invd
                duz = dzz * invd
                sgn_c = cnx * dux + cny * duy + cnz * duz
                sgn_l = -(lnx * dux + lny * duy + lnz * duz)
                cos_c = jnp.abs(sgn_c)
                cos_l = jnp.abs(sgn_l)
                pair = pair & (cos_c > 0.0) & (cos_l > 0.0)
                if mis:
                    # one-sided connections (models.bdpt deviation note):
                    # the reference's abs() cosines transport light through
                    # one-sided lambertian backs — unweightable paths
                    pair = pair & (c_iso | (sgn_c > 0.0))
                    pair = pair & (l_iso | (sgn_l > 0.0))
                max_t = dist - 0.001
                pair = pair & (max_t > 0.0)
                t_vis = max_t * (1.0 - SHADOW_EPS_REL)
                sox = cpx + 0.001 * dux
                soy = cpy + 0.001 * duy
                soz = cpz + 0.001 * duz
                occ = any_hit(sox, soy, soz, dux, duy, duz,
                              jnp.where(pair, t_vis, 0.0))
                pair = pair & ~occ
                g = (cos_c * cos_l) / jnp.maximum(dist2, 1e-30)
                cr = (ctr * fcr) * (ltr * flr) * g
                cg = (ctg * fcg) * (ltg * flg) * g
                cb = (ctb * fcb) * (ltb * flb) * g
                if mis:
                    d2s = jnp.maximum(dist2, 1e-30)
                    # reverse pdfs of the two junction vertices (area
                    # measure); junction endpoints are non-delta wherever
                    # the pair contributes, so genuine zeros stay zero
                    rev_c = jnp.where(
                        l_delta, 0.0,
                        bsdf_pdf(lmt, lnx, lny, lnz, -dux, -duy, -duz)
                    ) * cos_c / d2s
                    rev_l = jnp.where(
                        c_delta, 0.0,
                        bsdf_pdf(cmt, cnx, cny, cnz, dux, duy, duz)
                    ) * cos_l / d2s
                    rc = rev_c / _remap0(cam_vtx[cbase + 14])
                    rl = rev_l / _remap0(lgt_vtx[lbase + 14])
                    # realizability clamp: strategies keeping i camera
                    # (j light) vertices need the other side <= depth,
                    # i.e. i, j >= k - depth with k = (s+1) + (t+1)
                    thr_k = s + t + 2 - depth
                    sum_c = rc * rc * mis_suffix_sum(cam_vtx, s, thr_k)
                    sum_l = rl * rl * mis_suffix_sum(lgt_vtx, t, thr_k)
                    wm = 1.0 / (1.0 + sum_c + sum_l)
                    cr = cr * wm
                    cg = cg * wm
                    cb = cb * wm
                ar = ar + jnp.where(pair, cr, 0.0)
                ag = ag + jnp.where(pair, cg, 0.0)
                ab = ab + jnp.where(pair, cb, 0.0)
                shadow_cnt = shadow_cnt + jnp.where(pair, 1.0, 0.0)
                return (ar, ag, ab, shadow_cnt)

            return jax.lax.fori_loop(0, t_hi, conn_t, (ar, ag, ab, shadow_cnt))

        # bound both loops by the TILE's maximum subpath lengths: vertex
        # slots are filled prefix-contiguously per lane, so slots past
        # the tile max are invalid for every lane and the (s,t) pair
        # body (incl. the T-triangle occlusion loop) is pure waste.
        # Mean path length is ~2.7 at depth 10, so this prunes most of
        # the depth^2 pair space.
        def _tile_len(ref, cnt, sidx):
            fl = ref[sidx * stride + 13]
            return cnt + jnp.any((fl % 2.0) >= 1.0).astype(jnp.int32)

        s_hi = jax.lax.fori_loop(
            0, depth, lambda s, c: _tile_len(cam_vtx, c, s), jnp.int32(0))
        t_hi = jax.lax.fori_loop(
            0, depth, lambda s, c: _tile_len(lgt_vtx, c, s), jnp.int32(0))

        ar, ag, ab, shadow_cnt = jax.lax.fori_loop(
            0, s_hi, conn_s, (ar, ag, ab, zf)
        )
        return ar, ag, ab, rays_cnt, shadow_cnt


    if with_raygen:
        # in-kernel get_ray, same scheme as the PT kernel; jitter keys sit
        # at the tail of the subkey table
        nj = n_uniform_slots(depth, n_vols)
        k1a = keys_u[nj * 2]
        k1b = keys_u[nj * 2 + 1]
        k2a = keys_u[nj * 2 + 2]
        k2b = keys_u[nj * 2 + 3]
        sqrt_spp = meta[3]
        active_f = (rid[:] >= 0).astype(jnp.float32)

        def one_sample(ridu, sxv, syv):
            _ridu_cell[0] = ridu
            b1, _ = _threefry2x32(k1a, k1b, ridu, jnp.zeros_like(ridu))
            b2, _ = _threefry2x32(k2a, k2b, ridu, jnp.zeros_like(ridu))
            u0 = _bits_to_unit_float(b1)
            u1 = _bits_to_unit_float(b2)
            recip = cam_f[12]
            offx = (sxv + u0) * recip - 0.5
            offy = (syv + u1) * recip - 0.5
            psx = cam_f[0] + (ii[:] + offx) * cam_f[3] + (jj[:] + offy) * cam_f[6]
            psy = cam_f[1] + (ii[:] + offx) * cam_f[4] + (jj[:] + offy) * cam_f[7]
            psz = cam_f[2] + (ii[:] + offx) * cam_f[5] + (jj[:] + offy) * cam_f[8]
            return bdpt_sample(
                (jnp.full(shape, cam_f[9], jnp.float32), jnp.full(shape, cam_f[10], jnp.float32),
                 jnp.full(shape, cam_f[11], jnp.float32)),
                (psx - cam_f[9], psy - cam_f[10], psz - cam_f[11]),
                active_f,
            )

        if spp_loop == 1:
            ar, ag, ab, rays_cnt, shadow_cnt = one_sample(
                rid[:].astype(jnp.uint32), sx[:], sy[:]
            )
        else:
            spp_eff = sqrt_spp * sqrt_spp

            def spp_body(s, acc):
                a1, a2, a3, rc, sc = one_sample(
                    (rid[:] * spp_eff + s).astype(jnp.uint32),
                    jnp.full(shape, (s % sqrt_spp).astype(jnp.float32), jnp.float32),
                    jnp.full(shape, (s // sqrt_spp).astype(jnp.float32), jnp.float32),
                )
                return (acc[0] + a1, acc[1] + a2, acc[2] + a3,
                        acc[3] + rc, acc[4] + sc)

            ar, ag, ab, rays_cnt, shadow_cnt = jax.lax.fori_loop(
                0, spp_eff, spp_body, (zf, zf, zf, zf, zf)
            )
    else:
        ar, ag, ab, rays_cnt, shadow_cnt = bdpt_sample(
            (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]),
            (rid[:] >= 0).astype(jnp.float32),
        )

    rr[:] = ar
    rg[:] = ag
    rb[:] = ab
    rays_out[:] = rays_cnt
    shadow_out[:] = shadow_cnt
    zrow = jnp.zeros((1, LANES), jnp.float32)
    st_out[0:1] = (jnp.sum(nv_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[1:2] = (jnp.sum(ah_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[2:3] = jnp.sum(tt_s[:], axis=0, keepdims=True)
    st_out[3:4] = jnp.sum(th_s[:], axis=0, keepdims=True)
    st_out[4:8] = jnp.zeros((4, LANES), jnp.float32)


def make_bdpt_kernel(depth: int, with_buffer: bool, clustered: bool = False,
                     with_raygen: bool = False, spp_loop: int = 1,
                     mat_classes=(True, True), mis: bool = False,
                     n_vols: int = 0):
    def kernel(*refs):
        return _bdpt_kernel_impl(depth, with_buffer, clustered, with_raygen,
                                 spp_loop, mat_classes, mis, n_vols, *refs)

    return kernel


def _pack_tables_bdpt(scene):
    """pt tables + light mat-id section + total area at the lgt tail."""
    meta, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    # lgt_tab tail currently: [... lights ..., bg(3)]; append total_area and
    # per-light mat ids
    lmat = jnp.zeros((MAX_LIGHTS,), jnp.float32).at[: scene.num_lights].set(
        scene.light_mat.astype(jnp.float32)
    )
    lgt_tab = jnp.concatenate(
        [lgt_tab, scene.light_total_area.astype(jnp.float32)[None], lmat]
    )
    return meta, tri_tab, mat_tab, lgt_tab


def _subkeys_bdpt(key, depth: int, n_vols: int = 0):
    """Per-slot keys for all three sections, mirroring the render driver's
    stream split (cam trace / light start / light trace); trace bounces
    carry NT + n_vols slots (free-flight draws last)."""
    n = n_uniform_slots(depth, n_vols)
    ntv = NT + n_vols
    k_cam = jax.random.fold_in(key, 2)
    k_ls = jax.random.fold_in(key, 3)
    k_lt = jax.random.fold_in(key, 4)

    def kd(k):
        return (k if k.dtype == jnp.uint32 else jax.random.key_data(k)).astype(
            jnp.uint32
        )

    ks = []
    for b in range(depth):
        kb = jax.random.fold_in(k_cam, b)
        for s in range(ntv):
            ks.append(kd(jax.random.fold_in(kb, s)))
    for s in range(NLS):
        ks.append(kd(jax.random.fold_in(k_ls, s)))
    for b in range(max(depth - 1, 0)):
        kb = jax.random.fold_in(k_lt, b)
        for s in range(ntv):
            ks.append(kd(jax.random.fold_in(kb, s)))
    assert len(ks) == n
    return jnp.stack(ks).reshape(-1)


def bdpt_megakernel(
    scene,
    o,  # Vec3 [B]
    d,  # Vec3 [B]
    ray_ids,  # [B] int32; negative = inactive
    key,  # full render key (streams 2/3/4 are folded internally)
    depth: int,
    uniforms=None,  # [n_uniform_slots(depth), B] f32 (testing)
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    mis: bool = False,
):
    """Returns (rad_x, rad_y, rad_z [B], rays_traced, shadow_rays,
    extra f32[4] = (node_visits, aabb_hits, tri_tests, tri_hits) counted
    in-kernel — the reference's BvhStats analogs, src/core/stats.h).
    ``mis``: power-heuristic weighted connections (integrator bdpt-mis);
    same uniform stream (the weights draw nothing), so injected-uniform
    comparisons against the jnp wavefront hold in both modes."""
    B = o.x.shape[0]
    stride = VTX_STRIDE_MIS if mis else VTX_STRIDE
    # small batches (tests, tails) need no giant tile padding
    tile_rows = max(1, min(tile_rows, -(-B // LANES)))
    tile_rows = _clamp_rows_for_depth(tile_rows, depth, stride)
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    G = Bp // tile

    def prep(x, fill=0.0):
        pad = Bp - B
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    meta, tri_tab, mat_tab, lgt_tab = _pack_tables_bdpt(scene)
    n_vols = int(scene.num_volumes)
    keys_flat = _subkeys_bdpt(key, depth, n_vols)

    from bpt_tpu.ops.pallas.pt_kernel import use_clusters

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
    scratch_shapes = [
        pltpu.VMEM((depth * stride, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((depth * stride, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),  # any-hit gate buf
    ]
    if clustered:
        from bpt_tpu.ops.pallas import clusters as cl

        n_c, cl_aabb, tri_hbm = cl.pack_clusters_rolled(scene)
        order_t = cl.cluster_orders(scene, n_c)
        meta = meta.at[5].set(n_c)
        scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb,
                   order_t]
        ins.append(tri_hbm)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        scratch_shapes += [
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 10
    else:
        scratch_shapes += [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2
    if n_vols:
        scalars = scalars + list(_pack_vol_tables(scene))
    with_buffer = uniforms is not None
    if with_buffer:
        nslots = n_uniform_slots(depth, n_vols)
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
    rr, rg, rb, rays, shadow, st = pl.pallas_call(
        make_bdpt_kernel(depth, with_buffer, clustered,  # raygen off
                         mat_classes=(scene.has_delta_mats,
                                      scene.has_iso_mats), mis=mis,
                         n_vols=n_vols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(G,),
            in_specs=in_specs,
            out_specs=[block] * 5 + [st_block],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[fshape] * 5 + [st_shape],
        interpret=interpret,
    )(*scalars, *ins)
    return (
        rr.reshape(Bp)[:B],
        rg.reshape(Bp)[:B],
        rb.reshape(Bp)[:B],
        jnp.sum(rays),
        jnp.sum(shadow),
        jnp.sum(st.reshape(G, 8, LANES)[:, :4, :], axis=(0, 2)),
    )


def _subkeys_bdpt_raygen(key, depth: int, n_vols: int = 0):
    ks = [_subkeys_bdpt(key, depth, n_vols)]
    kg = jax.random.fold_in(key, 0)

    def kd(k):
        return (k if k.dtype == jnp.uint32 else jax.random.key_data(k)).astype(
            jnp.uint32
        )

    ks.append(kd(jax.random.fold_in(kg, 0)))
    ks.append(kd(jax.random.fold_in(kg, 1)))
    return jnp.concatenate(ks)


def bdpt_megakernel_pixels(
    scene,
    i,  # [B] f32 pixel x
    j,  # [B] f32 pixel y
    pix_ids,  # [B] int32 pixel ids; negative = inactive
    cam16,  # [13] f32 (pt_kernel.camera_table)
    key,  # base render key
    depth: int,
    sqrt_spp: int,
    tile_rows: int = DEF_TILE_ROWS,
    interpret: bool = False,
    mis: bool = False,
):
    """Fully-fused BDPT: in-kernel raygen + all spp strata per launch.
    Returns (rad_x, rad_y, rad_z [B] — summed over strata, rays, shadow,
    extra f32[4] = (node_visits, aabb_hits, tri_tests, tri_hits)).
    ``mis``: power-heuristic weighted connections (integrator bdpt-mis)."""
    B = i.shape[0]
    stride = VTX_STRIDE_MIS if mis else VTX_STRIDE
    tile_rows = max(1, min(tile_rows, -(-B // LANES)))
    tile_rows = _clamp_rows_for_depth(tile_rows, depth, stride)
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    G = Bp // tile
    i, j = jnp.asarray(i, jnp.float32), jnp.asarray(j, jnp.float32)
    pix_ids = jnp.asarray(pix_ids, jnp.int32)
    cam16 = jnp.asarray(cam16, jnp.float32)

    def prep(x, fill=0.0):
        pad = Bp - B
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    meta, tri_tab, mat_tab, lgt_tab = _pack_tables_bdpt(scene)
    meta = meta.at[3].set(sqrt_spp)
    n_vols = int(scene.num_volumes)
    keys_flat = _subkeys_bdpt_raygen(key, depth, n_vols)

    from bpt_tpu.ops.pallas.pt_kernel import use_clusters

    clustered = use_clusters(scene)

    block = pl.BlockSpec((tile_rows, LANES), lambda i_, *_: (i_, 0),
                         memory_space=pltpu.VMEM)
    zeros = jnp.zeros((B,), jnp.float32)
    ins = [prep(i), prep(j), prep(zeros), prep(zeros), prep(pix_ids, fill=-1)]
    in_specs = [block] * 5
    scratch_shapes = [
        pltpu.VMEM((depth * stride, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((depth * stride, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((tile_rows, LANES), jnp.float32),  # any-hit gate buf
    ]
    cl_aabb = jnp.zeros((6,), jnp.float32)
    order_t = jnp.zeros((8,), jnp.int32)
    if clustered:
        from bpt_tpu.ops.pallas import clusters as cl

        n_c, cl_aabb, tri_hbm = cl.pack_clusters_rolled(scene)
        order_t = cl.cluster_orders(scene, n_c)
        meta = meta.at[5].set(n_c)
        ins.append(tri_hbm)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        scratch_shapes += [
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((cl.BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 10
    else:
        scratch_shapes += [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2
    scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb, order_t,
               cam16]
    if n_vols:
        scalars = scalars + list(_pack_vol_tables(scene))

    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    st_block = pl.BlockSpec((8, LANES), lambda i_, *_: (i_, 0),
                            memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32)
    rr, rg, rb, rays, shadow, st = pl.pallas_call(
        make_bdpt_kernel(depth, False, clustered, with_raygen=True,
                         mat_classes=(scene.has_delta_mats,
                                      scene.has_iso_mats),
                         spp_loop=sqrt_spp * sqrt_spp, mis=mis,
                         n_vols=n_vols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(G,),
            in_specs=in_specs,
            out_specs=[block] * 5 + [st_block],
            scratch_shapes=scratch_shapes,
        ),
        out_shape=[fshape] * 5 + [st_shape],
        interpret=interpret,
    )(*scalars, *ins)
    return (
        rr.reshape(Bp)[:B],
        rg.reshape(Bp)[:B],
        rb.reshape(Bp)[:B],
        jnp.sum(rays),
        jnp.sum(shadow),
        jnp.sum(st.reshape(G, 8, LANES)[:, :4, :], axis=(0, 2)),
    )
