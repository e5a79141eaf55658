"""Bidirectional integrator — wavefront form of bidirectional_color
(src/camera.h:294-475), component-SoA layout throughout.

Three stages, each a full-batch wave:

1. camera subpath: trace_path (camera.h:325-370) storing a vertex SoA with
   slot-major [S, B] arrays (slot rows are contiguous for the connection
   loop); per-vertex emission accumulates for non-delta vertices
   (camera.h:305-309) plus background on miss (camera.h:336-339).
2. light subpath: area-weighted emitter sample (camera.h:381-405; CDF
   searchsorted), throughput 1/max(pdf_area, 1e-8), cosine exit direction
   with throughput emission * cos / max(cos/pi, 1e-8) (camera.h:407-415),
   then the same trace for depth-1 more vertices.
3. connections: the (s, t) outer product evaluated blockwise — a fori loop
   over camera-vertex slots, each step a [S_l * B] wave of shadow rays —
   with the reference's exact rules: skip delta vertices, geometry term
   cos_c * cos_l / d^2, visibility epsilon 0.001 at both ends, light vertex
   contributes raw emission when it is an emitter (camera.h:440-475).
   NO MIS weights — faithful to the reference's (biased) all-pairs sum.

Randomness is injected via uniforms_fn callables for oracle testing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import vec3 as v3
from bpt_tpu.core.vec3 import Vec3
from bpt_tpu.ops import shade_soa as sh
from bpt_tpu.ops import soa
from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.scene.types import MAT_LIGHT, SceneArrays

# per-bounce uniform slots for trace_subpath
TU_B1 = 0  # bsdf dir sample
TU_B2 = 1
TU_DIEL = 2  # dielectric reflect choice
TU_FZ1 = 3  # metal fuzz sphere dir
TU_FZ2 = 4
NT = 5

# light-start uniform slots (one draw per sample)
LS_PICK = 0
LS_U = 1
LS_V = 2
LS_D1 = 3  # cosine exit dir
LS_D2 = 4
NLS = 5

# relative endpoint margin for connection visibility: the reference advances
# the shadow origin by 0.001*du AND sets max_t = dist - 0.001, which puts the
# emitter plane exactly at max_t — occlusion then flips on fp rounding. We
# shrink the range so the endpoint is excluded deterministically.
SHADOW_EPS_REL = 1e-4

# Bounce/slot loops unroll into straight-line XLA up to this depth: on
# the axon TPU, fori_loop + per-iteration dynamic row slicing compiles
# pathologically (minutes, CLAUDE.md) and blocks inter-launch overlap;
# unrolled graphs compile in seconds and let XLA pipeline the per-bounce
# Pallas launches.  Past this (depth-80 north-star configs) the graph
# size itself becomes the compile hazard, so the dynamic loop returns.
UNROLL_MAX = 32


def _loop(steps: int, body, state):
    """fori_loop semantics, unrolled for small static trip counts."""
    if steps <= UNROLL_MAX:
        for b in range(steps):
            state = body(b, state)
        return state
    return jax.lax.fori_loop(0, steps, body, state)


class Vertices(NamedTuple):
    """path_vertex SoA (camera.h:236-243); arrays are [S, B] (slot-major)."""

    valid: jnp.ndarray
    p: Vec3
    normal: Vec3
    wi: Vec3
    thr: Vec3
    emit: Vec3
    mat: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    delta: jnp.ndarray
    is_light: jnp.ndarray


class MisInfo(NamedTuple):
    """Per-slot MIS bookkeeping ([S, B] each, slot-major like Vertices).

    pfwd: area pdf of generating vertex i from vertex i-1 along the subpath
        (0 for delta-sampled segments; remapped to 1 in ratios, the standard
        deltas-cancel treatment).  Camera slot 0 stores 0 (the camera ray is
        common to every strategy and cancels); light slot 0 stores the
        emitter-area pdf.
    rat2: squared ratio (remap(pdf_rev(x_{i-1})) / remap(pfwd(x_{i-1})))^2
        linking slot i to slot i-1, where pdf_rev(x_{i-1}) is the area pdf
        of generating x_{i-1} from x_i via x_i's (incoming-independent)
        scattering pdf.  Slot 0 is unused.
    valid: 1.0 where strategy cut between slot i-1 and i is connectable
        (both endpoints non-delta); light slot 0 is always 1 (area light).
    """

    pfwd: jnp.ndarray
    rat2: jnp.ndarray
    valid: jnp.ndarray


def _remap0(x):
    """Veach remap: pdf 0 (delta) contributes ratio factor 1."""
    return jnp.where(x > 0.0, x, 1.0)


def mis_strategy_table(info: MisInfo):
    """[S, S, B] table P[m, i] = valid[i] * prod_{q=i+1..m} rat2[q]:
    the junction-independent part of the power-heuristic term for moving
    the path cut from slot m down to slot i (strategy keeping i subpath
    vertices on this side).  Built by an unrolled scan over slots."""
    S, B = info.valid.shape
    dtype = info.rat2.dtype
    rows = []
    prev = None
    for m in range(S):
        if m == 0:
            row = jnp.zeros((S, B), dtype).at[0].set(info.valid[0])
        else:
            row = (prev * info.rat2[m][None]).at[m].set(info.valid[m])
        rows.append(row)
        prev = row
    return jnp.stack(rows)  # [S(m), S(i), B]


class BDPTStats(NamedTuple):
    rays_traced: jnp.ndarray  # reference-parity (trace_path entries only)
    shadow_rays: jnp.ndarray
    node_visits: jnp.ndarray
    aabb_hits: jnp.ndarray
    tri_tests: jnp.ndarray
    tri_hits: jnp.ndarray


def _zv3(S, B, dtype):
    z = jnp.zeros((S, B), dtype)
    return Vec3(z, z, z)


def _empty_vertices(S, B, dtype):
    return Vertices(
        valid=jnp.zeros((S, B), bool),
        p=_zv3(S, B, dtype),
        normal=_zv3(S, B, dtype),
        wi=_zv3(S, B, dtype),
        thr=_zv3(S, B, dtype),
        emit=_zv3(S, B, dtype),
        mat=jnp.zeros((S, B), jnp.int32),
        u=jnp.zeros((S, B), dtype),
        v=jnp.zeros((S, B), dtype),
        delta=jnp.zeros((S, B), bool),
        is_light=jnp.zeros((S, B), bool),
    )


def _row(vv: Vec3, s) -> Vec3:
    return Vec3(vv.x[s], vv.y[s], vv.z[s])


def _dyn_row(arr, s):
    return jax.lax.dynamic_index_in_dim(arr, s, axis=0, keepdims=False)


def _dyn_row3(vv: Vec3, s) -> Vec3:
    return Vec3(_dyn_row(vv.x, s), _dyn_row(vv.y, s), _dyn_row(vv.z, s))


def trace_subpath(
    scene: SceneArrays,
    o: Vec3,
    d: Vec3,
    thr0: Vec3,
    alive0,
    steps: int,
    uniforms_fn,
    collect_background: bool,
    mis_prev=None,
):
    """trace_path (camera.h:325-370) for ``steps`` bounces.

    Returns (Vertices [steps, B], background_contrib Vec3 [B], stats[, mis]).

    ``mis_prev`` (optional) enables per-vertex MIS pdf bookkeeping —
    a dict describing the vertex PRECEDING the first traced one:
      n (Vec3 [B]): its normal; delta (bool [B]); mtype (int32 [B]);
      pfwd ([B]): its own forward area pdf (1.0 for the camera, emitter
      area pdf for a light start).
    When given, a 4th return value MisInfo [steps, B] is appended.
    The bookkeeping exploits that every scattering pdf in the material
    set (cosine lambertian / uniform-sphere isotropic / cos-pi emitter
    exit) is independent of the incoming direction, so reverse pdfs of
    interior vertices are fixed at trace time.
    """
    B = o.x.shape[0]
    dtype = o.x.dtype
    verts = _empty_vertices(steps, B, dtype)
    zeros = jnp.zeros((B,), dtype)
    bg_acc = Vec3(zeros, zeros, zeros)
    bg = Vec3(scene.background[0], scene.background[1], scene.background[2])
    stats = BDPTStats(*(jnp.int32(0) for _ in range(6)))
    mis = (
        MisInfo(
            pfwd=jnp.zeros((steps, B), dtype),
            rat2=jnp.zeros((steps, B), dtype),
            valid=jnp.zeros((steps, B), dtype),
        )
        if mis_prev is not None
        else None
    )

    def set_row(arr, b, mask, val):
        return arr.at[b].set(jnp.where(mask, val, arr[b]))

    def set_row3(vv: Vec3, b, mask, val: Vec3) -> Vec3:
        return Vec3(
            set_row(vv.x, b, mask, val.x),
            set_row(vv.y, b, mask, val.y),
            set_row(vv.z, b, mask, val.z),
        )

    nt_total = NT + scene.num_volumes

    def body(b, state):
        o, d, thr, alive, verts, bg_acc, stats, mis, prev = state
        u = uniforms_fn(b, nt_total)

        h = soa.closest_hit(scene, o, d, T_MIN, jnp.inf, mask=alive)
        rec = soa.complete_hit(scene, o, d, h)
        if scene.num_volumes:
            rec = soa.apply_volumes(scene, o, d, rec, u[NT:], alive)
        mtype = scene.materials.mtype[rec.mat]

        miss = alive & ~rec.hit
        if collect_background:
            bg_acc = v3.scale_add(bg_acc, miss, thr * bg)

        valid_v = alive & rec.hit
        delta = sh.is_delta(mtype)
        emission = sh.emitted(scene, rec.mat, rec.front_face, rec.u, rec.v, rec.p)
        wi = v3.normalize_safe(-d)

        verts = Vertices(
            valid=set_row(verts.valid, b, valid_v, True),
            p=set_row3(verts.p, b, valid_v, rec.p),
            normal=set_row3(verts.normal, b, valid_v, rec.normal),
            wi=set_row3(verts.wi, b, valid_v, wi),
            thr=set_row3(verts.thr, b, valid_v, thr),
            emit=set_row3(verts.emit, b, valid_v, emission),
            mat=set_row(verts.mat, b, valid_v, rec.mat),
            u=set_row(verts.u, b, valid_v, rec.u),
            v=set_row(verts.v, b, valid_v, rec.v),
            delta=set_row(verts.delta, b, valid_v, delta),
            is_light=set_row(verts.is_light, b, valid_v, mtype == MAT_LIGHT),
        )

        if mis is not None:
            pp, pn, pdelta, pmtype, ppfwd = prev
            seg = Vec3(rec.p.x - pp.x, rec.p.y - pp.y, rec.p.z - pp.z)
            dist2 = jnp.maximum(v3.length_squared(seg), 1e-30)
            du = v3.normalize_safe(seg)
            cos_cur = jnp.abs(v3.dot(rec.normal, du))
            cos_prev = jnp.abs(v3.dot(pn, du))
            # forward: prev vertex's scattering pdf toward us, area measure
            pdf_sa_f = jnp.where(pdelta, 0.0,
                                 sh.bsdf_pdf_value(pmtype, pn, du))
            pfwd_cur = pdf_sa_f * cos_cur / dist2
            # reverse: OUR scattering pdf back toward prev, area measure.
            # Delta vertices contribute factor 1 (the delta pdfs cancel
            # across strategies); a GENUINE zero (backside cos) stays 0 —
            # those reverse strategies are impossible.
            prev_rev = jnp.where(
                delta, 1.0,
                sh.bsdf_pdf_value(mtype, rec.normal, -du) * cos_prev / dist2,
            )
            rat = prev_rev / _remap0(ppfwd)
            valid_cut = (~delta & ~pdelta).astype(dtype)
            mis = MisInfo(
                pfwd=set_row(mis.pfwd, b, valid_v, pfwd_cur),
                rat2=set_row(mis.rat2, b, valid_v, rat * rat),
                valid=set_row(mis.valid, b, valid_v, valid_cut),
            )
            prev = (
                v3.where(valid_v, rec.p, pp),
                v3.where(valid_v, rec.normal, pn),
                jnp.where(valid_v, delta, pdelta),
                jnp.where(valid_v, mtype, pmtype),
                jnp.where(valid_v, pfwd_cur, ppfwd),
            )

        can_scatter = mtype != MAT_LIGHT
        atten = sh.attenuation(scene, rec.mat, mtype, rec.u, rec.v, rec.p)

        d_delta = sh.delta_scatter_dir(
            scene, rec.mat, mtype, d, rec.normal, rec.front_face,
            u[TU_DIEL], u[TU_FZ1], u[TU_FZ2],
        )
        d_bsdf = sh.sample_bsdf_dir(scene, mtype, rec.normal, u[TU_B1], u[TU_B2])
        pdf_val = sh.bsdf_pdf_value(mtype, rec.normal, d_bsdf)
        scat_pdf = sh.scattering_pdf(mtype, rec.normal, d_bsdf)

        delta_ok = valid_v & can_scatter & delta
        diff_ok = valid_v & can_scatter & ~delta & (pdf_val > 0.0)
        w = jnp.where(pdf_val > 0.0, scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0), 0.0)

        thr = v3.where(delta_ok, thr * atten,
                       v3.where(diff_ok, thr * atten * w, thr))
        alive_new = delta_ok | diff_ok
        o = v3.where(alive_new, rec.p, o)
        d = v3.where(alive_new, v3.where(delta_ok, d_delta, d_bsdf), d)

        stats = BDPTStats(
            rays_traced=stats.rays_traced + jnp.sum(alive, dtype=jnp.int32),
            shadow_rays=stats.shadow_rays,
            node_visits=stats.node_visits + h.node_visits,
            aabb_hits=stats.aabb_hits + h.aabb_hits,
            tri_tests=stats.tri_tests + h.tri_tests,
            tri_hits=stats.tri_hits + h.tri_hits,
        )
        return (o, d, thr, alive_new, verts, bg_acc, stats, mis, prev)

    if mis_prev is not None:
        prev0 = (mis_prev["p"], mis_prev["n"], mis_prev["delta"],
                 mis_prev["mtype"], mis_prev["pfwd"])
    else:
        prev0 = None
    if steps > 0 and _narrow_ok(scene, dtype, B, steps, uniforms_fn):
        return _trace_subpath_narrow(
            scene, o, d, thr0, alive0, steps, uniforms_fn,
            collect_background, prev0)
    if steps > 0:
        state = (o, d, thr0, alive0, verts, bg_acc, stats, mis, prev0)
        state = _loop(steps, body, state)
        _, _, _, _, verts, bg_acc, stats, mis, _ = state
    if mis_prev is not None:
        return verts, bg_acc, stats, mis
    return verts, bg_acc, stats


def _narrow_ok(scene, dtype, B, steps, uniforms_fn) -> bool:
    """Gate for the live-prefix narrowed subpath trace (round 5).

    Measured motivation (tools/probe_bdpt_depthscale.py, coffee-91k at
    a 524k-lane wave): the bounce BODY outside the traversal kernel
    (complete_hit + shading elementwise) is nearly flat vs live
    fraction — ~38-46 ms/bounce fixed at full width, ~60% of the d10
    subpath wall — while closest_hit itself already scales (59.6 ->
    11.9 ms at 2% alive).  Narrowing runs the whole bounce body on a
    static live prefix instead.
    """
    import os

    env = os.environ.get("BPT_TPU_SUBPATH_NARROW", "")
    if env == "0":
        return False
    if not getattr(uniforms_fn, "supports_sel", False):
        return False
    if steps < 2 or steps > UNROLL_MAX:
        return False
    if env == "force":
        return True
    return (
        jax.default_backend() == "tpu"
        and soa._wave_cluster_ok(scene, dtype)
        and B >= (1 << 18)
    )


def _narrow_levels(B: int):
    """Static prefix widths for the per-bounce lax.switch ladder.  Alive
    counts are monotone non-increasing across bounces, so a fresh switch
    per bounce adapts without nested control flow; level k engages when
    count <= levels[k].  Kernels pad ray counts internally
    (cluster_wave._pad_to), so any width is safe."""
    floor = max(8, B >> 4)
    levels = [B]
    for shift in (1, 2, 4):
        w = max(B >> shift, floor)
        if w < levels[-1]:
            levels.append(w)
    return levels


def _trace_subpath_narrow(scene, o, d, thr0, alive0, steps, uniforms_fn,
                          collect_background, prev0):
    """trace_subpath with the wave carried in live-compacted sorted
    order: each bounce runs the FULL bounce body (closest_hit,
    complete_hit, shading, MIS bookkeeping, scatter sampling) on a
    static live-prefix width chosen per bounce by a lax.switch over
    `_narrow_levels`, then re-sorts the prefix alive-major (stable
    payload lax.sort — near-free on TPU, tools/probe_gather.py) so dead
    lanes retire into a tail that is never touched again.

    Per-lane math is identical to the plain body (same sh./soa. calls
    in the same order on the same per-lane inputs; uniforms are drawn
    by ORIGINAL ray id via uniforms_fn(..., sel=...)), and per-lane
    kernel results are tile-composition-independent (the same
    invariance the paged==single-table and shard bit-equality tests
    pin), so outputs are bit-equal to the plain path — asserted by
    tests/test_bdpt_narrow.py.  Traversal stats counters (node visits
    etc.) are composition-DEPENDENT and may legitimately differ.

    Mechanics (round-5 A/B, tools/probe_narrow_e2e.py): the first cut
    wrote vertex rows back to original lane order with a packed masked
    SCATTER per bounce and threaded the [steps, NC, B] row buffer
    through the lax.switch state — measured 0.75x of the plain path
    (XLA TPU scatters are the known-slow permutation primitive, and the
    100 MB buffer risks a copy at every switch boundary).  This version
    restores order with a payload lax.sort keyed by the (unique) sel
    column — the repo's measured-cheap way to move many columns by one
    permutation (tools/probe_gather.py) — and keeps the row buffer
    OUTSIDE the switch: each branch returns the bounce's [NC, B] row
    and the Python level does the static vp.at[b].set.

    Bounce 0 runs at full width (sel is the identity, so its vertex row
    needs no restore sort; its tail re-sort establishes the prefix
    invariant).  KEEP THE BODY MATH IN SYNC with trace_subpath.body
    above.
    """
    B = o.x.shape[0]
    dtype = o.x.dtype
    mis_on = prev0 is not None
    nt_total = NT + scene.num_volumes
    NC = 24 if mis_on else 21
    levels = _narrow_levels(B)
    bg = Vec3(scene.background[0], scene.background[1], scene.background[2])

    st0 = tuple(jnp.int32(0) for _ in range(6))

    def bounce_math(b, W, ox, oy, oz, dx, dy, dz, tx, ty, tz, alive,
                    sel_w, prev):
        """One bounce at width W in sorted order.  Returns (vals [NC,W]
        vertex row components, scatter mask, miss mask, bg contrib,
        new o/d/thr/alive, new prev, stat increments)."""
        o_w = Vec3(ox, oy, oz)
        d_w = Vec3(dx, dy, dz)
        thr = Vec3(tx, ty, tz)
        u = uniforms_fn(b, nt_total, sel_w)

        h = soa.closest_hit(scene, o_w, d_w, T_MIN, jnp.inf, mask=alive)
        rec = soa.complete_hit(scene, o_w, d_w, h)
        if scene.num_volumes:
            rec = soa.apply_volumes(scene, o_w, d_w, rec, u[NT:], alive)
        mtype = scene.materials.mtype[rec.mat]

        miss = alive & ~rec.hit
        bg_c = thr * bg if collect_background else None

        valid_v = alive & rec.hit
        delta = sh.is_delta(mtype)
        emission = sh.emitted(scene, rec.mat, rec.front_face, rec.u,
                              rec.v, rec.p)
        wi = v3.normalize_safe(-d_w)

        f = lambda x: x.astype(dtype)
        comps = [
            f(valid_v),
            rec.p.x, rec.p.y, rec.p.z,
            rec.normal.x, rec.normal.y, rec.normal.z,
            wi.x, wi.y, wi.z,
            thr.x, thr.y, thr.z,
            emission.x, emission.y, emission.z,
            f(rec.mat),
            rec.u, rec.v,
            f(delta),
            f(mtype == MAT_LIGHT),
        ]

        new_prev = None
        if mis_on:
            pp_x, pp_y, pp_z, pn_x, pn_y, pn_z, pdelta, pmtype, ppfwd = prev
            pp = Vec3(pp_x, pp_y, pp_z)
            pn = Vec3(pn_x, pn_y, pn_z)
            seg = Vec3(rec.p.x - pp.x, rec.p.y - pp.y, rec.p.z - pp.z)
            dist2 = jnp.maximum(v3.length_squared(seg), 1e-30)
            du = v3.normalize_safe(seg)
            cos_cur = jnp.abs(v3.dot(rec.normal, du))
            cos_prev = jnp.abs(v3.dot(pn, du))
            pdf_sa_f = jnp.where(pdelta > 0.5, 0.0,
                                 sh.bsdf_pdf_value(pmtype, pn, du))
            pfwd_cur = pdf_sa_f * cos_cur / dist2
            prev_rev = jnp.where(
                delta, 1.0,
                sh.bsdf_pdf_value(mtype, rec.normal, -du) * cos_prev
                / dist2,
            )
            rat = prev_rev / _remap0(ppfwd)
            valid_cut = (~delta & ~(pdelta > 0.5)).astype(dtype)
            comps += [pfwd_cur, rat * rat, valid_cut]
            new_prev = (
                jnp.where(valid_v, rec.p.x, pp.x),
                jnp.where(valid_v, rec.p.y, pp.y),
                jnp.where(valid_v, rec.p.z, pp.z),
                jnp.where(valid_v, rec.normal.x, pn.x),
                jnp.where(valid_v, rec.normal.y, pn.y),
                jnp.where(valid_v, rec.normal.z, pn.z),
                jnp.where(valid_v, f(delta), pdelta),
                jnp.where(valid_v, mtype, pmtype),
                jnp.where(valid_v, pfwd_cur, ppfwd),
            )

        can_scatter = mtype != MAT_LIGHT
        atten = sh.attenuation(scene, rec.mat, mtype, rec.u, rec.v, rec.p)

        d_delta = sh.delta_scatter_dir(
            scene, rec.mat, mtype, d_w, rec.normal, rec.front_face,
            u[TU_DIEL], u[TU_FZ1], u[TU_FZ2],
        )
        d_bsdf = sh.sample_bsdf_dir(scene, mtype, rec.normal, u[TU_B1],
                                    u[TU_B2])
        pdf_val = sh.bsdf_pdf_value(mtype, rec.normal, d_bsdf)
        scat_pdf = sh.scattering_pdf(mtype, rec.normal, d_bsdf)

        delta_ok = valid_v & can_scatter & delta
        diff_ok = valid_v & can_scatter & ~delta & (pdf_val > 0.0)
        w = jnp.where(pdf_val > 0.0,
                      scat_pdf / jnp.where(pdf_val > 0.0, pdf_val, 1.0),
                      0.0)

        thr_n = v3.where(delta_ok, thr * atten,
                         v3.where(diff_ok, thr * atten * w, thr))
        alive_new = delta_ok | diff_ok
        o_n = v3.where(alive_new, rec.p, o_w)
        d_n = v3.where(alive_new, v3.where(delta_ok, d_delta, d_bsdf), d_w)

        incs = (jnp.sum(alive, dtype=jnp.int32), h.node_visits,
                h.aabb_hits, h.tri_tests, h.tri_hits)
        return (jnp.stack(comps), valid_v, miss, bg_c,
                o_n, d_n, thr_n, alive_new, new_prev, incs)

    zB = jnp.zeros((B,), dtype)

    def apply_bounce(b, W, state):
        """Run bounce b on the [:W] prefix, re-sort the prefix
        alive-major, write the prefix back, and recount.  Returns
        (state, row [NC(+3), B]) with the bounce's vertex-row columns in
        the bounce's INPUT lane order (masked prefix padded with a zero
        tail) — the caller holds that order's sel and restores original
        order OUTSIDE the lax.switch, so the row buffers and the restore
        sort are instantiated once per bounce, not once per
        bounce x ladder level (the remote AOT compile helper OOMs on the
        larger variant)."""
        (ox, oy, oz, dx, dy, dz, tx, ty, tz, alive, sel, _count,
         st, prev) = state
        sl = lambda a: a[:W]
        prev_w = tuple(sl(a) for a in prev) if mis_on else None
        sel_w = sl(sel)
        (vals, valid_v, miss, bg_c, o_n, d_n, thr_n, alive_new,
         new_prev, incs) = bounce_math(
            b, W, sl(ox), sl(oy), sl(oz), sl(dx), sl(dy), sl(dz),
            sl(tx), sl(ty), sl(tz), sl(alive), sel_w, prev_w)

        # vertex-row columns: mask invalid lanes to the plain body's
        # untouched zeros, pad the prefix to B (tail lanes retired
        # earlier — their row is zeros)
        def pad(c):
            return jax.lax.dynamic_update_slice(zB, c, (jnp.int32(0),))

        full_cols = [pad(jnp.where(valid_v, vals[k], jnp.zeros((), dtype)))
                     for k in range(NC)]
        if collect_background:
            full_cols += [
                pad(jnp.where(miss, c, jnp.zeros((), dtype)))
                for c in (bg_c.x, bg_c.y, bg_c.z)
            ]
        row = jnp.stack(full_cols)

        # alive-major stable re-sort of the prefix; payload sort moves
        # the ~20 state columns nearly free (tools/probe_gather.py)
        key = jnp.where(alive_new, jnp.int32(0), jnp.int32(1))
        cols = [o_n.x, o_n.y, o_n.z, d_n.x, d_n.y, d_n.z,
                thr_n.x, thr_n.y, thr_n.z, alive_new, sel_w]
        if mis_on:
            cols += list(new_prev)
        sorted_ = jax.lax.sort((key, *cols), num_keys=1, is_stable=True)
        cols_s = sorted_[1:]

        def put(full, pref):
            return jax.lax.dynamic_update_slice(
                full, pref, (jnp.int32(0),))

        (ox, oy, oz, dx, dy, dz, tx, ty, tz) = (
            put(f, p) for f, p in zip(
                (ox, oy, oz, dx, dy, dz, tx, ty, tz), cols_s[:9]))
        alive = put(alive, cols_s[9])
        sel = put(sel, cols_s[10])
        if mis_on:
            prev = tuple(put(f, p) for f, p in zip(prev, cols_s[11:]))
        count = jnp.sum(cols_s[9], dtype=jnp.int32)
        st = (st[0] + incs[0], st[1], st[2] + incs[1], st[3] + incs[2],
              st[4] + incs[3], st[5] + incs[4])
        return ((ox, oy, oz, dx, dy, dz, tx, ty, tz, alive, sel, count,
                 st, prev), row)

    # mis prev as flat float/int columns (sortable payloads)
    if mis_on:
        pp, pn, pdelta, pmtype, ppfwd = prev0
        prev_cols = (pp.x, pp.y, pp.z, pn.x, pn.y, pn.z,
                     pdelta.astype(dtype), pmtype, ppfwd)
    else:
        prev_cols = ()

    sel0 = jnp.arange(B, dtype=jnp.int32)
    state = (o.x, o.y, o.z, d.x, d.y, d.z, thr0.x, thr0.y, thr0.z,
             alive0, sel0, jnp.int32(B), st0, prev_cols)

    # vertex rows + bg accumulator live OUTSIDE the per-bounce switch —
    # the branches return each bounce's row columns (in the bounce's
    # input lane order) and the restore to ORIGINAL lane order happens
    # here: one payload sort keyed by the pre-bounce sel (a permutation
    # of arange(B); unique keys, so is_stable is irrelevant) — the
    # repo's measured-cheap way to move many columns by one permutation
    # (tools/probe_gather.py); a packed masked scatter instead measured
    # 0.75x e2e (tools/probe_narrow_e2e.py, round-5 campaign)
    vp = jnp.zeros((steps, NC, B), dtype)
    bgp = jnp.zeros((3, B), dtype) if collect_background else None

    def bank_row(b, sel_b, row, vp, bgp):
        if b == 0:
            restored = [row[k] for k in range(row.shape[0])]
        else:
            restored = jax.lax.sort(
                (sel_b, *(row[k] for k in range(row.shape[0]))),
                num_keys=1, is_stable=False)[1:]
        vp = vp.at[b].set(jnp.stack(restored[:NC]))
        if collect_background:
            bgp = bgp + jnp.stack(restored[NC:])
        return vp, bgp

    # bounce 0: full width (sel is identity; the tail re-sort inside
    # establishes the live-prefix invariant for bounces 1+)
    state, row = apply_bounce(0, B, state)
    vp, bgp = bank_row(0, sel0, row, vp, bgp)
    for b in range(1, steps):
        count = state[11]
        sel_b = state[10]
        lvl = jnp.int32(0)
        for k in range(1, len(levels)):
            lvl = lvl + (count <= levels[k]).astype(jnp.int32)
        branches = [
            (lambda W: lambda s: apply_bounce(b, W, s))(W) for W in levels
        ]
        state, row = jax.lax.switch(lvl, branches, state)
        vp, bgp = bank_row(b, sel_b, row, vp, bgp)

    (_ox, _oy, _oz, _dx, _dy, _dz, _tx, _ty, _tz, _alive, _sel, _count,
     st, _prev) = state

    g = lambda k: vp[:, k, :]
    verts = Vertices(
        valid=g(0) > 0.5,
        p=Vec3(g(1), g(2), g(3)),
        normal=Vec3(g(4), g(5), g(6)),
        wi=Vec3(g(7), g(8), g(9)),
        thr=Vec3(g(10), g(11), g(12)),
        emit=Vec3(g(13), g(14), g(15)),
        mat=g(16).astype(jnp.int32),
        u=g(17),
        v=g(18),
        delta=g(19) > 0.5,
        is_light=g(20) > 0.5,
    )
    zeros = jnp.zeros((B,), dtype)
    bg_acc = (Vec3(bgp[0], bgp[1], bgp[2])
              if collect_background else Vec3(zeros, zeros, zeros))
    stats = BDPTStats(*st)
    if mis_on:
        return verts, bg_acc, stats, MisInfo(pfwd=g(21), rat2=g(22),
                                             valid=g(23))
    return verts, bg_acc, stats


def build_light_subpath(scene: SceneArrays, B, max_depth: int, start_u,
                        uniforms_fn, dtype, mis: bool = False):
    """build_light_path (camera.h:372-418). start_u: NLS rows of [B].
    With ``mis`` a MisInfo for the FULL light path (emitter slot included)
    is returned as a 5th value."""
    s = sh.sample_surface(scene, start_u[LS_PICK], start_u[LS_U], start_u[LS_V])

    # emitter emission: forced front_face=true, u=v=0 (camera.h:385-394)
    zeros = jnp.zeros((B,), dtype)
    emission = sh.emitted(scene, s.mat, jnp.ones((B,), bool), zeros, zeros, s.position)
    path_ok = s.valid & (v3.length_squared(emission) > 0.0)

    inv_pdf = 1.0 / jnp.maximum(s.pdf, 1e-8)
    thr0 = Vec3(inv_pdf, inv_pdf, inv_pdf)

    def as_slot(x):
        return x[None]

    emitter = Vertices(
        valid=as_slot(path_ok),
        p=Vec3(*(as_slot(c) for c in s.position)),
        normal=Vec3(*(as_slot(c) for c in s.normal)),
        wi=Vec3(*(as_slot(c) for c in s.normal)),  # camera.h:401
        thr=Vec3(*(as_slot(c) for c in thr0)),
        emit=Vec3(*(as_slot(c) for c in emission)),
        mat=as_slot(s.mat),
        u=as_slot(zeros),
        v=as_slot(zeros),
        delta=as_slot(jnp.zeros((B,), bool)),
        is_light=as_slot(path_ok),
    )

    # cosine exit (camera.h:407-415)
    dir_unit = v3.normalize_safe(
        sh.cosine_direction_world(s.normal, start_u[LS_D1], start_u[LS_D2])
    )
    cos_theta = jnp.maximum(0.0, v3.dot(s.normal, dir_unit))
    exit_ok = path_ok & (cos_theta > 0.0)
    pdf_dir = jnp.maximum(cos_theta / sh.PI, 1e-8)
    scale = cos_theta / pdf_dir
    thr = Vec3(
        thr0.x * emission.x * scale,
        thr0.y * emission.y * scale,
        thr0.z * emission.z * scale,
    )
    o = Vec3(
        s.position.x + 0.001 * s.normal.x,
        s.position.y + 0.001 * s.normal.y,
        s.position.z + 0.001 * s.normal.z,
    )

    mis_prev = None
    if mis:
        mis_prev = dict(
            p=s.position,
            n=s.normal,
            delta=jnp.zeros((B,), bool),
            mtype=scene.materials.mtype[s.mat],  # MAT_LIGHT: cos/pi exit pdf
            pfwd=s.pdf.astype(dtype),
        )
    out = trace_subpath(
        scene, o, dir_unit, thr, exit_ok, max_depth - 1, uniforms_fn,
        collect_background=False, mis_prev=mis_prev,
    )
    if mis:
        traced, _, stats, mis_tail = out
        ones = jnp.ones((1, B), dtype)
        mis_full = MisInfo(
            pfwd=jnp.concatenate([s.pdf.astype(dtype)[None], mis_tail.pfwd]),
            rat2=jnp.concatenate([jnp.zeros((1, B), dtype), mis_tail.rat2]),
            valid=jnp.concatenate([ones, mis_tail.valid]),  # area light
        )
        return emitter, traced, path_ok, stats, mis_full
    traced, _, stats = out
    return emitter, traced, path_ok, stats


def _concat_vertices(a: Vertices, b: Vertices) -> Vertices:
    def cat(x, y):
        if isinstance(x, Vec3):
            return Vec3(*(jnp.concatenate([cx, cy], axis=0) for cx, cy in zip(x, y)))
        return jnp.concatenate([x, y], axis=0)

    return Vertices(*(cat(x, y) for x, y in zip(a, b)))


def connect_paths(scene: SceneArrays, cam: Vertices, light: Vertices,
                  mis_c: MisInfo = None, mis_l: MisInfo = None,
                  max_depth: int = 0, ref_vis: bool = False):
    """All-pairs connect_vertices (camera.h:316-320, 440-475), blockwise over
    camera slots; one [S_l*B] shadow wave per slot.

    When mis_c/mis_l are given each (s, t) contribution is weighted by the
    power heuristic (beta=2) over every strategy of the same path length
    that the estimator realizes (t' in [max(1, k-max_depth), min(k,
    max_depth)], k = s+t) — a deviation from the reference, which sums
    all pairs unweighted (docs/PARITY.md).

    ``ref_vis`` emulates the reference binary's endpoint artifact: the
    shadow range ends EXACTLY at the connection endpoint's surface
    (max_t, inclusive), so fp rounding of the Möller–Trumbore t rejects
    ~86% of genuinely-visible connections (measured; docs/PARITY.md).
    Meaningful in f64 where our M-T acceptance rate tracks the
    reference's (12.6% vs 13.6% on the cornell floor->light ensemble)."""
    S_c, B = cam.valid.shape
    S_l = light.valid.shape[0]
    dtype = cam.p.x.dtype
    mis = mis_c is not None
    if mis:
        P_c = mis_strategy_table(mis_c)  # [S_c, S_c, B]
        P_l = mis_strategy_table(mis_l)  # [S_l, S_l, B]
        lmt_all = scene.materials.mtype[light.mat.reshape(-1)].reshape(S_l, B)
        l_delta_f = light.delta.astype(dtype)
        n_idx = jnp.arange(S_l, dtype=jnp.int32)
        j_idx = jnp.arange(S_l, dtype=jnp.int32)
        i_idx = jnp.arange(S_c, dtype=jnp.int32)
        # light-side sums are junction-(m)-dependent only through the
        # realizability clamp t' = k - s' <= max_depth, i.e. j >= k - D
        # (k = m + n + 2); precompute per-n tables below inside the loop

    # light-side factors, independent of s (evaluate once)
    lmat = light.mat.reshape(-1)
    lmtype = scene.materials.mtype[lmat]
    f_light_bsdf = sh.evaluate_bsdf(
        scene, lmat, lmtype, light.u.reshape(-1), light.v.reshape(-1),
        Vec3(*(c.reshape(-1) for c in light.p)),
    )
    f_light_bsdf = Vec3(*(c.reshape(S_l, B) for c in f_light_bsdf))
    # emitter vertices use raw emission as their "BSDF" (camera.h:462-467)
    f_light = v3.where(light.is_light, light.emit, f_light_bsdf)
    light_factor = light.thr * f_light  # [S_l, B]
    light_ok = light.valid & ~light.delta & (v3.length_squared(f_light) > 0.0)

    def slot_terms(s, dyn: bool):
        """Geometry + (MIS-weighted) contribution of camera slot ``s``
        against every light slot — everything EXCEPT the visibility
        test.  ``dyn``: s is a traced fori index (_loop body) vs a
        python int (the batched cross-slot mode, unrolled).  Returns
        (pair_ok [S_l,B] pre-occlusion, so Vec3, du Vec3, t_vis,
        contrib Vec3) — the caller applies occlusion and sums."""
        row = _dyn_row if dyn else (lambda a, i: a[i])
        row3 = _dyn_row3 if dyn else _row
        cp = row3(cam.p, s)
        cn = row3(cam.normal, s)
        cthr = row3(cam.thr, s)
        cmat = row(cam.mat, s)
        cu = row(cam.u, s)
        cv = row(cam.v, s)
        c_ok = row(cam.valid, s) & ~row(cam.delta, s)

        cmtype = scene.materials.mtype[cmat]
        f_cam = sh.evaluate_bsdf(scene, cmat, cmtype, cu, cv, cp)  # [B]
        c_ok = c_ok & (v3.length_squared(f_cam) > 0.0)
        cam_factor = cthr * f_cam  # Vec3 [B]

        # broadcast cam row against light slots: [S_l, B]
        diff = Vec3(
            light.p.x - cp.x[None],
            light.p.y - cp.y[None],
            light.p.z - cp.z[None],
        )
        dist2 = v3.length_squared(diff)
        pair_ok = c_ok[None] & light_ok & (dist2 > 0.0)

        dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
        if ref_vis:
            # the reference divides per-component (camera.h:429); in the
            # endpoint-tie regime the reciprocal-multiply form shifts the
            # fp acceptance rate (14.8% vs the binary's 13.6% measured)
            du = Vec3(diff.x / dist, diff.y / dist, diff.z / dist)
        else:
            inv_dist = 1.0 / dist
            du = Vec3(diff.x * inv_dist, diff.y * inv_dist, diff.z * inv_dist)
        sgn_cam = du.x * cn.x[None] + du.y * cn.y[None] + du.z * cn.z[None]
        sgn_light = v3.dot(light.normal, -du)
        cos_cam = jnp.abs(sgn_cam)
        cos_light = jnp.abs(sgn_light)
        pair_ok = pair_ok & (cos_cam > 0.0) & (cos_light > 0.0)
        if mis:
            # one-sided connections: the reference's abs() cosines transport
            # light through the BACK of one-sided lambertian surfaces
            # (camera.h:455-456) — paths the forward strategies can never
            # sample, which no weighting can repair.  bdpt-mis therefore
            # requires same-hemisphere connections (isotropic scatterers
            # stay two-sided, matching their spherical pdf).
            from bpt_tpu.scene.types import MAT_ISOTROPIC

            iso_c = cmtype == MAT_ISOTROPIC
            iso_l = lmt_all == MAT_ISOTROPIC
            pair_ok = pair_ok & (iso_c[None] | (sgn_cam > 0.0))
            pair_ok = pair_ok & (iso_l | (sgn_light > 0.0))

        # visible(a, b) (camera.h:425-438) with the endpoint margin;
        # the occlusion test itself is the CALLER's (per-slot wave or
        # the round-5 batched cross-slot wave)
        max_t = dist - 0.001
        pair_ok = pair_ok & (max_t > 0.0)
        so = Vec3(
            cp.x[None] + 0.001 * du.x,
            cp.y[None] + 0.001 * du.y,
            cp.z[None] + 0.001 * du.z,
        )
        t_vis = max_t if ref_vis else max_t * (1.0 - SHADOW_EPS_REL)

        g = (cos_cam * cos_light) / jnp.maximum(dist2, 1e-30)
        contrib = Vec3(
            cam_factor.x[None] * light_factor.x * g,
            cam_factor.y[None] * light_factor.y * g,
            cam_factor.z[None] * light_factor.z * g,
        )
        if mis:
            d2s = jnp.maximum(dist2, 1e-30)
            # reverse pdf of the camera junction vertex: light junction's
            # scattering pdf toward it (emitter slot: cos/pi exit pdf via
            # MAT_LIGHT), area measure
            rev_c = jnp.where(
                l_delta_f > 0.5, 0.0,
                sh.bsdf_pdf_value(lmt_all, light.normal, -du),
            ) * cos_cam / d2s  # [S_l, B]
            # reverse pdf of the light junction vertex: camera junction's
            # scattering pdf toward it
            rev_l = jnp.where(
                row(cam.delta, s)[None], 0.0,
                sh.bsdf_pdf_value(cmtype[None], Vec3(cn.x[None], cn.y[None],
                                                     cn.z[None]), du),
            ) * cos_light / d2s  # [S_l, B]
            # junction endpoints are non-delta wherever the pair
            # contributes, so zero reverse pdfs here are genuine (backside
            # cos) and must NOT be remapped — they zero those strategies
            pf_c = _remap0(row(mis_c.pfwd, s))  # [B]
            rc_ratio = rev_c / pf_c[None]
            rl_ratio = rev_l / _remap0(mis_l.pfwd)
            # realizability clamp: strategies keeping i camera vertices
            # need the light side k - i <= max_depth, so i >= k - D with
            # k = (s+1) + (n+1); symmetric for the light side
            k_tot = s + n_idx + 2  # [S_l]
            cmask = (i_idx[None, :] >= (k_tot - max_depth)[:, None]).astype(dtype)
            Pm = row(P_c, s)  # [S_c, B]
            # HIGHEST: TPU dot_general defaults to bf16 truncation, which
            # would bias the power-heuristic weights (CLAUDE.md invariant)
            sum_c = rc_ratio * rc_ratio * jnp.einsum(
                "ni,ib->nb", cmask, Pm,
                precision=jax.lax.Precision.HIGHEST)
            lmask = (j_idx[None, :] >= (k_tot - max_depth)[:, None]).astype(dtype)
            sum_l = rl_ratio * rl_ratio * jnp.einsum(
                "nj,njb->nb", lmask * (j_idx[None, :] <= n_idx[:, None]), P_l,
                precision=jax.lax.Precision.HIGHEST)
            w_mis = 1.0 / (1.0 + sum_c + sum_l)
            contrib = Vec3(contrib.x * w_mis, contrib.y * w_mis,
                           contrib.z * w_mis)
        return pair_ok, so, du, t_vis, contrib

    def accumulate(acc, pair_ok, contrib):
        """Occlusion already folded into pair_ok; same masked sums (and
        order) in both modes — the two are bit-identical."""
        total, n_shadow = acc
        masked = v3.where(pair_ok, contrib, _zv3(S_l, B, dtype))
        total = Vec3(
            total.x + jnp.sum(masked.x, axis=0),
            total.y + jnp.sum(masked.y, axis=0),
            total.z + jnp.sum(masked.z, axis=0),
        )
        return (total, n_shadow + jnp.sum(pair_ok, dtype=jnp.int32))

    zeros = jnp.zeros((B,), dtype)
    acc0 = (Vec3(zeros, zeros, zeros), jnp.int32(0))

    import os

    if (soa.sparse_any_ok(scene, dtype) and S_l >= 3 and S_c <= UNROLL_MAX
            and os.environ.get("BPT_TPU_CONNECT_BATCH", "") != ""):
        # Round-5 study option (OPT-IN, BPT_TPU_CONNECT_BATCH=1 +
        # BPT_TPU_CONNECT_SPARSE=1): ONE cross-slot occlusion launch
        # over every slot's compacted survivors.  MEASURED SLOWER than
        # the plain per-slot full-wave any-hit (0.638 vs 0.758 Mrays/s
        # coffee-91k bdpt-mis, interleaved medians,
        # tools/probe_connect_batch.py): the FTB kernel already parks
        # masked lanes in tail tiles that stream nothing, so the dense
        # launch saves little kernel work while holding every slot's
        # contribution terms live (HBM pressure) and paying the
        # compact/scatter plumbing.  Kept because it is bit-identical
        # to the per-slot path (tests) and is the right shape if the
        # any-hit kernel ever stops tail-parking.
        terms = [slot_terms(s, dyn=False) for s in range(S_c)]
        waves = [
            (Vec3(*(c.reshape(-1) for c in so)),
             Vec3(*(c.reshape(-1) for c in du)),
             t_vis.reshape(-1), pair_ok.reshape(-1))
            for (pair_ok, so, du, t_vis, _contrib) in terms
        ]
        occs = soa.any_hit_sparse_multi(scene, waves, T_MIN, cap=B)
        acc = acc0
        for (pair_ok, _so, _du, _tv, contrib), occ in zip(terms, occs):
            acc = accumulate(acc, pair_ok & ~occ.reshape(S_l, B), contrib)
        return acc

    def body(s, acc):
        pair_ok, so, du, t_vis, contrib = slot_terms(s, dyn=True)
        so_f = Vec3(*(c.reshape(-1) for c in so))
        du_f = Vec3(*(c.reshape(-1) for c in du))
        if soa.sparse_any_ok(scene, dtype) and S_l >= 3:
            # connection waves are ~3-7% valid (docs/ROADMAP.md round-4
            # stage split): compact to a B-lane prefix wave instead of
            # paying O(S_l*B) sort/key/grid work per slot; exact at any
            # density (cond fallback inside)
            occluded = soa.any_hit_sparse(
                scene, so_f, du_f, T_MIN, t_vis.reshape(-1),
                mask=pair_ok.reshape(-1), cap=B,
            ).reshape(S_l, B)
        else:
            occluded = soa.any_hit(
                scene, so_f, du_f, T_MIN, t_vis.reshape(-1),
                mask=pair_ok.reshape(-1),
            ).reshape(S_l, B)
        return accumulate(acc, pair_ok & ~occluded, contrib)

    total, n_shadow = _loop(S_c, body, acc0)
    return total, n_shadow


def bdpt_fast(scene: SceneArrays, origins, dirs, ray_ids, key, max_depth: int,
              mis: bool = False, ref_vis: bool = False):
    """Dispatch: fused Pallas BDPT megakernel on TPU for SMEM-resident
    scenes, else the oracle-pinned jnp wavefront.  ``key`` is the base
    render key (streams 2/3/4 fold internally); ray_ids < 0 = inactive.
    ``mis`` (integrator bdpt-mis) runs fused on the megakernel too
    (round 3); ``ref_vis`` (endpoint-artifact emulation) forces the jnp
    wavefront."""
    import os

    import jax as _jax

    from bpt_tpu.core import rng as rng_mod
    from bpt_tpu.models import pt as pt_mod
    from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel
    from bpt_tpu.ops.pallas.pt_kernel import megakernel_ok

    enabled = os.environ.get("BPT_TPU_NO_MEGAKERNEL", "") == ""
    if (enabled and not ref_vis
            and _jax.default_backend() == "tpu"
            and megakernel_ok(scene, "bdpt")):
        o = v3.from_array(origins)
        d = v3.from_array(dirs)
        rx, ry, rz, rays, shadow, extra = bdpt_megakernel(
            scene, o, d, ray_ids, key, max_depth, mis=mis
        )
        rad = jnp.stack([rx, ry, rz], axis=-1)
        stats = BDPTStats(
            rays_traced=rays.astype(jnp.int32),
            shadow_rays=shadow.astype(jnp.int32),
            node_visits=extra[0],
            aabb_hits=extra[1],
            tri_tests=extra[2],
            tri_hits=extra[3],
        )
        return rad, stats
    active = ray_ids >= 0
    ids = jnp.maximum(ray_ids, 0)
    dtype = origins.dtype
    k_cam = jax.random.fold_in(key, 2)
    k_ls = jax.random.fold_in(key, 3)
    k_lt = jax.random.fold_in(key, 4)
    ls_u = rng_mod.wave_uniforms(k_ls, ids, 0, NLS, dtype=dtype)
    rad, stats = bdpt_radiance(
        scene, origins, dirs, max_depth,
        pt_mod.default_uniforms_fn(k_cam, ids, dtype),
        ls_u,
        pt_mod.default_uniforms_fn(k_lt, ids, dtype),
        mis=mis, ref_vis=ref_vis,
    )
    return jnp.where(active[..., None], rad, 0.0), stats


def bdpt_radiance(
    scene: SceneArrays,
    origins,
    dirs,
    max_depth: int,
    cam_uniforms_fn,
    light_start_u,
    light_uniforms_fn,
    mis: bool = False,
    ref_vis: bool = False,
):
    """bidirectional_color (camera.h:294-323) for a batch of primary rays.

    light_start_u: [B, NLS] array (or NLS rows of [B]).
    ``mis`` switches on power-heuristic multiple importance sampling over
    the (s, t) strategies — OUR upgrade, not in the reference (which
    overcounts by summing all pairs unweighted, camera.h:316-320).
    """
    B = origins.shape[0]
    dtype = origins.dtype
    o0 = v3.from_array(origins)
    d0 = v3.from_array(dirs)
    ones = jnp.ones((B,), dtype)

    if not isinstance(light_start_u, (list, tuple)):
        light_start_u = [light_start_u[:, i] for i in range(NLS)]

    mis_prev_cam = None
    if mis:
        mis_prev_cam = dict(
            p=o0,
            n=v3.normalize_safe(d0),
            delta=jnp.ones((B,), bool),  # camera: pfwd[0] -> 0 -> remap 1
            mtype=jnp.zeros((B,), jnp.int32),
            pfwd=ones,
        )
    cam_out = trace_subpath(
        scene, o0, d0, Vec3(ones, ones, ones), jnp.ones((B,), bool),
        max_depth, cam_uniforms_fn, collect_background=True,
        mis_prev=mis_prev_cam,
    )
    if mis:
        cam, bg_acc, stats_c, mis_c = cam_out
    else:
        cam, bg_acc, stats_c = cam_out
        mis_c = None

    # camera-vertex emission (camera.h:305-309); strategy (s=0, t) under MIS
    emit_mask = cam.valid & ~cam.delta
    ve = v3.where(emit_mask, cam.thr * cam.emit, _zv3(max_depth, B, dtype))
    if mis:
        # reverse pdf of the emitting vertex under the s>=1 strategies:
        # the emitter-area pdf of sample_surface (area-weighted pick ->
        # 1/total_area anywhere on any light, shade_soa.sample_surface)
        inv_area = jnp.where(
            scene.light_total_area > 0.0,
            1.0 / jnp.maximum(scene.light_total_area, 1e-30), 0.0,
        ).astype(dtype)
        P_c = mis_strategy_table(mis_c)  # [S, S, B]
        sums = jnp.sum(P_c, axis=1)  # [S, B]; k = m+1 <= D: no clamp needed
        r_em = inv_area / _remap0(mis_c.pfwd)
        w_em = 1.0 / (1.0 + r_em * r_em * sums)
        ve = Vec3(ve.x * w_em, ve.y * w_em, ve.z * w_em)
    result = Vec3(
        bg_acc.x + jnp.sum(ve.x, axis=0),
        bg_acc.y + jnp.sum(ve.y, axis=0),
        bg_acc.z + jnp.sum(ve.z, axis=0),
    )

    light_out = build_light_subpath(
        scene, B, max_depth, light_start_u, light_uniforms_fn, dtype, mis=mis
    )
    if mis:
        emitter, traced, path_ok, stats_l, mis_l = light_out
    else:
        emitter, traced, path_ok, stats_l = light_out
        mis_l = None
    light = _concat_vertices(emitter, traced) if max_depth > 1 else emitter

    connect, n_shadow = connect_paths(scene, cam, light, mis_c=mis_c,
                                      mis_l=mis_l, max_depth=max_depth,
                                      ref_vis=ref_vis)
    result = Vec3(
        result.x + connect.x, result.y + connect.y, result.z + connect.z
    )

    stats = BDPTStats(
        rays_traced=stats_c.rays_traced + stats_l.rays_traced,
        shadow_rays=n_shadow,
        node_visits=stats_c.node_visits + stats_l.node_visits,
        aabb_hits=stats_c.aabb_hits + stats_l.aabb_hits,
        tri_tests=stats_c.tri_tests + stats_l.tri_tests,
        tri_hits=stats_c.tri_hits + stats_l.tri_hits,
    )
    return v3.to_array(result), stats
