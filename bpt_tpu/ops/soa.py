"""SoA hot-path intersection: brute-force closest hit and threaded-BVH
traversal over component arrays.

Semantically identical to ops.intersect / ops.traverse (the oracle tests pin
both), but every per-ray quantity is a flat [B] array so the VPU runs at
full lane width, and the BVH walk is a single batched while_loop (all lanes
step in lockstep; finished lanes idle at i == num_nodes).

Scene data is accessed through column views (loop-invariant slices of the
[T,3] arrays — XLA hoists them out of the loops).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bpt_tpu.core import vec3 as v3
from bpt_tpu.core.vec3 import Vec3
from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN  # noqa: F401
from bpt_tpu.scene.types import SceneArrays


class HitSoA(NamedTuple):
    hit: jnp.ndarray  # [B] bool
    t: jnp.ndarray  # [B] (inf when miss)
    tri: jnp.ndarray  # [B] int32
    u: jnp.ndarray  # [B]
    v: jnp.ndarray  # [B]
    # reference BvhStats counters, summed over the wave
    node_visits: jnp.ndarray  # scalar int32
    aabb_hits: jnp.ndarray
    tri_tests: jnp.ndarray
    tri_hits: jnp.ndarray


def _tri_columns(scene: SceneArrays):
    return (
        v3.from_array(scene.v0),
        v3.from_array(scene.e1),
        v3.from_array(scene.e2),
    )


def _mt_one(v0c: Vec3, e1c: Vec3, e2c: Vec3, ti, o: Vec3, d: Vec3):
    """Möller–Trumbore of the whole wave against triangle(s) ti ([B] or
    scalar index). Returns (det, t, u, v) — caller applies the validity
    predicate (triangle.h:41-74)."""
    tv0 = Vec3(v0c.x[ti], v0c.y[ti], v0c.z[ti])
    te1 = Vec3(e1c.x[ti], e1c.y[ti], e1c.z[ti])
    te2 = Vec3(e2c.x[ti], e2c.y[ti], e2c.z[ti])
    pvec = v3.cross(d, te2)
    det = v3.dot(te1, pvec)
    inv = 1.0 / det
    tvec = o - tv0
    u = v3.dot(tvec, pvec) * inv
    qvec = v3.cross(tvec, te1)
    v = v3.dot(d, qvec) * inv
    t = v3.dot(te2, qvec) * inv
    return det, t, u, v


def _mt_valid(det, t, u, v, tmin, tmax):
    return (
        (jnp.abs(det) >= MT_EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax)
    )


def _col2(a, k):
    """[T,3] column k as a [T,1] sublane-major operand."""
    return a[:, k][:, None]


def _mt_all(v0a, e1a, e2a, o: Vec3, d: Vec3):
    """Möller–Trumbore of every ray against every triangle as one [T, B]
    broadcast: T rides the 8-wide sublanes, B the 128-wide lanes — no loops,
    no gathers, fast to compile and full VPU utilization."""
    dx, dy, dz = d.x[None], d.y[None], d.z[None]  # [1,B]
    ox, oy, oz = o.x[None], o.y[None], o.z[None]
    e2x, e2y, e2z = _col2(e2a, 0), _col2(e2a, 1), _col2(e2a, 2)  # [T,1]
    e1x, e1y, e1z = _col2(e1a, 0), _col2(e1a, 1), _col2(e1a, 2)
    v0x, v0y, v0z = _col2(v0a, 0), _col2(v0a, 1), _col2(v0a, 2)

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / det
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    return det, t, u, v  # all [T, B]


def brute_closest(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax) -> HitSoA:
    """Closest hit over all triangles via one [T,B] broadcast; argmin over
    the T axis (first-hit-wins on exact ties)."""
    T = scene.num_tris
    det, t, u, v = _mt_all(scene.v0, scene.e1, scene.e2, o, d)
    valid = _mt_valid(det, t, u, v, tmin[None], tmax[None])
    t_masked = jnp.where(valid, t, jnp.inf)
    tri = jnp.argmin(t_masked, axis=0).astype(jnp.int32)  # [B]
    t_best = jnp.min(t_masked, axis=0)
    hit = jnp.isfinite(t_best)
    ub = jnp.take_along_axis(u, tri[None], axis=0)[0]
    vb = jnp.take_along_axis(v, tri[None], axis=0)[0]
    B = o.x.shape[0]
    return HitSoA(
        hit=hit, t=t_best, tri=tri, u=ub, v=vb,
        node_visits=jnp.int32(0),
        aabb_hits=jnp.int32(0),
        tri_tests=jnp.int32(T) * B,
        tri_hits=jnp.sum(hit, dtype=jnp.int32),
    )


def brute_any(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax):
    """Any-hit over all triangles via one [T,B] broadcast."""
    det, t, u, v = _mt_all(scene.v0, scene.e1, scene.e2, o, d)
    valid = _mt_valid(det, t, u, v, tmin[None], tmax[None])
    return jnp.any(valid, axis=0)


def bvh_closest(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax) -> HitSoA:
    """Batched threaded-DFS traversal (same visit order and t-shrink as
    bvh_node::hit, src/acceleration/bvh.h:50-59)."""
    N = scene.bvh_skip.shape[0]
    B = o.x.shape[0]
    dtype = o.x.dtype

    bminc = v3.from_array(scene.bvh_min)
    bmaxc = v3.from_array(scene.bvh_max)
    skip = scene.bvh_skip
    first = scene.bvh_first
    count = scene.bvh_count
    v0c, e1c, e2c = _tri_columns(scene)

    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)

    def slab(ic, lo, hi):
        t0x = (bminc.x[ic] - o.x) * inv.x
        t1x = (bmaxc.x[ic] - o.x) * inv.x
        t0y = (bminc.y[ic] - o.y) * inv.y
        t1y = (bmaxc.y[ic] - o.y) * inv.y
        t0z = (bminc.z[ic] - o.z) * inv.z
        t1z = (bmaxc.z[ic] - o.z) * inv.z
        lox = jnp.minimum(t0x, t1x)
        hix = jnp.maximum(t0x, t1x)
        loy = jnp.minimum(t0y, t1y)
        hiy = jnp.maximum(t0y, t1y)
        loz = jnp.minimum(t0z, t1z)
        hiz = jnp.maximum(t0z, t1z)
        # NaN (o on slab, d == 0): treat axis as unconstrained (see
        # ops.intersect.slab_test)
        enter = jnp.maximum(
            jnp.maximum(_nan_to(-jnp.inf, lox), _nan_to(-jnp.inf, loy)),
            jnp.maximum(_nan_to(-jnp.inf, loz), lo),
        )
        exit_ = jnp.minimum(
            jnp.minimum(_nan_to(jnp.inf, hix), _nan_to(jnp.inf, hiy)),
            jnp.minimum(_nan_to(jnp.inf, hiz), hi),
        )
        return exit_ > enter

    def cond(state):
        return jnp.any(state[0] < N)

    def body(state):
        i, t_best, tri, ub, vb, nv, ah, tt, th = state
        active = i < N
        ic = jnp.minimum(i, N - 1)
        box_hit = slab(ic, tmin, t_best) & active
        cnt = count[ic]
        is_leaf = cnt > 0
        f0 = first[ic]

        do_leaf = box_hit & is_leaf

        def leaf_test(ti, active_l, t_best, tri, ub, vb, tt, th):
            det, t, u, v = _mt_one(v0c, e1c, e2c, ti, o, d)
            # replace on t <= t_best: reference interval.contains semantics
            ok = active_l & _mt_valid(det, t, u, v, tmin, t_best)
            tt = tt + jnp.sum(active_l, dtype=jnp.int32)
            th = th + jnp.sum(ok, dtype=jnp.int32)
            t_best = jnp.where(ok, t, t_best)
            tri = jnp.where(ok, ti, tri)
            ub = jnp.where(ok, u, ub)
            vb = jnp.where(ok, v, vb)
            return t_best, tri, ub, vb, tt, th

        T = scene.num_tris
        ti0 = jnp.minimum(f0, T - 1)
        ti1 = jnp.minimum(f0 + 1, T - 1)
        t_best, tri, ub, vb, tt, th = leaf_test(ti0, do_leaf, t_best, tri, ub, vb, tt, th)
        t_best, tri, ub, vb, tt, th = leaf_test(
            ti1, do_leaf & (cnt > 1), t_best, tri, ub, vb, tt, th
        )

        nv = nv + jnp.sum(active, dtype=jnp.int32)
        ah = ah + jnp.sum(box_hit, dtype=jnp.int32)
        nxt = jnp.where(box_hit & ~is_leaf, ic + 1, skip[ic])
        i = jnp.where(active, nxt, i)
        return (i, t_best, tri, ub, vb, nv, ah, tt, th)

    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, dtype), (B,))
    init = (
        jnp.zeros((B,), jnp.int32),
        tmax_b,
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), dtype),
        jnp.zeros((B,), dtype),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
    )
    i, t_best, tri, ub, vb, nv, ah, tt, th = jax.lax.while_loop(cond, body, init)
    hit = tri >= 0
    return HitSoA(
        hit=hit,
        t=jnp.where(hit, t_best, jnp.inf),
        tri=jnp.maximum(tri, 0),
        u=ub, v=vb,
        node_visits=nv, aabb_hits=ah, tri_tests=tt, tri_hits=th,
    )


def _nan_to(val, x):
    return jnp.where(jnp.isnan(x), x.dtype.type(val), x)


def bvh_any(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax):
    """Batched any-hit traversal with whole-wave early exit."""
    N = scene.bvh_skip.shape[0]
    B = o.x.shape[0]
    dtype = o.x.dtype

    bminc = v3.from_array(scene.bvh_min)
    bmaxc = v3.from_array(scene.bvh_max)
    skip = scene.bvh_skip
    first = scene.bvh_first
    count = scene.bvh_count
    v0c, e1c, e2c = _tri_columns(scene)
    T = scene.num_tris

    inv = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, dtype), (B,))
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, dtype), (B,))

    def slab(ic, active):
        t0x = (bminc.x[ic] - o.x) * inv.x
        t1x = (bmaxc.x[ic] - o.x) * inv.x
        t0y = (bminc.y[ic] - o.y) * inv.y
        t1y = (bmaxc.y[ic] - o.y) * inv.y
        t0z = (bminc.z[ic] - o.z) * inv.z
        t1z = (bmaxc.z[ic] - o.z) * inv.z
        enter = jnp.maximum(
            jnp.maximum(
                _nan_to(-jnp.inf, jnp.minimum(t0x, t1x)),
                _nan_to(-jnp.inf, jnp.minimum(t0y, t1y)),
            ),
            jnp.maximum(_nan_to(-jnp.inf, jnp.minimum(t0z, t1z)), tmin_b),
        )
        exit_ = jnp.minimum(
            jnp.minimum(
                _nan_to(jnp.inf, jnp.maximum(t0x, t1x)),
                _nan_to(jnp.inf, jnp.maximum(t0y, t1y)),
            ),
            jnp.minimum(_nan_to(jnp.inf, jnp.maximum(t0z, t1z)), tmax_b),
        )
        return (exit_ > enter) & active

    def cond(state):
        i, found = state
        return jnp.any((i < N) & ~found)

    def body(state):
        i, found = state
        active = (i < N) & ~found
        ic = jnp.minimum(i, N - 1)
        box_hit = slab(ic, active)
        cnt = count[ic]
        is_leaf = cnt > 0
        f0 = first[ic]
        do_leaf = box_hit & is_leaf

        det, t, u, v = _mt_one(v0c, e1c, e2c, jnp.minimum(f0, T - 1), o, d)
        h0 = _mt_valid(det, t, u, v, tmin_b, tmax_b)
        det, t, u, v = _mt_one(v0c, e1c, e2c, jnp.minimum(f0 + 1, T - 1), o, d)
        h1 = _mt_valid(det, t, u, v, tmin_b, tmax_b) & (cnt > 1)
        found = found | (do_leaf & (h0 | h1))

        nxt = jnp.where(box_hit & ~is_leaf, ic + 1, skip[ic])
        i = jnp.where(active, nxt, i)
        return (i, found)

    _, found = jax.lax.while_loop(
        cond, body, (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool))
    )
    return found


# ----------------------------------------------------------------- dispatch


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def _tri_flat(scene: SceneArrays):
    """[T*9] interleaved (v0, e1, e2) for the Pallas SMEM prefetch."""
    return jnp.concatenate(
        [scene.v0, scene.e1, scene.e2], axis=1
    ).reshape(-1).astype(jnp.float32)


def _pallas_brute_closest(scene, o: Vec3, d: Vec3, tmin_b, tmax_b) -> HitSoA:
    from bpt_tpu.ops.pallas.intersect import closest_pallas

    t, tri, u, v = closest_pallas(
        _tri_flat(scene), o.x, o.y, o.z, d.x, d.y, d.z, tmin_b, tmax_b
    )
    hit = jnp.isfinite(t)
    B = o.x.shape[0]
    return HitSoA(
        hit=hit, t=t, tri=jnp.maximum(tri, 0), u=u, v=v,
        node_visits=jnp.int32(0),
        aabb_hits=jnp.int32(0),
        tri_tests=jnp.int32(scene.num_tris) * B,
        tri_hits=jnp.sum(hit, dtype=jnp.int32),
    )


def _wave_cluster_ok(scene, dtype) -> bool:
    """Large-scene TPU wavefront path: Morton-sorted rays + clustered
    streaming Pallas kernel (cluster_wave.py).  Used where the batched
    while_loop BVH would be chosen but the scene exceeds the SMEM brute
    budget (the jnp BVH path faults the TPU on ~90k-tri scenes)."""
    import os

    from bpt_tpu.ops.pallas.clusters import cluster_pages_ok

    return (
        _on_tpu()
        and dtype == jnp.float32
        and bool(scene.use_bvh)
        and scene.num_tris > 512
        # round 4: past the single-table SMEM budget the FTB dispatch
        # PAGES the combined table (min-t / OR merge across pages)
        and cluster_pages_ok(scene)
        and os.environ.get("BPT_TPU_NO_WAVE_CLUSTER", "") == ""
    )


def _require_single_page_unless_ftb(scene, ftb: bool):
    """The non-FTB clustered impls (plucker study path, env-disabled FTB,
    non-production intervals) take ONE combined table; paging is an FTB
    feature.  Raise the clean capacity error instead of silently packing
    an over-budget table Mosaic would reject."""
    if ftb:
        return
    from bpt_tpu.ops.pallas.clusters import MAX_TABLE_F32, cluster_ok

    if not cluster_ok(scene):
        raise RuntimeError(
            f"scene ({scene.num_tris} tris) exceeds the single-table "
            f"clustered budget ({MAX_TABLE_F32 * 4 // 1024} KB measured, "
            f"tools/probe_capacity.py) and the paged path requires the "
            f"FTB kernels — unset BPT_TPU_NO_FTB / BPT_TPU_WAVE_IMPL, or "
            f"trace over the production (T_MIN, inf)/(T_MIN, tmax] "
            f"interval shapes"
        )


def _sort_key(scene, o: Vec3, d: Vec3, mask=None):
    """Morton(origin)+octant(dir) coherence key (f32 inputs).

    ``mask``: lanes with mask=False get the maximum key, so they sort
    into a contiguous TAIL — whole [rows, 128] kernel tiles of dead
    lanes then fail every supercluster slab test (their tmax is 0) and
    stream no clusters at all.  This matters most for BDPT connection
    waves, where ~90% of the (s, t) candidate lanes are masked off
    (invalid pairs) and would otherwise dilute live tiles 10x."""
    from bpt_tpu.ops.pallas.cluster_wave import morton_octant_key

    lo = scene.bvh_min[0].astype(jnp.float32)
    hi = scene.bvh_max[0].astype(jnp.float32)
    key = morton_octant_key(
        lo, hi,
        o.x.astype(jnp.float32), o.y.astype(jnp.float32),
        o.z.astype(jnp.float32),
        d.x.astype(jnp.float32), d.y.astype(jnp.float32),
        d.z.astype(jnp.float32),
    )
    if mask is not None:
        key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))
    return key


def _wave_impls():
    """(pack_fn, closest_fn, any_fn).  Default: the VPU lane-roll variant
    (exact Möller–Trumbore arithmetic, 8 KB DMA/cluster).
    BPT_TPU_WAVE_IMPL=plucker selects the MXU Plücker kernel — measured
    equal on v5e (the f32 sign tests force Precision.HIGHEST, and the
    epilogue is VPU-bound), kept for bf16/two-pass experiments."""
    import os

    if os.environ.get("BPT_TPU_WAVE_IMPL", "roll") == "plucker":
        from bpt_tpu.ops.pallas.plucker import (
            pack_plucker_clusters, plucker_any_pallas, plucker_closest_pallas)

        return pack_plucker_clusters, plucker_closest_pallas, plucker_any_pallas
    from bpt_tpu.ops.pallas.cluster_wave import (
        clustered_any_pallas, clustered_closest_pallas)
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled

    return pack_clusters_rolled, clustered_closest_pallas, clustered_any_pallas


def _is_static(x, val) -> bool:
    """True when x is a concrete python/numpy scalar equal to val."""
    try:
        return not isinstance(x, jax.core.Tracer) and float(x) == val
    except (TypeError, ValueError):
        return False


def _ftb_sort_key(o: Vec3, d: Vec3, mask):
    """Round-4 coherence key for the soa clustered dispatch: the
    oct-major + adaptive-live-cell + direction-fine key pt_wave measured
    2x over the old morton-major key at the intersect level
    (tools/probe_traversal.py), with masked lanes parked at the tail so
    dead tiles stream nothing."""
    from bpt_tpu.ops.pallas.pt_wave import _coherence_key

    ox = o.x.astype(jnp.float32)
    oy = o.y.astype(jnp.float32)
    oz = o.z.astype(jnp.float32)
    alive = (jnp.ones(ox.shape, bool) if mask is None else mask)
    big = jnp.float32(3.4e38)
    lo_b = jnp.stack([jnp.min(jnp.where(alive, vv, big))
                      for vv in (ox, oy, oz)])
    hi_b = jnp.stack([jnp.max(jnp.where(alive, vv, -big))
                      for vv in (ox, oy, oz)])
    return _coherence_key(lo_b, hi_b, ox, oy, oz,
                          d.x.astype(jnp.float32),
                          d.y.astype(jnp.float32),
                          d.z.astype(jnp.float32),
                          alive.astype(jnp.float32))


def _clustered_sorted_closest(scene, o: Vec3, d: Vec3, tmin_b, tmax_b,
                              mask, ftb_ok: bool = False) -> HitSoA:
    import os

    B = o.x.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    # multi-payload lax.sort in BOTH directions instead of argsort +
    # per-array gathers: XLA's TPU sort moves payload operands nearly
    # free while gathers cost ~35 ms EACH at multi-M sizes
    # (tools/probe_gather.py; same trick as pt_wave's bounce loop)
    ftb = (ftb_ok
           and os.environ.get("BPT_TPU_WAVE_IMPL", "roll") == "roll"
           and os.environ.get("BPT_TPU_NO_FTB", "") == "")
    _require_single_page_unless_ftb(scene, ftb)
    if ftb:
        # round 4: the pt_wave traversal machinery (front-to-back super
        # ordering, paired DMA, 32-row tiles) on the standalone path;
        # past-budget scenes run one launch per table PAGE with a min-t
        # merge (cross-page t-tie winners may differ from the
        # single-table traversal order — same measure-zero class as
        # BPT_TPU_PAIR_IL, docs/PARITY.md BVH row)
        from bpt_tpu.ops.pallas.cluster_wave import (
            clustered_closest_ftb_pallas)
        from bpt_tpu.ops.pallas.clusters import pack_clusters_pages

        alive_f = (jnp.ones((B,), jnp.float32) if mask is None
                   else mask.astype(jnp.float32))
        key = _ftb_sort_key(o, d, mask)
        (_, sox, soy, soz, sdx, sdy, sdz, sact, sidx) = jax.lax.sort(
            (key, o.x, o.y, o.z, d.x, d.y, d.z, alive_f, idx),
            num_keys=1)
        t = tri = u = v = None
        for (_Cp, aabb, blocks, order_t) in pack_clusters_pages(scene):
            t_p, tri_p, u_p, v_p = clustered_closest_ftb_pallas(
                aabb, order_t, blocks, sox, soy, soz, sdx, sdy, sdz, sact)
            if t is None:
                t, tri, u, v = t_p, tri_p, u_p, v_p
            else:
                take = t_p < t
                t = jnp.where(take, t_p, t)
                tri = jnp.where(take, tri_p, tri)
                u = jnp.where(take, u_p, u)
                v = jnp.where(take, v_p, v)
    else:
        pack, closest_fn, _ = _wave_impls()
        _C, aabb, blocks = pack(scene)
        key = _sort_key(scene, o, d, mask)
        (_, sox, soy, soz, sdx, sdy, sdz, stmin, stmax,
         sidx) = jax.lax.sort(
            (key, o.x, o.y, o.z, d.x, d.y, d.z, tmin_b, tmax_b, idx),
            num_keys=1)
        t, tri, u, v = closest_fn(
            aabb, blocks, sox, soy, soz, sdx, sdy, sdz, stmin, stmax)
    _, t, tri, u, v = jax.lax.sort(
        (sidx, t, tri.astype(jnp.int32), u, v), num_keys=1)
    if ftb and mask is not None:
        # dead lanes in live FTB tiles may record junk hits (the roll is
        # not lane-masked); the contract is culled = miss
        t = jnp.where(mask, t, jnp.inf)
        tri = jnp.where(mask, tri, -1)
    hit = jnp.isfinite(t)
    alive = jnp.sum(mask, dtype=jnp.int32) if mask is not None else o.x.shape[0]
    return HitSoA(
        hit=hit, t=t.astype(o.x.dtype), tri=jnp.maximum(tri, 0),
        u=u.astype(o.x.dtype), v=v.astype(o.x.dtype),
        node_visits=jnp.int32(0),
        aabb_hits=jnp.int32(0),
        tri_tests=alive * jnp.int32(scene.num_tris),
        tri_hits=jnp.sum(hit, dtype=jnp.int32),
    )


def closest_hit(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax, mask=None) -> HitSoA:
    """mask: optional [B] bool — lanes with mask=False are culled (their
    tmax collapses to 0 so BVH traversal exits after the root test) and
    excluded from the stats counters."""
    B = o.x.shape[0]
    dtype = o.x.dtype
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, dtype), (B,))
    if mask is not None:
        tmax_b = jnp.where(mask, tmax_b, 0.0)
    if scene.use_bvh:
        if _wave_cluster_ok(scene, dtype):
            tmin_b = jnp.broadcast_to(jnp.asarray(tmin, dtype), (B,))
            # every production caller traces over (T_MIN, inf): that
            # static shape rides the round-4 FTB kernels
            ftb_ok = (_is_static(tmin, T_MIN)
                      and _is_static(tmax, float("inf")))
            return _clustered_sorted_closest(scene, o, d, tmin_b, tmax_b,
                                             mask, ftb_ok=ftb_ok)
        if _on_tpu() and scene.num_tris > 65536:
            # the vmapped-while BVH FAULTS this platform at ~90k tris
            # (CLAUDE.md); reaching here past the PAGED clustered
            # capacity (MAX_PAGES backstop, env-disabled cluster path,
            # or non-f32) used to be a device fault — clean error instead
            from bpt_tpu.ops.pallas.clusters import MAX_PAGES

            # _wave_cluster_ok was False (we did not take the clustered
            # branch above), so there is no safe TPU path for this size
            raise RuntimeError(
                f"scene ({scene.num_tris} tris) has no TPU clustered "
                f"path here (pages > MAX_PAGES={MAX_PAGES}, "
                f"BPT_TPU_NO_WAVE_CLUSTER set, or dtype != f32) and "
                f"the batched-BVH fallback faults this platform on "
                f"large scenes; render on CPU or split the scene"
            )
        h = bvh_closest(scene, o, d, tmin, tmax_b)
        if mask is not None:
            # culled lanes still "visit" the root before exiting; uncount
            h = h._replace(
                node_visits=h.node_visits - jnp.sum(~mask, dtype=jnp.int32)
            )
        return h
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, dtype), (B,))
    if _on_tpu() and dtype == jnp.float32:
        h = _pallas_brute_closest(scene, o, d, tmin_b, tmax_b)
    else:
        h = brute_closest(scene, o, d, tmin_b, tmax_b)
    if mask is not None:
        h = h._replace(
            tri_tests=jnp.sum(mask, dtype=jnp.int32) * scene.num_tris,
            tri_hits=jnp.sum(h.hit & mask, dtype=jnp.int32),
        )
    return h


def any_hit(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax, mask=None):
    B = o.x.shape[0]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, o.x.dtype), (B,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, o.x.dtype), (B,))
    if mask is not None:
        tmax_b = jnp.where(mask, tmax_b, 0.0)
    if scene.use_bvh:
        if _wave_cluster_ok(scene, o.x.dtype):
            import os

            idx = jnp.arange(B, dtype=jnp.int32)
            ftb = (_is_static(tmin, T_MIN)
                   and os.environ.get("BPT_TPU_WAVE_IMPL", "roll") == "roll"
                   and os.environ.get("BPT_TPU_NO_FTB", "") == "")
            _require_single_page_unless_ftb(scene, ftb)
            if ftb:
                from bpt_tpu.ops.pallas.cluster_wave import (
                    clustered_any_ftb_pallas)
                from bpt_tpu.ops.pallas.clusters import pack_clusters_pages

                # mask rides tmax (<= 0 = dead); the oct-major key parks
                # dead lanes in tail tiles that stream nothing — the big
                # lever for BDPT connection waves (~90% masked lanes)
                key = _ftb_sort_key(o, d, mask)
                (_, sox, soy, soz, sdx, sdy, sdz, stmax,
                 sidx) = jax.lax.sort(
                    (key, o.x, o.y, o.z, d.x, d.y, d.z, tmax_b, idx),
                    num_keys=1)
                found = None
                for (_Cp, aabb, blocks, _ord) in pack_clusters_pages(scene):
                    f_p = clustered_any_ftb_pallas(
                        aabb, blocks, sox, soy, soz, sdx, sdy, sdz, stmax)
                    found = f_p if found is None else (found | f_p)
            else:
                pack, _, any_fn = _wave_impls()
                _C, aabb, blocks = pack(scene)
                # payload sorts instead of argsort+gathers (see
                # _clustered_sorted_closest)
                key = _sort_key(scene, o, d, mask)
                (_, sox, soy, soz, sdx, sdy, sdz, stmin, stmax,
                 sidx) = jax.lax.sort(
                    (key, o.x, o.y, o.z, d.x, d.y, d.z, tmin_b, tmax_b,
                     idx),
                    num_keys=1)
                found = any_fn(aabb, blocks, sox, soy, soz, sdx, sdy, sdz,
                               stmin, stmax)
            _, found_f = jax.lax.sort(
                (sidx, found.astype(jnp.float32)), num_keys=1)
            return found_f > 0.5
        return bvh_any(scene, o, d, tmin_b, tmax_b)
    if _on_tpu() and o.x.dtype == jnp.float32:
        from bpt_tpu.ops.pallas.intersect import any_pallas

        return any_pallas(
            _tri_flat(scene), o.x, o.y, o.z, d.x, d.y, d.z, tmin_b, tmax_b
        )
    return brute_any(scene, o, d, tmin_b, tmax_b)


def sparse_any_ok(scene, dtype) -> bool:
    """True when any_hit_sparse's compact branch (FTB clustered kernel)
    is available for this scene on this backend.  OPT-IN
    (BPT_TPU_CONNECT_SPARSE=1) since round 5: the slot-wave microbench
    win (242 -> 127 ms, probe_connect_onejit) does NOT convert e2e —
    the full-wave FTB any-hit already parks ~97%-masked lanes in tail
    tiles that stream nothing, so compaction only narrows the sort
    while adding compact+scatter work.  Interleaved e2e medians on
    coffee-91k bdpt-mis: full 0.758 / sparse 0.672 / cross-slot batch
    0.638 Mrays/s (tools/probe_connect_batch.py, round 5)."""
    import os

    return (
        _wave_cluster_ok(scene, dtype)
        and os.environ.get("BPT_TPU_WAVE_IMPL", "roll") == "roll"
        and os.environ.get("BPT_TPU_NO_FTB", "") == ""
        and os.environ.get("BPT_TPU_CONNECT_SPARSE", "") != ""
    )


def any_hit_sparse(scene: SceneArrays, o: Vec3, d: Vec3, tmin, tmax,
                   mask, cap: int, interpret: bool = False):
    """any_hit for sparsely-masked waves (BDPT connection waves measure
    ~3-7% valid): valid lanes are compacted to a ``cap``-lane prefix
    wave before the FTB kernel.  The full-wave path's dead-lane parking
    skips traversal for dead tiles but still pays O(N) sort-key math,
    a 9-payload sort, and the tile grid at full width; compaction makes
    all of that O(cap) (measured 242 -> 127 ms per 5.2M-lane slot wave,
    tools/probe_connect_onejit.py).

    Exact at any density: a lax.cond falls back to the full wave when
    the valid count exceeds ``cap``.  Per-lane any-hit results are
    tile-composition-independent (a lane's predicate is exact M-T over
    (T_MIN, tmax]; extra shared-tile work cannot flip it), so the
    compact branch is bit-equal to the full wave.  Requires
    ``sparse_any_ok`` and tmin == T_MIN (the FTB kernels' static tmin).
    """
    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_pages

    assert _is_static(tmin, T_MIN), "FTB kernels fix tmin = T_MIN"
    pages = pack_clusters_pages(scene)
    N = o.x.shape[0]
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, o.x.dtype), (N,))

    def compact():
        idx = jnp.arange(N, dtype=jnp.int32)
        # validity-major 2-column sort: cheaper than jnp.nonzero at
        # multi-M lanes (probe_connect_onejit) and gives the stable
        # valid-first index prefix
        vkey = jnp.where(mask, idx, jnp.int32(0x7FFFFFFF))
        _, sel_full = jax.lax.sort((vkey, idx), num_keys=1)
        sel = sel_full[:cap]
        in_range = mask[sel]
        seli = jnp.where(in_range, sel, 0)
        ox = jnp.where(in_range, o.x[seli], 0.0)
        oy = jnp.where(in_range, o.y[seli], 0.0)
        oz = jnp.where(in_range, o.z[seli], 0.0)
        dx = jnp.where(in_range, d.x[seli], 1.0)
        dy = jnp.where(in_range, d.y[seli], 0.0)
        dz = jnp.where(in_range, d.z[seli], 0.0)
        tm = jnp.where(in_range, tmax_b[seli], 0.0)
        key = _ftb_sort_key(Vec3(ox, oy, oz), Vec3(dx, dy, dz), in_range)
        (_, sox, soy, soz, sdx, sdy, sdz, stm, ssel) = jax.lax.sort(
            (key, ox, oy, oz, dx, dy, dz, tm,
             jnp.where(in_range, sel, N)), num_keys=1)
        found = None
        for (_Cp, aabb, blocks, _ord) in pages:
            f_p = clustered_any_ftb_pallas(
                aabb, blocks, sox.astype(jnp.float32),
                soy.astype(jnp.float32), soz.astype(jnp.float32),
                sdx.astype(jnp.float32), sdy.astype(jnp.float32),
                sdz.astype(jnp.float32), stm.astype(jnp.float32),
                interpret=interpret)
            found = f_p if found is None else (found | f_p)
        out = jnp.zeros((N + 1,), jnp.float32
                        ).at[ssel].set(found.astype(jnp.float32))[:N]
        return out > 0.5

    if cap >= N:
        return compact()
    nv = jnp.sum(mask, dtype=jnp.int32)
    return jax.lax.cond(
        nv <= cap, compact,
        lambda: any_hit(scene, o, d, tmin, tmax, mask=mask))


def any_hit_sparse_multi(scene: SceneArrays, waves, tmin, cap: int,
                         interpret: bool = False):
    """any_hit_sparse over SEVERAL sparsely-masked waves at once: every
    wave's valid lanes are compacted to a ``cap``-lane prefix, the
    prefixes concatenated and FTB-sorted TOGETHER into one paged any-hit
    launch, and results scattered back per wave.  Round 5 (VERDICT r4
    item 1b): BDPT connection waves are ~3% valid per camera slot — one
    dense cross-slot launch replaces S_c per-slot launches, and sorting
    all slots' survivors together yields tighter kernel tiles (the same
    density lever the spp-batched waves measured, docs/ROADMAP.md).

    ``waves``: sequence of (o: Vec3 [N], d: Vec3 [N], tmax [N], mask
    [N] bool); Ns may differ.  Returns a list of occluded [N] bools.

    Exact at any density: a wave whose valid count exceeds ``cap``
    computes its own full-wave any_hit via lax.cond (its compacted
    candidates go dead in the shared launch).  Per-lane any-hit results
    are tile-composition-independent (exact M-T over (T_MIN, tmax];
    extra shared-tile work cannot flip a lane's predicate), so the
    output is bit-equal to per-wave any_hit at any grouping."""
    from bpt_tpu.ops.pallas.cluster_wave import clustered_any_ftb_pallas
    from bpt_tpu.ops.pallas.clusters import pack_clusters_pages

    assert _is_static(tmin, T_MIN), "FTB kernels fix tmin = T_MIN"
    pages = pack_clusters_pages(scene)
    total = sum(int(o.x.shape[0]) for (o, _d, _t, _m) in waves)

    parts = []
    occ_direct = []
    base = 0
    for (o, d, tmax, mask) in waves:
        N = o.x.shape[0]
        tmax_b = jnp.broadcast_to(jnp.asarray(tmax, o.x.dtype), (N,))
        idx = jnp.arange(N, dtype=jnp.int32)
        vkey = jnp.where(mask, idx, jnp.int32(0x7FFFFFFF))
        _, sel = jax.lax.sort((vkey, idx), num_keys=1)
        sel = sel[:cap]
        in_range = mask[sel]
        if cap >= N:
            overflow = jnp.asarray(False)
            od = jnp.zeros((N,), bool)
        else:
            overflow = jnp.sum(mask, dtype=jnp.int32) > cap

            def full(o=o, d=d, tmax=tmax, mask=mask):
                return any_hit(scene, o, d, tmin, tmax, mask=mask)

            od = jax.lax.cond(
                overflow, full, lambda N=N: jnp.zeros((N,), bool))
        live = in_range & ~overflow
        seli = jnp.where(in_range, sel, 0)
        parts.append((
            jnp.where(live, o.x[seli], 0.0),
            jnp.where(live, o.y[seli], 0.0),
            jnp.where(live, o.z[seli], 0.0),
            jnp.where(live, d.x[seli], 1.0),
            jnp.where(live, d.y[seli], 0.0),
            jnp.where(live, d.z[seli], 0.0),
            jnp.where(live, tmax_b[seli], 0.0),
            jnp.where(live, base + sel, total),  # scatter target
        ))
        occ_direct.append(od)
        base += int(N)

    ox, oy, oz, dx, dy, dz, tm, gsel = (
        jnp.concatenate([p[i] for p in parts]) for i in range(8))
    key = _ftb_sort_key(Vec3(ox, oy, oz), Vec3(dx, dy, dz), tm > 0.0)
    (_, sox, soy, soz, sdx, sdy, sdz, stm, sgsel) = jax.lax.sort(
        (key, ox, oy, oz, dx, dy, dz, tm, gsel), num_keys=1)
    found = None
    for (_Cp, aabb, blocks, _ord) in pages:
        f_p = clustered_any_ftb_pallas(
            aabb, blocks, sox.astype(jnp.float32), soy.astype(jnp.float32),
            soz.astype(jnp.float32), sdx.astype(jnp.float32),
            sdy.astype(jnp.float32), sdz.astype(jnp.float32),
            stm.astype(jnp.float32), interpret=interpret)
        found = f_p if found is None else (found | f_p)
    occ_all = jnp.zeros((total + 1,), jnp.float32
                        ).at[sgsel].set(found.astype(jnp.float32))[:total]

    out = []
    base = 0
    for (o, _d, _t, _m), od in zip(waves, occ_direct):
        N = int(o.x.shape[0])
        out.append((occ_all[base:base + N] > 0.5) | od)
        base += N
    return out


# ------------------------------------------------------------------ volumes


def _vol_closest(scene, vid, o: Vec3, d: Vec3, tmin, tmax):
    """Closest boundary hit of volume ``vid`` in (tmin, tmax) — the interval
    may be (-inf, inf): constant_medium probes with interval::universe
    (constant_medium.h:31-34).  [VT,B] broadcast, min over VT."""
    det, t, u, v = _mt_all(scene.vol_v0, scene.vol_e1, scene.vol_e2, o, d)
    owner = (scene.vol_tri_vol == vid)[:, None]
    valid = (
        owner
        & (jnp.abs(det) >= MT_EPSILON)
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax)
    )
    return jnp.min(jnp.where(valid, t, jnp.inf), axis=0)


def volume_interaction(scene, o: Vec3, d: Vec3, tmin, t_surf, u_rows, active):
    """constant_medium::hit (constant_medium.h:24-56) for every volume.

    t_surf: [B] — current closest surface t (the reference's closest_so_far
    shrink; volumes behave as if appended last to the hittable list).
    u_rows: V uniforms rows of [B] (one exponential free-flight draw each).
    Returns (hit [B], t [B], mat [B] int32).
    """
    B = o.x.shape[0]
    dtype = o.x.dtype
    d_len = v3.length(d)

    t_best = t_surf
    hit = jnp.zeros((B,), bool)
    mat = jnp.zeros((B,), jnp.int32)

    for vid in range(scene.num_volumes):
        t1 = _vol_closest(scene, vid, o, d, -jnp.inf, jnp.inf)
        h1 = jnp.isfinite(t1)
        t2 = _vol_closest(scene, vid, o, d, t1 + 1e-4, jnp.inf)
        h2 = jnp.isfinite(t2)

        tt1 = jnp.maximum(t1, jnp.asarray(tmin, dtype))
        tt2 = jnp.minimum(t2, t_best)
        ok = active & h1 & h2 & (tt1 < tt2)
        tt1 = jnp.maximum(tt1, 0.0)

        dist_inside = (tt2 - tt1) * d_len
        hd = scene.vol_neg_inv_density[vid] * jnp.log(u_rows[vid])
        ok = ok & (hd <= dist_inside)
        tv = tt1 + hd / d_len

        t_best = jnp.where(ok, tv, t_best)
        hit = jnp.where(ok, True, hit)
        mat = jnp.where(ok, scene.vol_mat[vid], mat)

    return hit, t_best, mat


def apply_volumes(scene, o: Vec3, d: Vec3, rec: "HitRecSoA", u_rows, active):
    """Override the surface hit record where a volume interaction comes
    first.  Volume hits get the reference's arbitrary normal (1,0,0),
    front_face=true (constant_medium.h:48-49), u=v=0."""
    t_surf = jnp.where(rec.hit, rec.t, jnp.inf)
    vhit, t_new, vmat = volume_interaction(scene, o, d, T_MIN, t_surf, u_rows, active)
    hit = rec.hit | vhit
    t = jnp.where(vhit, t_new, rec.t)
    t_safe = jnp.where(hit, t, 0.0)
    p = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    one = jnp.ones_like(t)
    zero = jnp.zeros_like(t)
    normal = v3.where(vhit, Vec3(one, zero, zero), rec.normal)
    return HitRecSoA(
        hit=hit,
        t=t,
        p=p,
        normal=normal,
        front_face=jnp.where(vhit, True, rec.front_face),
        tri=rec.tri,
        mat=jnp.where(vhit, vmat, rec.mat),
        u=jnp.where(vhit, 0.0, rec.u),
        v=jnp.where(vhit, 0.0, rec.v),
    )


class HitRecSoA(NamedTuple):
    hit: jnp.ndarray
    t: jnp.ndarray
    p: Vec3
    normal: Vec3  # flipped (set_face_normal, hittable.h:20-26)
    front_face: jnp.ndarray
    tri: jnp.ndarray
    mat: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def complete_hit(scene: SceneArrays, o: Vec3, d: Vec3, h: HitSoA) -> HitRecSoA:
    t_safe = jnp.where(h.hit, h.t, 0.0)
    p = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    nrm = v3.gather(scene.normal, h.tri)
    front = v3.dot(d, nrm) < 0.0
    normal = v3.where(front, nrm, -nrm)
    u, v = h.u, h.v
    if scene.has_textures:
        # per-vertex UV interpolation; the default table reproduces the
        # barycentric passthrough exactly (uv0=(0,0) uv1=(1,0) uv2=(0,1))
        uvt = scene.tri_uv[h.tri]
        u = uvt[:, 0] + u * (uvt[:, 2] - uvt[:, 0]) + v * (uvt[:, 4] - uvt[:, 0])
        v = uvt[:, 1] + h.u * (uvt[:, 3] - uvt[:, 1]) + h.v * (uvt[:, 5] - uvt[:, 1])
    return HitRecSoA(
        hit=h.hit, t=h.t, p=p, normal=normal, front_face=front,
        tri=h.tri, mat=scene.mat_id[h.tri], u=u, v=v,
    )
