"""Clustered scene layout + Pallas intersect providers for large scenes.

Scenes beyond the SMEM triangle budget (512 tris) use a TWO-LEVEL scheme
tuned to the TPU memory system instead of per-lane BVH pointer chasing
(the reference walks a shared_ptr BVH per ray, src/acceleration/bvh.h:50-59;
per-lane pointer chasing does not vectorize on the VPU):

* triangles stay in BVH-DFS order (spatially coherent — the builder already
  permutes them) and are chopped into clusters of CLUSTER_TRIS=32;
* SUPER=16 consecutive clusters form a supercluster (512 tris);
* both levels' AABBs live in SMEM (scalar prefetch, one combined table);
* per ray tile, the kernel slab-tests supercluster AABBs front-to-back
  (per direction-octant order table) and descends into the 16 member
  clusters only when ANY lane's interval is non-empty; a cluster hit DMAs
  its 8 KB triangle block HBM -> VMEM and runs a 32-step all-pairs lane
  roll (each of the 128 block lanes holds triangle lane%32, i.e. four
  replicas, so 32 roll steps give every ray lane every triangle).

No per-lane gathers anywhere; the divergence granularity is the whole tile,
which is the right trade for TPU — the tighter 32-tri leaves plus the
16x supercluster pre-cull keep the per-tile work close to what a BVH
gives a scalar machine, while the roll keeps the VPU at full width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN

LANES = 128
CLUSTER_TRIS = 32
REPL = LANES // CLUSTER_TRIS  # lane replicas per block (4)
SUPER = 16  # clusters per supercluster (512 tris)
BLOCK_ROWS = 16  # block rows: 13 fields + 3 pad
TRI_STRIDE = 13
# SMEM AABB table: (MAX_CLUSTERS + MAX_CLUSTERS/SUPER) * 6 * 4 B ~= 102 KB
MAX_CLUSTERS = 4096


def n_super(C: int) -> int:
    return (C + SUPER - 1) // SUPER


def cluster_ok(scene) -> bool:
    return scene.num_tris <= CLUSTER_TRIS * MAX_CLUSTERS


def _cluster_aabbs(scene, C):
    """[C*6] f32 cluster bounds (lo3 | hi3 per cluster) — pure jnp so it
    traces when the scene is a jit argument (the render driver's step
    passes it traced).  Padding triangles yield +inf/-inf rows."""
    T = scene.num_tris
    v0 = scene.v0.astype(jnp.float32)
    p1 = (scene.v0 + scene.e1).astype(jnp.float32)
    p2 = (scene.v0 + scene.e2).astype(jnp.float32)
    lo = jnp.minimum(v0, jnp.minimum(p1, p2))
    hi = jnp.maximum(v0, jnp.maximum(p1, p2))
    pad = C * CLUSTER_TRIS - T
    lo = jnp.concatenate([lo, jnp.full((pad, 3), jnp.inf, jnp.float32)])
    hi = jnp.concatenate([hi, jnp.full((pad, 3), -jnp.inf, jnp.float32)])
    clo = lo.reshape(C, CLUSTER_TRIS, 3).min(axis=1)
    chi = hi.reshape(C, CLUSTER_TRIS, 3).max(axis=1)
    return jnp.concatenate([clo, chi], axis=1).reshape(-1)


def _two_level_aabbs(scene, C):
    """(sc_lo/hi unions, padded cluster table) -> combined [S*6 + S*SUPER*6]
    f32 SMEM table: supercluster AABBs first, then cluster AABBs padded to
    a whole number of superclusters (padding boxes are empty: slab never
    passes)."""
    S = n_super(C)
    Cp = S * SUPER
    cl = _cluster_aabbs(scene, C).reshape(C, 6)
    if Cp > C:
        # padding boxes must FAIL the slab test.  An inverted box
        # (lo=+inf, hi=-inf) silently PASSES it — per axis min(t0,t1) is
        # -inf and max is +inf, i.e. it turns into an infinite box and the
        # resulting DMA reads past tri_hbm.  A degenerate finite point at
        # +3e38 gives enter == exit on every axis, which the strict
        # exit > enter test always rejects.
        empty = jnp.full((Cp - C, 6), 3e38, jnp.float32)
        cl = jnp.concatenate([cl, empty])
    lo = cl[:C, :3].reshape(-1, 3)
    hi = cl[:C, 3:].reshape(-1, 3)
    # supercluster union over the REAL members only
    padn = Cp - C
    lo_p = jnp.concatenate([lo, jnp.full((padn, 3), jnp.inf, jnp.float32)])
    hi_p = jnp.concatenate([hi, jnp.full((padn, 3), -jnp.inf, jnp.float32)])
    sc = jnp.concatenate(
        [lo_p.reshape(S, SUPER, 3).min(axis=1),
         hi_p.reshape(S, SUPER, 3).max(axis=1)], axis=1)
    return jnp.concatenate([sc.reshape(-1), cl.reshape(-1)])


def pack_clusters_rolled(scene):
    """Host-side packing -> (n_clusters,
    combined AABB table [S*6 + S*SUPER*6] f32 (SMEM),
    tri blocks [C, 16, 128] f32 (HBM)).

    Block layout: rows = 13 fields (v0 xyz, e1 xyz, e2 xyz, n xyz, mat;
    3 pad rows), lane L = triangle (L mod 32) of the cluster — four lane
    replicas so a 32-step roll shows every triangle to every ray lane.
    Padding lanes hold degenerate triangles (det == 0 -> never valid)."""
    T = scene.num_tris
    C = int(np.ceil(T / CLUSTER_TRIS))
    tri = jnp.concatenate(
        [scene.v0, scene.e1, scene.e2, scene.normal,
         scene.mat_id[:, None].astype(jnp.float32)],
        axis=1,
    ).astype(jnp.float32)  # [T,13]
    flat = jnp.zeros((C * CLUSTER_TRIS, TRI_STRIDE), jnp.float32).at[:T].set(tri)
    # [C, 32, 13] -> [C, 13, 32] -> replicate lanes x4 -> pad rows to 16
    blocks = flat.reshape(C, CLUSTER_TRIS, TRI_STRIDE).transpose(0, 2, 1)
    blocks = jnp.tile(blocks, (1, 1, REPL))
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((C, BLOCK_ROWS - TRI_STRIDE, LANES), jnp.float32)],
        axis=1,
    )
    return C, _two_level_aabbs(scene, C), blocks


def _mt_rolled_step(buf, cox, coy, coz, cdx, cdy, cdz):
    """One roll step: test every ray lane against the triangle in its lane.
    buf: [16, 128] field block. Rays: [R, 128]. Returns (ok-free values)."""
    v0x = buf[0][None, :]
    v0y = buf[1][None, :]
    v0z = buf[2][None, :]
    e1x = buf[3][None, :]
    e1y = buf[4][None, :]
    e1z = buf[5][None, :]
    e2x = buf[6][None, :]
    e2y = buf[7][None, :]
    e2z = buf[8][None, :]
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
    base_ok = (
        (jnp.abs(det) >= MT_EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= T_MIN)
    )
    return base_ok, t, u, v


def cluster_orders(scene, C):
    """[8*S] i32: for each direction octant, SUPERCLUSTER indices sorted
    front-to-back along the octant's dominant signs.  Visiting near-to-far
    lets the running t-min cull everything behind the first hit (the slab
    exit test already bounds by t_best), which is where BVH traversal gets
    its win.  Pure jnp; S<=256 argsorts are trivial."""
    S = n_super(C)
    comb = _two_level_aabbs(scene, C)
    sc = comb[: S * 6].reshape(S, 6)
    lo3, hi3 = sc[:, :3], sc[:, 3:]
    fin = jnp.all(jnp.isfinite(lo3) & jnp.isfinite(hi3), axis=1)
    ctr = (lo3 + hi3) * 0.5
    orders = []
    for oct_ in range(8):
        sx = 1.0 if (oct_ & 1) else -1.0
        sy = 1.0 if (oct_ & 2) else -1.0
        sz = 1.0 if (oct_ & 4) else -1.0
        d = sx * ctr[:, 0] + sy * ctr[:, 1] + sz * ctr[:, 2]
        # sentinel AFTER the signed projection so padding sorts last in
        # every octant (a pre-projection sentinel flips sign for 7 of 8
        # octants and put padding first)
        d = jnp.where(fin, d, 3.4e38)
        orders.append(jnp.argsort(d).astype(jnp.int32))
    return jnp.concatenate(orders)


def _majority_octant(cdx, cdy, cdz, active):
    """Per-tile majority direction octant (int32 scalar).  Order only
    affects traversal efficiency, never correctness, so mixed tiles
    simply benefit less."""
    a = active.astype(jnp.float32)
    px = jnp.sum(jnp.where(cdx > 0, a, 0.0))
    py = jnp.sum(jnp.where(cdy > 0, a, 0.0))
    pz = jnp.sum(jnp.where(cdz > 0, a, 0.0))
    half = jnp.sum(a) * 0.5
    ox = (px > half).astype(jnp.int32)
    oy = (py > half).astype(jnp.int32)
    oz = (pz > half).astype(jnp.int32)
    return ox | (oy << 1) | (oz << 2)


def _slab(aabb, base, ox, oy, oz, inx, iny, inz, exit_bound):
    """Vector slab test against the SMEM box at aabb[base:base+6].
    Returns (enter, exit_) with exit_ already min'd with exit_bound."""
    t0x = (aabb[base + 0] - ox) * inx
    t1x = (aabb[base + 3] - ox) * inx
    t0y = (aabb[base + 1] - oy) * iny
    t1y = (aabb[base + 4] - oy) * iny
    t0z = (aabb[base + 2] - oz) * inz
    t1z = (aabb[base + 5] - oz) * inz
    enter = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
    )
    exit_ = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), exit_bound),
    )
    return enter, exit_


def make_rolled_intersect(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                          scratch, shape, order_tab=None):
    """Closest-hit provider. vmem_buf: VMEM (16,128); cl_aabb: the combined
    two-level SMEM table from pack_clusters_rolled.
    order_tab: optional [8*S] SMEM i32 (cluster_orders) — supercluster
    traversal runs front-to-back along the tile's majority direction octant
    so the running t-min culls geometry behind the first hit."""
    t_ref, m_ref, nx_ref, ny_ref, nz_ref = scratch
    n_clusters = meta[5]
    n_sup = (n_clusters + SUPER - 1) // SUPER
    cl_base0 = n_sup * 6  # cluster boxes follow the supercluster table

    def isect(cox, coy, coz, cdx, cdy, cdz, active):
        t_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
        m_ref[:] = jnp.full(shape, -1.0, jnp.float32)
        nx_ref[:] = jnp.zeros(shape, jnp.float32)
        ny_ref[:] = jnp.zeros(shape, jnp.float32)
        nz_ref[:] = jnp.zeros(shape, jnp.float32)

        # dead tiles (bucket-sorted waves park dead rays together) skip
        # the whole traversal
        @pl.when(jnp.any(active))
        def _():
            inx = 1.0 / cdx
            iny = 1.0 / cdy
            inz = 1.0 / cdz
            if order_tab is not None:
                stride = order_tab.shape[0] // 8
                oct_ = _majority_octant(cdx, cdy, cdz, active) * stride

            def super_body(si, _):
                s = order_tab[oct_ + si] if order_tab is not None else si
                enter, exit_ = _slab(cl_aabb, s * 6, cox, coy, coz,
                                     inx, iny, inz, t_ref[:])

                @pl.when(jnp.any((exit_ > enter) & active))
                def _():
                    def cl_body(k, _):
                        c = s * SUPER + k
                        en, ex = _slab(cl_aabb, cl_base0 + c * 6,
                                       cox, coy, coz, inx, iny, inz, t_ref[:])

                        @pl.when(jnp.any((ex > en) & active)
                                 & (c < n_clusters))
                        def _():
                            dma = pltpu.make_async_copy(
                                tri_hbm.at[c], vmem_buf, dma_sem)
                            dma.start()
                            dma.wait()

                            def step(_s, buf):
                                ok, t, _u, _v = _mt_rolled_step(
                                    buf, cox, coy, coz, cdx, cdy, cdz)
                                ok = ok & (t < t_ref[:])
                                t_ref[:] = jnp.where(ok, t, t_ref[:])
                                m_ref[:] = jnp.where(ok, buf[12][None, :] + 0.0,
                                                     m_ref[:])
                                nx_ref[:] = jnp.where(ok, buf[9][None, :] + 0.0,
                                                      nx_ref[:])
                                ny_ref[:] = jnp.where(ok, buf[10][None, :] + 0.0,
                                                      ny_ref[:])
                                nz_ref[:] = jnp.where(ok, buf[11][None, :] + 0.0,
                                                      nz_ref[:])
                                return pltpu.roll(buf, LANES - 1, 1)

                            jax.lax.fori_loop(0, CLUSTER_TRIS, step,
                                              vmem_buf[:])

                        return 0

                    jax.lax.fori_loop(0, SUPER, cl_body, 0)

                return 0

            jax.lax.fori_loop(0, n_sup, super_body, 0)

        return t_ref[:], m_ref[:], nx_ref[:], ny_ref[:], nz_ref[:]

    return isect


def make_rolled_any_hit(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                        found_ref, shape):
    """Any-hit provider (shadow rays); tmax <= 0 marks a dead lane."""
    n_clusters = meta[5]
    n_sup = (n_clusters + SUPER - 1) // SUPER
    cl_base0 = n_sup * 6

    def any_hit(sox, soy, soz, sdx, sdy, sdz, tmax):
        found_ref[:] = jnp.zeros(shape, jnp.float32)

        @pl.when(jnp.any(tmax > 0.0))
        def _():
            inx = 1.0 / sdx
            iny = 1.0 / sdy
            inz = 1.0 / sdz

            def super_body(si, _):
                bound = jnp.where(found_ref[:] < 0.5, tmax,
                                  jnp.float32(-jnp.inf))
                enter, exit_ = _slab(cl_aabb, si * 6, sox, soy, soz,
                                     inx, iny, inz, bound)

                @pl.when(jnp.any(exit_ > enter))
                def _():
                    def cl_body(k, _):
                        c = si * SUPER + k
                        bnd = jnp.where(found_ref[:] < 0.5, tmax,
                                        jnp.float32(-jnp.inf))
                        en, ex = _slab(cl_aabb, cl_base0 + c * 6,
                                       sox, soy, soz, inx, iny, inz, bnd)

                        @pl.when(jnp.any(ex > en) & (c < n_clusters))
                        def _():
                            dma = pltpu.make_async_copy(
                                tri_hbm.at[c], vmem_buf, dma_sem)
                            dma.start()
                            dma.wait()

                            def step(_s, buf):
                                ok, t, _u, _v = _mt_rolled_step(
                                    buf, sox, soy, soz, sdx, sdy, sdz)
                                ok = ok & (t <= tmax)
                                found_ref[:] = jnp.where(ok, 1.0,
                                                         found_ref[:])
                                return pltpu.roll(buf, LANES - 1, 1)

                            jax.lax.fori_loop(0, CLUSTER_TRIS, step,
                                              vmem_buf[:])

                        return 0

                    jax.lax.fori_loop(0, SUPER, cl_body, 0)

                return 0

            jax.lax.fori_loop(0, n_sup, super_body, 0)

        return found_ref[:] > 0.5

    return any_hit
