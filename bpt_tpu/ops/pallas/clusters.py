"""Clustered scene layout + Pallas intersect providers for large scenes.

Scenes beyond the SMEM triangle budget (512 tris) use a two-level scheme
tuned to the TPU memory system instead of per-lane BVH pointer chasing:

* triangles stay in BVH-DFS order (spatially coherent — the builder already
  permutes them) and are chopped into clusters of 128;
* each cluster's 13-float triangle records pack into one [16, 128] HBM
  block; cluster AABBs live in SMEM (scalar prefetch);
* per ray tile, the kernel slab-tests every cluster AABB (vector op from
  SMEM scalars) and only when ANY lane hits does it DMA the 8 KB block
  HBM -> SMEM and run the scalar-constant Möller–Trumbore loop.

No per-lane gathers anywhere; the divergence granularity is the whole tile,
which is the right trade for TPU (and matches wavefront coherence: primary
tiles touch few clusters, diffuse bounces degrade gracefully).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN

CLUSTER_TRIS = 128
BLOCK_ROWS = 16  # 16 x 128 = 2048 floats >= 128 tris * 13
TRI_STRIDE = 13
MAX_CLUSTERS = 1024  # SMEM AABB table: 1024 * 6 * 4 B = 24 KB


def cluster_ok(scene) -> bool:
    return scene.num_tris <= CLUSTER_TRIS * MAX_CLUSTERS


def _cluster_aabbs(scene, C):
    """[C*6] f32 cluster bounds — pure jnp so it traces when the scene is a
    jit argument (the render driver's step passes it traced)."""
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


def pack_clusters(scene):
    """Host-side packing -> (n_clusters, aabb_smem [C*6] f32,
    tri_hbm [C, 16, 128] f32)."""
    T = scene.num_tris
    C = int(np.ceil(T / CLUSTER_TRIS))

    tri = jnp.concatenate(
        [scene.v0, scene.e1, scene.e2, scene.normal,
         scene.mat_id[:, None].astype(jnp.float32)],
        axis=1,
    ).astype(jnp.float32)  # [T,13]
    flat = jnp.zeros((C * CLUSTER_TRIS, TRI_STRIDE), jnp.float32).at[:T].set(tri)
    blocks = flat.reshape(C, CLUSTER_TRIS * TRI_STRIDE)
    pad = BLOCK_ROWS * 128 - CLUSTER_TRIS * TRI_STRIDE
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((C, pad), jnp.float32)], axis=1
    ).reshape(C, BLOCK_ROWS, 128)

    aabb = _cluster_aabbs(scene, C)
    return C, aabb, blocks


def make_clustered_intersect(meta, cl_aabb, tri_hbm, smem_buf, dma_sem,
                             scratch, shape):
    """Closest-hit provider for the megakernels.

    meta: SMEM int32 ref with meta[5] = n_clusters, meta[0] = T.
    smem_buf: SMEM (BLOCK_ROWS, 128) scratch; dma_sem: DMA semaphore.
    scratch: five VMEM (R, L) f32 refs (t, mat, nx, ny, nz).
    Returns isect(cox..cdz, active_f) -> (t, mat_fl, nx, ny, nz).
    """
    t_ref, m_ref, nx_ref, ny_ref, nz_ref = scratch
    n_clusters = meta[5]
    T = meta[0]

    def isect(cox, coy, coz, cdx, cdy, cdz, active):
        t_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
        m_ref[:] = jnp.full(shape, -1.0, jnp.float32)
        nx_ref[:] = jnp.zeros(shape, jnp.float32)
        ny_ref[:] = jnp.zeros(shape, jnp.float32)
        nz_ref[:] = jnp.zeros(shape, jnp.float32)

        inx = 1.0 / cdx
        iny = 1.0 / cdy
        inz = 1.0 / cdz

        def cluster_body(c, _):
            base = c * 6
            bx0 = cl_aabb[base + 0]
            by0 = cl_aabb[base + 1]
            bz0 = cl_aabb[base + 2]
            bx1 = cl_aabb[base + 3]
            by1 = cl_aabb[base + 4]
            bz1 = cl_aabb[base + 5]
            t0x = (bx0 - cox) * inx
            t1x = (bx1 - cox) * inx
            t0y = (by0 - coy) * iny
            t1y = (by1 - coy) * iny
            t0z = (bz0 - coz) * inz
            t1z = (bz1 - coz) * inz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), t_ref[:]),
            )
            tile_hits = jnp.any((exit_ > enter) & active)

            @pl.when(tile_hits)
            def _():
                dma = pltpu.make_async_copy(tri_hbm.at[c], smem_buf, dma_sem)
                dma.start()
                dma.wait()
                first = c * CLUSTER_TRIS
                cnt = jnp.minimum(T - first, CLUSTER_TRIS)

                def tri_body(k, _):
                    fb = k * TRI_STRIDE

                    # 13 consecutive floats may straddle one row boundary;
                    # scalar reads use explicit divmod per field
                    def rd(j):
                        idx = fb + j
                        return smem_buf[idx // 128, idx % 128]

                    v0x = rd(0)
                    v0y = rd(1)
                    v0z = rd(2)
                    e1x = rd(3)
                    e1y = rd(4)
                    e1z = rd(5)
                    e2x = rd(6)
                    e2y = rd(7)
                    e2z = rd(8)
                    nx = rd(9)
                    ny = rd(10)
                    nz = rd(11)
                    mid = rd(12)

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
                        & (t >= T_MIN) & (t < t_ref[:])
                    )
                    t_ref[:] = jnp.where(ok, t, t_ref[:])
                    m_ref[:] = jnp.where(ok, mid, m_ref[:])
                    nx_ref[:] = jnp.where(ok, nx, nx_ref[:])
                    ny_ref[:] = jnp.where(ok, ny, ny_ref[:])
                    nz_ref[:] = jnp.where(ok, nz, nz_ref[:])
                    return 0

                jax.lax.fori_loop(0, cnt, tri_body, 0)

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        return t_ref[:], m_ref[:], nx_ref[:], ny_ref[:], nz_ref[:]

    return isect


def make_clustered_any_hit(meta, cl_aabb, tri_hbm, smem_buf, dma_sem,
                           found_ref, shape):
    """Any-hit provider (shadow rays). found_ref: VMEM (R, L) f32 scratch."""
    n_clusters = meta[5]
    T = meta[0]

    def any_hit(sox, soy, soz, sdx, sdy, sdz, tmax):
        found_ref[:] = jnp.zeros(shape, jnp.float32)
        inx = 1.0 / sdx
        iny = 1.0 / sdy
        inz = 1.0 / sdz

        def cluster_body(c, _):
            base = c * 6
            t0x = (cl_aabb[base + 0] - sox) * inx
            t1x = (cl_aabb[base + 3] - sox) * inx
            t0y = (cl_aabb[base + 1] - soy) * iny
            t1y = (cl_aabb[base + 4] - soy) * iny
            t0z = (cl_aabb[base + 2] - soz) * inz
            t1z = (cl_aabb[base + 5] - soz) * inz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), tmax),
            )
            pending = (found_ref[:] < 0.5)
            tile_hits = jnp.any((exit_ > enter) & pending)

            @pl.when(tile_hits)
            def _():
                dma = pltpu.make_async_copy(tri_hbm.at[c], smem_buf, dma_sem)
                dma.start()
                dma.wait()
                first = c * CLUSTER_TRIS
                cnt = jnp.minimum(T - first, CLUSTER_TRIS)

                def tri_body(k, _):
                    fb = k * TRI_STRIDE

                    def rd(j):
                        idx = fb + j
                        return smem_buf[idx // 128, idx % 128]

                    v0x = rd(0)
                    v0y = rd(1)
                    v0z = rd(2)
                    e1x = rd(3)
                    e1y = rd(4)
                    e1z = rd(5)
                    e2x = rd(6)
                    e2y = rd(7)
                    e2z = rd(8)
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
                    found_ref[:] = jnp.where(ok, 1.0, found_ref[:])
                    return 0

                jax.lax.fori_loop(0, cnt, tri_body, 0)

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        return found_ref[:] > 0.5

    return any_hit



# ------------------------------------------------------------- rolled mode
#
# The SMEM-buffer path above pays ~60us per conditional HBM->SMEM DMA (the
# scalar-memory DMA is a slow path).  The rolled variant DMAs blocks to VMEM
# (fast path) and replaces the scalar-constant triangle loop with an
# all-pairs lane roll: the 128 triangles of a cluster sit in the 128 lanes
# of a [16, 128] block (rows = fields); each of 128 steps tests every ray
# lane against one triangle lane and then rolls the block by one lane, so
# after 128 steps every ray has met every triangle.  Closest-hit keeps a
# running strict-< min, so the visit order per lane is irrelevant except on
# exact t ties (measure zero).

def pack_clusters_rolled(scene):
    """[C, 16, 128] with lane k = triangle k of the cluster, rows = fields
    (v0 xyz, e1 xyz, e2 xyz, n xyz, mat; 3 pad rows). Padding lanes hold
    degenerate triangles (det == 0 -> never valid)."""
    T = scene.num_tris
    C = int(np.ceil(T / CLUSTER_TRIS))
    tri = jnp.concatenate(
        [scene.v0, scene.e1, scene.e2, scene.normal,
         scene.mat_id[:, None].astype(jnp.float32)],
        axis=1,
    ).astype(jnp.float32)  # [T,13]
    flat = jnp.zeros((C * CLUSTER_TRIS, TRI_STRIDE), jnp.float32).at[:T].set(tri)
    # [C, 128, 13] -> [C, 13, 128] -> pad rows to 16
    blocks = flat.reshape(C, CLUSTER_TRIS, TRI_STRIDE).transpose(0, 2, 1)
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((C, BLOCK_ROWS - TRI_STRIDE, CLUSTER_TRIS), jnp.float32)],
        axis=1,
    )

    aabb = _cluster_aabbs(scene, C)
    return C, aabb, blocks


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
    """[8*C] i32: for each direction octant, cluster indices sorted
    front-to-back along the octant's dominant signs.  Visiting clusters
    near-to-far lets the running t-min cull everything behind the first
    hit (the slab exit test already bounds by t_best), which is where
    BVH traversal gets its win.  Pure jnp; C=716 argsorts are trivial."""
    aabb = _cluster_aabbs(scene, C).reshape(C, 6)
    lo3, hi3 = aabb[:, :3], aabb[:, 3:]
    fin = jnp.all(jnp.isfinite(lo3) & jnp.isfinite(hi3), axis=1)
    ctr = (lo3 + hi3) * 0.5
    orders = []
    for oct_ in range(8):
        sx = 1.0 if (oct_ & 1) else -1.0
        sy = 1.0 if (oct_ & 2) else -1.0
        sz = 1.0 if (oct_ & 4) else -1.0
        d = sx * ctr[:, 0] + sy * ctr[:, 1] + sz * ctr[:, 2]
        # sentinel AFTER the signed projection so padding clusters sort
        # last in every octant (a pre-projection sentinel flips sign for
        # 7 of 8 octants and put padding first)
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


def make_rolled_intersect(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                          scratch, shape, order_tab=None):
    """Closest-hit provider, rolled variant. vmem_buf: VMEM (16,128).
    order_tab: optional [8*C] SMEM i32 (cluster_orders) — traversal runs
    front-to-back along the tile's majority direction octant so the
    running t-min culls clusters behind the first hit."""
    t_ref, m_ref, nx_ref, ny_ref, nz_ref = scratch
    n_clusters = meta[5]

    def isect(cox, coy, coz, cdx, cdy, cdz, active):
        t_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
        m_ref[:] = jnp.full(shape, -1.0, jnp.float32)
        nx_ref[:] = jnp.zeros(shape, jnp.float32)
        ny_ref[:] = jnp.zeros(shape, jnp.float32)
        nz_ref[:] = jnp.zeros(shape, jnp.float32)
        inx = 1.0 / cdx
        iny = 1.0 / cdy
        inz = 1.0 / cdz
        if order_tab is not None:
            stride = order_tab.shape[0] // 8
            oct_ = _majority_octant(cdx, cdy, cdz, active) * stride

        def cluster_body(ci, _):
            c = order_tab[oct_ + ci] if order_tab is not None else ci
            base = c * 6
            t0x = (cl_aabb[base + 0] - cox) * inx
            t1x = (cl_aabb[base + 3] - cox) * inx
            t0y = (cl_aabb[base + 1] - coy) * iny
            t1y = (cl_aabb[base + 4] - coy) * iny
            t0z = (cl_aabb[base + 2] - coz) * inz
            t1z = (cl_aabb[base + 5] - coz) * inz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), t_ref[:]),
            )
            tile_hits = jnp.any((exit_ > enter) & active)

            @pl.when(tile_hits)
            def _():
                dma = pltpu.make_async_copy(tri_hbm.at[c], vmem_buf, dma_sem)
                dma.start()
                dma.wait()

                def step(s, buf):
                    base_ok, t, _u, _v = _mt_rolled_step(buf, cox, coy, coz,
                                                         cdx, cdy, cdz)
                    ok = base_ok & (t < t_ref[:])
                    t_ref[:] = jnp.where(ok, t, t_ref[:])
                    m_ref[:] = jnp.where(ok, buf[12][None, :] + 0.0, m_ref[:])
                    nx_ref[:] = jnp.where(ok, buf[9][None, :] + 0.0, nx_ref[:])
                    ny_ref[:] = jnp.where(ok, buf[10][None, :] + 0.0, ny_ref[:])
                    nz_ref[:] = jnp.where(ok, buf[11][None, :] + 0.0, nz_ref[:])
                    return pltpu.roll(buf, CLUSTER_TRIS - 1, 1)

                jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        return t_ref[:], m_ref[:], nx_ref[:], ny_ref[:], nz_ref[:]

    return isect


def make_rolled_any_hit(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                        found_ref, shape):
    n_clusters = meta[5]

    def any_hit(sox, soy, soz, sdx, sdy, sdz, tmax):
        found_ref[:] = jnp.zeros(shape, jnp.float32)
        inx = 1.0 / sdx
        iny = 1.0 / sdy
        inz = 1.0 / sdz

        def cluster_body(c, _):
            base = c * 6
            t0x = (cl_aabb[base + 0] - sox) * inx
            t1x = (cl_aabb[base + 3] - sox) * inx
            t0y = (cl_aabb[base + 1] - soy) * iny
            t1y = (cl_aabb[base + 4] - soy) * iny
            t0z = (cl_aabb[base + 2] - soz) * inz
            t1z = (cl_aabb[base + 5] - soz) * inz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), tmax),
            )
            pending = found_ref[:] < 0.5
            tile_hits = jnp.any((exit_ > enter) & pending)

            @pl.when(tile_hits)
            def _():
                dma = pltpu.make_async_copy(tri_hbm.at[c], vmem_buf, dma_sem)
                dma.start()
                dma.wait()

                def step(s, buf):
                    base_ok, t, _u, _v = _mt_rolled_step(buf, sox, soy, soz,
                                                         sdx, sdy, sdz)
                    ok = base_ok & (t <= tmax)
                    found_ref[:] = jnp.where(ok, 1.0, found_ref[:])
                    return pltpu.roll(buf, CLUSTER_TRIS - 1, 1)

                jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])

            return 0

        jax.lax.fori_loop(0, n_clusters, cluster_body, 0)
        return found_ref[:] > 0.5

    return any_hit
