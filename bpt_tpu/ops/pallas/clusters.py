"""Clustered scene layout + Pallas intersect providers for large scenes.

Scenes beyond the SMEM triangle budget (512 tris) use a TWO-LEVEL scheme
tuned to the TPU memory system instead of per-lane BVH pointer chasing
(the reference walks a shared_ptr BVH per ray, src/acceleration/bvh.h:50-59;
per-lane pointer chasing does not vectorize on the VPU):

* triangles stay in BVH-DFS order (the builder permutes them), segmented
  at BVH-SUBTREE boundaries (scene.cluster_splits / super_splits from
  scene/bvh.subtree_splits): clusters are maximal subtrees of <= 32
  tris, superclusters maximal subtrees of <= 512 tris - every AABB is a
  node bbox the build already proved tight.  (A fixed-stride chop
  straddles sibling subtrees and balloons the unions: measured ~1.6x
  more t-culled triangle tests per bounce ray, tools/probe_subtree.py.)
* both levels' AABBs + per-super member spans + per-cluster tri bases
  live in SMEM in one combined table (_combined_table: [S*6|S*2|C*7]);
* per ray tile, the kernel slab-tests supercluster AABBs front-to-back
  (per direction-octant order table) and descends into the member
  clusters only when ANY lane's interval is non-empty; a cluster hit
  DMAs its 8 KB triangle block HBM -> VMEM and runs a 32-step all-pairs
  lane roll (each of the 128 block lanes holds triangle slot lane%32,
  i.e. four replicas, so 32 roll steps give every ray lane every slot).

No per-lane gathers anywhere; the divergence granularity is the whole
tile.  Each cluster visit's DMA+roll cost is shared by every tile lane,
so throughput ~ (rays/tile) / (visits/tile x visit cost): fine ray
sorting (pt_wave._coherence_perm) keeps the visit union small, and
LARGER tiles amortize it further - the union grows sublinearly in tile
size (32-row tiles measured fastest; see pt_wave.DEF_TILE_ROWS).
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
# Capacity is bounded by the combined SMEM table [S*8 + C*7] f32, not by
# a triangle count: MEASURED on the real chip (tools/probe_capacity.py,
# round 3) — C=16384/S=1024 (480 KB, a 434k-tri dense sphere) compiles
# and runs; ~700 KB and ~1.1 MB tables fail Mosaic compilation.  The old
# round-1 gate (MAX_CLUSTERS=4096 -> 131k tris) was 4.8x conservative.
MAX_TABLE_F32 = 16384 * 7 + 1024 * 8  # = 122,880 f32 = 480 KB, measured
MAX_CLUSTERS = 16384


def n_super(C: int) -> int:
    return (C + SUPER - 1) // SUPER


def _pair_interleave() -> bool:
    """Default ON (disable with BPT_TPU_PAIR_IL=0): fuse each DMA
    pair's two 32-step rolls into ONE loop (two M-T updates + two rolls
    per step), halving the per-step loop bookkeeping — measured +3.3%
    full-wave on coffee-91k (2.76 -> 2.84 Mrays/s, interleaved A/B,
    tools/probe_pairil.py).  t-tie winners BETWEEN the paired clusters
    may differ from the sequential order (measure-zero; closest-hit min
    is otherwise order-independent)."""
    import os

    return os.environ.get("BPT_TPU_PAIR_IL", "1") == "1"


def _roll_split() -> int:
    """Round-4 roll restructure (BPT_TPU_ROLL_SPLIT, default measured
    winner): split each cluster's 32-step roll into K independent
    pre-rolled streams tested together — step s tests slots (l+s),
    (l+s+32/K), ... so the loop runs 32/K iterations.  The single
    stream's serial roll->M-T->roll dependency chain limits issue-slot
    occupancy (the measured ~50-60%% efficiency, ROADMAP); K independent
    chains give the VPU work to interleave.  Same M-T op count, same
    total roll volume (K buffers x 32/K steps), K-1 extra setup rolls
    per visit.  t-ties between slots tested in the same step resolve by
    stream order (degenerate-geometry caveat, same class as PAIR_IL)."""
    import os

    v = int(os.environ.get("BPT_TPU_ROLL_SPLIT", "1"))
    assert v in (1, 2, 4, 8) and CLUSTER_TRIS % v == 0
    return v


def cluster_ok(scene) -> bool:
    """True when the scene's ACTUAL cluster structure fits the measured
    SMEM budget in ONE combined table (subtree-aligned clusters average
    well under 32 tris, so a triangle-count proxy would over- or
    under-gate).  Single-table is required by the fused megakernels and
    pt_wave; the standalone FTB dispatch can PAGE past this
    (cluster_pages_ok)."""
    cs, ss = _splits_of(scene)
    C = len(cs) - 1
    S = len(ss) - 1
    return C <= MAX_CLUSTERS and S * 8 + C * 7 <= MAX_TABLE_F32


# Paging (round 4, VERDICT item 7): scenes past the single-table SMEM
# budget split into pages on SUPERCLUSTER boundaries; the standalone FTB
# kernels run once per page and the dispatch merges min-t (closest) /
# OR (any) XLA-side.  Capacity becomes HBM-bounded (the reference's only
# bound, bvh.h:20-48): MAX_PAGES * ~480 KB tables + 8 KB/cluster blocks.
MAX_PAGES = 64  # ~28M tris; sanity backstop, not a measured limit


def _page_budget() -> int:
    import os

    return int(os.environ.get("BPT_TPU_PAGE_F32", str(MAX_TABLE_F32)))


def _page_bounds(cs, ss):
    """[(s0, s1, c0, c1)] page spans (super index / cluster index), each
    page's combined table within the budget.  Greedy left-to-right on
    super boundaries; one super (8 + 16*7 = 120 f32) always fits."""
    start_of = {v: k for k, v in enumerate(cs)}
    sc_first = [start_of[v] for v in ss]
    S = len(ss) - 1
    budget = _page_budget()
    pages = []
    s0 = 0
    while s0 < S:
        s1 = s0 + 1
        while s1 < S:
            S_p = s1 + 1 - s0
            C_p = sc_first[s1 + 1] - sc_first[s0]
            if C_p > MAX_CLUSTERS or S_p * 8 + C_p * 7 > budget:
                break
            s1 += 1
        pages.append((s0, s1, sc_first[s0], sc_first[s1]))
        s0 = s1
    return pages


def n_pages(scene) -> int:
    cs, ss = _splits_of(scene)
    return len(_page_bounds(cs, ss))


def cluster_pages_ok(scene) -> bool:
    """True when the scene fits the PAGED FTB dispatch (any number of
    tables up to the MAX_PAGES backstop)."""
    return n_pages(scene) <= MAX_PAGES


def _cluster_aabbs(scene, C):
    """[C*6] f32 FIXED-STRIDE chop cluster bounds (lo3 | hi3).  Kept for
    the single-level Plücker experiment (plucker.py); the main traversal
    uses the subtree-aligned _combined_table."""
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


def _splits_of(scene):
    """(cluster_splits, super_splits) — the scene's BVH-subtree-aligned
    boundaries (scene/bvh.subtree_splits) or the fixed-stride chop
    fallback.  Static python tuples: the cluster STRUCTURE is part of
    the trace."""
    T = scene.num_tris
    cs = tuple(scene.cluster_splits)
    ss = tuple(scene.super_splits)
    if len(cs) >= 2 and len(ss) >= 2 and cs[-1] == T and ss[-1] == T:
        return cs, ss
    C = int(np.ceil(T / CLUSTER_TRIS))
    S = (C + SUPER - 1) // SUPER
    cs = tuple(min(k * CLUSTER_TRIS, T) for k in range(C + 1))
    ss = tuple(min(k * SUPER * CLUSTER_TRIS, T) for k in range(S + 1))
    return cs, ss


def _combined_table(scene, cs, ss):
    """Combined f32 SMEM table, layout
    [S*6 super AABBs | S*2 spans (first_cluster, n_members) | C*7
    cluster records (lo3, hi3, tri_base)] — pure jnp over the (possibly
    traced) triangle data; the STRUCTURE (split points) is static.
    Kernels recover S from the ref shapes: C = tri_hbm.shape[0],
    S = (len(table) - C*7) // 8.  tri_base maps (cluster, roll slot) to
    the global triangle id (variable-size clusters)."""
    T = scene.num_tris
    C = len(cs) - 1
    S = len(ss) - 1
    v0 = scene.v0.astype(jnp.float32)
    p1 = (scene.v0 + scene.e1).astype(jnp.float32)
    p2 = (scene.v0 + scene.e2).astype(jnp.float32)
    lo = jnp.minimum(v0, jnp.minimum(p1, p2))
    hi = jnp.maximum(v0, jnp.maximum(p1, p2))
    lo_p = jnp.concatenate([lo, jnp.full((1, 3), jnp.inf, jnp.float32)])
    hi_p = jnp.concatenate([hi, jnp.full((1, 3), -jnp.inf, jnp.float32)])

    # static [C, CLUSTER_TRIS] tri gather map (pad -> sentinel row T)
    idx = np.full((C, CLUSTER_TRIS), T, np.int64)
    for k in range(C):
        n = cs[k + 1] - cs[k]
        idx[k, :n] = np.arange(cs[k], cs[k + 1])
    cl_lo = lo_p[idx].min(axis=1)  # [C,3]
    cl_hi = hi_p[idx].max(axis=1)
    base = jnp.asarray(np.asarray(cs[:-1], np.float32))[:, None]
    cl = jnp.concatenate([cl_lo, cl_hi, base], axis=1)  # [C,7]

    # static cluster-index spans per super (alignment is guaranteed:
    # clusters are maximal subtrees nested inside the super subtrees)
    start_of = {v: k for k, v in enumerate(cs)}
    sc_first = [start_of[v] for v in ss]
    n_mem = np.diff(np.asarray(sc_first)).astype(np.int64)
    max_m = int(n_mem.max()) if S else 1
    m_map = np.full((S, max_m), C, np.int64)  # pad -> sentinel cluster
    for k in range(S):
        m_map[k, : n_mem[k]] = np.arange(sc_first[k], sc_first[k + 1])
    cl_lo_p = jnp.concatenate([cl_lo, jnp.full((1, 3), jnp.inf, jnp.float32)])
    cl_hi_p = jnp.concatenate([cl_hi, jnp.full((1, 3), -jnp.inf, jnp.float32)])
    su = jnp.concatenate(
        [cl_lo_p[m_map].min(axis=1), cl_hi_p[m_map].max(axis=1)], axis=1)
    spans = jnp.asarray(
        np.stack([np.asarray(sc_first[:-1], np.float32),
                  n_mem.astype(np.float32)], axis=1))  # [S,2]
    return jnp.concatenate(
        [su.reshape(-1), spans.reshape(-1), cl.reshape(-1)])


def pack_clusters_rolled(scene):
    """Host-side packing -> (n_clusters,
    combined SMEM table (see _combined_table),
    tri blocks [C, 16, 128] f32 (HBM)).

    Clusters are BVH-subtree-aligned variable-size segments (<= 32 tris;
    scene.cluster_splits) — their AABBs are node bboxes the BVH build
    already proved tight, measured ~1.6x fewer t-culled triangle tests
    per bounce ray than the round-1 fixed 32-stride chop
    (tools/probe_subtree.py).  Block layout: rows = 13 fields (v0 xyz,
    e1 xyz, e2 xyz, n xyz, mat; 3 pad rows), lane L = triangle slot
    (L mod 32) — four lane replicas so a 32-step roll shows every
    triangle to every ray lane.  Padding lanes hold degenerate
    triangles (det == 0 -> never valid)."""
    cs, ss = _splits_of(scene)
    return len(cs) - 1, _combined_table(scene, cs, ss), _pack_blocks(scene, cs)


def _pack_blocks(scene, cs):
    """Tri blocks [C, 16, 128] f32 for the cluster boundaries ``cs``
    (absolute triangle-id tuples; a slice of the scene's splits pages)."""
    T = scene.num_tris
    C = len(cs) - 1
    tri = jnp.concatenate(
        [scene.v0, scene.e1, scene.e2, scene.normal,
         scene.mat_id[:, None].astype(jnp.float32)],
        axis=1,
    ).astype(jnp.float32)  # [T,13]
    tri_p = jnp.concatenate([tri, jnp.zeros((1, TRI_STRIDE), jnp.float32)])
    idx = np.full((C, CLUSTER_TRIS), T, np.int64)
    for k in range(C):
        n = cs[k + 1] - cs[k]
        idx[k, :n] = np.arange(cs[k], cs[k + 1])
    # [C, 32, 13] -> [C, 13, 32] -> replicate lanes x4 -> pad rows to 16
    blocks = tri_p[idx].transpose(0, 2, 1)
    blocks = jnp.tile(blocks, (1, 1, REPL))
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((C, BLOCK_ROWS - TRI_STRIDE, LANES), jnp.float32)],
        axis=1,
    )
    return blocks


def pack_clusters_pages(scene):
    """Paged packing for the standalone FTB kernels: one
    (n_clusters, combined table, tri blocks, octant order table) per
    page (see _page_bounds).  Single-page scenes get exactly the
    pack_clusters_rolled arrays.  Slicing the split tuples on super
    boundaries keeps every per-page invariant: spans are page-local
    cluster indices, tri_base stays GLOBAL (uv payload triangle ids are
    scene-wide), and each page's supers bound exactly its clusters."""
    cs, ss = _splits_of(scene)
    out = []
    for (s0, s1, c0, c1) in _page_bounds(cs, ss):
        sub_cs = cs[c0:c1 + 1]
        sub_ss = ss[s0:s1 + 1]
        tab = _combined_table(scene, sub_cs, sub_ss)
        out.append((c1 - c0, tab, _pack_blocks(scene, sub_cs),
                    _orders_of_table(tab, s1 - s0)))
    return out


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
    cs, ss = _splits_of(scene)
    return _orders_of_table(_combined_table(scene, cs, ss), len(ss) - 1)


def _orders_of_table(comb, S):
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
                          scratch, shape, order_tab=None, stat_refs=None,
                          uv_refs=None, pair_il=None):
    """Closest-hit provider. vmem_buf: VMEM (16,128); cl_aabb: the combined
    two-level SMEM table from pack_clusters_rolled.
    order_tab: optional [8*S] SMEM i32 (cluster_orders) — supercluster
    traversal runs front-to-back along the tile's majority direction octant
    so the running t-min culls geometry behind the first hit.
    vmem_buf/dma_sem: PAIRS of block buffers/semaphores (double-buffered
    cluster streaming)."""
    il = _pair_interleave() if pair_il is None else bool(pair_il)
    buf_a, buf_b = vmem_buf
    sem_a, sem_b = dma_sem
    # LEAN mode (round 5, VERDICT item 3 op removal): callers that only
    # consume (t, u, v, tri) — the standalone FTB kernels feeding the
    # XLA-side shade (cluster_wave.clustered_closest_ftb_pallas) — pass
    # None for the m/nx/ny/nz scratch refs and the per-step hit-update
    # drops those 4 selects + 4 broadcast row reads (~13% of the ~61
    # issued ops per roll step; the accounting in docs/ROADMAP.md says
    # the kernel runs at its issue bound, so removal converts ~1:1).
    # The fused megakernels shade in-kernel and keep the full carries.
    t_ref, m_ref, nx_ref, ny_ref, nz_ref = scratch
    # optional (u, v, tri) VMEM f32 refs — textured scenes need the hit
    # barycentrics + global triangle id for the XLA texel stage.  The
    # global id is tri_base (combined-table field 6) + the lane's roll
    # slot (lane + step) mod 32, same identity as cluster_wave.py.
    u_ref, v_ref, ti_ref = uv_refs if uv_refs else (None, None, None)
    # optional (nv, ah, tt) VMEM f32 accumulators the CALLER zeroes once
    # per kernel — per-lane traversal-counter analogs of the reference's
    # BvhStats (src/core/stats.h:8-16): nv += 1 per node (super or
    # cluster) the lane's TILE processes, ah += per-lane slab pass,
    # tt += CLUSTER_TRIS per cluster M-T roll (work performed: every
    # lane computes the whole roll).
    nv_ref, ah_ref, tt_ref = stat_refs if stat_refs else (None, None, None)
    n_clusters = meta[5]
    # static structure from ref shapes: [S*6 | S*2 spans | C*6]
    C_st = tri_hbm.shape[0]
    n_sup = (cl_aabb.shape[0] - C_st * 7) // 8
    span_base = n_sup * 6
    cl_base0 = n_sup * 8  # cluster records follow supers + spans

    def isect(cox, coy, coz, cdx, cdy, cdz, active):
        t_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
        if m_ref is not None:
            m_ref[:] = jnp.full(shape, -1.0, jnp.float32)
            nx_ref[:] = jnp.zeros(shape, jnp.float32)
            ny_ref[:] = jnp.zeros(shape, jnp.float32)
            nz_ref[:] = jnp.zeros(shape, jnp.float32)
        if u_ref is not None:
            u_ref[:] = jnp.zeros(shape, jnp.float32)
            v_ref[:] = jnp.zeros(shape, jnp.float32)
            ti_ref[:] = jnp.full(shape, -1.0, jnp.float32)

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
                s_open = (exit_ > enter) & active
                if ah_ref is not None:
                    ah_ref[:] = ah_ref[:] + s_open.astype(jnp.float32)

                @pl.when(jnp.any(s_open))
                def _():
                    if nv_ref is not None:
                        nv_ref[:] = nv_ref[:] + 1.0
                    first = cl_aabb[span_base + s * 2].astype(jnp.int32)
                    n_m = cl_aabb[span_base + s * 2 + 1].astype(jnp.int32)

                    def mt_update(buf, s_, tri_base):
                        """One M-T test of every lane against its rolled
                        slot of ``buf`` + hit-ref updates."""
                        ok, t, u_, v_ = _mt_rolled_step(
                            buf, cox, coy, coz, cdx, cdy, cdz)
                        ok = ok & (t < t_ref[:])
                        t_ref[:] = jnp.where(ok, t, t_ref[:])
                        if m_ref is not None:
                            m_ref[:] = jnp.where(ok, buf[12][None, :] + 0.0,
                                                 m_ref[:])
                            nx_ref[:] = jnp.where(ok, buf[9][None, :] + 0.0,
                                                  nx_ref[:])
                            ny_ref[:] = jnp.where(ok, buf[10][None, :] + 0.0,
                                                  ny_ref[:])
                            nz_ref[:] = jnp.where(ok, buf[11][None, :] + 0.0,
                                                  nz_ref[:])
                        if u_ref is not None:
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, shape, 1)
                            ti = tri_base + (
                                (lane + s_) & (CLUSTER_TRIS - 1)
                            ).astype(jnp.float32)
                            u_ref[:] = jnp.where(ok, u_, u_ref[:])
                            v_ref[:] = jnp.where(ok, v_, v_ref[:])
                            ti_ref[:] = jnp.where(ok, ti, ti_ref[:])

                    def tri_base_of(c):
                        if u_ref is None:
                            return 0.0
                        return cl_aabb[cl_base0 + c * 7 + 6]

                    # K-way split roll (see _roll_split): K independent
                    # pre-rolled streams per cluster break the serial
                    # roll->M-T dependency chain
                    ksplit = _roll_split()
                    kstride = CLUSTER_TRIS // ksplit

                    def streams_of(buf_ref):
                        b0 = buf_ref[:]
                        return tuple(
                            b0 if k == 0
                            else pltpu.roll(b0, LANES - k * kstride, 1)
                            for k in range(ksplit))

                    def roll(buf_ref, c):
                        tb = tri_base_of(c)

                        def step(s_, bufs):
                            for k in range(ksplit):
                                mt_update(bufs[k], s_ + k * kstride, tb)
                            return tuple(pltpu.roll(b, LANES - 1, 1)
                                         for b in bufs)

                        jax.lax.fori_loop(0, kstride, step,
                                          streams_of(buf_ref))

                    def roll2(c0, c1):
                        """Interleaved dual roll: both clusters' steps
                        share one loop (study option, BPT_TPU_PAIR_IL=1 —
                        t-tie winners BETWEEN the two clusters may differ
                        from the sequential order; closest-hit min is
                        otherwise order-independent)."""
                        tb0 = tri_base_of(c0)
                        tb1 = tri_base_of(c1)

                        def step(s_, bufs):
                            bas, bbs = bufs
                            for k in range(ksplit):
                                mt_update(bas[k], s_ + k * kstride, tb0)
                                mt_update(bbs[k], s_ + k * kstride, tb1)
                            return (tuple(pltpu.roll(b, LANES - 1, 1)
                                          for b in bas),
                                    tuple(pltpu.roll(b, LANES - 1, 1)
                                          for b in bbs))

                        jax.lax.fori_loop(0, kstride, step,
                                          (streams_of(buf_a),
                                           streams_of(buf_b)))

                    # paired double-buffered DMA: start both clusters'
                    # copies before rolling either, so cluster c1's
                    # transfer hides behind c0's 32-step roll (measured
                    # 92 -> 84 ms on the bounce-1 intersect, bit-identical
                    # results; tools/probe_pairdma.py)
                    def pair_body(j, _):
                        c0 = first + 2 * j
                        c1 = c0 + 1
                        # clamp the c1 record read: at the scene's last
                        # cluster with an odd member count, c1 ==
                        # n_clusters and the raw read would run past the
                        # SMEM table (result masked, read still OOB)
                        c1r = jnp.minimum(c1, n_clusters - 1)
                        bnd = t_ref[:]
                        en0, ex0 = _slab(cl_aabb, cl_base0 + c0 * 7,
                                         cox, coy, coz, inx, iny, inz, bnd)
                        en1, ex1 = _slab(cl_aabb, cl_base0 + c1r * 7,
                                         cox, coy, coz, inx, iny, inz, bnd)
                        valid0 = (c0 < first + n_m) & (c0 < n_clusters)
                        valid1 = (c1 < first + n_m) & (c1 < n_clusters)
                        open0 = jnp.any((ex0 > en0) & active) & valid0
                        open1 = jnp.any((ex1 > en1) & active) & valid1
                        if ah_ref is not None:
                            ah_ref[:] = (
                                ah_ref[:]
                                + ((ex0 > en0) & active).astype(jnp.float32)
                                * valid0.astype(jnp.float32)
                                + ((ex1 > en1) & active).astype(jnp.float32)
                                * valid1.astype(jnp.float32))

                        @pl.when(open0)
                        def _():
                            pltpu.make_async_copy(
                                tri_hbm.at[c0], buf_a, sem_a).start()

                        @pl.when(open1)
                        def _():
                            pltpu.make_async_copy(
                                tri_hbm.at[c1], buf_b, sem_b).start()

                        if il:
                            @pl.when(open0 & open1)
                            def _():
                                if nv_ref is not None:
                                    nv_ref[:] = nv_ref[:] + 2.0
                                    tt_ref[:] = (tt_ref[:]
                                                 + 2.0 * CLUSTER_TRIS)
                                pltpu.make_async_copy(
                                    tri_hbm.at[c0], buf_a, sem_a).wait()
                                pltpu.make_async_copy(
                                    tri_hbm.at[c1], buf_b, sem_b).wait()
                                roll2(c0, c1r)

                            @pl.when(open0 & ~open1)
                            def _():
                                if nv_ref is not None:
                                    nv_ref[:] = nv_ref[:] + 1.0
                                    tt_ref[:] = (tt_ref[:]
                                                 + float(CLUSTER_TRIS))
                                pltpu.make_async_copy(
                                    tri_hbm.at[c0], buf_a, sem_a).wait()
                                roll(buf_a, c0)

                            @pl.when(~open0 & open1)
                            def _():
                                if nv_ref is not None:
                                    nv_ref[:] = nv_ref[:] + 1.0
                                    tt_ref[:] = (tt_ref[:]
                                                 + float(CLUSTER_TRIS))
                                pltpu.make_async_copy(
                                    tri_hbm.at[c1], buf_b, sem_b).wait()
                                roll(buf_b, c1r)

                            return 0

                        @pl.when(open0)
                        def _():
                            if nv_ref is not None:
                                nv_ref[:] = nv_ref[:] + 1.0
                                tt_ref[:] = tt_ref[:] + float(CLUSTER_TRIS)
                            pltpu.make_async_copy(
                                tri_hbm.at[c0], buf_a, sem_a).wait()
                            roll(buf_a, c0)

                        @pl.when(open1)
                        def _():
                            if nv_ref is not None:
                                nv_ref[:] = nv_ref[:] + 1.0
                                tt_ref[:] = tt_ref[:] + float(CLUSTER_TRIS)
                            pltpu.make_async_copy(
                                tri_hbm.at[c1], buf_b, sem_b).wait()
                            roll(buf_b, c1r)

                        return 0

                    jax.lax.fori_loop(0, (n_m + 1) // 2, pair_body, 0)

                return 0

            jax.lax.fori_loop(0, n_sup, super_body, 0)

        if m_ref is None:
            return t_ref[:], None, None, None, None
        return t_ref[:], m_ref[:], nx_ref[:], ny_ref[:], nz_ref[:]

    return isect


CAND_K = 8  # per-lane candidate superclusters held in registers


def make_candidate_intersect(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                             scratch, shape, order_tab=None, K=CAND_K,
                             stat_refs=None):
    """Per-LANE candidate traversal: closest-hit provider with the same
    signature/results as make_rolled_intersect, but the work per ray is
    proportional to the ray's OWN candidate set instead of the tile
    union (the union is what caps the tile-granularity scheme at
    ~0.3-0.5 Mrays/s on 90k-tri scenes: a 1024-ray tile's union touches
    ~40x more clusters than any one ray needs — measured by
    tools/probe_perray.py: bounce-ray per-ray t-culled supercluster
    entries mean ~6 vs tile DMA counts in the hundreds).

    Three phases, all in-kernel (no host orchestration):
      1. one sweep over the supercluster AABB table: each lane keeps its
         K nearest-entry superclusters (insertion by slab enter t, a
         VPU-register top-K) + an entered-count for overflow detection;
      2. K rounds: round r visits the tile's [min, max] range of the
         lanes' r-th candidates (rays are bucket-sorted between bounces,
         so the range is a few ids); each visited supercluster descends
         into its 16 member clusters with the PER-LANE mask
         (candidate == s) & (enter < t_best) — per-lane front-to-back
         order gives each lane the BVH-style early-out, independent of
         its neighbors;
      3. lanes whose candidate list overflowed K run the full
         front-to-back tile-union traversal, bounded by their t_best
         (rare -> almost all tiles skip it).

    The reference gets the same effect from per-ray recursive BVH
    traversal (src/acceleration/bvh.h:50-59); per-lane pointer chasing
    does not vectorize on the VPU, per-lane register top-K does."""
    vmem_buf, _buf_b = vmem_buf if isinstance(vmem_buf, tuple) else (vmem_buf, None)
    dma_sem, _sem_b = dma_sem if isinstance(dma_sem, tuple) else (dma_sem, None)
    t_ref, m_ref, nx_ref, ny_ref, nz_ref = scratch
    nv_ref, ah_ref, tt_ref = stat_refs if stat_refs else (None, None, None)
    n_clusters = meta[5]
    C_st = tri_hbm.shape[0]
    n_sup = (cl_aabb.shape[0] - C_st * 7) // 8
    span_base = n_sup * 6
    cl_base0 = n_sup * 8

    def isect(cox, coy, coz, cdx, cdy, cdz, active):
        t_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
        m_ref[:] = jnp.full(shape, -1.0, jnp.float32)
        nx_ref[:] = jnp.zeros(shape, jnp.float32)
        ny_ref[:] = jnp.zeros(shape, jnp.float32)
        nz_ref[:] = jnp.zeros(shape, jnp.float32)

        @pl.when(jnp.any(active))
        def _():
            inx = 1.0 / cdx
            iny = 1.0 / cdy
            inz = 1.0 / cdz
            act_f = active.astype(jnp.float32)
            big = jnp.float32(3.4e38)

            # ---- phase 1: per-lane top-K supercluster candidates
            def scan_body(si, carry):
                cnt = carry[0]
                slots = list(carry[1:])  # en0..enK-1, sc0..scK-1
                enter, exit_ = _slab(cl_aabb, si * 6, cox, coy, coz,
                                     inx, iny, inz, big)
                opened = (exit_ > enter) & active
                cnt = cnt + opened.astype(jnp.float32)
                e = jnp.where(opened, jnp.maximum(enter, 0.0), big)
                s = si.astype(jnp.float32)
                for k in range(K):
                    c = e < slots[k]
                    slots[k], e = (jnp.where(c, e, slots[k]),
                                   jnp.where(c, slots[k], e))
                    slots[K + k], s = (jnp.where(c, s, slots[K + k]),
                                       jnp.where(c, slots[K + k], s))
                return (cnt, *slots)

            zf = jnp.zeros(shape, jnp.float32)
            init = (zf,) + (jnp.full(shape, big, jnp.float32),) * K \
                + (jnp.full(shape, -1.0, jnp.float32),) * K
            carry = jax.lax.fori_loop(0, n_sup, scan_body, init)
            cnt = carry[0]
            ens = carry[1:1 + K]
            scs = carry[1 + K:1 + 2 * K]

            def descend(s, act_s):
                """Member-cluster descend of supercluster s with per-lane
                mask act_s; shared by rounds and the overflow pass."""
                first = cl_aabb[span_base + s * 2].astype(jnp.int32)
                n_m = cl_aabb[span_base + s * 2 + 1].astype(jnp.int32)

                def cl_body(k, _):
                    c = first + k
                    en, ex = _slab(cl_aabb, cl_base0 + c * 7,
                                   cox, coy, coz, inx, iny, inz, t_ref[:])
                    if ah_ref is not None:
                        ah_ref[:] = (
                            ah_ref[:]
                            + ((ex > en) & act_s).astype(jnp.float32)
                            * (c < n_clusters).astype(jnp.float32))

                    @pl.when(jnp.any((ex > en) & act_s) & (c < n_clusters))
                    def _():
                        if nv_ref is not None:
                            nv_ref[:] = nv_ref[:] + 1.0
                            tt_ref[:] = tt_ref[:] + float(CLUSTER_TRIS)
                        dma = pltpu.make_async_copy(
                            tri_hbm.at[c], vmem_buf, dma_sem)
                        dma.start()
                        dma.wait()

                        def step(_s, buf):
                            ok, t, _u, _v = _mt_rolled_step(
                                buf, cox, coy, coz, cdx, cdy, cdz)
                            ok = ok & act_s & (t < t_ref[:])
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

                        jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])

                    return 0

                jax.lax.fori_loop(0, n_m, cl_body, 0)

            # ---- phase 2: K rounds, tile range of the r-th candidates
            for r in range(K):
                sc_r = scs[r]
                lane_ok = (sc_r >= 0.0) & (ens[r] < t_ref[:]) & active

                @pl.when(jnp.any(lane_ok))
                def _(sc_r=sc_r, lane_ok=lane_ok):
                    smin = jnp.min(jnp.where(lane_ok, sc_r, big))
                    smax = jnp.max(jnp.where(lane_ok, sc_r, -1.0))

                    def sc_body(s, _):
                        act_s = lane_ok & (sc_r == s.astype(jnp.float32)) \
                            & (ens[r] < t_ref[:])

                        @pl.when(jnp.any(act_s))
                        def _():
                            descend(s, act_s)

                        return 0

                    jax.lax.fori_loop(smin.astype(jnp.int32),
                                      smax.astype(jnp.int32) + 1, sc_body, 0)

            # ---- phase 3: overflowed lanes run the full ordered pass
            over = (cnt > float(K)) & active

            @pl.when(jnp.any(over))
            def _():
                if order_tab is not None:
                    stride = order_tab.shape[0] // 8
                    oct_ = _majority_octant(cdx, cdy, cdz, over) * stride

                def super_body(si, _):
                    s = order_tab[oct_ + si] if order_tab is not None else si
                    enter, exit_ = _slab(cl_aabb, s * 6, cox, coy, coz,
                                         inx, iny, inz, t_ref[:])
                    act_s = over & (exit_ > enter)

                    @pl.when(jnp.any(act_s))
                    def _():
                        descend(s, act_s)

                    return 0

                jax.lax.fori_loop(0, n_sup, super_body, 0)

        return t_ref[:], m_ref[:], nx_ref[:], ny_ref[:], nz_ref[:]

    return isect


def first_super_id(cl_aabb, n_sup, ox, oy, oz, dx, dy, dz):
    """Per-LANE id of the first supercluster the ray enters (argmin of
    slab entry-t over every super AABB; ties keep the lower id), n_sup
    where the ray misses everything.  Slab tests only — no DMA, no
    triangle work — so the loop costs ~S x 20 vector ops (~15 us per
    4096-lane tile at S=180, ~0.1% of a bounce).  Returns f32 [shape].

    This is the round-3 'entry pattern' coherence key: rays grouped by
    the super they actually START traversal in share most of their
    cluster visit set, unlike origin/direction proxies (VERDICT round-2
    item 1c)."""
    inx = 1.0 / dx
    iny = 1.0 / dy
    inz = 1.0 / dz
    inf = jnp.full(ox.shape, jnp.inf, jnp.float32)

    def body(s, carry):
        bt, bi = carry
        en, ex = _slab(cl_aabb, s * 6, ox, oy, oz, inx, iny, inz, inf)
        hit = (ex > en) & (en < bt)
        bt = jnp.where(hit, en, bt)
        bi = jnp.where(hit, jnp.zeros_like(bi) + s.astype(jnp.float32), bi)
        return bt, bi

    _, bi = jax.lax.fori_loop(
        0, n_sup, body,
        (inf, jnp.full(ox.shape, float(n_sup), jnp.float32)))
    return bi


def make_clustered_closest(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                           scratch, shape, order_tab=None, stat_refs=None,
                           uv_refs=None, pair_il=None):
    """Dispatch: tile-union traversal by default; BPT_TPU_TRAVERSAL=cand
    selects the per-lane candidate scheme.  Measured on the 91k-tri
    coffee stand-in (v5e): candidate = 0.27 Mrays/s vs union 0.45 — the
    M-T roll cost is shared across the whole tile either way, so per-lane
    personalization cannot beat the union, and rank-misaligned rounds
    re-DMA clusters.  Kept for study: it IS the right shape if tiles
    ever get per-row masking."""
    import os

    if os.environ.get("BPT_TPU_TRAVERSAL", "union") == "cand" \
            and uv_refs is None \
            and scratch[1] is not None:  # study path; needs full carries
        return make_candidate_intersect(meta, cl_aabb, tri_hbm, vmem_buf,
                                        dma_sem, scratch, shape,
                                        order_tab=order_tab,
                                        stat_refs=stat_refs)
    return make_rolled_intersect(meta, cl_aabb, tri_hbm, vmem_buf,
                                 dma_sem, scratch, shape,
                                 order_tab=order_tab, stat_refs=stat_refs,
                                 uv_refs=uv_refs, pair_il=pair_il)


def make_rolled_any_hit(meta, cl_aabb, tri_hbm, vmem_buf, dma_sem,
                        found_ref, shape, stat_refs=None):
    """Any-hit provider (shadow rays); tmax <= 0 marks a dead lane.
    Accepts the paired buffer/semaphore form; runs serially on pair A
    (the any-hit early-exits on found, so prefetch pays less here).
    stat_refs: optional (nv, ah, tt) accumulators, same semantics as
    make_rolled_intersect (the reference charges shadow-ray BVH work to
    the same global BvhStats)."""
    vmem_buf, _b = vmem_buf if isinstance(vmem_buf, tuple) else (vmem_buf, None)
    dma_sem, _s = dma_sem if isinstance(dma_sem, tuple) else (dma_sem, None)
    nv_ref, ah_ref, tt_ref = stat_refs if stat_refs else (None, None, None)
    n_clusters = meta[5]
    C_st = tri_hbm.shape[0]
    n_sup = (cl_aabb.shape[0] - C_st * 7) // 8
    span_base = n_sup * 6
    cl_base0 = n_sup * 8

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
                if ah_ref is not None:
                    ah_ref[:] = ah_ref[:] + (exit_ > enter).astype(jnp.float32)

                @pl.when(jnp.any(exit_ > enter))
                def _():
                    if nv_ref is not None:
                        nv_ref[:] = nv_ref[:] + 1.0
                    first = cl_aabb[span_base + si * 2].astype(jnp.int32)
                    n_m = cl_aabb[span_base + si * 2 + 1].astype(jnp.int32)

                    def cl_body(k, _):
                        c = first + k
                        bnd = jnp.where(found_ref[:] < 0.5, tmax,
                                        jnp.float32(-jnp.inf))
                        en, ex = _slab(cl_aabb, cl_base0 + c * 7,
                                       sox, soy, soz, inx, iny, inz, bnd)
                        if ah_ref is not None:
                            ah_ref[:] = (
                                ah_ref[:]
                                + (ex > en).astype(jnp.float32)
                                * (c < n_clusters).astype(jnp.float32))

                        @pl.when(jnp.any(ex > en) & (c < n_clusters))
                        def _():
                            if nv_ref is not None:
                                nv_ref[:] = nv_ref[:] + 1.0
                                tt_ref[:] = tt_ref[:] + float(CLUSTER_TRIS)
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

                    jax.lax.fori_loop(0, n_m, cl_body, 0)

                return 0

            jax.lax.fori_loop(0, n_sup, super_body, 0)

        return found_ref[:] > 0.5

    return any_hit
