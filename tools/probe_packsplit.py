"""Simulate PACKING-AWARE BVH splits: round the median split point to a
multiple of CLUSTER_TRIS so maximal subtrees fill their 32-tri roll
blocks (~100% instead of the balanced-median ~70%).

The streaming kernel pays a full 32-step roll per cluster visit
regardless of fill, and a median-split tree's maximal subtrees sit at
~22.3/32 — an irreducible 30% roll-step tax that fill-merging cannot
recover (two adjacent subtrees always overflow).  Rounding the split
keeps near-median box quality at high node counts while making every
left subtree a 32-multiple.

Measures, on the REAL bounce-1 secondary state of coffee-91k: cluster
count, per-tile (proxy-sorted, 32x128) cluster-union sizes, and the
predicted kernel-time ratio sum(visits_new)/sum(visits_old) under both
the final-t and the infinity t bound.

Usage: python tools/probe_packsplit.py [rows]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import (
    pack_clusters_rolled, cluster_orders, CLUSTER_TRIS, SUPER)
from bpt_tpu.scene import bvh as bvh_mod
from bpt_tpu.ops.intersect import T_MIN
from probe_traversal import probe

LANES = 128
W32 = CLUSTER_TRIS


def build_packed(tri_min, tri_max):
    """Numpy BVH with split points rounded to W32 multiples."""
    node_min, node_max, node_skip = [], [], []
    node_first, node_count, new_order = [], [], []

    def rec(idx):
        my_pos = len(node_min)
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        node_min.append(bmin)
        node_max.append(bmax)
        node_skip.append(-1)
        span = len(idx)
        if span <= 2:
            node_first.append(len(new_order))
            node_count.append(span)
            new_order.extend(idx.tolist())
        else:
            node_first.append(0)
            node_count.append(0)
            axis = int(np.argmax(bmax - bmin))
            order = np.argsort(tri_min[idx, axis], kind="stable")
            idx = idx[order]
            if span > W32:
                mid = int(np.clip(round(span / (2 * W32)) * W32,
                                  W32, span - 1))
            else:
                mid = span // 2
            rec(idx[:mid])
            rec(idx[mid:])
        node_skip[my_pos] = len(node_min)

    rec(np.arange(tri_min.shape[0]))
    return dict(
        bvh_skip=np.asarray(node_skip, np.int32),
        bvh_count=np.asarray(node_count, np.int32),
        order=np.asarray(new_order, np.int64),
        bvh_min=np.stack(node_min), bvh_max=np.stack(node_max),
    )


def cluster_bounds(cs, lo, hi):
    C = len(cs) - 1
    clo = np.zeros((C, 3), np.float32)
    chi = np.zeros((C, 3), np.float32)
    for k in range(C):
        clo[k] = lo[cs[k]: cs[k + 1]].min(0)
        chi[k] = hi[cs[k]: cs[k + 1]].max(0)
    return clo, chi


def cand_matrix(clo, chi, o, d, t_end):
    B, C = o.shape[0], clo.shape[0]
    out = np.zeros((B, C), bool)
    inv = 1.0 / d
    for c0 in range(0, C, 256):
        c1 = min(C, c0 + 256)
        t0 = (clo[None, c0:c1] - o[:, None]) * inv[:, None]
        t1 = (chi[None, c0:c1] - o[:, None]) * inv[:, None]
        en = np.maximum(np.minimum(t0, t1).max(2), T_MIN)
        ex = np.minimum(np.maximum(t0, t1).min(2), t_end[:, None])
        out[:, c0:c1] = ex > en
    return out


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    Wd = 512
    B = Wd * Wd
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % Wd).astype(jnp.float32)
    j = (pix // Wd).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)

    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(jax.random.fold_in(key, 1), NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab,
                              lgt_tab, keys_flat, cl_aabb, order_t,
                              tri_hbm, state, 16, False, True)
    (ox, oy, oz, dx, dy, dz) = outs[:6]
    alive_f = outs[12]
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.where(alive_f > 0.5, jnp.inf, -1.0)
    t_fin, _, _ = probe(cl_aabb, order_t, tri_hbm, ox, oy, oz, dx, dy, dz,
                        tmin, tmax, tile_rows=16)
    live = np.asarray(alive_f) > 0.5
    o_np = np.stack([np.asarray(v)[live] for v in (ox, oy, oz)], 1)
    d_np = np.stack([np.asarray(v)[live] for v in (dx, dy, dz)], 1)
    t_np = np.asarray(t_fin)[live]
    t_np = np.where(np.isfinite(t_np), t_np * 1.0001, np.inf)
    nlive = o_np.shape[0]
    print(f"live rays: {nlive}", flush=True)

    # proxy sort (identical key for both variants: ray order is
    # clustering-independent)
    lo_b = jnp.asarray(o_np.min(0)); hi_b = jnp.asarray(o_np.max(0))
    alive1 = jnp.ones((nlive,), jnp.float32)
    p = np.asarray(ptw._coherence_perm(
        lo_b, hi_b, *[jnp.asarray(o_np[:, a]) for a in range(3)],
        *[jnp.asarray(d_np[:, a]) for a in range(3)], alive1))
    o_s, d_s, t_s = o_np[p], d_np[p], t_np[p]

    # triangle world bounds in CURRENT scene order
    v0 = np.asarray(scene.v0, np.float64)
    p1 = v0 + np.asarray(scene.e1, np.float64)
    p2 = v0 + np.asarray(scene.e2, np.float64)
    lo = np.minimum(v0, np.minimum(p1, p2)).astype(np.float32)
    hi = np.maximum(v0, np.maximum(p1, p2)).astype(np.float32)

    def union_report(name, cs):
        clo, chi = cluster_bounds(cs, lo, hi)
        tile = rows * LANES
        nt = nlive // tile
        for bname, te in (("t-bound", t_s), ("inf", np.full_like(t_s, np.inf))):
            cand = cand_matrix(clo, chi, o_s, d_s, te)
            u = cand[: nt * tile].reshape(nt, tile, -1).any(1).sum(1)
            print(f"{name:16s} [{bname}] C={len(cs)-1} "
                  f"visits/tile={u.mean():7.1f} total={u.sum()}", flush=True)
        return None

    # current (median) clustering, same tri order
    union_report("median-splits", tuple(scene.cluster_splits))

    # packed rebuild: REORDERS triangles; cluster bounds must use the
    # packed order's permuted tri bounds
    tree = build_packed(np.minimum(v0, np.minimum(p1, p2)),
                        np.maximum(v0, np.maximum(p1, p2)))
    cs_p = bvh_mod.subtree_splits(tree["bvh_skip"], tree["bvh_count"], W32)
    n = np.diff(np.asarray(cs_p))
    print(f"packed clusters: {len(n)} fill mean={n.mean():.1f} "
          f"p10={np.percentile(n,10):.0f} max={n.max()}", flush=True)
    ordp = tree["order"]
    global lo2, hi2
    lo2, hi2 = lo[ordp], hi[ordp]

    def union_report_packed(name, cs):
        clo, chi = cluster_bounds(cs, lo2, hi2)
        tile = rows * LANES
        nt = nlive // tile
        for bname, te in (("t-bound", t_s), ("inf", np.full_like(t_s, np.inf))):
            cand = cand_matrix(clo, chi, o_s, d_s, te)
            u = cand[: nt * tile].reshape(nt, tile, -1).any(1).sum(1)
            print(f"{name:16s} [{bname}] C={len(cs)-1} "
                  f"visits/tile={u.mean():7.1f} total={u.sum()}", flush=True)

    union_report_packed("packed-splits", cs_p)


if __name__ == "__main__":
    main()
