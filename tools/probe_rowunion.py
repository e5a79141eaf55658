"""Probe: per-ROW (128-ray) vs per-TILE (R*128-ray) cluster-union sizes
on pt_wave's REAL bounce-1 state, under different sort keys.

Decides whether a row-personalized visit scheme (each tile row streams
its OWN cluster queue, rank-aligned DMA; rolls stay full-width) can
beat the tile-union traversal: its per-tile step count is
max-over-rows |row union| instead of |tile union|, so the win ceiling
is the ratio printed here.

Per-ray candidate set approximation: clusters whose slab interval is
non-empty before the ray's FINAL hit t (the probe kernel's t_out) —
i.e. what a perfect per-ray front-to-back traversal would visit.
All set math happens host-side in numpy on a ray sample.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders
from bpt_tpu.ops.intersect import T_MIN
from probe_traversal import probe

LANES = 128


def cand_matrix(aabb_np, C, n_sup, o, d, t_end):
    """[B, C] bool: cluster slab interval non-empty in [T_MIN, t_end]."""
    cl = aabb_np[n_sup * 8:].reshape(C, 7)
    lo = cl[:, 0:3]  # [C,3]
    hi = cl[:, 3:6]
    B = o.shape[0]
    out = np.zeros((B, C), bool)
    inv = 1.0 / d  # [B,3]
    for c0 in range(0, C, 256):
        c1 = min(C, c0 + 256)
        t0 = (lo[None, c0:c1] - o[:, None]) * inv[:, None]  # [B,c,3]
        t1 = (hi[None, c0:c1] - o[:, None]) * inv[:, None]
        en = np.maximum(np.minimum(t0, t1).max(2), T_MIN)
        ex = np.minimum(np.maximum(t0, t1).min(2), t_end[:, None])
        out[:, c0:c1] = ex > en
    return out


def union_stats(name, cand, rows):
    """cand: [B, C] bool in tile order."""
    B, C = cand.shape
    tile = rows * LANES
    nt = B // tile
    cand = cand[: nt * tile]
    row_u = cand.reshape(-1, LANES, C).any(1).sum(1)  # [B/128]
    tile_u = cand.reshape(nt, tile, C).any(1).sum(1)  # [nt]
    row_max_per_tile = row_u.reshape(nt, rows).max(1)
    print(f"{name:24s} perray={cand.sum(1).mean():6.1f} "
          f"row_u(mean)={row_u.mean():6.1f} "
          f"rowmax/tile={row_max_per_tile.mean():6.1f} "
          f"tile_u={tile_u.mean():6.1f} "
          f"win_ceiling={tile_u.mean() / max(row_max_per_tile.mean(), 1):.2f}x")


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    B = W * W
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
    k_pt = jax.random.fold_in(key, 1)

    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    n_sup = (cl_aabb.shape[0] - C * 7) // 8
    print(f"C={C} S={n_sup}")

    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, state,
                              16, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f, fs) = outs
    print("live after bounce 0:", int(jnp.sum(alive_f)))

    # final t per live ray from the instrumented probe (sort-invariant)
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.where(alive_f > 0.5, jnp.inf, -1.0)
    t_fin, _, _ = probe(cl_aabb, order_t, tri_hbm, ox, oy, oz, dx, dy, dz,
                        tmin, tmax, tile_rows=16)

    live = np.asarray(alive_f) > 0.5
    o_np = np.stack([np.asarray(v)[live] for v in (ox, oy, oz)], 1)
    d_np = np.stack([np.asarray(v)[live] for v in (dx, dy, dz)], 1)
    t_np = np.asarray(t_fin)[live]
    t_np = np.where(np.isfinite(t_np), t_np * 1.0001, np.inf)
    fs_np = np.asarray(fs)[live]
    aabb_np = np.asarray(cl_aabb)

    # sample for tractability: contiguous blocks AFTER sorting
    nlive = o_np.shape[0]
    print(f"live rays: {nlive}")
    cand = cand_matrix(aabb_np, C, n_sup, o_np, d_np, t_np)

    # ---- sort variants over the SAME live set
    lo_b = jnp.asarray(o_np.min(0))
    hi_b = jnp.asarray(o_np.max(0))
    alive1 = jnp.ones((nlive,), jnp.float32)
    p_proxy = np.asarray(ptw._coherence_perm(
        lo_b, hi_b, *[jnp.asarray(o_np[:, a]) for a in range(3)],
        *[jnp.asarray(d_np[:, a]) for a in range(3)], alive1))
    p_entry = np.asarray(ptw._entry_perm(
        jnp.asarray(fs_np), *[jnp.asarray(d_np[:, a]) for a in range(3)],
        alive1))

    for rows in (8, 32):
        union_stats(f"unsorted rows={rows}", cand, rows)
        union_stats(f"proxy-sort rows={rows}", cand[p_proxy], rows)
        union_stats(f"entry-sort rows={rows}", cand[p_entry], rows)

    # greedy set-similarity ordering ceiling: order rays by (leading
    # cluster id of their set, set size) — a cheap stand-in for true
    # clustering by Jaccard similarity
    lead = np.argmax(cand, 1)
    sz = cand.sum(1)
    p_lead = np.lexsort((sz, lead))
    for rows in (8, 32):
        union_stats(f"leadcl-sort rows={rows}", cand[p_lead], rows)


if __name__ == "__main__":
    main()
