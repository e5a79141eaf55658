"""Simulate the BINNED TARGETED TRAVERSAL scheme on real wave states.

Scheme under study (round-3 candidate for the large-scene gap): instead
of one union-traversal pass per bounce, run R short ROUNDS.  In round r
every unresolved ray targets its r-th nearest candidate supercluster
(by slab entry t); rays are sorted by target id between rounds, so a
tile's lanes nearly all want the SAME super and the kernel descends
only into that super's clusters.  A ray is resolved once its best hit t
<= the entry t of every remaining candidate (standard front-to-back
BVH argument).  This moves the regrouping the in-kernel candidate
scheme could not do (VERDICT r2: tile-shared visit cost) into the XLA
sort between launches.

This probe quantifies, on the REAL bounce-1 secondary-ray state of the
91k-tri coffee stand-in (the exact state pt_wave sorts today):
  1. per-ray candidate-super counts + rounds-to-resolution (m_i =
     candidates with entry t < final hit t);
  2. per-round cluster VISITS under target-id binning (both with the
     final-t bound = optimistic, and the infinity bound = pessimistic)
     vs the tile-union baseline's visits — the predicted kernel-time
     ratio, since visit cost is identical in both schemes.

Usage: python tools/probe_binned.py [rows [spp_mult]]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas import pt_wave as ptw
from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, use_clusters, NU
from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders, SUPER
from bpt_tpu.ops.intersect import T_MIN
from probe_traversal import probe

LANES = 128


def slab_mat(lo, hi, o, d, t_end):
    """[B, N] (enter, open) for N aabbs; t_end[B] upper bound."""
    B = o.shape[0]
    N = lo.shape[0]
    en_all = np.zeros((B, N), np.float32)
    open_all = np.zeros((B, N), bool)
    inv = 1.0 / d
    for c0 in range(0, N, 256):
        c1 = min(N, c0 + 256)
        t0 = (lo[None, c0:c1] - o[:, None]) * inv[:, None]
        t1 = (hi[None, c0:c1] - o[:, None]) * inv[:, None]
        en = np.maximum(np.minimum(t0, t1).max(2), T_MIN)
        ex = np.minimum(np.maximum(t0, t1).min(2), t_end[:, None])
        en_all[:, c0:c1] = en
        open_all[:, c0:c1] = ex > en
    return en_all, open_all


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
    print(f"C={C} S={n_sup}", flush=True)

    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, state,
                              16, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f) = outs[:13]
    print("live after bounce 0:", int(jnp.sum(alive_f)), flush=True)

    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.where(alive_f > 0.5, jnp.inf, -1.0)
    t_fin, _, _ = probe(cl_aabb, order_t, tri_hbm, ox, oy, oz, dx, dy, dz,
                        tmin, tmax, tile_rows=16)

    live = np.asarray(alive_f) > 0.5
    o_np = np.stack([np.asarray(v)[live] for v in (ox, oy, oz)], 1)
    d_np = np.stack([np.asarray(v)[live] for v in (dx, dy, dz)], 1)
    t_np = np.asarray(t_fin)[live]
    t_np = np.where(np.isfinite(t_np), t_np * 1.0001, np.inf)
    aabb_np = np.asarray(cl_aabb)
    nlive = o_np.shape[0]
    print(f"live rays: {nlive}", flush=True)

    sup = aabb_np[: n_sup * 6].reshape(n_sup, 6)
    s_lo, s_hi = sup[:, 0:3], sup[:, 3:6]
    spans = aabb_np[n_sup * 6: n_sup * 8].reshape(n_sup, 2).astype(np.int64)
    cl = aabb_np[n_sup * 8:].reshape(C, 7)
    c_lo, c_hi = cl[:, 0:3], cl[:, 3:6]
    # cluster -> super map
    c2s = np.zeros(C, np.int64)
    for s in range(n_sup):
        c2s[spans[s, 0]: spans[s, 0] + spans[s, 1]] = s

    inf_t = np.full(nlive, np.inf, np.float32)

    # ---- per-ray candidate supers (no t bound: what traversal faces)
    s_en, s_open = slab_mat(s_lo, s_hi, o_np, d_np, inf_t)
    ncand = s_open.sum(1)
    # rounds to resolution: candidates with entry t < final hit t
    m = (s_open & (s_en < t_np[:, None])).sum(1)
    print(f"cand supers/ray: mean={ncand.mean():.2f} "
          f"p50={np.percentile(ncand, 50):.0f} "
          f"p90={np.percentile(ncand, 90):.0f} "
          f"p99={np.percentile(ncand, 99):.0f} max={ncand.max()}", flush=True)
    print(f"rounds-to-resolve m: mean={m.mean():.2f} "
          f"p50={np.percentile(m, 50):.0f} p90={np.percentile(m, 90):.0f} "
          f"p99={np.percentile(m, 99):.0f} max={m.max()}", flush=True)
    for r in range(8):
        print(f"  frac resolved after round {r}: {(m <= r).mean():.3f}",
              flush=True)

    # ---- baseline: proxy-sorted tile-union visits (what runs today)
    lo_b = jnp.asarray(o_np.min(0)); hi_b = jnp.asarray(o_np.max(0))
    alive1 = jnp.ones((nlive,), jnp.float32)
    p_proxy = np.asarray(ptw._coherence_perm(
        lo_b, hi_b, *[jnp.asarray(o_np[:, a]) for a in range(3)],
        *[jnp.asarray(d_np[:, a]) for a in range(3)], alive1))
    # cluster-level candidates under final-t bound (tight) and inf bound
    _, c_open_t = slab_mat(c_lo, c_hi, o_np, d_np, t_np)
    _, c_open_inf = slab_mat(c_lo, c_hi, o_np, d_np, inf_t)
    tile = rows * LANES
    for name, c_open in (("t-bound", c_open_t), ("inf-bound", c_open_inf)):
        cs = c_open[p_proxy]
        nt = nlive // tile
        base_visits = cs[: nt * tile].reshape(nt, tile, C).any(1).sum()
        print(f"baseline union visits [{name}]: {base_visits} "
              f"({base_visits / nt:.1f}/tile, {nt} tiles)", flush=True)

    # ---- binned rounds
    # candidate order per ray: supers sorted by entry t (open only)
    order = np.argsort(np.where(s_open, s_en, np.inf), 1)
    for name, c_open in (("t-bound", c_open_t), ("inf-bound", c_open_inf)):
        tot_visits = 0
        tot_tiles = 0
        R = int(np.percentile(m, 99))
        for r in range(R):
            unres = m > r
            n_u = int(unres.sum())
            if n_u == 0:
                break
            tgt = order[unres, r]  # r-th nearest candidate super
            has = r < ncand[unres]
            idx = np.nonzero(unres)[0][has]
            tgt = tgt[has]
            if idx.size == 0:
                break
            p = np.argsort(tgt, kind="stable")
            idx, tgt = idx[p], tgt[p]
            ntile = int(np.ceil(idx.size / tile))
            visits = 0
            for ti in range(ntile):
                sl = slice(ti * tile, (ti + 1) * tile)
                rs, ss = idx[sl], np.unique(tgt[sl])
                # clusters of the tile's target supers that any lane's
                # slab passes
                for s in ss:
                    cr = slice(spans[s, 0], spans[s, 0] + spans[s, 1])
                    visits += int(c_open[rs, cr].any(0).sum())
            tot_visits += visits
            tot_tiles += ntile
            print(f"  [{name}] round {r}: rays={idx.size} tiles={ntile} "
                  f"visits={visits} ({visits / max(ntile,1):.1f}/tile)",
                  flush=True)
        print(f"binned total [{name}]: visits={tot_visits} tiles={tot_tiles} "
              f"(+pre-pass {n_sup} slabs/ray)", flush=True)


if __name__ == "__main__":
    main()
