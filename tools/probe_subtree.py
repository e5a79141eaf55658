"""Does BVH-subtree-aligned clustering beat DFS-chop?

Computes per-ray t-culled cluster/supercluster entry counts for both
boundary choices on the coffee stand-in.  DFS-chop slices 32 consecutive
DFS-ordered tris regardless of subtree boundaries, so most clusters span
parts of 2+ sibling subtrees and their AABBs balloon; subtree-aligned
clusters are the node bboxes the BVH already proved tight.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.loader import load_scene_from_yaml
from probe_perray import brute_t, count_entries
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod


def subtree_splits(scene, max_tris):
    """Greedy maximal subtrees with <= max_tris triangles -> tri-range
    split points [0, ..., T] (host numpy; preorder + skip links)."""
    skip = np.asarray(scene.bvh_skip)
    count = np.asarray(scene.bvh_count)
    N = skip.shape[0]
    pre = np.zeros(N + 1, np.int64)
    pre[1:] = np.cumsum(count)
    tri_first = pre[:N]
    tri_count = pre[skip] - pre[:N]
    splits = [0]
    pos = 0
    while pos < N:
        if tri_count[pos] <= max_tris:
            splits.append(int(tri_first[pos] + tri_count[pos]))
            pos = int(skip[pos])
        else:
            pos += 1
    return np.asarray(splits, np.int64)


def boxes_from_splits(scene, splits):
    v0 = np.asarray(scene.v0, np.float64)
    p1 = v0 + np.asarray(scene.e1, np.float64)
    p2 = v0 + np.asarray(scene.e2, np.float64)
    lo = np.minimum(v0, np.minimum(p1, p2))
    hi = np.maximum(v0, np.maximum(p1, p2))
    n = len(splits) - 1
    out = np.zeros((n, 6), np.float32)
    for k in range(n):
        a, b = splits[k], splits[k + 1]
        out[k, :3] = lo[a:b].min(0)
        out[k, 3:] = hi[a:b].max(0)
    return out


def chop_splits(T, step):
    return np.arange(0, T + step, step).clip(max=T)


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    T = scene.num_tris
    cc = camera_constants(cfg, scene.dtype)
    W = 256
    B = W * W
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    u = rng_mod.wave_uniforms(jax.random.fold_in(jax.random.PRNGKey(0), 0),
                              pix, 0, 4, dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
    o3 = np.asarray(o3); d3 = np.asarray(d3)
    cache = "/tmp/probe_subtree_rays.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        p, dirs, t2c, hit = z["p"], z["dirs"], z["t2c"], z["hit"]
    else:
        t1 = np.asarray(brute_t(scene, jnp.asarray(o3), jnp.asarray(d3)))
        hit = np.isfinite(t1)
        rng = np.random.default_rng(7)
        p = o3 + np.where(hit, t1, 1.0)[:, None] * d3
        u1, u2 = rng.random(B), rng.random(B)
        phi = 2 * np.pi * u1; r_ = np.sqrt(u2)
        dirs = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                         np.sqrt(1 - u2) * np.where(rng.random(B) < 0.5, 1, -1)],
                        1).astype(np.float32)
        t2 = np.asarray(brute_t(scene, jnp.asarray(p), jnp.asarray(dirs)))
        t2c = np.where(np.isfinite(t2), t2, 3.4e38).astype(np.float32)
        np.savez(cache, p=p, dirs=dirs, t2c=t2c, hit=hit)

    cases = {
        "chop32": chop_splits(T, 32),
        "chop512": chop_splits(T, 512),
        "sub32": subtree_splits(scene, 32),
        "sub512": subtree_splits(scene, 512),
        "sub128": subtree_splits(scene, 128),
    }
    for name, sp in cases.items():
        box = boxes_from_splits(scene, sp)
        n = box.shape[0]
        mean_sz = T / n
        n_all_l, n_cull_l = [], []
        ch = 16384
        for k in range(0, B, ch):
            na, nc = count_entries(
                jnp.asarray(box),
                *[jnp.asarray(x[k:k+ch]) for x in
                  (p[:, 0], p[:, 1], p[:, 2],
                   dirs[:, 0], dirs[:, 1], dirs[:, 2])],
                jnp.asarray(t2c[k:k+ch]))
            n_all_l.append(np.asarray(na)); n_cull_l.append(np.asarray(nc))
        n_all = np.concatenate(n_all_l)[hit]
        n_cull = np.concatenate(n_cull_l)[hit]
        # tests/ray if we M-T every tri of every t-culled entered cluster
        tests = n_cull.mean() * mean_sz
        print(f"{name:8s}: n={n:5d} (avg {mean_sz:5.1f} tris) "
              f"bounce1 entries/ray all={n_all.mean():7.2f} "
              f"culled={n_cull.mean():6.2f}  -> culled tests/ray {tests:7.0f}")


if __name__ == "__main__":
    main()
