"""Probe: sort-key variants on a 16x spp-batched wave (4.2M rays).

At 16x density the proxy key's 12-bit origin cell collapses: a tile
holds same-cell rays with arbitrary directions, whose cluster union is
everything that point can see.  Dense waves need direction-heavy keys.
Runs the instrumented traversal (probe_traversal.probe) on the REAL
bounce-1 state under each candidate permutation and prints wall time +
dynamic dma/tile.
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
from probe_traversal import probe, run_case

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    npix = W * W
    B = npix * spp
    pix = jnp.arange(npix, dtype=jnp.int32)
    i = jnp.tile((pix % W).astype(jnp.float32), spp)
    j = jnp.tile((pix // W).astype(jnp.float32), spp)
    S = int(np.sqrt(spp))
    s_lin = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    rid = jnp.tile(pix, spp) * spp + s_lin
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), rid, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, (s_lin % S).astype(jnp.float32),
                           (s_lin // S).astype(jnp.float32), u)
    k_pt = jax.random.fold_in(key, 1)

    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    assert use_clusters(scene)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)

    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    # bounce 0 in chunks (state tensors are 11 x 4.2M f32, fine; the
    # launch itself handles any B)
    state = (ox, oy, oz, dx, dy, dz, one, one, one, one, rid)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, state,
                              rows, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f, fs) = outs
    jax.block_until_ready(outs)
    nlive = int(jnp.sum(alive_f))
    print(f"B={B} live after bounce 0: {nlive}")

    live = alive_f > 0.5
    big = jnp.float32(3.4e38)
    lo_b = jnp.stack([jnp.min(jnp.where(live, v, big)) for v in (ox, oy, oz)])
    hi_b = jnp.stack([jnp.max(jnp.where(live, v, -big)) for v in (ox, oy, oz)])
    ext = jnp.maximum(hi_b - lo_b, 1e-12)

    octant = ((dx > 0).astype(jnp.int32)
              | ((dy > 0).astype(jnp.int32) << 1)
              | ((dz > 0).astype(jnp.int32) << 2))

    def qbits(p, a, n):
        f = jnp.clip((p - lo_b[a]) / ext[a], 0.0, 1.0)
        return (f * (2 ** n - 1)).astype(jnp.int32)

    def cell(n):
        return (qbits(ox, 0, n) << (2 * n)) | (qbits(oy, 1, n) << n) | qbits(oz, 2, n)

    # direction quantization: theta-phi style via axis projections
    def dirq(n):
        # quantize the direction components (coarse spherical binning)
        def q(v):
            return jnp.clip(((v + 1.0) * 0.5 * (2 ** n - 1)).astype(jnp.int32),
                            0, 2 ** n - 1)
        return (q(dx) << (2 * n)) | (q(dy) << n) | q(dz)

    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    dom = jnp.where(ax >= jnp.maximum(ay, az), 0, jnp.where(ay >= az, 1, 2))
    strong = (jnp.maximum(ax, jnp.maximum(ay, az))
              > 0.7 * jnp.sqrt(ax * ax + ay * ay + az * az))
    dfine = (dom << 1) | strong.astype(jnp.int32)

    variants = {
        "proxy (oct|cell4|df)": (octant << 15) | (cell(4) << 3) | dfine,
        "oct|cell4|dir2": (octant << 18) | (cell(4) << 6) | dirq(2),
        "oct|cell3|dir3": (octant << 18) | (cell(3) << 9) | dirq(3),
        "oct|cell2|dir4": (octant << 18) | (cell(2) << 12) | dirq(4),
        "oct|dir3|cell3": (octant << 18) | (dirq(3) << 9) | cell(3),
        "cell5|oct|dir2": (cell(5) << 9) | (octant << 6) | dirq(2),
        "oct|cell5|dir2": (octant << 21) | (cell(5) << 6) | dirq(2),
    }

    tmin = jnp.full((B,), T_MIN, jnp.float32)
    for name, k in variants.items():
        kk = jnp.where(live, k, jnp.int32(1 << 30))
        p = jnp.argsort(kk)
        a = [v[p] for v in (ox, oy, oz, dx, dy, dz)]
        tmax = jnp.where(live[p], jnp.inf, -1.0)
        run_case(name, cl_aabb, order_t, tri_hbm, a, tmin, tmax,
                 tile_rows=rows)


if __name__ == "__main__":
    main()
