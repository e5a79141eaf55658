"""Instrumented two-level traversal probe: counts supercluster descents and
cluster DMAs per tile on (a) sorted primaries, (b) realistic bounce-1 rays,
(c) worst-case random rays.  Fits the cost model that decides the next
optimization lever."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod
from bpt_tpu.ops.pallas.clusters import (
    pack_clusters_rolled, cluster_orders, _mt_rolled_step, _slab,
    SUPER, CLUSTER_TRIS, BLOCK_ROWS, _majority_octant)
from bpt_tpu.ops.intersect import T_MIN

LANES = 128


def _probe_kernel(meta_ref, aabb_ref, order_ref, blocks_hbm,
                  ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                  t_out, sc_cnt, cl_cnt, vmem_buf, dma_sem):
    shape = ox.shape
    n_clusters = meta_ref[0]
    C_st = blocks_hbm.shape[0]
    n_sup = (aabb_ref.shape[0] - C_st * 7) // 8
    span_base = n_sup * 6
    cl_base0 = n_sup * 8
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmin_r[:]
    tmax = tmax_r[:]
    t_out[:] = jnp.full(shape, jnp.inf, jnp.float32)
    sc_cnt[:] = jnp.zeros(shape, jnp.float32)
    cl_cnt[:] = jnp.zeros(shape, jnp.float32)
    inx, iny, inz = 1.0 / dxv, 1.0 / dyv, 1.0 / dzv
    stride = order_ref.shape[0] // 8
    act = tmax > 0.0
    oct_ = _majority_octant(dxv, dyv, dzv, act) * stride

    def super_body(si, _):
        s = order_ref[oct_ + si]
        bound = jnp.minimum(t_out[:], tmax)
        enter, exit_ = _slab(aabb_ref, s * 6, oxv, oyv, ozv, inx, iny, inz, bound)

        @pl.when(jnp.any(exit_ > enter))
        def _():
            sc_cnt[:] = sc_cnt[:] + 1.0
            first = aabb_ref[span_base + s * 2].astype(jnp.int32)
            n_m = aabb_ref[span_base + s * 2 + 1].astype(jnp.int32)

            def cluster_body(k, _):
                c = first + k
                bnd = jnp.minimum(t_out[:], tmax)
                en, ex = _slab(aabb_ref, cl_base0 + c * 7, oxv, oyv, ozv,
                               inx, iny, inz, bnd)

                @pl.when(jnp.any(ex > en) & (c < n_clusters))
                def _():
                    cl_cnt[:] = cl_cnt[:] + 1.0
                    dma = pltpu.make_async_copy(blocks_hbm.at[c], vmem_buf, dma_sem)
                    dma.start()
                    dma.wait()

                    def step(s_, buf):
                        ok, t, _u, _v = _mt_rolled_step(buf, oxv, oyv, ozv, dxv, dyv, dzv)
                        ok = ok & (t >= tmin) & (t <= tmax) & (t < t_out[:])
                        t_out[:] = jnp.where(ok, t, t_out[:])
                        return pltpu.roll(buf, LANES - 1, 1)

                    jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])
                return 0

            jax.lax.fori_loop(0, n_m, cluster_body, 0)
        return 0

    jax.lax.fori_loop(0, n_sup, super_body, 0)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def probe(aabb, order, blocks, ox, oy, oz, dx, dy, dz, tmin, tmax, tile_rows=8):
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    C = blocks.shape[0]

    def prep(x, fill=0.0):
        pad = Bp - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]
    meta = jnp.array([C], jnp.int32)
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    t, sc, cl = pl.pallas_call(
        _probe_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=[block] * 3,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[fshape, fshape, fshape],
    )(meta, aabb, order, blocks, *args)
    return t.reshape(Bp)[:B], sc.reshape(-1, tile_rows * LANES)[:, 0], cl.reshape(-1, tile_rows * LANES)[:, 0]


def run_case(name, aabb, order, blocks, a, tmin, tmax, tile_rows=8):
    r = probe(aabb, order, blocks, *a, tmin, tmax, tile_rows=tile_rows)
    jax.block_until_ready(r)
    N = 10
    t0 = time.monotonic()
    for _ in range(N):
        r = probe(aabb, order, blocks, *a, tmin, tmax, tile_rows=tile_rows)
    jax.block_until_ready(r)
    dt = (time.monotonic() - t0) / N
    t, sc, cl = r
    B = a[0].shape[0]
    print(f"{name:28s} rows={tile_rows}: {dt*1000:7.2f} ms, {B/dt/1e6:7.1f} Mrays/s, "
          f"sc/tile={float(np.mean(np.asarray(sc))):6.1f}, dma/tile={float(np.mean(np.asarray(cl))):7.1f}, "
          f"hit%={100*float(np.mean(np.isfinite(np.asarray(t)))):.0f}")
    return r


def main():
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = H = 512
    B = W * H
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32)
    j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4, dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i * 0, j * 0, u)
    C, aabb, blocks = pack_clusters_rolled(scene)
    order = cluster_orders(scene, C)
    S = (C + SUPER - 1) // SUPER
    print(f"T={scene.num_tris} C={C} S={S}")
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.full((B,), np.inf, jnp.float32)

    a_pri = [o3[:, 0], o3[:, 1], o3[:, 2], d3[:, 0], d3[:, 1], d3[:, 2]]
    t1, _, _ = run_case("primary (raster)", aabb, order, blocks, a_pri, tmin, tmax)

    # realistic bounce-1: cosine about hit normal from the primary hits
    t1n = np.asarray(t1)
    hit = np.isfinite(t1n)
    o_np = np.asarray(o3)
    d_np = np.asarray(d3)
    p = o_np + np.where(hit, t1n, 1.0)[:, None] * d_np
    # normals via a brute nearest-triangle lookup is overkill; approximate
    # with random cosine lobes about the z-up (divergence is what matters)
    rng = np.random.default_rng(7)
    u1, u2 = rng.random(B), rng.random(B)
    phi = 2 * np.pi * u1
    r_ = np.sqrt(u2)
    dirs = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                     np.sqrt(1 - u2) * np.where(rng.random(B) < 0.5, 1, -1)], 1).astype(np.float32)
    a_b1 = [jnp.asarray(x) for x in
            (p[:, 0], p[:, 1], p[:, 2], dirs[:, 0], dirs[:, 1], dirs[:, 2])]
    tmax_b1 = jnp.where(jnp.asarray(hit), jnp.inf, -1.0)
    run_case("bounce1 unsorted", aabb, order, blocks, a_b1, tmin, tmax_b1)

    # sorted by octant+morton (what pt_wave does)
    from bpt_tpu.ops.pallas.cluster_wave import morton_octant_key
    live = hit
    lo_b = np.where(live[:, None], p, np.inf).min(0)
    hi_b = np.where(live[:, None], p, -np.inf).max(0)
    k2 = morton_octant_key(jnp.asarray(lo_b), jnp.asarray(hi_b), *a_b1)
    k2 = jnp.where(jnp.asarray(live), k2, jnp.int32(2**30))
    perm = jnp.argsort(k2)
    a_b1s = [x[perm] for x in a_b1]
    run_case("bounce1 sorted", aabb, order, blocks, a_b1s, tmin, tmax_b1[perm])
    run_case("bounce1 sorted", aabb, order, blocks, a_b1s, tmin,
             tmax_b1[perm], tile_rows=16)
    # coherence CEILING: sort by (primary hit cluster, fine direction bin)
    # — the best origin locality obtainable; shows whether better sorting
    # is worth building or tile-union divergence is intrinsic
    t1tri = np.asarray(probe(aabb, order, blocks, *a_pri, tmin, tmax)[0])
    from bpt_tpu.ops.pallas.clusters import CLUSTER_TRIS as CT
    db = ((dirs[:, 0] > 0).astype(np.int64)
          | ((dirs[:, 1] > 0).astype(np.int64) << 1)
          | ((dirs[:, 2] > 0).astype(np.int64) << 2)
          | ((np.abs(dirs).argmax(1).astype(np.int64)) << 3)
          | ((np.abs(dirs[:, 0]) > 0.7).astype(np.int64) << 5))
    # origin cluster: quantized hit position cell (morton-free: 6 bits/axis)
    q = np.clip((p - lo_b) / np.maximum(hi_b - lo_b, 1e-9), 0, 1)
    cell = ((q[:, 0] * 15).astype(np.int64) << 8) | \
           ((q[:, 1] * 15).astype(np.int64) << 4) | (q[:, 2] * 15).astype(np.int64)
    keyi = np.where(hit, (cell << 6) | db, 1 << 62)
    permi = jnp.asarray(np.argsort(keyi, kind="stable"), jnp.int32)
    a_ideal = [x[permi] for x in a_b1]
    run_case("bounce1 cell-major sort", aabb, order, blocks, a_ideal, tmin,
             tmax_b1[permi])
    # octant-MAJOR ideal: tiles single-octant (majority-octant front-to-back
    # order then actually culls behind the per-ray first hit), cell minor
    oct3 = db & 7
    keyo = np.where(hit, (oct3 << 40) | (cell << 20) | (db >> 3), 1 << 62)
    permo = jnp.asarray(np.argsort(keyo, kind="stable"), jnp.int32)
    a_octm = [x[permo] for x in a_b1]
    for rows in (8, 16):
        run_case("bounce1 OCT-major ideal", aabb, order, blocks, a_octm,
                 tmin, tmax_b1[permo], tile_rows=rows)

    # worst case: random box origins, random dirs
    lo = np.asarray(scene.bvh_min[0]); hi = np.asarray(scene.bvh_max[0])
    O = rng.uniform(lo, hi, (B, 3)).astype(np.float32)
    D = rng.normal(size=(B, 3)).astype(np.float32)
    a_rnd = [jnp.asarray(O[:, 0]), jnp.asarray(O[:, 1]), jnp.asarray(O[:, 2]),
             jnp.asarray(D[:, 0]), jnp.asarray(D[:, 1]), jnp.asarray(D[:, 2])]
    run_case("random worst-case", aabb, order, blocks, a_rnd, tmin, tmax)


if __name__ == "__main__":
    main()
