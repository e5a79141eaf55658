"""A/B: serial per-cluster DMA (start;wait;roll) vs paired double-buffered
DMA (start A; start B; roll A; roll B) on the real wave-b1 state."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.pallas.clusters import (
    _mt_rolled_step, _slab, CLUSTER_TRIS, BLOCK_ROWS, _majority_octant)
from bpt_tpu.ops.intersect import T_MIN

LANES = 128


def _kernel(mode, meta_ref, aabb_ref, order_ref, blocks_hbm,
            ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
            t_out, bufA, bufB, semA, semB):
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
    inx, iny, inz = 1.0 / dxv, 1.0 / dyv, 1.0 / dzv
    stride = order_ref.shape[0] // 8
    act = tmax > 0.0
    oct_ = _majority_octant(dxv, dyv, dzv, act) * stride

    R = shape[0]

    def roll(buf_ref, en=None, ex=None):
        if mode != "grouped":
            def step(s_, buf):
                ok, t, _u, _v = _mt_rolled_step(buf, oxv, oyv, ozv,
                                                dxv, dyv, dzv)
                ok = ok & (t >= tmin) & (t <= tmax) & (t < t_out[:])
                t_out[:] = jnp.where(ok, t, t_out[:])
                return pltpu.roll(buf, LANES - 1, 1)
            jax.lax.fori_loop(0, CLUSTER_TRIS, step, buf_ref[:])
            return
        for g in range(R // 8):
            sl = slice(g * 8, g * 8 + 8)

            @pl.when(jnp.any(ex[sl] > en[sl]))
            def _(sl=sl):
                def step(s_, buf):
                    ok, t, _u, _v = _mt_rolled_step(
                        buf, oxv[sl], oyv[sl], ozv[sl],
                        dxv[sl], dyv[sl], dzv[sl])
                    ok = (ok & (t >= tmin[sl]) & (t <= tmax[sl])
                          & (t < t_out[sl]))
                    t_out[sl] = jnp.where(ok, t, t_out[sl])
                    return pltpu.roll(buf, LANES - 1, 1)
                jax.lax.fori_loop(0, CLUSTER_TRIS, step, buf_ref[:])

    def super_body(si, _):
        s = order_ref[oct_ + si]
        bound = jnp.minimum(t_out[:], tmax)
        enter, exit_ = _slab(aabb_ref, s * 6, oxv, oyv, ozv, inx, iny, inz, bound)

        @pl.when(jnp.any(exit_ > enter))
        def _():
            first = aabb_ref[span_base + s * 2].astype(jnp.int32)
            n_m = aabb_ref[span_base + s * 2 + 1].astype(jnp.int32)

            if mode == "serial":
                def cluster_body(k, _):
                    c = first + k
                    bnd = jnp.minimum(t_out[:], tmax)
                    en, ex = _slab(aabb_ref, cl_base0 + c * 7, oxv, oyv, ozv,
                                   inx, iny, inz, bnd)

                    @pl.when(jnp.any(ex > en) & (c < n_clusters))
                    def _():
                        dma = pltpu.make_async_copy(blocks_hbm.at[c], bufA, semA)
                        dma.start()
                        dma.wait()
                        roll(bufA)
                    return 0

                jax.lax.fori_loop(0, n_m, cluster_body, 0)
            elif mode == "grouped":
                def pair_body(j, _):
                    c0 = first + 2 * j
                    c1 = c0 + 1
                    bnd = jnp.minimum(t_out[:], tmax)
                    en0, ex0 = _slab(aabb_ref, cl_base0 + c0 * 7, oxv, oyv,
                                     ozv, inx, iny, inz, bnd)
                    en1, ex1 = _slab(aabb_ref, cl_base0 + c1 * 7, oxv, oyv,
                                     ozv, inx, iny, inz, bnd)
                    open0 = jnp.any(ex0 > en0) & (c0 < first + n_m)
                    open1 = (jnp.any(ex1 > en1) & (c1 < first + n_m)
                             & (c1 < n_clusters))

                    @pl.when(open0)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c0], bufA, semA).start()

                    @pl.when(open1)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c1], bufB, semB).start()

                    @pl.when(open0)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c0], bufA, semA).wait()
                        roll(bufA, en0, ex0)

                    @pl.when(open1)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c1], bufB, semB).wait()
                        roll(bufB, en1, ex1)
                    return 0

                jax.lax.fori_loop(0, (n_m + 1) // 2, pair_body, 0)
            else:
                def pair_body(j, _):
                    c0 = first + 2 * j
                    c1 = c0 + 1
                    bnd = jnp.minimum(t_out[:], tmax)
                    en0, ex0 = _slab(aabb_ref, cl_base0 + c0 * 7, oxv, oyv,
                                     ozv, inx, iny, inz, bnd)
                    en1, ex1 = _slab(aabb_ref, cl_base0 + c1 * 7, oxv, oyv,
                                     ozv, inx, iny, inz, bnd)
                    open0 = jnp.any(ex0 > en0) & (c0 < first + n_m)
                    open1 = (jnp.any(ex1 > en1) & (c1 < first + n_m)
                             & (c1 < n_clusters))

                    @pl.when(open0)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c0], bufA, semA).start()

                    @pl.when(open1)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c1], bufB, semB).start()

                    @pl.when(open0)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c0], bufA, semA).wait()
                        roll(bufA)

                    @pl.when(open1)
                    def _():
                        pltpu.make_async_copy(blocks_hbm.at[c1], bufB, semB).wait()
                        roll(bufB)
                    return 0

                jax.lax.fori_loop(0, (n_m + 1) // 2, pair_body, 0)
        return 0

    jax.lax.fori_loop(0, n_sup, super_body, 0)


@functools.partial(jax.jit, static_argnames=("tile_rows", "mode"))
def run(aabb, order, blocks, ox, oy, oz, dx, dy, dz, tmin, tmax,
        tile_rows=32, mode="serial"):
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
    t = pl.pallas_call(
        functools.partial(_kernel, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=block,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=fshape,
    )(meta, aabb, order, blocks, *args)
    return t


def main():
    from bpt_tpu.scene.loader import load_scene_from_yaml
    from bpt_tpu.models.camera import camera_constants, generate_rays
    from bpt_tpu.core import rng as rng_mod
    from bpt_tpu.ops.pallas import pt_wave as ptw
    from bpt_tpu.ops.pallas.pt_kernel import _pack_tables, _subkeys, NU
    from bpt_tpu.ops.pallas.clusters import pack_clusters_rolled, cluster_orders
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512; B = W*W
    pix = jnp.arange(B, dtype=jnp.int32)
    i = (pix % W).astype(jnp.float32); j = (pix // W).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), pix, 0, 4, dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, i*0, j*0, u)
    k_pt = jax.random.fold_in(key, 1)
    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(k_pt, NU)
    C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
    order_t = cluster_orders(scene, C)
    meta0 = meta0.at[5].set(C)
    ox, oy, oz = [jnp.asarray(o3[:, a], jnp.float32) for a in range(3)]
    dx, dy, dz = [jnp.asarray(d3[:, a], jnp.float32) for a in range(3)]
    one = jnp.ones((B,), jnp.float32)
    st = (ox, oy, oz, dx, dy, dz, one, one, one, one, pix)
    outs = ptw._launch_bounce(meta0.at[4].set(0), tri_tab, mat_tab, lgt_tab,
                              keys_flat, cl_aabb, order_t, tri_hbm, st,
                              32, False, True)
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f) = outs
    lo_b = jnp.stack([jnp.min(jnp.where(alive_f > 0.5, v, 3.4e38)) for v in (ox, oy, oz)])
    hi_b = jnp.stack([jnp.max(jnp.where(alive_f > 0.5, v, -3.4e38)) for v in (ox, oy, oz)])
    p = ptw._coherence_perm(lo_b, hi_b, ox, oy, oz, dx, dy, dz, alive_f)
    oxs, oys, ozs, dxs, dys, dzs, als = (ox[p], oy[p], oz[p], dx[p], dy[p], dz[p], alive_f[p])
    tmin = jnp.full((B,), T_MIN, jnp.float32)
    tmax = jnp.where(als > 0.5, jnp.inf, -1.0)
    live = float(jnp.sum(als))
    res = {}
    import itertools
    cases = [("serial", 32), ("paired", 32), ("grouped", 32),
             ("grouped", 64), ("grouped", 128),
             ("serial", 32), ("grouped", 32), ("grouped", 64),
             ("grouped", 128)]
    if len(sys.argv) > 1:
        cases = [(m, int(r)) for m, r in
                 (c.split(":") for c in sys.argv[1].split(","))]
    for mode, rows in cases:
        a = [oxs, oys, ozs, dxs, dys, dzs]
        r = run(cl_aabb, order_t, tri_hbm, *a, tmin, tmax, tile_rows=rows, mode=mode)
        jax.block_until_ready(r)
        N = 5
        t0 = time.monotonic()
        for _ in range(N):
            r = run(cl_aabb, order_t, tri_hbm, *a, tmin, tmax, tile_rows=rows, mode=mode)
        jax.block_until_ready(r)
        dt = (time.monotonic()-t0)/N
        print(f"mode={mode:8s} rows={rows:3d}: {dt*1000:7.1f} ms  {live/dt/1e6:5.2f} Mlive/s")
        res[(mode, rows)] = np.asarray(r)
    ref = res.get(("serial", 32))
    if ref is not None:
        for k, v in res.items():
            if k != ("serial", 32):
                print(k, "t equal:", np.array_equal(ref, v))


if __name__ == "__main__":
    main()
