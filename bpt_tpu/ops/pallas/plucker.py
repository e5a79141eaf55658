"""MXU ray-triangle intersection: Plücker coordinates as one matmul.

The rolled cluster kernels (cluster_wave.py) are VPU-bound: 128 roll
steps of a ~45-op Möller–Trumbore chain per touched cluster (~2.8 us
per 2048-ray cluster-tile measured on v5e).  This kernel moves the
test onto the MXU — measured EQUAL to the roll on v5e because the f32
sign tests force Precision.HIGHEST and the select/reduce epilogue is
VPU-bound; kept as the basis for bf16 two-pass experiments.
For ray (o, d) and triangle (a, b, c) the three edge Plücker
products and the plane numerator are all linear in the 10-vector

    f(ray) = [d, o x d, -o, 1]

so a cluster of 128 triangles becomes a [512, 128] constant matrix A
(rows: w_ab | w_bc | w_ca | plane x 128 tris, cols: feature dim padded
to the native 128-lane K) and intersection of a 128-ray group is

    W = A @ f       # [512, 128] MXU matmul
    denom = w_ab + w_bc + w_ca        ( = d . n = -det_MT )
    u = w_ca/denom, v = w_ab/denom, t = plane/denom

with the reference's exact test semantics (|det| >= 1e-8, u in [0,1],
v >= 0, u+v <= 1, src/objects/primatives/triangle.h:41-74) expressed
sign-safely as w-vs-denom sign agreements: u>=0 <=> sgn(w_ca)=sgn(denom),
u<=1 <=> sgn(w_ab+w_bc)=sgn(denom), v>=0 <=> sgn(w_ab)=sgn(denom),
u+v<=1 <=> sgn(w_bc)=sgn(denom).  Numerically u/v/t agree with MT to
~1e-6 relative (fp rearrangement only; verified against brute_closest).

Cluster AABBs stay in SMEM for tile-level culling; triangle matrices
stream HBM->VMEM (256 KB per touched cluster) like clusters.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON, T_MIN
from bpt_tpu.ops.pallas.clusters import CLUSTER_TRIS, _cluster_aabbs

LANES = 128
K = 128  # feature dim padded to the native MXU contraction width
ROWS_PER_CLUSTER = 4 * CLUSTER_TRIS  # w_ab | w_bc | w_ca | plane
DEF_TILE_ROWS = 16
NFEAT = 10


def pack_plucker_clusters(scene):
    """-> (C, aabb [C*6] f32, blocks [C, 512, 128] f32).  Pure jnp (safe
    under jit with a traced scene).  Padding triangles are all-zero rows
    (denom == 0 -> fails the |det| >= eps test).

    Vertices are stored RELATIVE to the cluster's AABB center and the
    kernel translates ray origins the same way: the raw Plücker moments
    (a x b, o x d) lose ~log2(|coord|^2) bits to cancellation at
    mm-style scene scales, while the translated form matches
    Möller–Trumbore's conditioning (which subtracts o - v0 first)."""
    T = scene.num_tris
    C = int(np.ceil(T / CLUSTER_TRIS))
    Tp = C * CLUSTER_TRIS

    aabb = _cluster_aabbs(scene, C)
    aabb6 = aabb.reshape(C, 6)
    ctr = jnp.where(
        jnp.isfinite(aabb6[:, :3]) & jnp.isfinite(aabb6[:, 3:]),
        (aabb6[:, :3] + aabb6[:, 3:]) * 0.5, 0.0,
    )  # all-padding clusters have +/-inf bounds
    ctr_tri = jnp.repeat(ctr, CLUSTER_TRIS, axis=0)[:T]

    v0 = scene.v0.astype(jnp.float32) - ctr_tri
    e1 = scene.e1.astype(jnp.float32)
    e2 = scene.e2.astype(jnp.float32)
    a = v0
    b = v0 + e1
    c_ = v0 + e2
    n = jnp.cross(e1, e2)
    z3 = jnp.zeros((T, 3), jnp.float32)
    z1 = jnp.zeros((T, 1), jnp.float32)

    rows_ab = jnp.concatenate([jnp.cross(a, b), b - a, z3, z1], axis=1)
    rows_bc = jnp.concatenate([jnp.cross(b, c_), c_ - b, z3, z1], axis=1)
    rows_ca = jnp.concatenate([jnp.cross(c_, a), a - c_, z3, z1], axis=1)
    rows_pl = jnp.concatenate(
        [z3, z3, n, jnp.sum(n * v0, axis=1, keepdims=True)], axis=1
    )

    def blockify(rows):  # [T,10] -> [C,128,10]
        pad = Tp - T
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, NFEAT), jnp.float32)], axis=0
        )
        return rows.reshape(C, CLUSTER_TRIS, NFEAT)

    blocks = jnp.concatenate(
        [blockify(rows_ab), blockify(rows_bc),
         blockify(rows_ca), blockify(rows_pl)],
        axis=1,
    )  # [C, 512, 10]
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((C, ROWS_PER_CLUSTER, K - NFEAT), jnp.float32)],
        axis=2,
    )
    return C, aabb, blocks


def _feat_block(oxg, oyg, ozg, dxg, dyg, dzg):
    """Translated ray rows [1,128] -> [K,128] feature block."""
    mxg = oyg * dzg - ozg * dyg
    myg = ozg * dxg - oxg * dzg
    mzg = oxg * dyg - oyg * dxg
    one = jnp.ones_like(dxg)
    return jnp.concatenate(
        [dxg, dyg, dzg, mxg, myg, mzg, -oxg, -oyg, -ozg, one,
         jnp.zeros((K - NFEAT, LANES), jnp.float32)],
        axis=0,
    )


def _slab(aabb_ref, c, oxv, oyv, ozv, inx, iny, inz, far):
    base = c * 6
    t0x = (aabb_ref[base + 0] - oxv) * inx
    t1x = (aabb_ref[base + 3] - oxv) * inx
    t0y = (aabb_ref[base + 1] - oyv) * iny
    t1y = (aabb_ref[base + 4] - oyv) * iny
    t0z = (aabb_ref[base + 2] - ozv) * inz
    t1z = (aabb_ref[base + 5] - ozv) * inz
    enter = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), T_MIN),
    )
    exit_ = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), far),
    )
    return enter, exit_


def _cluster_hits(buf, feat_g, tmin_g, tmax_g, tbest_g):
    """One (cluster, ray-row) MXU step.  buf [512,128] tri matrix,
    feat_g [128,128] features.  Returns (okfull [128,128], t [128,128])."""
    w = jax.lax.dot_general(
        buf, feat_g, (((1,), (0,)), ((), ())),
        # HIGHEST = full-f32 multi-pass: the default TPU precision
        # truncates to bf16 (8 mantissa bits) and flips the w sign tests
        # on near-miss triangles -> false hits
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [512, 128] = (4*tri, ray)
    w_ab = w[0:CLUSTER_TRIS]
    w_bc = w[CLUSTER_TRIS:2 * CLUSTER_TRIS]
    w_ca = w[2 * CLUSTER_TRIS:3 * CLUSTER_TRIS]
    pn = w[3 * CLUSTER_TRIS:4 * CLUSTER_TRIS]
    denom = w_ab + w_bc + w_ca
    pos = denom > 0.0
    neg = jnp.logical_not(pos)

    def okw(x):
        # sign(x) agrees with sign(denom); plain boolean algebra — Mosaic
        # rejects vector selects on i1 ("unsupported bitwidth truncation")
        return ((x >= 0.0) & pos) | ((x <= 0.0) & neg)

    rdenom = 1.0 / denom
    t = pn * rdenom
    okfull = (
        (jnp.abs(denom) >= MT_EPSILON)
        & okw(w_ca) & okw(w_ab) & okw(w_bc) & okw(w_ab + w_bc)
        & (t >= tmin_g) & (t <= tmax_g) & (t < tbest_g)
    )
    return okfull, t, w_ab * 1.0, w_ca * 1.0, rdenom


def _closest_kernel(tile_rows, meta_ref, aabb_ref, blocks_hbm,
                    ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                    t_out, tri_out, u_out, v_out,
                    vmem_buf, dma_sem):
    shape = ox.shape
    n_clusters = meta_ref[0]
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    inx = 1.0 / dx[:]
    iny = 1.0 / dy[:]
    inz = 1.0 / dz[:]

    t_out[:] = jnp.full(shape, jnp.inf, jnp.float32)
    tri_out[:] = jnp.full(shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(shape, jnp.float32)
    v_out[:] = jnp.zeros(shape, jnp.float32)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_TRIS, LANES), 0)

    def cluster_body(c, _):
        enter, exit_ = _slab(aabb_ref, c, oxv, oyv, ozv, inx, iny, inz,
                             jnp.minimum(t_out[:], tmax_r[:]))
        tile_hits = jnp.any(exit_ > enter)

        @pl.when(tile_hits)
        def _():
            dma = pltpu.make_async_copy(blocks_hbm.at[c], vmem_buf, dma_sem)
            dma.start()
            dma.wait()
            buf = vmem_buf[:]
            base = c * 6
            ctrx = (aabb_ref[base + 0] + aabb_ref[base + 3]) * 0.5
            ctry = (aabb_ref[base + 1] + aabb_ref[base + 4]) * 0.5
            ctrz = (aabb_ref[base + 2] + aabb_ref[base + 5]) * 0.5
            for g in range(tile_rows):
                feat_g = _feat_block(
                    ox[g:g + 1, :] - ctrx, oy[g:g + 1, :] - ctry,
                    oz[g:g + 1, :] - ctrz,
                    dx[g:g + 1, :], dy[g:g + 1, :], dz[g:g + 1, :],
                )
                tmin_g = tmin_r[g:g + 1, :]
                tmax_g = tmax_r[g:g + 1, :]
                tbest_g = t_out[g:g + 1, :]
                okfull, t, w_ab, w_ca, rdenom = _cluster_hits(
                    buf, feat_g, tmin_g, tmax_g, tbest_g
                )
                tc = jnp.where(okfull, t, jnp.inf)
                tnew = jnp.min(tc, axis=0, keepdims=True)  # [1,128]
                improved = tnew < tbest_g
                eq = tc == tnew
                tri_loc = jnp.min(
                    jnp.where(eq, rowid, CLUSTER_TRIS), axis=0, keepdims=True
                )
                sel = rowid == tri_loc
                u_all = w_ca * rdenom
                v_all = w_ab * rdenom
                u_new = jnp.sum(jnp.where(sel & eq, u_all, 0.0), axis=0,
                                keepdims=True)
                v_new = jnp.sum(jnp.where(sel & eq, v_all, 0.0), axis=0,
                                keepdims=True)
                t_out[g:g + 1, :] = jnp.where(improved, tnew, tbest_g)
                tri_out[g:g + 1, :] = jnp.where(
                    improved, tri_loc + c * CLUSTER_TRIS,
                    tri_out[g:g + 1, :],
                )
                u_out[g:g + 1, :] = jnp.where(improved, u_new,
                                              u_out[g:g + 1, :])
                v_out[g:g + 1, :] = jnp.where(improved, v_new,
                                              v_out[g:g + 1, :])
        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)


def _any_kernel(tile_rows, meta_ref, aabb_ref, blocks_hbm,
                ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                hit_out, vmem_buf, dma_sem):
    shape = ox.shape
    n_clusters = meta_ref[0]
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    inx = 1.0 / dx[:]
    iny = 1.0 / dy[:]
    inz = 1.0 / dz[:]
    hit_out[:] = jnp.zeros(shape, jnp.int32)
    big = jnp.full(shape, jnp.inf, jnp.float32)

    def cluster_body(c, _):
        enter, exit_ = _slab(aabb_ref, c, oxv, oyv, ozv, inx, iny, inz,
                             jnp.where(hit_out[:] == 0, tmax_r[:], 0.0))
        tile_hits = jnp.any(exit_ > enter)

        @pl.when(tile_hits)
        def _():
            dma = pltpu.make_async_copy(blocks_hbm.at[c], vmem_buf, dma_sem)
            dma.start()
            dma.wait()
            buf = vmem_buf[:]
            base = c * 6
            ctrx = (aabb_ref[base + 0] + aabb_ref[base + 3]) * 0.5
            ctry = (aabb_ref[base + 1] + aabb_ref[base + 4]) * 0.5
            ctrz = (aabb_ref[base + 2] + aabb_ref[base + 5]) * 0.5
            for g in range(tile_rows):
                feat_g = _feat_block(
                    ox[g:g + 1, :] - ctrx, oy[g:g + 1, :] - ctry,
                    oz[g:g + 1, :] - ctrz,
                    dx[g:g + 1, :], dy[g:g + 1, :], dz[g:g + 1, :],
                )
                okfull, _t, _wa, _wc, _rd = _cluster_hits(
                    buf, feat_g, tmin_r[g:g + 1, :], tmax_r[g:g + 1, :],
                    big[g:g + 1, :],
                )
                anyhit = jnp.sum(okfull.astype(jnp.int32), axis=0,
                                 keepdims=True)
                hit_out[g:g + 1, :] = jnp.maximum(
                    hit_out[g:g + 1, :], jnp.minimum(anyhit, 1)
                )
        return 0

    jax.lax.fori_loop(0, n_clusters, cluster_body, 0)


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])


def _prep_inputs(aabb, blocks, ox, oy, oz, dx, dy, dz, tmin, tmax,
                 tile_rows):
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]
    meta = jnp.array([blocks.shape[0]], jnp.int32)
    return B, Bp, meta, args


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def plucker_closest_pallas(aabb, blocks, ox, oy, oz, dx, dy, dz,
                           tmin, tmax, tile_rows: int = DEF_TILE_ROWS,
                           interpret: bool = False):
    """Same contract as cluster_wave.clustered_closest_pallas, but the
    triangle test runs on the MXU.  blocks: pack_plucker_clusters()."""
    B, Bp, meta, args = _prep_inputs(
        aabb, blocks, ox, oy, oz, dx, dy, dz, tmin, tmax, tile_rows
    )
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    t, tri, u, v = pl.pallas_call(
        functools.partial(_closest_kernel, tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Bp // (tile_rows * LANES),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=[block] * 4,
            scratch_shapes=[
                pltpu.VMEM((ROWS_PER_CLUSTER, K), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[fshape, ishape, fshape, fshape],
        interpret=interpret,
    )(meta, aabb, blocks, *args)
    return (
        t.reshape(Bp)[:B],
        tri.reshape(Bp)[:B],
        u.reshape(Bp)[:B],
        v.reshape(Bp)[:B],
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def plucker_any_pallas(aabb, blocks, ox, oy, oz, dx, dy, dz,
                       tmin, tmax, tile_rows: int = DEF_TILE_ROWS,
                       interpret: bool = False):
    B, Bp, meta, args = _prep_inputs(
        aabb, blocks, ox, oy, oz, dx, dy, dz, tmin, tmax, tile_rows
    )
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        functools.partial(_any_kernel, tile_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Bp // (tile_rows * LANES),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=block,
            scratch_shapes=[
                pltpu.VMEM((ROWS_PER_CLUSTER, K), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(meta, aabb, blocks, *args)
    return hit.reshape(Bp)[:B] > 0
