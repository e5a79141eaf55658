"""Standalone clustered intersect kernels for the per-bounce wavefront.

The megakernels' in-kernel bounce loop cannot re-sort rays, so on large
scenes (> 512 tris) their tiles decohere after the first diffuse bounce
and every tile touches most clusters (SURVEY §7 / ROADMAP item 1).  The
wavefront path can: between bounces the host-side loop sorts rays by a
Morton key of their origin (plus direction octant) so that each [R,128]
tile sees spatially-adjacent rays, and tile-level AABB culling becomes
effective again.  These kernels are the intersect stage of that path —
one launch per wave, grid over ray tiles, the cluster blocks streamed
HBM->VMEM on whole-tile AABB hits exactly like the megakernels'
clustered mode (clusters.py), but additionally returning the triangle
index and barycentrics that the jnp shading stage (ops.soa.complete_hit)
needs for UV/texture parity with the reference
(src/objects/primatives/triangle.h:41-74).

Triangle identity through the lane roll: after s roll steps ray lane l
faces the cluster's slot (l + s) mod 32, so the global id is the
cluster's tri_base (combined-table record field 6) + that slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import T_MIN
from bpt_tpu.ops.pallas.clusters import (
    BLOCK_ROWS,
    CLUSTER_TRIS,
    SUPER,
    _mt_rolled_step,
    _slab,
)

LANES = 128
DEF_TILE_ROWS = 16


def _closest_kernel(meta_ref, aabb_ref, blocks_hbm,
                    ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                    t_out, tri_out, u_out, v_out,
                    vmem_buf, dma_sem):
    shape = ox.shape
    n_clusters = meta_ref[0]
    # static structure from ref shapes: [S*6 | S*2 spans | C*7]
    C_st = blocks_hbm.shape[0]
    n_sup = (aabb_ref.shape[0] - C_st * 7) // 8
    span_base = n_sup * 6
    cl_base0 = n_sup * 8
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmin_r[:]
    tmax = tmax_r[:]

    t_out[:] = jnp.full(shape, jnp.inf, jnp.float32)
    tri_out[:] = jnp.full(shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(shape, jnp.float32)
    v_out[:] = jnp.zeros(shape, jnp.float32)

    inx = 1.0 / dxv
    iny = 1.0 / dyv
    inz = 1.0 / dzv
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    def super_body(si, _):
        bound = jnp.minimum(t_out[:], tmax)
        enter, exit_ = _slab(aabb_ref, si * 6, oxv, oyv, ozv,
                             inx, iny, inz, bound)

        @pl.when(jnp.any(exit_ > enter))
        def _():
            first = aabb_ref[span_base + si * 2].astype(jnp.int32)
            n_m = aabb_ref[span_base + si * 2 + 1].astype(jnp.int32)

            def cluster_body(k, _):
                c = first + k
                bnd = jnp.minimum(t_out[:], tmax)
                en, ex = _slab(aabb_ref, cl_base0 + c * 7, oxv, oyv, ozv,
                               inx, iny, inz, bnd)

                @pl.when(jnp.any(ex > en) & (c < n_clusters))
                def _():
                    dma = pltpu.make_async_copy(blocks_hbm.at[c], vmem_buf,
                                                dma_sem)
                    dma.start()
                    dma.wait()

                    def step(s, buf):
                        base_ok, t, u, v = _mt_rolled_step(
                            buf, oxv, oyv, ozv, dxv, dyv, dzv
                        )
                        ok = base_ok & (t >= tmin) & (t <= tmax) & (t < t_out[:])
                        tri_id = (
                            aabb_ref[cl_base0 + c * 7 + 6].astype(jnp.int32)
                            + ((lane + s) & (CLUSTER_TRIS - 1)))
                        t_out[:] = jnp.where(ok, t, t_out[:])
                        tri_out[:] = jnp.where(ok, tri_id, tri_out[:])
                        u_out[:] = jnp.where(ok, u, u_out[:])
                        v_out[:] = jnp.where(ok, v, v_out[:])
                        return pltpu.roll(buf, LANES - 1, 1)

                    jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])

                return 0

            jax.lax.fori_loop(0, n_m, cluster_body, 0)

        return 0

    jax.lax.fori_loop(0, n_sup, super_body, 0)


def _any_kernel(meta_ref, aabb_ref, blocks_hbm,
                ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                hit_out, vmem_buf, dma_sem):
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

    hit_out[:] = jnp.zeros(shape, jnp.int32)
    inx = 1.0 / dxv
    iny = 1.0 / dyv
    inz = 1.0 / dzv

    def super_body(si, _):
        bound = jnp.where(hit_out[:] == 0, tmax, jnp.float32(-jnp.inf))
        enter, exit_ = _slab(aabb_ref, si * 6, oxv, oyv, ozv,
                             inx, iny, inz, bound)

        @pl.when(jnp.any(exit_ > enter))
        def _():
            first = aabb_ref[span_base + si * 2].astype(jnp.int32)
            n_m = aabb_ref[span_base + si * 2 + 1].astype(jnp.int32)

            def cluster_body(k, _):
                c = first + k
                bnd = jnp.where(hit_out[:] == 0, tmax, jnp.float32(-jnp.inf))
                en, ex = _slab(aabb_ref, cl_base0 + c * 7, oxv, oyv, ozv,
                               inx, iny, inz, bnd)

                @pl.when(jnp.any(ex > en) & (c < n_clusters))
                def _():
                    dma = pltpu.make_async_copy(blocks_hbm.at[c], vmem_buf,
                                                dma_sem)
                    dma.start()
                    dma.wait()

                    def step(s, buf):
                        base_ok, t, _u, _v = _mt_rolled_step(
                            buf, oxv, oyv, ozv, dxv, dyv, dzv
                        )
                        ok = base_ok & (t >= tmin) & (t <= tmax)
                        hit_out[:] = jnp.where(ok, 1, hit_out[:])
                        return pltpu.roll(buf, LANES - 1, 1)

                    jax.lax.fori_loop(0, CLUSTER_TRIS, step, vmem_buf[:])

                return 0

            jax.lax.fori_loop(0, n_m, cluster_body, 0)

        return 0

    jax.lax.fori_loop(0, n_sup, super_body, 0)


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def clustered_closest_pallas(aabb, blocks, ox, oy, oz, dx, dy, dz,
                             tmin, tmax, tile_rows: int = DEF_TILE_ROWS,
                             interpret: bool = False):
    """aabb: the COMBINED two-level SMEM table from
    clusters.pack_clusters_rolled ([S*6 super AABBs | S*2 spans | C*7
    cluster records]); blocks: [C,16,128] rolled triangle blocks (HBM,
    DMA'd per tile-hit).  Rays/tmin/tmax [B].
    Returns (t [B] inf-on-miss, tri [B] int32 -1-on-miss, u [B], v [B])."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    C = blocks.shape[0]

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]
    meta = jnp.array([C], jnp.int32)

    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    t, tri, u, v = pl.pallas_call(
        _closest_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, aabb
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=[block] * 4,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
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
def clustered_any_pallas(aabb, blocks, ox, oy, oz, dx, dy, dz,
                         tmin, tmax, tile_rows: int = DEF_TILE_ROWS,
                         interpret: bool = False):
    """Any-hit variant. Returns bool [B]."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    C = blocks.shape[0]

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]
    meta = jnp.array([C], jnp.int32)

    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        _any_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 8,
            out_specs=block,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(meta, aabb, blocks, *args)
    return hit.reshape(Bp)[:B] > 0


# ------------------------------------------------- round-4 FTB variants
#
# The kernels above visit clusters in index order with single-buffered
# DMA.  The round-2/3 pt_wave campaign measured three traversal wins the
# soa-dispatch path (BDPT traces + connection shadow waves) never got:
# front-to-back supercluster ordering along the tile's majority octant
# (order_tab), paired double-buffered cluster DMA, and 32-row tiles.
# These wrappers reuse the providers from clusters.py
# (make_clustered_closest / make_rolled_any_hit) so the soa path runs
# the SAME traversal the pt_wave bounce kernel does.  Semantics: closest
# assumes the caller's interval is (T_MIN, inf) with dead lanes masked
# via ``active`` (every production closest-hit call); any-hit takes the
# per-lane tmax (<= 0 marks dead lanes).

DEF_TILE_ROWS_FTB = 32


def _closest_kernel_ftb(meta_ref, aabb_ref, order_ref, blocks_hbm,
                        ox, oy, oz, dx, dy, dz, act,
                        t_out, tri_out, u_out, v_out,
                        buf_a, buf_b, sem_a, sem_b,
                        t_s, u_s, v_s, ti_s):
    from bpt_tpu.ops.pallas.clusters import make_clustered_closest

    shape = ox.shape
    # LEAN carries (round 5): this kernel's caller only consumes
    # (t, tri, u, v) — complete_hit gathers the normal/material from
    # the winning tri XLA-side anyway — so the mat + normal hit-update
    # selects are dropped from the roll (clusters.make_rolled_intersect
    # lean mode, ~4 selects + 4 row reads per step removed).
    closest = make_clustered_closest(
        meta_ref, aabb_ref, blocks_hbm, (buf_a, buf_b), (sem_a, sem_b),
        (t_s, None, None, None, None), shape, order_tab=order_ref,
        uv_refs=(u_s, v_s, ti_s),
    )
    t, _m, _nx, _ny, _nz = closest(
        ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], act[:] > 0.5)
    t_out[:] = t
    tri_out[:] = ti_s[:].astype(jnp.int32)
    u_out[:] = u_s[:]
    v_out[:] = v_s[:]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def clustered_closest_ftb_pallas(aabb, order_t, blocks,
                                 ox, oy, oz, dx, dy, dz, active,
                                 tile_rows: int = DEF_TILE_ROWS_FTB,
                                 interpret: bool = False):
    """Front-to-back closest hit over the (T_MIN, inf) interval.
    ``active``: bool/f32 [B] — dead lanes return miss.  Returns
    (t [B] inf-on-miss, tri [B] int32 -1-on-miss, u [B], v [B])."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    C = blocks.shape[0]

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(active.astype(jnp.float32))]
    # make_rolled_intersect reads n_clusters from meta[5]
    meta = jnp.zeros((8,), jnp.int32).at[5].set(C)

    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32)
    t, tri, u, v = pl.pallas_call(
        _closest_kernel_ftb,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # meta, aabb, order
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 7,
            out_specs=[block] * 4,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 4,
        ),
        out_shape=[fshape, ishape, fshape, fshape],
        interpret=interpret,
    )(meta, aabb, order_t, blocks, *args)
    return (
        t.reshape(Bp)[:B],
        tri.reshape(Bp)[:B],
        u.reshape(Bp)[:B],
        v.reshape(Bp)[:B],
    )


def _any_kernel_ftb(meta_ref, aabb_ref, blocks_hbm,
                    ox, oy, oz, dx, dy, dz, tmax_r,
                    hit_out, buf_a, sem_a, found_s):
    from bpt_tpu.ops.pallas.clusters import make_rolled_any_hit

    shape = ox.shape
    any_fn = make_rolled_any_hit(
        meta_ref, aabb_ref, blocks_hbm, buf_a, sem_a, found_s, shape)
    found = any_fn(ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], tmax_r[:])
    hit_out[:] = found.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def clustered_any_ftb_pallas(aabb, blocks, ox, oy, oz, dx, dy, dz, tmax,
                             tile_rows: int = DEF_TILE_ROWS_FTB,
                             interpret: bool = False):
    """Any-hit over (T_MIN, tmax] with early exit; tmax <= 0 marks a
    dead lane (whole-tile dead -> no traversal).  Returns bool [B]."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)
    C = blocks.shape[0]

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmax, fill=-1.0)]
    meta = jnp.zeros((8,), jnp.int32).at[5].set(C)

    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        _any_kernel_ftb,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # meta, aabb
            grid=(Bp // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * 7,
            out_specs=block,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((tile_rows, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(meta, aabb, blocks, *args)
    return hit.reshape(Bp)[:B] > 0


# ---------------------------------------------------------------- sorting


def _spread8(x):
    """Spread the low 8 bits of x so consecutive bits land 3 apart
    (standard 3-D Morton bit twiddling, 8 bits/axis -> 24-bit code)."""
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_octant_key(lo, hi, ox, oy, oz, dx, dy, dz):
    """int32 sort key: 24-bit Morton code of the quantized ray origin,
    with the 3-bit direction octant in the low bits.  lo/hi: [3] world
    bounds used for quantization (the scene's root AABB)."""
    ext = jnp.maximum(hi - lo, 1e-12)

    def q(p, a):
        f = jnp.clip((p - lo[a]) / ext[a], 0.0, 1.0)
        return (f * 255.0).astype(jnp.int32)

    m = (_spread8(q(ox, 0)) | (_spread8(q(oy, 1)) << 1)
         | (_spread8(q(oz, 2)) << 2))
    oct_ = ((dx > 0).astype(jnp.int32)
            | ((dy > 0).astype(jnp.int32) << 1)
            | ((dz > 0).astype(jnp.int32) << 2))
    return (m << 3) | oct_
