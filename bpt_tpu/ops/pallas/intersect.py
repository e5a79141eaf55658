"""Pallas TPU kernels for brute-force ray-triangle intersection.

The jnp [T,B] broadcast formulation materializes ~T*B-sized temporaries in
HBM (memory-bound, ~12ms per 262k-ray wave on cornell).  These kernels keep
a [RxL] ray tile resident in VMEM and loop over triangles with *scalar*
parameters read from SMEM (scalar-prefetch), so the whole Möller–Trumbore
chain stays on-chip — the only HBM traffic is rays in, hit records out.

Semantics identical to ops.soa.brute_closest / brute_any (strict-< closest
update = argmin-first-on-ties; reference epsilon and comparison order,
src/objects/primatives/triangle.h:41-74).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.intersect import MT_EPSILON

LANES = 128
SUBLANES = 8
DEF_TILE_ROWS = 16  # 16 x 128 = 2048 rays per grid step


def _closest_kernel(nt_ref, tri_ref, ox, oy, oz, dx, dy, dz, tmin_r, tmax_r,
                    t_out, tri_out, u_out, v_out):
    shape = ox.shape  # [R, L]
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmin_r[:]
    tmax = tmax_r[:]

    t_best0 = jnp.full(shape, jnp.inf, jnp.float32)
    tri0 = jnp.full(shape, -1, jnp.int32)
    z = jnp.zeros(shape, jnp.float32)

    def body(ti, carry):
        t_best, tri_b, u_b, v_b = carry
        base = ti * 9
        v0x = tri_ref[base + 0]
        v0y = tri_ref[base + 1]
        v0z = tri_ref[base + 2]
        e1x = tri_ref[base + 3]
        e1y = tri_ref[base + 4]
        e1z = tri_ref[base + 5]
        e2x = tri_ref[base + 6]
        e2y = tri_ref[base + 7]
        e2z = tri_ref[base + 8]

        px = dyv * e2z - dzv * e2y
        py = dzv * e2x - dxv * e2z
        pz = dxv * e2y - dyv * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / det
        tx = oxv - v0x
        ty = oyv - v0y
        tz = ozv - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dxv * qx + dyv * qy + dzv * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv

        ok = (
            (jnp.abs(det) >= MT_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= tmax)
            & (t < t_best)
        )
        t_best = jnp.where(ok, t, t_best)
        tri_b = jnp.where(ok, ti, tri_b)
        u_b = jnp.where(ok, u, u_b)
        v_b = jnp.where(ok, v, v_b)
        return (t_best, tri_b, u_b, v_b)

    t_best, tri_b, u_b, v_b = jax.lax.fori_loop(
        0, nt_ref[0], body, (t_best0, tri0, z, z)
    )
    t_out[:] = t_best
    tri_out[:] = tri_b
    u_out[:] = u_b
    v_out[:] = v_b


def _any_kernel(nt_ref, tri_ref, ox, oy, oz, dx, dy, dz, tmin_r, tmax_r, hit_out):
    shape = ox.shape
    oxv, oyv, ozv = ox[:], oy[:], oz[:]
    dxv, dyv, dzv = dx[:], dy[:], dz[:]
    tmin = tmin_r[:]
    tmax = tmax_r[:]

    def body(ti, found):
        base = ti * 9
        v0x = tri_ref[base + 0]
        v0y = tri_ref[base + 1]
        v0z = tri_ref[base + 2]
        e1x = tri_ref[base + 3]
        e1y = tri_ref[base + 4]
        e1z = tri_ref[base + 5]
        e2x = tri_ref[base + 6]
        e2y = tri_ref[base + 7]
        e2z = tri_ref[base + 8]

        px = dyv * e2z - dzv * e2y
        py = dzv * e2x - dxv * e2z
        pz = dxv * e2y - dyv * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / det
        tx = oxv - v0x
        ty = oyv - v0y
        tz = ozv - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dxv * qx + dyv * qy + dzv * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv

        ok = (
            (jnp.abs(det) >= MT_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin) & (t <= tmax)
        )
        # f32 carry: Mosaic rejects i1 vector loop carries at some
        # tile/layout configs ("vpad 32" i1 scf.yield compile error)
        return jnp.where(ok, 1.0, found)

    found = jax.lax.fori_loop(
        0, nt_ref[0], body, jnp.zeros(shape, jnp.float32)
    )
    hit_out[:] = (found > 0.5).astype(jnp.int32)


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def closest_pallas(tri_flat, ox, oy, oz, dx, dy, dz, tmin, tmax,
                   tile_rows: int = DEF_TILE_ROWS, interpret: bool = False):
    """tri_flat: [T*9] f32 (v0,e1,e2 interleaved per triangle).
    Rays: [B] f32 components; tmin/tmax: [B].
    Returns (t [B] — inf on miss, tri [B] int32, u [B], v [B])."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]  # pad lanes: tmax<tmin -> miss

    nt = jnp.array([tri_flat.shape[0] // 9], jnp.int32)

    grid = (Bp // tile,)
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    t, tri, u, v = pl.pallas_call(
        _closest_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # nt, tri_flat
            grid=grid,
            in_specs=[block] * 8,
            out_specs=[block] * 4,
        ),
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
            out_shape,
            out_shape,
        ],
        interpret=interpret,
    )(nt, tri_flat, *args)
    return (
        t.reshape(Bp)[:B],
        tri.reshape(Bp)[:B],
        u.reshape(Bp)[:B],
        v.reshape(Bp)[:B],
    )


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def any_pallas(tri_flat, ox, oy, oz, dx, dy, dz, tmin, tmax,
               tile_rows: int = DEF_TILE_ROWS, interpret: bool = False):
    """Any-hit variant. Returns bool [B]."""
    B = ox.shape[0]
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)

    def prep(x, fill=0.0):
        return _pad_to(x, Bp, fill).reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tmin), prep(tmax, fill=-1.0)]
    nt = jnp.array([tri_flat.shape[0] // 9], jnp.int32)

    grid = (Bp // tile,)
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    hit = pl.pallas_call(
        _any_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[block] * 8,
            out_specs=block,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.int32),
        interpret=interpret,
    )(nt, tri_flat, *args)
    return hit.reshape(Bp)[:B] > 0
