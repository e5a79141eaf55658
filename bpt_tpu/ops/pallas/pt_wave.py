"""Per-bounce PT megakernel with host-side ray sorting (large scenes).

The fused megakernel (pt_kernel.py) runs the whole bounce loop in one
launch, so its ray tiles decohere after the first diffuse bounce and —
on >512-tri scenes — every tile streams most clusters per bounce.  The
jnp wavefront can re-sort between bounces but pays ~100+ ms of XLA
gather/launch overhead per wave on this platform.

This module is the middle path: ONE Pallas launch per bounce that does
clustered intersect + the full branchless shade (shared `make_bounce`
from pt_kernel.py — estimator semantics identical to the fused kernel,
camera.h:255-292), with a Morton re-sort of the live rays between
launches so every [R,128] tile stays spatially coherent.  depth
launches + depth argsorts compile into a single XLA executable.

RNG parity: draws key off the same `_subkeys(key, depth)` streams and
the per-sample ray id, so results are bit-identical to the fused
megakernel for the same inputs (the sort permutation is undone
exactly; per-ray computation is order-invariant)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpt_tpu.ops.pallas.clusters import (
    BLOCK_ROWS,
    _pair_interleave,
    cluster_orders,
    pack_clusters_rolled,
)
from bpt_tpu.ops.pallas.pt_kernel import (
    LANES,
    NU,
    _bits_to_unit_float,
    _pack_tables,
    _subkeys,
    _threefry2x32,
    make_bounce,
    use_clusters,
)

DEF_TILE_ROWS = 32  # 4096-ray tiles: with fine sorting the tile's cluster
# union grows SUBlinearly in tile size, so bigger tiles amortize each
# cluster DMA+roll over more rays (measured 8:0.48 / 16:0.60 / 32:0.77 /
# 64:0.67 Mrays/s on the 91k-tri stand-in, depth 10)


def _coherence_key(lo, hi, ox, oy, oz, dx, dy, dz, alive_f):
    """FINE coherence sort key:
    direction octant (major), 24-bit origin Morton cell, then the low
    direction-octant bits again as a tie-break; dead rays sort last.

    The key structure is the probe's measured winner (tools/
    probe_traversal.py 'OCT-major ideal', 2x over Morton-minor at the
    intersect level): a COARSE position cell with direction-fine minor
    bits beats a fine Morton cell — ultra-fine position cells make the
    direction the effective tie-break noise, so a tile holds same-origin
    arbitrary-direction rays whose cluster union is everything that
    point can see; coarse-cell + direction bits yields cone-coherent
    tiles with small unions.  jnp.argsort costs ~1 ms at 262k keys on
    this platform (the round-1 note claiming 7 s no longer reproduces),
    so the full-precision sort replaced the 128-bucket counting sort."""
    octant = ((dx > 0).astype(jnp.int32)
              | ((dy > 0).astype(jnp.int32) << 1)
              | ((dz > 0).astype(jnp.int32) << 2))
    ext = jnp.maximum(hi - lo, 1e-12)

    def q4(p, a):
        f = jnp.clip((p - lo[a]) / ext[a], 0.0, 1.0)
        return (f * 15.0).astype(jnp.int32)

    cell = (q4(ox, 0) << 8) | (q4(oy, 1) << 4) | q4(oz, 2)  # 12 bits
    ax = jnp.abs(dx)
    ay = jnp.abs(dy)
    az = jnp.abs(dz)
    dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                    jnp.where(ay >= az, 1, 2))
    strong = (jnp.maximum(ax, jnp.maximum(ay, az))
              > 0.7 * jnp.sqrt(ax * ax + ay * ay + az * az))
    dfine = (dom << 1) | strong.astype(jnp.int32)  # 3 bits
    fine = (octant << 15) | (cell << 3) | dfine
    # dead rays: force the maximum key so they form a contiguous tail
    return jnp.where(alive_f > 0.5, fine, jnp.int32(1 << 29))


def _coherence_perm(lo, hi, ox, oy, oz, dx, dy, dz, alive_f):
    """Gather-permutation form of _coherence_key (probes/tests; the
    wave loop itself moves state with a payload lax.sort instead)."""
    return jnp.argsort(
        _coherence_key(lo, hi, ox, oy, oz, dx, dy, dz, alive_f)
    ).astype(jnp.int32)


def _entry_key(fs, dx, dy, dz, alive_f):
    """Round-3 entry-pattern sort key: the super the ray will START
    traversal in (major; from the previous bounce's first_super_id
    output), then direction octant + dominant-axis bits (minor) so a
    tile's rays fan out of the same region in similar cones; dead rays
    sort last."""
    octant = ((dx > 0).astype(jnp.int32)
              | ((dy > 0).astype(jnp.int32) << 1)
              | ((dz > 0).astype(jnp.int32) << 2))
    ax = jnp.abs(dx)
    ay = jnp.abs(dy)
    az = jnp.abs(dz)
    dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                    jnp.where(ay >= az, 1, 2))
    strong = (jnp.maximum(ax, jnp.maximum(ay, az))
              > 0.7 * jnp.sqrt(ax * ax + ay * ay + az * az))
    dfine = (dom << 1) | strong.astype(jnp.int32)  # 3 bits
    key = (fs.astype(jnp.int32) << 6) | (octant << 3) | dfine
    return jnp.where(alive_f > 0.5, key, jnp.int32(1 << 29))


def _entry_perm(fs, dx, dy, dz, alive_f):
    """Gather-permutation form of _entry_key (probes/tests)."""
    return jnp.argsort(_entry_key(fs, dx, dy, dz, alive_f)).astype(jnp.int32)


def _bounce_kernel(clustered, precomp, n_vols, mat_classes, emit_fs,
                   textured, pair_il, *refs):
    (meta, tri_f, mat_f, lgt_f, keys_u, cl_aabb, order_t) = refs[:7]
    nsc = 7
    if n_vols:
        vol_f, volm_f = refs[7:9]
        nsc = 9
    ins = refs[nsc:]
    (cox, coy, coz, cdx, cdy, cdz, tr, tg, tb, alive_in, rid) = ins[:11]
    ins = ins[11:]
    if clustered:
        tri_hbm = ins[0]
        ins = ins[1:]
    ph = phuv = None
    if precomp:
        # paged mode (round 5, VERDICT r4 item 4): the closest hit was
        # computed OUTSIDE by the paged standalone FTB kernels; this
        # launch only shades.  Inputs: (t inf-on-miss, mat -1-on-miss,
        # geometric normal xyz) [+ (u, v, global tri id) when textured].
        ph = ins[:5]
        ins = ins[5:]
        if textured:
            phuv = ins[:3]
            ins = ins[3:]
    outs = ins
    fs_out = None
    uv_refs = None
    if clustered:
        (nox, noy, noz, ndx, ndy, ndz, ntr, ntg, ntb,
         ir, ig, ib, alive_out) = outs[:13]
        rest = outs[13:]
        if emit_fs:
            fs_out = rest[0]
            rest = rest[1:]
        if textured:
            # hit payload outputs for the XLA texel stage: written
            # in-place by the traversal provider (clusters.uv_refs)
            uv_refs = tuple(rest[:3])
            rest = rest[3:]
        st_out = rest[0]
        (cl_vmem, cl_vmem2, cl_sem, cl_sem2,
         t_s, m_s, nx_s, ny_s, nz_s, nv_s, ah_s, tt_s, th_s) = rest[1:]
    else:
        (nox, noy, noz, ndx, ndy, ndz, ntr, ntg, ntb,
         ir, ig, ib, alive_out) = outs[:13]
        rest = outs[13:]
        if textured:
            uv_refs = tuple(rest[:3])
            rest = rest[3:]
        (st_out, tt_s, th_s) = rest
        nv_s = ah_s = None

    shape = rid.shape
    zst = jnp.zeros(shape, jnp.float32)
    tt_s[:] = zst
    th_s[:] = zst
    closest_fn = None
    if precomp:
        def closest_fn(cox_, coy_, coz_, cdx_, cdy_, cdz_, alive_):
            if uv_refs is not None:
                u_ref, v_ref, ti_ref = uv_refs
                u_ref[:] = phuv[0][:]
                v_ref[:] = phuv[1][:]
                ti_ref[:] = phuv[2][:]
            return ph[0][:], ph[1][:], ph[2][:], ph[3][:], ph[4][:]
    elif clustered:
        from bpt_tpu.ops.pallas.clusters import make_clustered_closest

        nv_s[:] = zst
        ah_s[:] = zst
        closest_fn = make_clustered_closest(
            meta, cl_aabb, tri_hbm, (cl_vmem, cl_vmem2),
            (cl_sem, cl_sem2),
            (t_s, m_s, nx_s, ny_s, nz_s), shape,
            order_tab=order_t if clustered else None,
            stat_refs=(nv_s, ah_s, tt_s),
            uv_refs=uv_refs, pair_il=pair_il,
        )

    b = meta[4]
    ridu = rid[:].astype(jnp.uint32)
    nu_eff = NU + n_vols

    def draw(b_, slot):
        k1 = keys_u[slot * 2]
        k2 = keys_u[slot * 2 + 1]
        ctr = (jnp.zeros_like(ridu) + b_).astype(jnp.uint32)
        bits, _ = _threefry2x32(k1, k2, ridu, ctr)
        return _bits_to_unit_float(bits)

    def draw2(b_, slot):
        k1 = keys_u[slot * 2]
        k2 = keys_u[slot * 2 + 1]
        ctr = (jnp.zeros_like(ridu) + b_).astype(jnp.uint32)
        x0, x1 = _threefry2x32(k1, k2, ridu, ctr)
        return _bits_to_unit_float(x0), _bits_to_unit_float(x1)

    vol_refs = (vol_f, volm_f, n_vols, meta[7]) if n_vols else None
    bounce = make_bounce(meta, tri_f, mat_f, lgt_f, (draw, draw2),
                         clustered or precomp, closest_fn, shape,
                         vol_refs=vol_refs,
                         mat_classes=mat_classes,
                         stat_refs=(None if (clustered or precomp)
                                    else tt_s, th_s),
                         # clustered: the traversal provider writes the
                         # payload; make_bounce still needs the refs for
                         # the volume-override uv fixup (round 4)
                         uv_refs=uv_refs)

    zf = jnp.zeros(shape, jnp.float32)
    state = (cox[:], coy[:], coz[:], cdx[:], cdy[:], cdz[:],
             tr[:], tg[:], tb[:], zf, zf, zf, alive_in[:], zf)
    (pox, poy, poz, pdx, pdy, pdz,
     ptr, ptg, ptb, ar, ag, ab, alive_f, _rays) = bounce(b, state)

    nox[:] = pox
    noy[:] = poy
    noz[:] = poz
    ndx[:] = pdx
    ndy[:] = pdy
    ndz[:] = pdz
    ntr[:] = ptr
    ntg[:] = ptg
    ntb[:] = ptb
    ir[:] = ar
    ig[:] = ag
    ib[:] = ab
    alive_out[:] = alive_f
    zrow = jnp.zeros((1, LANES), jnp.float32)
    st_out[0:1] = (jnp.sum(nv_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[1:2] = (jnp.sum(ah_s[:], axis=0, keepdims=True)
                   if clustered else zrow)
    st_out[2:3] = jnp.sum(tt_s[:], axis=0, keepdims=True)
    st_out[3:4] = jnp.sum(th_s[:], axis=0, keepdims=True)
    st_out[4:8] = jnp.zeros((4, LANES), jnp.float32)
    if fs_out is not None:
        # next-bounce coherence key: the super this ray will START
        # traversal in (clusters.first_super_id) — the inter-bounce sort
        # groups rays by actual entry pattern, not origin/dir proxies
        from bpt_tpu.ops.pallas.clusters import first_super_id

        C_st = tri_hbm.shape[0]
        n_sup = (cl_aabb.shape[0] - C_st * 7) // 8
        fs_out[:] = first_super_id(cl_aabb, n_sup, pox, poy, poz,
                                   pdx, pdy, pdz)


def _launch_bounce(meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb,
                   order_t, tri_hbm, state, tile_rows, interpret, clustered,
                   vol_tabs=None, n_vols=0, mat_classes=(True, True),
                   emit_fs=False, textured=False, pair_il=None,
                   precomp_hits=None):
    """``precomp_hits``: paged mode — (t, mat_fl, nx, ny, nz[, u, v,
    ti]) [B] f32 arrays from the paged standalone FTB closest; the
    kernel shades only (pass clustered=False — no tri_hbm/DMA)."""
    precomp = precomp_hits is not None
    ox, oy, oz, dx, dy, dz, tr, tg, tb, alive_f, rid = state
    B = ox.shape[0]
    tile_rows = max(1, min(tile_rows, -(-B // LANES)))
    tile = tile_rows * LANES
    Bp = int(np.ceil(B / tile) * tile)

    def prep(x, fill=0.0):
        pad = Bp - B
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(Bp // LANES, LANES)

    args = [prep(ox), prep(oy), prep(oz), prep(dx), prep(dy), prep(dz),
            prep(tr), prep(tg), prep(tb), prep(alive_f), prep(rid, fill=-1)]
    block = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [block] * 11
    scalars = [meta, tri_tab, mat_tab, lgt_tab, keys_flat, cl_aabb, order_t]
    if vol_tabs is not None:
        scalars += list(vol_tabs)
    if clustered:
        args.append(tri_hbm)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = [
            pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
            pltpu.VMEM((BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 9
    else:
        if precomp:
            args += [prep(h) for h in precomp_hits]
            in_specs += [block] * len(precomp_hits)
        scratch = [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2

    n_out = 14 if (clustered and emit_fs) else 13
    if textured:
        n_out += 3  # u, v, tri-id hit payload for the XLA texel stage
    G = Bp // tile
    fshape = jax.ShapeDtypeStruct((Bp // LANES, LANES), jnp.float32)
    st_block = pl.BlockSpec((8, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    st_shape = jax.ShapeDtypeStruct((G * 8, LANES), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_bounce_kernel, clustered, precomp, n_vols,
                          mat_classes, clustered and emit_fs, textured,
                          _pair_interleave() if pair_il is None
                          else bool(pair_il)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(G,),
            in_specs=in_specs,
            out_specs=[block] * n_out + [st_block],
            scratch_shapes=scratch,
        ),
        out_shape=[fshape] * n_out + [st_shape],
        interpret=interpret,
    )(*scalars, *args)
    st4 = jnp.sum(outs[-1].reshape(G, 8, LANES)[:, :4, :], axis=(0, 2))
    return [o.reshape(Bp)[:B] for o in outs[:-1]] + [st4]


def pt_wave(scene, o, d, ray_ids, key, depth: int,
            tile_rows: int = DEF_TILE_ROWS, interpret: bool = False,
            sort: bool = True, entry_sort: bool = False, pair_il=None,
            paged=None):
    """Sorted per-bounce wavefront PT (thin wrapper; see _pt_wave_jit).
    Resolves ``paged=None`` HERE, outside the jit: paged mode (round 5,
    VERDICT r4 item 4) engages past the single-table SMEM budget — each
    bounce runs the PAGED standalone FTB closest kernels (min-t merge
    across pages) and a shade-only launch, so past-budget scenes get
    wave-rate traversal instead of the minutes-to-compile jnp wavefront.
    The reference has no size cliff at any RAM-fitting count
    (bvh.h:20-48); this is its TPU analog at full wave rate.

    The resolution must live outside ``_pt_wave_jit``: with ``paged`` a
    static argname, a second call with paged=None would HIT the jit
    cache and silently reuse the executable traced under the OLD env
    (the round-4 advisor's staleness class, measured to reproduce here);
    as a plain-Python wrapper the env/cluster_ok decision re-runs on
    every call — and at every (env-sig-keyed) outer step trace."""
    if paged is None:
        import os

        from bpt_tpu.ops.pallas.clusters import cluster_ok

        paged = use_clusters(scene) and (
            not cluster_ok(scene)
            or os.environ.get("BPT_TPU_FORCE_PAGED_WAVE", "") != "")
    return _pt_wave_jit(scene, o, d, ray_ids, key, depth=depth,
                        tile_rows=tile_rows, interpret=interpret,
                        sort=sort, entry_sort=entry_sort, pair_il=pair_il,
                        paged=bool(paged))


@functools.partial(jax.jit,
                   static_argnames=("depth", "tile_rows", "interpret",
                                    "sort", "entry_sort", "pair_il",
                                    "paged"))
def _pt_wave_jit(scene, o, d, ray_ids, key, depth: int,
                 tile_rows: int = DEF_TILE_ROWS, interpret: bool = False,
                 sort: bool = True, entry_sort: bool = False, pair_il=None,
                 paged: bool = False):
    """Sorted per-bounce wavefront PT.  o/d: Vec3 SoA; ray_ids [B] int32
    (negative = inactive).  Returns (rad_x, rad_y, rad_z [B], rays,
    extra f32[4] = (node_visits, aabb_hits, tri_tests, tri_hits)
    counted in-kernel — the reference's BvhStats analogs).
    ``entry_sort``: sort bounces 2+ by first-entered-supercluster id
    (clusters.first_super_id) instead of the origin/direction proxy key
    — the sort permutation is undone exactly either way, so results are
    bit-identical across both settings.  MEASURED NEGATIVE and off by
    default: the entry super is dominated by the ray's origin (the slab
    enter-t ties at T_MIN inside the origin's super), so it degenerates
    to a coarse origin proxy — 128-ray row unions 213 vs the proxy
    key's 141 clusters, end-to-end 0.74 vs 0.79 Mrays/s on coffee-91k
    (tools/probe_rowunion.py); kept as a study option."""
    B = ray_ids.shape[0]
    n_vols = scene.num_volumes
    meta0, tri_tab, mat_tab, lgt_tab = _pack_tables(scene)
    keys_flat = _subkeys(key, NU + n_vols)
    clustered = use_clusters(scene)
    if paged:
        # per-bounce closest rides the standalone kernels; entry_sort's
        # first_super_id needs the single combined table — not here
        assert not entry_sort, "entry_sort unsupported in paged mode"
    # textured mode (round 3, VERDICT r2 item 7): the kernel reports the
    # hit's (u, v, tri); the texel is gathered in XLA BETWEEN bounces
    # and multiplied into the throughput there.  This is exact because
    # a bounce's albedo only ever affects LATER bounces (emission and
    # background both read the throughput before the scatter multiply),
    # and _pack_tables neutralizes textured-material table albedo to 1.
    # Texture eval per bounce is a handful of gathers (~ms) vs a
    # ~100 ms bounce — the 0.36 Mrays/s jnp wavefront detour is gone.
    textured = bool(scene.has_textures)
    vol_tabs = None
    if n_vols:
        from bpt_tpu.ops.pallas.pt_kernel import _pack_vol_tables

        vol_tabs = _pack_vol_tables(scene)
    pages = None
    if paged:
        from bpt_tpu.ops.pallas.clusters import pack_clusters_pages

        pages = pack_clusters_pages(scene)
        cl_aabb = jnp.zeros((6,), jnp.float32)
        order_t = jnp.zeros((8,), jnp.int32)
        tri_hbm = None
    elif clustered:
        C, cl_aabb, tri_hbm = pack_clusters_rolled(scene)
        order_t = cluster_orders(scene, C)
        meta0 = meta0.at[5].set(C)
    else:
        cl_aabb = jnp.zeros((6,), jnp.float32)
        order_t = jnp.zeros((8,), jnp.int32)
        tri_hbm = None
    lo = (scene.bvh_min[0].astype(jnp.float32) if scene.use_bvh
          else jnp.zeros((3,), jnp.float32))
    hi = (scene.bvh_max[0].astype(jnp.float32) if scene.use_bvh
          else jnp.ones((3,), jnp.float32))

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    ox, oy, oz = f32(o.x), f32(o.y), f32(o.z)
    dx, dy, dz = f32(d.x), f32(d.y), f32(d.z)
    one = jnp.ones((B,), jnp.float32)
    tr = tg = tb = one
    rr = rg = rb = jnp.zeros((B,), jnp.float32)
    alive_f = (ray_ids >= 0).astype(jnp.float32)
    rid = jnp.asarray(ray_ids, jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)
    rays = jnp.float32(0.0)

    st4 = jnp.zeros((4,), jnp.float32)
    fs = None
    for b in range(depth):
        if sort and b > 0:  # primaries arrive raster-coherent
            if fs is not None and entry_sort:
                # round 3: group by the super each ray will actually
                # START traversal in (emitted by the previous bounce),
                # direction-fine minor bits
                keyv = _entry_key(fs, dx, dy, dz, alive_f)
            else:
                # adaptive bounds: live origins cluster on the geometry,
                # which may be tiny inside the root AABB (floor/light
                # dominate it) — quantizing to the live cloud keeps the
                # morton bits useful
                live = alive_f > 0.5
                big = jnp.float32(3.4e38)
                lo_b = jnp.stack([
                    jnp.min(jnp.where(live, v, big)) for v in (ox, oy, oz)])
                hi_b = jnp.stack([
                    jnp.max(jnp.where(live, v, -big)) for v in (ox, oy, oz)])
                keyv = _coherence_key(lo_b, hi_b, ox, oy, oz, dx, dy, dz,
                                      alive_f)
            # ONE multi-payload lax.sort instead of argsort + gather:
            # XLA's TPU sort moves payload operands nearly for free
            # (measured at 4.2M rows: key+15 payloads 16 ms vs 110 ms
            # for argsort + one [B,15] row gather and ~35 ms PER column
            # as separate gathers — tools/probe_gather.py).  Stable, so
            # the ray order (and thus every result bit) matches the old
            # argsort path exactly.  int32 rows ride as operands.
            (_, ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb,
             alive_f, rid, idx) = jax.lax.sort(
                (keyv, ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb,
                 alive_f, rid, idx), num_keys=1)
        rays = rays + jnp.sum(alive_f)
        precomp_hits = None
        if paged:
            # paged closest: one standalone FTB launch per page on the
            # ALREADY-SORTED wave (the sort above is the same
            # _coherence_key the soa FTB dispatch uses), min-t merged
            # XLA-side.  Stat conventions match the jnp wavefront's
            # clustered dispatch: nv = ah = 0, tt = alive * T, th = hits.
            from bpt_tpu.ops.pallas.cluster_wave import (
                clustered_closest_ftb_pallas)

            t = tri = u = v = None
            for (_Cp, aabb_p, blocks_p, order_p) in pages:
                t_p, tri_p, u_p, v_p = clustered_closest_ftb_pallas(
                    aabb_p, order_p, blocks_p, ox, oy, oz, dx, dy, dz,
                    alive_f, interpret=interpret)
                if t is None:
                    t, tri, u, v = t_p, tri_p, u_p, v_p
                else:
                    take = t_p < t
                    t = jnp.where(take, t_p, t)
                    tri = jnp.where(take, tri_p, tri)
                    u = jnp.where(take, u_p, u)
                    v = jnp.where(take, v_p, v)
            # dead lanes in live FTB tiles may record junk (the roll is
            # not lane-masked); contract: dead = miss
            live = alive_f > 0.5
            t = jnp.where(live, t, jnp.inf)
            hit = jnp.isfinite(t)
            tri = jnp.where(hit, tri, -1)
            trc = jnp.clip(tri, 0, scene.num_tris - 1)
            mat_fl = jnp.where(
                hit, scene.mat_id[trc].astype(jnp.float32), -1.0)
            nrm = scene.normal[trc].astype(jnp.float32)
            z = jnp.zeros_like(t)
            precomp_hits = [t, mat_fl,
                            jnp.where(hit, nrm[:, 0], z),
                            jnp.where(hit, nrm[:, 1], z),
                            jnp.where(hit, nrm[:, 2], z)]
            if textured:
                precomp_hits += [jnp.where(hit, u, z), jnp.where(hit, v, z),
                                 jnp.where(hit, tri.astype(jnp.float32),
                                           -1.0)]
            st4 = st4 + jnp.stack([
                jnp.float32(0.0), jnp.float32(0.0),
                jnp.sum(alive_f) * jnp.float32(scene.num_tris),
                jnp.float32(0.0)])
        outs = _launch_bounce(
            meta0.at[4].set(b), tri_tab, mat_tab, lgt_tab, keys_flat,
            cl_aabb, order_t, tri_hbm,
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, alive_f, rid),
            tile_rows, interpret, clustered and not paged,
            vol_tabs=vol_tabs, n_vols=n_vols,
            mat_classes=(scene.has_delta_mats, scene.has_iso_mats),
            emit_fs=entry_sort, textured=textured, pair_il=pair_il,
            precomp_hits=precomp_hits,
        )
        st4 = st4 + outs[-1]
        outs = outs[:-1]
        if textured:
            hit_u, hit_v, hit_ti = outs[-3:]
            outs = outs[:-3]
        if clustered and entry_sort:
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib, alive_f,
             fs) = outs
        else:
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, ir, ig, ib,
             alive_f) = outs
        if textured:
            # XLA texel stage (rounds 3-4): complete_hit's per-vertex UV
            # interpolation + texture_value (ops/soa.py complete_hit,
            # scene/textures.texture_value — same math, same tables).
            # The kernel neutralizes every textured material's table
            # albedo to 1.0; this stage restores the texel.  Three cases
            # by the (u, v, ti) hit payload:
            #   ti >= 0   surface hit at (ui, vi): scatter-albedo
            #             multiply into the throughput of lanes that
            #             scattered (lambertian/metal/iso; dielectric
            #             attenuates white, material.h:96-116), and
            #             EMISSION scale for diffuse_light lanes — they
            #             die in-kernel having emitted throughput * 1.0,
            #             so this bounce's radiance scales by the
            #             emission texel (material.h:138-143)
            #   ti <= -2  constant_medium free-flight scatter: phase
            #             material is -2 - ti, texel at (0, 0, p)
            #             (soa.apply_volumes uv zeroing)
            #   ti == -1  miss: nothing
            from bpt_tpu.ops.pallas.pt_kernel import M_DIEL, M_LIGHT
            from bpt_tpu.scene.textures import texture_value

            surf = hit_ti >= -0.5
            vol = hit_ti < -1.5
            n_mats = int(scene.materials.mtype.shape[0])
            tri = jnp.clip(hit_ti.astype(jnp.int32), 0, scene.num_tris - 1)
            vmat = jnp.clip(jnp.round(-2.0 - hit_ti).astype(jnp.int32),
                            0, n_mats - 1)
            mat = jnp.where(vol, vmat, scene.mat_id[tri])
            mtype = scene.materials.mtype[mat]
            tid = scene.materials.tex_id[mat]
            uvt = scene.tri_uv[tri].astype(jnp.float32)
            ui = (uvt[:, 0] + hit_u * (uvt[:, 2] - uvt[:, 0])
                  + hit_v * (uvt[:, 4] - uvt[:, 0]))
            vi = (uvt[:, 1] + hit_u * (uvt[:, 3] - uvt[:, 1])
                  + hit_v * (uvt[:, 5] - uvt[:, 1]))
            ui = jnp.where(surf, ui, 0.0)
            vi = jnp.where(surf, vi, 0.0)
            # hit/scatter point == the outgoing ray's origin
            p = jnp.stack([ox, oy, oz], axis=-1)
            tex = texture_value(scene.textures, jnp.maximum(tid, 0),
                                ui, vi, p, with_noise=scene.has_noise)
            texd = (tid >= 0) & (surf | vol)
            take = (alive_f > 0.5) & texd & (mtype != M_DIEL)
            tr = jnp.where(take, tr * tex[:, 0], tr)
            tg = jnp.where(take, tg * tex[:, 1], tg)
            tb = jnp.where(take, tb * tex[:, 2], tb)
            # textured-light emission: lanes not in `take` (they died on
            # the emitter); ir is exactly throughput * 1.0 there (or 0
            # for back-face hits), so the scale is exact
            lt = texd & (mtype == M_LIGHT)
            ir = jnp.where(lt, ir * tex[:, 0], ir)
            ig = jnp.where(lt, ig * tex[:, 1], ig)
            ib = jnp.where(lt, ib * tex[:, 2], ib)
        rr = rr + ir
        rg = rg + ig
        rb = rb + ib
    rays = rays + jnp.sum(alive_f)  # depth-exhausted entries (camera.h:256)

    # sorting by idx (a permutation) restores original ray order, moving
    # the radiance as payload — the scatter form crashes XLA's TPU
    # scatter emitter, and argsort+gather costs ~7x (probe_gather)
    _, rr, rg, rb = jax.lax.sort((idx, rr, rg, rb), num_keys=1)
    return rr, rg, rb, rays, st4
