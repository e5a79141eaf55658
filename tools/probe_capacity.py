"""Probe the real clustered-scene capacity on the TPU (VERDICT r2 item 8).

MAX_CLUSTERS is a dispatch gate, not a table size: the combined SMEM
table is [S*8 + C*7] f32 for the scene's ACTUAL cluster count, so the
true capacity is whatever SMEM the hardware accepts.  This builds dense
UV-sphere scenes at growing triangle counts, lifts the gate, and runs
one small megakernel launch per scene on the real chip.

Usage: python tools/probe_capacity.py [n_lat ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bpt_tpu.core import vec3 as v3
from bpt_tpu.ops.pallas import clusters as cl
from bpt_tpu.scene.builder import MaterialSpec as M
from bpt_tpu.scene.builder import SceneBuilder


def dense_scene(n_lat: int):
    b = SceneBuilder()
    b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((0.7, 0.3, 0.2)),
                    lat_steps=n_lat, lon_steps=2 * n_lat)
    b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20),
               M.lambertian((0.6, 0.6, 0.6)))
    b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4),
               M.diffuse_light((10, 10, 10)))
    return b.build(dtype=jnp.float32)


def run(n_lat: int):
    from bpt_tpu.ops.pallas.pt_kernel import pt_megakernel

    scene = dense_scene(n_lat)
    T = scene.num_tris
    cs = tuple(scene.cluster_splits)
    ss = tuple(scene.super_splits)
    C = len(cs) - 1 if len(cs) >= 2 else -1
    S = len(ss) - 1 if len(ss) >= 2 else -1
    smem_kb = (S * 8 + C * 7) * 4 / 1024 if C > 0 else -1
    print(f"lat={n_lat}: T={T} C={C} S={S} combined-table={smem_kb:.0f} KB",
          flush=True)

    B = 256
    rng = np.random.default_rng(1)
    o = v3.from_array(jnp.asarray(
        np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate([rng.uniform(-1, 1, (B, 2)), np.zeros((B, 1))], 1)
    d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]),
                                  jnp.float32))
    t0 = time.monotonic()
    try:
        r = pt_megakernel(scene, o, d, jnp.arange(B, dtype=jnp.int32),
                          jax.random.PRNGKey(0), 2)
        rays = float(r[3])
        print(f"  OK rays={rays:.0f} wall={time.monotonic() - t0:.1f}s",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — probing the failure boundary
        print(f"  FAIL after {time.monotonic() - t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


if __name__ == "__main__":
    # lift the dispatch gates for the probe (both the cluster-count cap
    # and the measured SMEM-table budget)
    cl.MAX_CLUSTERS = 10 ** 9
    cl.MAX_TABLE_F32 = 10 ** 9
    lats = [int(x) for x in sys.argv[1:]] or [330, 500, 700]
    for n in lats:
        run(n)
