"""Textured large-scene throughput (VERDICT r2 item 7).

Round 2's textured coffee variant ran at 0.36 Mrays/s on the full jnp
wavefront (XLA shade + per-wave sorts).  Round 3 routes textured PT
scenes onto pt_wave (hit u/v/tri from the kernel, texel gather in XLA
between bounces); this measures the textured pt_wave against that
number on a checker-textured 91k-tri coffee-class scene, and breaks out
the texel stage's share of a bounce.

Usage: python tools/probe_tex_wave.py [size [spp [depth]]]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def textured_coffee():
    """The coffee stand-in mesh re-built with a checker texture on the
    orange plastic (same geometry class as ROADMAP's textured probe)."""
    from bpt_tpu.scene.loader import load_scene_from_yaml

    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    # retexture: wrap the first lambertian material in a checker
    from bpt_tpu.scene.textures import TextureSpec, build_texture_table

    tt = build_texture_table(
        [TextureSpec.checker(0.02, (0.9, 0.4, 0.05), (0.1, 0.1, 0.1))],
        dtype=np.float32)
    mats = scene.materials
    tex_id = np.asarray(mats.tex_id).copy()
    lam = np.asarray(mats.mtype) == 0  # MAT_LAMBERTIAN
    first = int(np.argmax(lam))
    tex_id[first] = 0
    import dataclasses as dc

    mats2 = mats._replace(tex_id=jnp.asarray(tex_id)) \
        if hasattr(mats, "_replace") else dc.replace(mats, tex_id=jnp.asarray(tex_id))
    scene = dc.replace(scene, materials=mats2, textures=tt,
                       has_textures=True)
    return scene, cfg


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scene, cfg = textured_coffee()
    import dataclasses as dc

    from bpt_tpu.models.render import _can_use_pt_wave, render
    from bpt_tpu.models.camera import camera_constants

    cfg = dc.replace(cfg, image_width=size, aspect_ratio=1.0,
                     samples_per_pixel=spp, max_depth=depth)
    cc = camera_constants(cfg, jnp.float32)
    print("routes to pt_wave:",
          _can_use_pt_wave(scene, cc, "pt", None, None), flush=True)

    r = render(scene, cfg, seed=0, integrator="pt")
    print(f"warmup wall={r.stats.wall_seconds:.2f}s "
          f"rays={r.stats.rays_traced}", flush=True)
    walls = []
    for k in range(3):
        r = render(scene, cfg, seed=0, integrator="pt")
        walls.append(r.stats.wall_seconds)
        print(f"run{k}: {r.stats.rays_traced / r.stats.wall_seconds / 1e6:.2f}"
              f" Mrays/s (wall {r.stats.wall_seconds:.2f}s)", flush=True)
    w = float(np.median(walls))
    print(f"median: {r.stats.rays_traced / w / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
