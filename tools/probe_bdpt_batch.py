"""bdpt_wave batch-size sweep on coffee-91k bdpt-mis (and bdpt).

Usage: python tools/probe_bdpt_batch.py [spp [integrator]]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses

from bpt_tpu.models.render import render
from bpt_tpu.scene.loader import load_scene_from_yaml


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    integ = sys.argv[2] if len(sys.argv) > 2 else "bdpt-mis"
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    cfg = dataclasses.replace(
        ls.camera, image_width=512, aspect_ratio=1.0,
        samples_per_pixel=spp, max_depth=10, integrator=integ)

    results = {}
    for b in (1, 2, 4):
        if b > cfg.effective_spp:
            continue
        os.environ["BPT_TPU_BDPT_BATCH"] = str(b)
        render(ls.scene, cfg, seed=7)  # warm
        walls = []
        for _ in range(3):
            r = render(ls.scene, cfg, seed=0)
            walls.append(r.stats.wall_seconds)
        walls.sort()
        mr = r.stats.rays_traced / walls[1] / 1e6
        results[b] = mr
        print(f"batch={b}: {mr:.3f} Mrays/s (median wall {walls[1]:.2f}s, "
              f"rays {r.stats.rays_traced})", flush=True)
    os.environ.pop("BPT_TPU_BDPT_BATCH", None)
    print(results)


if __name__ == "__main__":
    main()
