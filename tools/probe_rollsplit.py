"""ROLL_SPLIT sweep: coffee-91k PT 512^2/16spp/d10 e2e (pt_wave path),
interleaved A/B/C medians.

Usage: python tools/probe_rollsplit.py [runs]
"""
from __future__ import annotations

import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses

from bpt_tpu.models.render import render
from bpt_tpu.scene.loader import load_scene_from_yaml


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    cfg = dataclasses.replace(
        ls.camera, image_width=512, aspect_ratio=1.0,
        samples_per_pixel=16, max_depth=10, integrator="pt")
    splits = [1, 2, 4]

    def run(s, tag):
        os.environ["BPT_TPU_ROLL_SPLIT"] = str(s)
        r = render(ls.scene, cfg, seed=0)
        mr = r.stats.rays_traced / max(r.stats.wall_seconds, 1e-9) / 1e6
        print(f"split={s} [{tag}]: {mr:.3f} Mrays/s "
              f"wall={r.stats.wall_seconds:.2f}s", flush=True)
        return mr

    for s in splits:
        run(s, "warm")
    res = {s: [] for s in splits}
    for i in range(runs):
        for s in splits:
            res[s].append(run(s, i))
    for s in splits:
        print(f"median split={s}: {statistics.median(res[s]):.3f}")


if __name__ == "__main__":
    main()
