"""Round-5 A/B: coffee-91k bdpt-mis — live-prefix narrowed subpath
trace (BPT_TPU_SUBPATH_NARROW, bdpt._trace_subpath_narrow) vs the plain
full-width bdpt_wave.  Interleaved runs, medians (CLAUDE.md measurement
discipline); env toggles are honest here because every step maker keys
on _trace_env_sig() (round-4 advisor fix), so each variant compiles
exactly once during the two warm calls.

Usage: python tools/probe_narrow_e2e.py [runs [spp [integrator]]]
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
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    integ = sys.argv[3] if len(sys.argv) > 3 else "bdpt-mis"
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    cfg = dataclasses.replace(
        ls.camera, image_width=512, aspect_ratio=1.0,
        samples_per_pixel=spp, max_depth=10, integrator=integ)

    def run(tag, narrow):
        os.environ["BPT_TPU_SUBPATH_NARROW"] = "" if narrow else "0"
        r = render(ls.scene, cfg, seed=0)
        mr = r.stats.rays_traced / max(r.stats.wall_seconds, 1e-9) / 1e6
        print(f"{tag}: {mr:.3f} Mrays/s  wall={r.stats.wall_seconds:.2f}s "
              f"rays={r.stats.rays_traced} shadow={r.stats.shadow_rays}",
              flush=True)
        return mr

    run("warm plain ", False)
    run("warm narrow", True)
    a, b = [], []
    for i in range(runs):
        a.append(run(f"plain [{i}]", False))
        b.append(run(f"narrow[{i}]", True))
    os.environ.pop("BPT_TPU_SUBPATH_NARROW", None)
    print(f"median plain={statistics.median(a):.3f} "
          f"narrow={statistics.median(b):.3f} "
          f"ratio={statistics.median(b)/statistics.median(a):.2f}x")


if __name__ == "__main__":
    main()
