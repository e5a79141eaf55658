"""Round-4/5 A/B: coffee-91k bdpt-mis on the bdpt_wave path with the
connection-wave sparse any-hit compaction ON (BPT_TPU_CONNECT_SPARSE=1
— OPT-IN since round 5; e2e it LOSES to the full-wave any-hit) vs OFF
(the default).  The slot-wave microbench measured 242 ->
127 ms (tools/probe_connect_onejit.py); this measures the claim
END-TO-END.  Interleaved runs, medians (CLAUDE.md measurement
discipline).

Usage: python tools/probe_sparse_e2e.py [runs [spp]]
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
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    cfg = dataclasses.replace(
        ls.camera, image_width=512, aspect_ratio=1.0,
        samples_per_pixel=spp, max_depth=10, integrator="bdpt-mis")

    def run(tag, off):
        if off:
            os.environ.pop("BPT_TPU_CONNECT_SPARSE", None)
        else:
            os.environ["BPT_TPU_CONNECT_SPARSE"] = "1"
        r = render(ls.scene, cfg, seed=0)
        mr = r.stats.rays_traced / max(r.stats.wall_seconds, 1e-9) / 1e6
        print(f"{tag}: {mr:.3f} Mrays/s  wall={r.stats.wall_seconds:.2f}s "
              f"rays={r.stats.rays_traced} shadow={r.stats.shadow_rays}",
              flush=True)
        return mr

    run("warm sparse", False)
    run("warm full  ", True)
    a, b = [], []
    for i in range(runs):
        a.append(run(f"sparse[{i}]", False))
        b.append(run(f"full  [{i}]", True))
    print(f"median sparse={statistics.median(a):.3f} "
          f"full={statistics.median(b):.3f} "
          f"sparse/full={statistics.median(a) / statistics.median(b):.3f}x")


if __name__ == "__main__":
    main()
