"""A/B: BPT_TPU_PT_SHARED_SCATTER on the cornell fused megakernel
(512^2/16spp/d10, the bench config).  Interleaved runs, medians
(CLAUDE.md measurement discipline — chip variance ±12%, degradation
windows happen).

Usage: python tools/probe_shared_scatter.py [runs]
"""
from __future__ import annotations

import dataclasses
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bpt_tpu.models.render import render
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene = cornell_box()
    cfg = dataclasses.replace(
        cornell_box_camera(), image_width=512, samples_per_pixel=16,
        max_depth=10, integrator="pt")

    def run(tag, on):
        if on:
            os.environ["BPT_TPU_PT_SHARED_SCATTER"] = "1"
        else:
            os.environ.pop("BPT_TPU_PT_SHARED_SCATTER", None)
        r = render(scene, cfg, seed=0)
        mr = r.stats.rays_traced / max(r.stats.wall_seconds, 1e-9) / 1e6
        print(f"{tag}: {mr:.1f} Mrays/s wall={r.stats.wall_seconds * 1e3:.1f}ms",
              flush=True)
        return mr

    run("warm off", False)
    run("warm on ", True)
    a, b = [], []
    for i in range(runs):
        a.append(run(f"off[{i}]", False))
        b.append(run(f"on [{i}]", True))
    print(f"median off={statistics.median(a):.1f} "
          f"on={statistics.median(b):.1f} "
          f"ratio={statistics.median(b) / statistics.median(a):.3f}x")


if __name__ == "__main__":
    main()
