"""Round-4 A/B: coffee-91k bdpt-mis — fused megakernel vs the new
bdpt_wave render branch (spp-batched jnp estimator over FTB clustered
kernels).  Interleaved runs, medians (CLAUDE.md measurement discipline).

Usage: python tools/probe_bdpt_wave.py [runs [spp [integrator]]]
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

    def run(tag, env):
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        r = render(ls.scene, cfg, seed=0)
        mr = r.stats.rays_traced / max(r.stats.wall_seconds, 1e-9) / 1e6
        print(f"{tag}: {mr:.3f} Mrays/s  wall={r.stats.wall_seconds:.2f}s "
              f"rays={r.stats.rays_traced} shadow={r.stats.shadow_rays}",
              flush=True)
        return mr

    # warm both compile paths
    run("warm fused", {"BPT_TPU_NO_BDPT_WAVE": "1"})
    run("warm wave ", {"BPT_TPU_NO_BDPT_WAVE": None})
    a, b = [], []
    for i in range(runs):
        a.append(run(f"fused[{i}]", {"BPT_TPU_NO_BDPT_WAVE": "1"}))
        b.append(run(f"wave [{i}]", {"BPT_TPU_NO_BDPT_WAVE": None}))
    print(f"median fused={statistics.median(a):.3f} "
          f"wave={statistics.median(b):.3f} "
          f"ratio={statistics.median(b)/statistics.median(a):.2f}x")


if __name__ == "__main__":
    main()
