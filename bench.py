"""Benchmark: steady-state ray throughput on one chip.

Headline config: cornell box (the reference's built-in scene,
src/main.cpp:14-60) at 512x512, 16 effective spp, depth 10, unidirectional
PT — measured warm (one full render to compile+warm caches, then a timed
render).  The reference publishes no numbers (BASELINE.md); the recorded
baseline is the north-star target of 500 Mrays/sec/chip from
BASELINE.json, so vs_baseline = Mrays / 500.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/500}
"""

from __future__ import annotations

import dataclasses
import json
import sys


def main():
    from bpt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from bpt_tpu.models.render import render
    from bpt_tpu.scene.presets import cornell_box, cornell_box_camera

    scene = cornell_box()
    cfg = dataclasses.replace(
        cornell_box_camera(),
        image_width=512,
        samples_per_pixel=16,
        max_depth=10,
        integrator="pt",
    )

    # warm-up: compiles every chunk shape
    render(scene, cfg, seed=0)
    # timed
    result = render(scene, cfg, seed=0)
    s = result.stats
    mrays = s.mrays_per_sec

    print(
        json.dumps(
            {
                "metric": "cornell_512x512_16spp_d10_pt",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 500.0, 4),
                "detail": {
                    "rays": s.total_rays,
                    "wall_s": round(s.wall_seconds, 3),
                    "tri_tests": s.triangle_tests,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
