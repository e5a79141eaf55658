"""Round-5 A/B/C: coffee-91k bdpt-mis on the bdpt_wave path —
(a) batched cross-slot connection occlusion (BPT_TPU_CONNECT_BATCH=1:
    soa.any_hit_sparse_multi — ONE any-hit launch for all camera slots),
(b) per-slot sparse compaction (BPT_TPU_CONNECT_SPARSE=1, the round-4
    wiring), and
(c) full per-slot any-hit (the round-5 DEFAULT — measured fastest:
    full 0.758 / sparse 0.672 / batch 0.638 Mrays/s interleaved medians,
    2026-08-19 window).
This banks VERDICT r4 items 1a (sparse e2e) and 1b (cross-slot batch)
with one interleaved-medians session (CLAUDE.md measurement
discipline).  Env toggles are honored per-variant because every
step-maker cache key carries _trace_env_sig() (round 5).

Usage: python tools/probe_connect_batch.py [runs [spp]]
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

VARIANTS = [
    ("batch ", {"BPT_TPU_CONNECT_BATCH": "1", "BPT_TPU_CONNECT_SPARSE": "1"}),
    ("sparse", {"BPT_TPU_CONNECT_BATCH": None, "BPT_TPU_CONNECT_SPARSE": "1"}),
    ("full  ", {"BPT_TPU_CONNECT_BATCH": None, "BPT_TPU_CONNECT_SPARSE": None}),
]


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    cfg = dataclasses.replace(
        ls.camera, image_width=512, aspect_ratio=1.0,
        samples_per_pixel=spp, max_depth=10, integrator="bdpt-mis")

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

    for tag, env in VARIANTS:  # compile each variant once
        run(f"warm {tag}", env)
    med = {tag: [] for tag, _ in VARIANTS}
    for i in range(runs):
        for tag, env in VARIANTS:
            med[tag].append(run(f"{tag}[{i}]", env))
    m = {tag: statistics.median(v) for tag, v in med.items()}
    print(" ".join(f"median_{t.strip()}={v:.3f}" for t, v in m.items())
          + f"  batch/full={m['batch '] / m['full  ']:.3f}x"
          + f"  sparse/full={m['sparse'] / m['full  ']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
