"""Probe: bdpt-mis megakernel throughput on the real chip.

Cornell 512x512, 16 spp, depth 10 (the bench config) rendered with
integrator bdpt-mis through the fused megakernel path, against plain
bdpt for calibration.  VERDICT round-2 item 2 target: >=100 Mrays/s
of extension rays.
"""

import dataclasses
import sys

sys.path.insert(0, ".")

from bpt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from bpt_tpu.models.render import render
from bpt_tpu.scene.presets import cornell_box, cornell_box_camera


def main():
    scene = cornell_box()
    base = dataclasses.replace(
        cornell_box_camera(), image_width=512, samples_per_pixel=16,
        max_depth=10,
    )
    for integ in sys.argv[1:] or ("bdpt-mis", "bdpt"):
        cfg = dataclasses.replace(base, integrator=integ)
        render(scene, cfg, seed=7)  # warm
        r = render(scene, cfg, seed=0)
        s = r.stats
        mr = s.rays_traced / max(s.wall_seconds, 1e-9) / 1e6
        print(f"{integ:9s} rays={s.rays_traced} wall={s.wall_seconds:.3f}s "
              f"-> {mr:.1f} Mrays/s (ext rays); shadow={s.shadow_rays}")
        mean = float(r.framebuffer_sum.mean()) / r.samples_per_pixel
        print(f"{integ:9s} mean radiance {mean:.5f}")


if __name__ == "__main__":
    main()
