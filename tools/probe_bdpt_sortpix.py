"""Does MORTON-ordering the pixels fed to the fused BDPT megakernel
help on clustered scenes?  The fused kernel has no inter-bounce
sorting; its tiles are whatever pixel order the driver feeds it.
Raster rows at 512 px wrap around the image, so a [rows,128] tile mixes
distant pixels; Morton-ordering the pixel->lane assignment makes
bounce-0 camera rays (and everything their coherence seeds) tile-local.

Interleaved A/B on coffee-91k, bdpt-mis, one 512^2 chunk, 1 spp.
Usage: python tools/probe_bdpt_sortpix.py [spp]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants
from bpt_tpu.ops.pallas.bdpt_kernel import bdpt_megakernel_pixels
from bpt_tpu.ops.pallas.pt_kernel import camera_table


def morton16(i, j):
    def spread(x):
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    return (spread(j) << 1) | spread(i)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    import dataclasses

    cfg = dataclasses.replace(cfg, image_width=512, aspect_ratio=1.0,
                              samples_per_pixel=spp * spp, max_depth=10)
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    npix = W * W
    pix = np.arange(npix, dtype=np.int32)
    iv = pix % W
    jv = pix // W
    m = morton16(iv.astype(np.int64), jv.astype(np.int64))
    perm = np.argsort(m, kind="stable").astype(np.int32)

    key = jax.random.PRNGKey(0)

    def run(order):
        p = jnp.asarray(order)
        i = (p % W).astype(jnp.float32)
        j = (p // W).astype(jnp.float32)
        rx, ry, rz, rays, _sh, _st = bdpt_megakernel_pixels(
            scene, i, j, p, camera_table(cc), key, cfg.max_depth,
            cfg.sqrt_spp)
        float(jnp.sum(rx))
        return float(rays)

    orders = {"raster": pix, "morton": perm}
    for name in orders:
        run(orders[name])
    res = {k: [] for k in orders}
    rays = 0.0
    for _ in range(5):
        for name, o in orders.items():
            t0 = time.monotonic()
            rays = run(o)
            res[name].append(time.monotonic() - t0)
    for name, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:7s} median {med:6.2f} s = {rays / med / 1e6:.3f} "
              f"ext-Mrays/s (runs {[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
