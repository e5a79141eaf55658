"""A/B the interleaved dual roll (BPT_TPU_PAIR_IL) against sequential
pair rolls, full-wave, in ONE process with interleaved reps (chip-drift
honest).  Usage: python tools/probe_pairil.py [rows [spp]]"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from bpt_tpu.scene.loader import load_scene_from_yaml
from bpt_tpu.models.camera import camera_constants, generate_rays
from bpt_tpu.core import rng as rng_mod, vec3 as v3
from bpt_tpu.ops.pallas.pt_wave import pt_wave


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ls = load_scene_from_yaml("scenes/coffee/coffee_standin.yaml")
    scene, cfg = ls.scene, ls.camera
    cc = camera_constants(cfg, scene.dtype)
    W = 512
    npix = W * W
    B = npix * spp
    pix = jnp.arange(npix, dtype=jnp.int32)
    i = jnp.tile((pix % W).astype(jnp.float32), spp)
    j = jnp.tile((pix // W).astype(jnp.float32), spp)
    S = max(1, int(np.sqrt(spp)))
    s_lin = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    rid = jnp.tile(pix, spp) * spp + s_lin
    key = jax.random.PRNGKey(0)
    u = rng_mod.wave_uniforms(jax.random.fold_in(key, 0), rid, 0, 4,
                              dtype=jnp.float32)
    o3, d3 = generate_rays(cc, i, j, (s_lin % S).astype(jnp.float32),
                           (s_lin // S).astype(jnp.float32), u)
    o = v3.from_array(o3)
    d = v3.from_array(d3)
    k = jax.random.fold_in(key, 1)

    def run(il):
        r = pt_wave(scene, o, d, rid, k, 10, tile_rows=rows, pair_il=il)
        float(jnp.sum(r[0]))
        return float(r[3])

    for il in (False, True):
        run(il)  # compile + warm
    res = {False: [], True: []}
    rays = 0.0
    for _ in range(5):
        for il in (False, True):
            t0 = time.monotonic()
            rays = run(il)
            res[il].append(time.monotonic() - t0)
    for il, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"pair_il={il}: full-wave median {med:6.2f} s = "
              f"{rays / med / 1e6:.2f} Mrays/s "
              f"(runs {[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
