"""Confirm the shadow-count drift: jnp bdpt with unrolled loops vs
fori_loop form (UNROLL_MAX monkeypatched) on the volumes smoke scene."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
from test_pallas_kernels import _box_rays, _smoke_scene_f32

from bpt_tpu.core import vec3 as v3
from bpt_tpu.models import bdpt, pt

scene = _smoke_scene_f32()
V = scene.num_volumes
ntv = bdpt.NT + V
B = 96
depth = 4
mis = False
o, d = _box_rays(B, seed=23 + int(mis))
rng = np.random.default_rng(29 + int(mis))
cam_U = rng.uniform(size=(B, depth, ntv)).astype(np.float32)
ls_U = rng.uniform(size=(B, bdpt.NLS)).astype(np.float32)
light_U = rng.uniform(size=(B, depth - 1, ntv)).astype(np.float32)

for um in (32, 0):
    bdpt.UNROLL_MAX = um
    rad, stats = bdpt.bdpt_radiance(
        scene, v3.to_array(o), v3.to_array(d), depth,
        pt.array_uniforms_fn(jnp.asarray(cam_U)),
        jnp.asarray(ls_U),
        pt.array_uniforms_fn(jnp.asarray(light_U)),
        mis=mis,
    )
    print(f"UNROLL_MAX={um}: shadow={int(stats.shadow_rays)} "
          f"rays={int(stats.rays_traced)} radsum={float(jnp.sum(rad)):.6f}")
