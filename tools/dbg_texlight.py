"""Isolate the 3 mismatching lanes in the textured-light wave test."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bpt_tpu.core import vec3 as v3
from bpt_tpu.models import pt
from bpt_tpu.ops.pallas.pt_wave import pt_wave
from bpt_tpu.scene.builder import MaterialSpec as M
from bpt_tpu.scene.builder import SceneBuilder
from bpt_tpu.scene.textures import TextureSpec

b = SceneBuilder()
ltex = TextureSpec.checker(0.5, (12.0, 10.0, 4.0), (2.0, 2.0, 10.0))
tex = TextureSpec.checker(0.35, (0.9, 0.3, 0.2), (0.1, 0.8, 0.3))
kw = dict(lat_steps=4, lon_steps=6)
b.add_uv_sphere((0, 1, 0), 1.0, M.lambertian((1, 1, 1), texture=tex), **kw)
b.add_quad((-10, 0, -10), (20, 0, 0), (0, 0, 20), M.lambertian((0.6, 0.6, 0.6)))
b.add_quad((-2, 6, -2), (4, 0, 0), (0, 0, 4), M.diffuse_light((1, 1, 1), texture=ltex))
scene = b.build(dtype=jnp.float32)

B = 192
depth = 4
rng = np.random.default_rng(63)
o = v3.from_array(jnp.asarray(np.tile([[0.0, 2.0, 6.0]], (B, 1)), jnp.float32))
tgt = np.concatenate(
    [rng.uniform(-2, 2, (B, 1)), rng.uniform(0, 6, (B, 1)), np.zeros((B, 1))], 1)
d = v3.from_array(jnp.asarray(tgt - np.array([0.0, 2.0, 6.0]), jnp.float32))
ids = jnp.arange(B, dtype=jnp.int32)
key = jax.random.PRNGKey(23)
rad_ref, stats_ref = pt.path_trace_radiance(
    scene, v3.to_array(o), v3.to_array(d), depth,
    pt.kernel_stream_uniforms_fn(key, ids, jnp.float32),
)
rx, ry, rz, rays, _st = pt_wave(scene, o, d, ids, key, depth, interpret=True)
got = np.stack([np.asarray(rx), np.asarray(ry), np.asarray(rz)], -1)
ref = np.asarray(rad_ref)
bad = np.nonzero(np.abs(got - ref).max(-1) > 1e-4 + 1e-4 * np.abs(ref).max(-1))[0]
print("bad lanes:", bad)
for li in bad:
    print(f"lane {li}: got={got[li]} want={ref[li]} d={np.asarray(v3.to_array(d))[li]}")

# per-depth comparison to find the bounce where they diverge
for dep in range(1, depth + 1):
    r_ref, _ = pt.path_trace_radiance(
        scene, v3.to_array(o), v3.to_array(d), dep,
        pt.kernel_stream_uniforms_fn(key, ids, jnp.float32))
    rx2, ry2, rz2, _, _ = pt_wave(scene, o, d, ids, key, dep, interpret=True)
    g2 = np.stack([np.asarray(rx2), np.asarray(ry2), np.asarray(rz2)], -1)
    r2 = np.asarray(r_ref)
    for li in bad:
        print(f"depth={dep} lane={li} got={g2[li]} want={r2[li]}")
