"""Cost attribution for the cornell SMEM megakernel: time the fused PT
kernel normally, with the threefry RNG stubbed out, and with scenes of
varying triangle count (per-tri intersect slope).  Decides which of
RNG / intersect / shade to attack for the 350 Mrays/s target."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.scene.presets import cornell_box
from bpt_tpu.scene.builder import MaterialSpec as M, SceneBuilder
from bpt_tpu.core import vec3 as v3
from bpt_tpu.ops.pallas import pt_kernel as ptk


def rays_into_box(B, seed=0):
    rng = np.random.default_rng(seed)
    o = v3.from_array(jnp.asarray(
        np.tile([[278.0, 278.0, -800.0]], (B, 1)), jnp.float32))
    tgt = np.concatenate([rng.uniform(50, 500, (B, 2)),
                          rng.uniform(50, 500, (B, 1))], 1)
    d = v3.from_array(jnp.asarray(
        tgt - np.array([278.0, 278.0, -800.0]), jnp.float32))
    return o, d


def timeit(fn, n=5):
    r = fn(0)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for k in range(1, n + 1):
        r = fn(k)
    jax.block_until_ready(r)
    return (time.monotonic() - t0) / n, r


def bench_scene(scene, name, B=1 << 18, depth=10):
    o, d = rays_into_box(B)
    ids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def step(k):
        return ptk.pt_megakernel(scene, o, d, ids,
                                 jax.random.fold_in(key, k), depth)

    dt, r = timeit(lambda k: step(jnp.int32(k)))
    rays = float(r[3])
    print(f"{name:28s}: {dt*1000:7.1f} ms  rays={rays/1e6:6.2f}M "
          f"{rays/dt/1e6:7.1f} Mrays/s")
    return dt, rays


def main():
    scene = cornell_box()
    print(f"cornell tris={scene.num_tris}")
    bench_scene(scene, "full kernel d10")

    # RNG stubbed: replaces threefry with a passthrough -> measures the
    # in-kernel RNG share (image garbage; time meaningful)
    real_tf = ptk._threefry2x32
    try:
        ptk._threefry2x32 = lambda k1, k2, a, b: (
            a * jnp.uint32(2654435761) + k1, b)
        bench_scene(scene, "cheap-rng d10")
    finally:
        ptk._threefry2x32 = real_tf

    # triangle-count slope: same shape scene with fewer/more tris
    def quad_scene(n_quads):
        b = SceneBuilder()
        b.add_quad((113, 554, 127), (330, 0, 0), (0, 0, 305),
                   M.diffuse_light((15, 15, 15)))
        white = M.lambertian((0.7, 0.7, 0.7))
        for k in range(n_quads):
            y = 1.0 + 5.0 * k
            b.add_quad((0, y, 0), (555, 0, 0), (0, 0, 555), white)
        return b.build(dtype=jnp.float32, use_bvh=False)

    for nq in (4, 16, 64):
        s = quad_scene(nq)
        bench_scene(s, f"{s.num_tris}-tri scene d10")


if __name__ == "__main__":
    main()
