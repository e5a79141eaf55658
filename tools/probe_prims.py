"""Microbench XLA primitives on axon that gate the binned-traversal
design: key-value sort, scatter, gather, [B,S] reductions/cumsum,
one-hot counting sort."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp


def bench(name, fn, *args, n=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.monotonic() - t0) / n
    print(f"{name:44s}: {dt*1000:8.2f} ms")
    return r


def main():
    rng = np.random.default_rng(0)
    for B in (262144, 3 * 1024 * 1024):
        k = jnp.asarray(rng.integers(0, 256, B), jnp.int32)
        v = jnp.asarray(rng.random(B), jnp.float32)
        mB = f"{B//1024}k"

        bench(f"lax.sort kv {mB}",
              jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), k, v)
        idx = jnp.asarray(rng.permutation(B), jnp.int32)
        bench(f"scatter set {mB}",
              jax.jit(lambda v, i: jnp.zeros((B,), jnp.float32).at[i].set(v)),
              v, idx)
        bench(f"scatter min {mB}",
              jax.jit(lambda v, i: jnp.full((B,), jnp.inf, jnp.float32)
                      .at[i % 65536].min(v)), v, idx)
        bench(f"gather {mB}", jax.jit(lambda v, i: v[i]), v, idx)
        bench(f"cumsum i32 {mB}",
              jax.jit(lambda k: jnp.cumsum(k)), k)

    B, S = 262144, 179
    o = jnp.asarray(rng.random((B, 3)), jnp.float32)
    box = jnp.asarray(rng.random((S, 6)), jnp.float32)

    def slab_open(o, box):
        lo = box[None, :, :3]; hi = box[None, :, 3:]
        t0 = (lo - o[:, None, :]) * 3.0
        t1 = (hi - o[:, None, :]) * 3.0
        enter = jnp.minimum(t0, t1).max(-1)
        exit_ = jnp.maximum(t0, t1).min(-1)
        return exit_ > enter

    bench("[B,S] slab open -> per-ray count",
          jax.jit(lambda o, box: jnp.sum(slab_open(o, box), 1,
                                         dtype=jnp.int32)), o, box)
    bench("[B,S] slab open -> cumsum axis0 [B,S]",
          jax.jit(lambda o, box: jnp.cumsum(
              slab_open(o, box).astype(jnp.int32), 0)), o, box)
    bench("[B,S] open materialize i8",
          jax.jit(lambda o, box: slab_open(o, box).astype(jnp.int8)), o, box)

    # one-hot counting-sort rank (the pt_wave _coherence_perm core)
    from bpt_tpu.ops.pallas.pt_wave import _coherence_perm
    lo = jnp.zeros((3,), jnp.float32); hi = jnp.ones((3,), jnp.float32)
    xs = [jnp.asarray(rng.random(B), jnp.float32) for _ in range(6)]
    al = jnp.ones((B,), jnp.float32)
    bench("coherence_perm (128-bucket counting sort)",
          jax.jit(_coherence_perm), lo, hi, *xs, al)

    # blocked MXU rank trick: [G,128,S] bf16 matmul prefix
    G = B // 128
    openf = jnp.asarray(rng.integers(0, 2, (G, 128, S)), jnp.bfloat16)
    L = jnp.asarray(np.tril(np.ones((128, 128), np.float32), -1), jnp.bfloat16)

    def mxu_rank(openf):
        r = jax.lax.dot_general(
            L, openf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [128, G, S]
        return r
    bench("MXU blockwise rank [G,128,S]", jax.jit(mxu_rank), openf)


if __name__ == "__main__":
    main()
