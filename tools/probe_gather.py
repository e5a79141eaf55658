"""Row-gather cost vs row width/alignment at wave scale (4.2M rows).

The packed inter-bounce permutation gather measures ~123 ms for a
[B,15] f32 row gather — 50x off the ~2.5 ms DMA-bandwidth bound for
the 500 MB moved.  Checks whether 16-column (64 B, register-aligned)
rows, 8-column rows, or lax.sort-with-payload beat the [B,15] gather.

Usage: python tools/probe_gather.py [B_log2]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp

from bpt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def timeit(name, fn, *args, n=5):
    def syncv(out):
        if isinstance(out, (tuple, list)):
            out = out[0]
        float(jnp.sum(out if out.ndim == 1 else out[:, 0]))

    syncv(fn(*args))
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    syncv(out)
    dt = (time.monotonic() - t0) / n
    print(f"{name:32s} {dt * 1000:8.1f} ms", flush=True)
    return dt


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    B = 1 << blog
    key = jax.random.PRNGKey(0)
    p = jax.random.permutation(key, B).astype(jnp.int32)
    cols = [jax.random.normal(jax.random.fold_in(key, k), (B,), jnp.float32)
            for k in range(15)]
    keyf = jax.random.normal(jax.random.fold_in(key, 99), (B,), jnp.float32)
    print(f"B={B}", flush=True)

    @jax.jit
    def g15(p, *cs):
        return jnp.stack(cs, axis=1)[p]

    @jax.jit
    def g16(p, *cs):
        return jnp.stack(cs + (cs[0],), axis=1)[p]

    @jax.jit
    def g8(p, *cs):
        return jnp.stack(cs[:8], axis=1)[p]

    @jax.jit
    def g1(p, c):
        return c[p]

    @jax.jit
    def sort_payload(k, *cs):
        outs = jax.lax.sort((k,) + cs, num_keys=1)
        return outs[1]

    @jax.jit
    def sort_packed(k, *cs):
        m = jnp.stack(cs, axis=1)
        ki = jnp.argsort(k).astype(jnp.int32)
        return m[ki]

    timeit("[B,15] row gather", g15, p, *cols)
    timeit("[B,16] row gather", g16, p, *cols)
    timeit("[B,8] row gather", g8, p, *cols)
    timeit("[B] single gather", g1, p, cols[0])
    timeit("lax.sort key+15 payloads", sort_payload, keyf, *cols)
    timeit("argsort+[B,15] gather", sort_packed, keyf, *cols)


if __name__ == "__main__":
    main()
