import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp

B = 512*512
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 2**27, B), jnp.int32)

@jax.jit
def full_sort(k):
    return jnp.argsort(k)

@jax.jit
def bucket_rank(k):
    # counting sort by top-8 bits via one-hot cumsum: perm[i] = dest of i
    b = (k >> 19) & 0xFF                             # [B] bucket 0..255
    oh = (b[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
    ohi = oh.astype(jnp.int32)
    within = jnp.cumsum(ohi, axis=0) - ohi           # exclusive count within bucket
    counts = jnp.sum(ohi, axis=0)
    offs = jnp.cumsum(counts) - counts               # bucket start offsets
    rank = jnp.sum(jnp.where(oh, within + offs[None, :], 0), axis=1)
    return rank                                      # position each elem goes to

def timeit(name, fn, *a):
    r = fn(*a); jax.block_until_ready(r)
    t0 = time.monotonic()
    for k in range(3):
        r = fn(*a)
        _ = float(jnp.sum(r))   # force
    print(f"{name}: {(time.monotonic()-t0)/3*1000:.1f} ms")
    return r

timeit("argsort 262k", full_sort, keys)
rk = timeit("bucket_rank 262k", bucket_rank, keys)
# correctness: scatter i -> rank[i] must be a permutation grouping buckets
rkn = np.asarray(rk)
assert sorted(rkn) == list(range(B)), "not a permutation"
kb = (np.asarray(keys) >> 19) & 0xFF
dest = np.empty(B, np.int64); dest[rkn] = np.arange(B)
assert (np.diff(kb[dest]) >= 0).all(), "buckets not grouped"
print("bucket_rank correct")

@jax.jit
def inv_perm(rank):
    B_ = rank.shape[0]
    return jnp.zeros((B_,), jnp.int32).at[rank].set(jnp.arange(B_, dtype=jnp.int32))

@jax.jit
def pipeline(k):
    r = bucket_rank(k)
    q = inv_perm(r)
    return k[q]  # gathered keys: grouped by bucket

timeit("inv_perm scatter", inv_perm, rk)
out = timeit("full pipeline", pipeline, keys)
kb2 = (np.asarray(out) >> 19) & 0xFF
assert (np.diff(kb2) >= 0).all(), "gather perm wrong"
print("pipeline correct")
