"""What makes the rANS scan slow? Isolate: scan step overhead, small-table
gather, big-table gather, words-read gather, erf math — each as a scan over
the same step count/lane width as the real decoder."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

K = int(os.environ.get("K", "1024"))
n = 3932160
STEPS = n // K
rng = np.random.default_rng(0)

idx_g = jnp.asarray(rng.integers(0, 64, (STEPS, K)).astype(np.int32))
cf_g = jnp.asarray(rng.integers(0, 1 << 16, (STEPS, K)).astype(np.uint32))
big_tab = jnp.asarray(rng.integers(0, 1 << 16, (64, 1 << 16)).astype(np.uint32))
small_tab = jnp.asarray(rng.random(64).astype(np.float32))
words = jnp.asarray(rng.integers(0, 1 << 16, (K, STEPS + 8)).astype(np.uint32))


def timed(name, fn, *args, reps=3):
    out = jax.jit(fn)(*args)
    np.asarray(out)
    f = jax.jit(fn)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt*1e3:8.0f} ms  {dt/STEPS*1e6:7.1f} us/step  {n/dt/1e6:7.1f} Msym/s")


# 1. bare scan: carry arithmetic only
def bare(idxs):
    def step(c, i):
        c = c + i.astype(jnp.uint32) * 3 + (c >> 7)
        return c, c[0]
    c, o = jax.lax.scan(step, jnp.zeros((K,), jnp.uint32), idxs)
    return o.sum()

timed("bare scan (no gather)", bare, idx_g)


# 2. small-table gather per step
def small_gather(idxs):
    def step(c, i):
        v = small_tab[i]
        c = c + v
        return c, None
    c, _ = jax.lax.scan(step, jnp.zeros((K,), jnp.float32), idxs)
    return c.sum()

timed("small [64] gather", small_gather, idx_g)


# 3. big-table 2D gather per step (the inverse/packed table pattern)
def big_gather(idxs, cfs):
    def step(c, ic):
        i, cf = ic
        v = big_tab[i, (cf + c[0]) & 0xFFFF]
        c = c + v
        return c, None
    c, _ = jax.lax.scan(step, jnp.zeros((K,), jnp.uint32), (idxs, cfs))
    return c.sum()

timed("big [64,65536] 2D gather", big_gather, idx_g, cf_g)


# 4. words read: per-lane pointer gather (the renorm read pattern)
def words_read(cfs):
    lanes = jnp.arange(K)
    def step(c, cf):
        x, rp = c
        w = words[lanes, jnp.maximum(rp, 0)]
        need = (cf & 1).astype(jnp.bool_)
        x = x + jnp.where(need, w, 0)
        rp = jnp.where(need, rp - 1, rp)
        return (x, rp), None
    (x, rp), _ = jax.lax.scan(
        step, (jnp.zeros((K,), jnp.uint32), jnp.full((K,), STEPS, jnp.int32)), cfs)
    return x.sum()

timed("words [K,cap] ptr gather", words_read, cf_g)


# 5. erf chain: 9 binary-search-style erf evals per step, no gathers
def erf_math(cfs):
    sig = jnp.asarray(rng.random(K).astype(np.float32) * 10 + 0.2)
    def step(c, cf):
        p = cf.astype(jnp.float32) / 65536.0
        s = jnp.zeros((K,), jnp.float32)
        for _ in range(9):
            g = 0.5 * (1 + jax.lax.erf((s - 5.0) / (sig * 1.4142)))
            s = jnp.where(g < p, s + 1.0, s - 1.0)
        c = c + s
        return c, None
    c, _ = jax.lax.scan(step, jnp.zeros((K,), jnp.float32), cfs)
    return c.sum()

timed("9x erf binary search", erf_math, cf_g)


# 6. one-hot matmul lookup from [64] table (MXU instead of gather)
def onehot_lookup(idxs):
    def step(c, i):
        oh = jax.nn.one_hot(i, 64, dtype=jnp.float32)
        v = oh @ small_tab
        c = c + v
        return c, None
    c, _ = jax.lax.scan(step, jnp.zeros((K,), jnp.float32), idxs)
    return c.sum()

timed("one-hot [K,64]@[64] lookup", onehot_lookup, idx_g)
