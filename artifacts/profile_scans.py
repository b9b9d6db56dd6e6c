"""Reliable standalone timing of the device-rANS scans (sync via output fetch).

Sweeps lane count K and isolates: decode w/ inverse table, decode w/ binary
search, encode (div-free), and a transforms-only program for comparison.
"""
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

from reslic_tcm_tpu.coding import device_rans as dr
from reslic_tcm_tpu.entropy.gaussian import build_scale_tables
from reslic_tcm_tpu.ops.math import get_scale_table

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

t = build_scale_tables(np.asarray(get_scale_table()))
cdf = jnp.asarray(t.quantized_cdf)
cdflen = jnp.asarray(t.cdf_length)
off = jnp.asarray(t.offset)
inv = jnp.asarray(dr.build_inverse_table(t.quantized_cdf, t.cdf_length))
packed = jnp.asarray(dr.build_packed_table(t.quantized_cdf, t.cdf_length))

# trained-statistics symbols: mostly near-zero, low scale indexes
rng = np.random.default_rng(0)
n = 3932160  # TCM-Large B=8 768x512 y-symbol count
idx_np = np.clip(rng.geometric(0.3, n) + 4, 0, 63).astype(np.int32)
sigma = np.asarray(get_scale_table())[idx_np]
sym_np = np.round(rng.normal(0, sigma)).astype(np.int32)
sym = jnp.asarray(sym_np)
idx = jnp.asarray(idx_np)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    res = [np.asarray(o) for o in (out if isinstance(out, tuple) else (out,))]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        res = [np.asarray(o) for o in (out if isinstance(out, tuple) else (out,))]
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.0f} ms  {n/dt/1e6:6.1f} Msym/s")
    return out


for K in (1024, 2048, 4096, 8192):
    cap = max(64, n // K)
    enc = jax.jit(lambda s, i, _K=K, _c=cap: dr.encode_interleaved(
        s, i, cdf, cdflen, off, k=_K, cap=_c, packed=packed))
    words, counts, ovf = timed(f"enc k={K}", enc, sym, idx)
    assert not bool(ovf)

    dec = jax.jit(lambda w, c, i, _K=K: dr.decode_interleaved(
        w, c, i, cdf, cdflen, off, n=n, k=_K, inverse=inv, packed=packed))
    out = timed(f"dec k={K} inverse", dec, words, counts, idx)
    ok = np.array_equal(np.asarray(out), sym_np)
    if not ok:
        print("  MISMATCH!")

    dec_bs = jax.jit(lambda w, c, i, _K=K: dr.decode_interleaved(
        w, c, i, cdf, cdflen, off, n=n, k=_K, inverse=None, packed=packed))
    timed(f"dec k={K} binsearch", dec_bs, words, counts, idx)
