"""A/B the encode_interleaved compaction formulations on the real chip.

gather (bisection + minor-axis take_along_axis) vs scatter (XLA lowers the
slot scatter through a full sort; measured ~26 ms inside the fused encode
at TCM N=128 768x512 — docs/PERFORMANCE.md roadmap item 3). Shapes match
the headline bench stream: n = b*slices*slice_len + hyper symbols.

Usage: python artifacts/probe_enc_compact.py [n] [k]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from reslic_tcm_tpu.coding import device_rans as dr

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_966_080  # 768x512 TCM M=320
k = int(sys.argv[2]) if len(sys.argv) > 2 else 256

rng = np.random.default_rng(0)
R, L = 64, 130
pmf = rng.random((R, L)) + 0.01
cdfs = np.zeros((R, L + 2), np.uint32)
for i in range(R):
    q = np.floor(pmf[i] / pmf[i].sum() * ((1 << 16) - L - 1)).astype(np.uint64) + 1
    cdfs[i, 1 : L + 1] = np.cumsum(q)
    cdfs[i, L + 1] = 1 << 16
lengths = np.full(R, L + 2, np.int32)
offsets = np.full(R, -64, np.int32)
packed = jnp.asarray(dr.build_packed_table(cdfs, lengths))

sym = rng.integers(-60, 60, n).astype(np.int32)
idx = rng.integers(0, R, n).astype(np.int32)
args = (
    jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(cdfs),
    jnp.asarray(lengths), jnp.asarray(offsets),
)
cap = n // k  # the serving budget (~16 bits/symbol)

outs = {}
for mode in ("scatter", "gather"):
    f = jax.jit(
        lambda s, i, c, le, o, _m=mode: dr.encode_interleaved(
            s, i, c, le, o, k=k, cap=cap, packed=packed, compact=_m
        )
    )
    w, cts, ovf = jax.block_until_ready(f(*args))
    assert not bool(ovf)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        w, cts, ovf = f(*args)
    jax.block_until_ready((w, cts, ovf))
    dt = (time.perf_counter() - t0) / reps
    outs[mode] = (np.asarray(w), np.asarray(cts))
    print(f"{mode}: {dt * 1e3:.2f} ms  ({n} symbols, k={k}, cap={cap})")

cg, cs = outs["gather"][1], outs["scatter"][1]
np.testing.assert_array_equal(cg, cs)
for lane in range(k):
    np.testing.assert_array_equal(
        outs["gather"][0][lane, : cg[lane]], outs["scatter"][0][lane, : cg[lane]]
    )
print("streams bit-identical across formulations")
