"""Reliable on-chip timing of the real model's pieces.

Protocol: chain `reps` calls with a scalar data dependency (forces serial
execution), ONE tiny fetch at the end; subtract the measured RTT baseline.
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

from reslic_tcm_tpu.models.tcm import make_tcm
from reslic_tcm_tpu.models.base import ChannelARModule

N, M = 128, 320
B, H, W = 8, 768, 512
PREC = os.environ.get("PROF_PREC", "bfloat16")
print(f"# device: {jax.devices()[0]} prec={PREC}", file=sys.stderr)

t0 = time.time()
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True)
if PREC != "none":
    codec.set_matmul_precision(PREC)
codec.update()
module = codec.module
v = codec.variables
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
y_shape = (H // 16, W // 16)

_fetch = jax.jit(lambda t: t.ravel()[0].astype(jnp.float32))


def chain_time(name, make_fn, inp, reps=5):
    """make_fn returns a jitted fn(inp, eps)->out; eps is a traced scalar
    derived from the previous output, forcing serialization."""
    fn = make_fn()
    out = fn(inp, jnp.float32(0.0))
    np.asarray(_fetch(out))  # compile + settle
    # RTT baseline: chained trivial adds
    t0 = time.perf_counter()
    e = jnp.float32(0.0)
    for _ in range(reps):
        e = _fetch(out) * 0.0 + e
    np.asarray(e)
    rtt = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    e = jnp.float32(0.0)
    for _ in range(reps):
        out = fn(inp, e)
        e = _fetch(out) * 0.0
    np.asarray(e)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt*1e3:8.1f} ms  (raw, rtt/call {rtt*1e3:.1f} ms)")
    return out


prec_ctx = (lambda: jax.default_matmul_precision(PREC)) if PREC != "none" else None


def apply_jit(method, *extra_static):
    def make():
        def f(inp, eps):
            with jax.default_matmul_precision(PREC):
                return module.apply(v, inp + eps, *extra_static, method=method)
        return jax.jit(f)
    return make


# g_a alone
def make_ga():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, inp + eps, method=lambda m, xx: m.g_a(xx))
    return jax.jit(f)

y = chain_time("g_a (8x768x512)", make_ga, x)

def make_ha():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, inp + eps, method=lambda m, yy: m.h_a(yy))
    return jax.jit(f)

z = chain_time("h_a", make_ha, y)

def make_hyper():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, inp + eps, 0,
                                method=ChannelARModule.hyper_synthesis)[0]
    return jax.jit(f)

lm = chain_time("hyper_synthesis (both)", make_hyper, z)

def make_gs():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, inp + eps, 0,
                                method=ChannelARModule.synthesize)
    return jax.jit(f)

yh = jnp.asarray(rng.normal(0, 1, (B, y_shape[0], y_shape[1], M)).astype(np.float32))
chain_time("synthesize (g_s+clip)", make_gs, yh)

# one slice params step (slice 2, 2 supports)
sup = [jnp.asarray(rng.normal(0, 1, (B, y_shape[0], y_shape[1], 64)).astype(np.float32))
       for _ in range(2)]
lms = jnp.asarray(rng.normal(0, 1, (B, y_shape[0], y_shape[1], M)).astype(np.float32))

def make_params():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, 2, inp + eps, lms, sup, y_shape,
                                method=ChannelARModule.decode_slice_params_sigma)[0]
    return jax.jit(f)

chain_time("dec_params_sigma (1 slice)", make_params, lms)

# finish
mu = jnp.asarray(rng.normal(0, 1, (B, y_shape[0], y_shape[1], 64)).astype(np.float32))
ms = jnp.asarray(rng.normal(0, 1, (B, y_shape[0], y_shape[1], M + 128)).astype(np.float32))
sym = jnp.asarray(rng.integers(-3, 3, (B, y_shape[0], y_shape[1], 64)).astype(np.int16))

def make_finish():
    def f(inp, eps):
        with jax.default_matmul_precision(PREC):
            return module.apply(v, 2, inp + eps, sym, mu,
                                method=ChannelARModule.decode_slice_dequant_finish)
    return jax.jit(f)

chain_time("finish (1 slice)", make_finish, ms)

# analytic y scans standalone (n = full batch symbol count)
from reslic_tcm_tpu.coding import analytic_rans as ar
n = B * y_shape[0] * y_shape[1] * M
K = 1024
sigma = jnp.asarray(
    np.exp(rng.uniform(np.log(0.1), np.log(4), n)).astype(np.float32))
p = {k2: np.asarray(v2) for k2, v2 in ar.coder_params(sigma).items()}
symf = np.clip(np.round(rng.normal(0, np.asarray(sigma))), -p["c"], p["c"]).astype(np.int32)
pj = {k2: jnp.asarray(v2) for k2, v2 in p.items()}
symj = jnp.asarray(symf)

enc_fn = jax.jit(lambda s, pp: ar.encode_gaussian(s, pp, k=K))
w, c, ovf = enc_fn(symj, pj)
np.asarray(_fetch(c))
t0 = time.perf_counter()
for _ in range(3):
    w, c, ovf = enc_fn(symj, pj)
    np.asarray(_fetch(c))
print(f"{'analytic enc scan n=3.9M':32s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms")

dec_fn = jax.jit(lambda w2, c2, pp: ar.decode_gaussian(w2, c2, pp, k=K))
vals = dec_fn(w, c, pj)
assert np.array_equal(np.asarray(vals), symf), "analytic roundtrip broke"
t0 = time.perf_counter()
for _ in range(3):
    vals = dec_fn(w, c, pj)
    np.asarray(_fetch(vals))
print(f"{'analytic dec scan n=3.9M':32s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms")
