"""Bisect the fused analytic encode: transforms-only vs +y-scan vs full."""
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

from reslic_tcm_tpu.coding import analytic_rans as ar
from reslic_tcm_tpu.models.base import ChannelARModule
from reslic_tcm_tpu.models.tcm import make_tcm

N, M = 128, 320
B, H, W = 8, 768, 512
K = 4096

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
t0 = time.time()
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True)
codec.set_matmul_precision("bfloat16")
codec.update()
module = codec.module
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, H, W * 3)).astype(np.float32))
y_shape = (H // 16, W // 16)


def transforms(v, xx, upto):
    with jax.default_matmul_precision("bfloat16"):
        y, z, z_hat = module.apply(v, xx, 0, method=ChannelARModule.analysis)
        if upto == "analysis":
            return jnp.sum(y) + jnp.sum(z_hat)
        lm, ls = module.apply(v, z_hat, 0, method=ChannelARModule.hyper_synthesis)
        syms, pars, yhs = [], [], []
        for i in range(module.num_slices):
            mu, sigma, ms = module.apply(
                v, i, lm, ls, list(yhs), y_shape,
                method=ChannelARModule.decode_slice_params_sigma)
            p = ar.coder_params(sigma)
            s32 = module.apply(v, i, y, mu,
                               method=ChannelARModule.quantize_slice).astype(jnp.int32)
            s32 = ar.clamp_symbols(s32, p["c"])
            yhs.append(module.apply(v, i, ms, s32.astype(jnp.int16), mu,
                                    method=ChannelARModule.decode_slice_dequant_finish))
            syms.append(s32.reshape(-1))
            pars.append({kk: vv.reshape(-1) for kk, vv in p.items()})
        if upto == "slices":
            return sum(jnp.sum(s) for s in syms)
        par_cat = {kk: jnp.concatenate([pp[kk] for pp in pars]) for kk in pars[0]}
        yw, yc, yo = ar.encode_gaussian(jnp.concatenate(syms), par_cat, k=K,
                                        cap=3932160 // K)
        return jnp.sum(yc)


_fetch = jax.jit(lambda t: t.astype(jnp.float32))


def timed(name, upto, reps=3):
    f = jax.jit(lambda v, xx: transforms(v, xx, upto), static_argnums=())
    fn = lambda: np.asarray(_fetch(f(codec.variables, x)))  # noqa: E731
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    print(f"{name:34s} {(time.perf_counter()-t0)/reps*1e3:8.0f} ms")


timed("analysis only (g_a+h_a)", "analysis")
timed("+hyper+5 slices", "slices")
timed("+y scan (full enc minus z)", "full")
