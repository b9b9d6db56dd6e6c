"""Trace the fused analytic decode program to locate where its time goes."""
import os, sys, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from reslic_tcm_tpu.models.tcm import make_tcm

N, M, B, H, W = 128, 320, 8, 768, 512
K = 4096
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True,
                 dtype=jnp.bfloat16 if os.environ.get("DTYPE")=="bf16" else None)
codec.set_matmul_precision("bfloat16")
from reslic_tcm_tpu.ops.window_attention import enable_fused_attention
enable_fused_attention(True)
codec.update()
r = np.random.default_rng(0)
g = r.uniform(size=(B, H//16, W//16, 3))
im = np.clip(np.repeat(np.repeat(g,16,1),16,2) + r.normal(0,0.02,(B,H,W,3)), 0, 1).astype(np.float32)
x = jnp.asarray(im.reshape(B, H, W*3))
enc = codec.compress_device_analytic(x, k=K)
dec = codec.decompress_device_analytic(enc, raw_u8=True)
np.asarray(dec["rgb_raw"])
print("warm", file=sys.stderr)
with jax.profiler.trace("/tmp/dectrace"):
    t0=time.perf_counter()
    enc2 = codec.compress_device_analytic(x, k=K)
    t1=time.perf_counter()
    dec = codec.decompress_device_analytic(enc2, raw_u8=True)
    raw = np.asarray(dec["rgb_raw"])
    t2=time.perf_counter()
print(f"enc {1000*(t1-t0):.0f}ms decfetch {1000*(t2-t1):.0f}ms")
print(sorted(glob.glob("/tmp/dectrace/**/*", recursive=True))[-5:])
