"""MXU rate probe, v2: chain ops and sync via a scalar D2H fetch (the axon
tunnel's block_until_ready does not actually wait for completion)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

dev = jax.devices()[0]
print("device:", dev)


_first = jax.jit(lambda v: v.ravel()[0].astype(jnp.float32))


def sync(x):
    # fetch one element -> forces the queue to drain
    np.asarray(_first(x))


def bench(name, fn, x0, flops, reps=10):
    y = fn(x0)
    sync(y)
    # measure fixed sync cost with reps and 2*reps to subtract RTT
    t = time.time()
    y = x0
    for _ in range(reps):
        y = fn(y)
    sync(y)
    dt = time.time() - t
    tf = flops * reps / dt / 1e12
    print(f"{name:44s} {dt/reps*1e3:8.2f} ms/it  {tf:6.1f} TFLOP/s")


k = 4096
fl = 2 * k**3
key = jax.random.PRNGKey(0)
a32 = jax.random.normal(key, (k, k), jnp.float32)
a16 = a32.astype(jnp.bfloat16)

mm = jax.jit(lambda x: (x @ a32) * 1e-2)
bench("matmul fp32 default", mm, a32, fl)
mm16 = jax.jit(lambda x: ((x @ a16) * jnp.bfloat16(1e-2)).astype(jnp.bfloat16))
bench("matmul bf16", mm16, a16, fl)
mm_hi = jax.jit(lambda x: jax.lax.dot(x, a32, precision=jax.lax.Precision.HIGHEST) * 1e-2)
bench("matmul fp32 HIGHEST", mm_hi, a32, fl)
with jax.default_matmul_precision("bfloat16"):
    mm_bf = jax.jit(lambda x: (x @ a32) * 1e-2)
    bench("matmul fp32 prec=bf16", mm_bf, a32, fl)

B, H, W, C = 8, 384, 256, 256
w32 = jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.01
w16 = w32.astype(jnp.bfloat16)
cfl = 2 * 9 * C * C * H * W * B
x32 = jax.random.normal(key, (B, H, W, C), jnp.float32)
x16 = x32.astype(jnp.bfloat16)

conv = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1)
bench("conv3x3 256 fp32 default", conv, x32, cfl)
conv16 = jax.jit(lambda x: (jax.lax.conv_general_dilated(
    x, w16, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * jnp.bfloat16(0.1)).astype(jnp.bfloat16))
bench("conv3x3 256 bf16", conv16, x16, cfl)
with jax.default_matmul_precision("bfloat16"):
    conv_bf = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1)
    bench("conv3x3 256 fp32 prec=bf16", conv_bf, x32, cfl)
with jax.default_matmul_precision("tensorfloat32"):
    conv_tf = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1)
    bench("conv3x3 256 fp32 prec=tf32", conv_tf, x32, cfl)
