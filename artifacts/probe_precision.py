"""Probe MXU rates: fp32 vs bf16 matmul/conv on this chip, and precision knobs."""
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


def bench(name, fn, *args, flops=None, reps=5):
    out = jax.block_until_ready(fn(*args))
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t) / reps
    tf = (flops / dt / 1e12) if flops else 0
    print(f"{name:44s} {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s")


k = 4096
a32 = jnp.ones((k, k), jnp.float32)
b32 = jnp.ones((k, k), jnp.float32)
a16 = a32.astype(jnp.bfloat16)
b16 = b32.astype(jnp.bfloat16)
fl = 2 * k**3

mm = jax.jit(lambda x, y: x @ y)
bench("matmul fp32 default", mm, a32, b32, flops=fl)
bench("matmul bf16", mm, a16, b16, flops=fl)

mm_hi = jax.jit(lambda x, y: jax.lax.dot(x, y, precision=jax.lax.Precision.HIGHEST))
bench("matmul fp32 HIGHEST", mm_hi, a32, b32, flops=fl)
mm_def = jax.jit(lambda x, y: jax.lax.dot(x, y, precision=jax.lax.Precision.DEFAULT))
bench("matmul fp32 DEFAULT", mm_def, a32, b32, flops=fl)

# f32 output from bf16 inputs (accumulate fp32)
mm_pref = jax.jit(lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32))
bench("matmul bf16->f32 acc", mm_pref, a16, b16, flops=fl)

# conv3x3 256ch at 384x256, B=8 (the g_a hot stage shape)
B, H, W, C = 8, 384, 256, 256
x32 = jnp.ones((B, H, W, C), jnp.float32)
w32 = jnp.ones((3, 3, C, C), jnp.float32)
cfl = 2 * 9 * C * C * H * W * B

conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
bench("conv3x3 256 fp32 default", conv, x32, w32, flops=cfl)
bench("conv3x3 256 bf16", conv, x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), flops=cfl)

conv_pref = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.float32))
bench("conv3x3 256 bf16->f32 acc", conv_pref, x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16), flops=cfl)

with jax.default_matmul_precision("bfloat16"):
    conv_bf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    bench("conv3x3 256 fp32 matmul-prec=bf16", conv_bf, x32, w32, flops=cfl)

with jax.default_matmul_precision("tensorfloat32"):
    conv_tf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    bench("conv3x3 256 fp32 matmul-prec=tf32", conv_tf, x32, w32, flops=cfl)

# strided conv 3->256 (first layer, tiny Cin)
w0 = jnp.ones((3, 3, 3, 256), jnp.float32)
x0 = jnp.ones((8, 768, 512, 3), jnp.float32)
c0fl = 2 * 9 * 3 * 256 * 384 * 256 * 8
conv_s2 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
    x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
bench("conv3x3 3->256 s2 fp32", conv_s2, x0, w0, flops=c0fl)
