"""Measure per-call dispatch overhead on the axon tunnel:
(a) trivial chained jit calls, (b) calls passing a large param pytree,
(c) calls with params closed over (baked into the executable)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

print("device:", jax.devices()[0])
_first = jax.jit(lambda v: v.ravel()[0].astype(jnp.float32))


def sync(x):
    np.asarray(_first(x))


# (a) trivial chain
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 8), jnp.float32)
y = f(x); sync(y)
t = time.time()
y = x
for _ in range(50):
    y = f(y)
sync(y)
print(f"trivial chained call      {(time.time()-t)/50*1e3:8.2f} ms/call")

# (b) big pytree arg (mimic codec variables: ~600 leaves, ~75M params)
rng = np.random.default_rng(0)
tree = {f"layer_{i}": {"kernel": jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32)),
                       "bias": jnp.asarray(np.zeros(128, np.float32))}
        for i in range(300)}
g = jax.jit(lambda v, x: x + v["layer_0"]["kernel"][0, 0])
y = g(tree, x); sync(y)
t = time.time()
y = x
for _ in range(50):
    y = g(tree, y)
sync(y)
print(f"600-leaf pytree arg       {(time.time()-t)/50*1e3:8.2f} ms/call")

# (c) params closed over
h = jax.jit(lambda x: x + tree["layer_0"]["kernel"][0, 0])
y = h(x); sync(y)
t = time.time()
y = x
for _ in range(50):
    y = h(y)
sync(y)
print(f"params closed over        {(time.time()-t)/50*1e3:8.2f} ms/call")

# (d) python-side flatten cost only
t = time.time()
for _ in range(200):
    jax.tree_util.tree_flatten(tree)
print(f"tree_flatten alone        {(time.time()-t)/200*1e3:8.2f} ms/call")

# (e) big-compute chained conv (real work, chained) fp32 vs prec-bf16
B, H, W, C = 8, 384, 256, 256
w32 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.01)
x32 = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
cfl = 2 * 9 * C * C * H * W * B
conv = jax.jit(lambda x: jax.lax.conv_general_dilated(
    x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1)
y = conv(x32); sync(y)
t = time.time()
y = x32
for _ in range(10):
    y = conv(y)
sync(y)
dt = (time.time() - t) / 10
print(f"conv fp32 chained         {dt*1e3:8.2f} ms/call  {cfl/dt/1e12:6.1f} TF/s")
with jax.default_matmul_precision("bfloat16"):
    convb = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1)
    y = convb(x32); sync(y)
    t = time.time()
    y = x32
    for _ in range(10):
        y = convb(y)
    sync(y)
    dt = (time.time() - t) / 10
print(f"conv prec=bf16 chained    {dt*1e3:8.2f} ms/call  {cfl/dt/1e12:6.1f} TF/s")

# (f) does the matmul-precision context INSIDE a jitted body work?
def body(x):
    with jax.default_matmul_precision("bfloat16"):
        return jax.lax.conv_general_dilated(
            x, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) * 0.1
convi = jax.jit(body)
y = convi(x32); sync(y)
t = time.time()
y = x32
for _ in range(10):
    y = convi(y)
sync(y)
dt = (time.time() - t) / 10
print(f"conv ctx-inside-jit       {dt*1e3:8.2f} ms/call  {cfl/dt/1e12:6.1f} TF/s")
