"""Measure the fused one-program device-coder profile on the real chip."""
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

N, M = 128, 320
B, H, W = 8, 768, 512
MP = B * H * W / 1e6
K = int(os.environ.get("K", "1024"))
PREC = os.environ.get("PROF_PREC", "bfloat16")

print(f"# device: {jax.devices()[0]} K={K} prec={PREC}", file=sys.stderr)
t0 = time.time()
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True)
if PREC != "none":
    codec.set_matmul_precision(PREC)

# same trained-statistics weight shaping as bench.py
params = jax.tree_util.tree_map(lambda x: x, codec.params)
last_ga = sorted(params["g_a"].keys(), key=lambda s: int(s.split("_")[1]))[-1]
last_ha = sorted(params["h_a"].keys(), key=lambda s: int(s.split("_")[1]))[-1]
for seq, layer in (("g_a", last_ga), ("h_a", last_ha)):
    leaf = params[seq][layer]["conv"]
    leaf["kernel"] = leaf["kernel"] * 0.02
    leaf["bias"] = leaf["bias"] * 0.02
ga_leaf = params["g_a"][last_ga]["conv"]
ch_scale = np.ones((ga_leaf["kernel"].shape[-1],), np.float32)
ch_scale[32:] = 1e-3
ga_leaf["kernel"] = ga_leaf["kernel"] * ch_scale
ga_leaf["bias"] = ga_leaf["bias"] * ch_scale
for i in range(codec.module.num_slices):
    for nm in ("cc_scale", "cc_mean"):
        leaf = params[f"{nm}_{i}"]["layers_4"]["conv"]
        leaf["kernel"] = leaf["kernel"] * 0.02
        leaf["bias"] = leaf["bias"] * (0.0 if nm == "cc_scale" else 0.02)
codec.variables = {"params": params}
codec.update()
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)


def img(seed):
    r = np.random.default_rng(seed)
    g = r.uniform(size=(1, H // 16, W // 16, 3))
    im = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    return np.clip(im + r.normal(0, 0.02, im.shape), 0, 1).astype(np.float32)



def _rt(codec, xs, K):
    encs = [codec.compress_device_analytic(x, k=K) for x in xs]
    return [{"x_hat": codec.decompress_device_analytic(e)["x_hat"]} for e in encs]

x = jnp.asarray(np.concatenate([img(i) for i in range(B)], axis=0))

t0 = time.time()
enc = codec.compress_device_analytic(x, k=K)
dec = codec.decompress_device_analytic(enc)
xh = np.asarray(dec["x_hat"])
print(f"# compile {time.time()-t0:.0f}s nbytes={enc['nbytes']} "
      f"bpp={enc['nbytes']*8/(B*H*W):.3f}", file=sys.stderr)

# correctness: must match the forward-eval reconstruction exactly
out = codec.forward(x, training=False)
ref = np.asarray(jnp.clip(out["x_hat"], 0, 1))
err = float(np.max(np.abs(xh - ref)))
print(f"# roundtrip max err vs forward: {err}", file=sys.stderr)
assert err == 0.0, "BIT-IDENTITY BROKEN between fused enc/dec programs"

for _ in range(2):
    t0 = time.perf_counter()
    enc = codec.compress_device_analytic(x, k=K)
    t1 = time.perf_counter()
    dec = codec.decompress_device_analytic(enc)
    np.asarray(dec["x_hat"])
    t2 = time.perf_counter()
    print(f"enc={1000*(t1-t0):.0f}ms dec={1000*(t2-t1):.0f}ms "
          f"roundtrip {MP/(t2-t0):.2f} MP/s")

# streamed duplex over 3 batches
xs = [jnp.asarray(np.concatenate([img(100 + j * B + i) for i in range(B)], 0))
      for j in range(3)]
outs = _rt(codec, xs, K)
for o in outs:
    np.asarray(o["x_hat"])
t0 = time.perf_counter()
outs = _rt(codec, xs, K)
for o in outs:
    np.asarray(o["x_hat"])
dt = time.perf_counter() - t0
print(f"pipelined 3x: {3*MP/dt:.2f} MP/s ({dt*1000:.0f}ms)")
