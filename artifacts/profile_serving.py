"""End-to-end serving-profile measurement: packed-input analytic fused
encode + raw-u8 fused decode, serial and pipelined."""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from reslic_tcm_tpu.models.base import unshuffle_u8
from reslic_tcm_tpu.models.tcm import make_tcm

N, M = 128, 320
B, H, W = int(os.environ.get("B", "8")), 768, 512
MP = B * H * W / 1e6
K = int(os.environ.get("K", "4096"))
NBATCH = int(os.environ.get("NBATCH", "3"))

print(f"# device: {jax.devices()[0]} K={K}", file=sys.stderr)
t0 = time.time()
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True,
                 dtype=jnp.bfloat16 if os.environ.get("DTYPE")=="bf16" else None)
codec.set_matmul_precision("bfloat16")
if os.environ.get("FUSED", "1") == "1":
    from reslic_tcm_tpu.ops.window_attention import enable_fused_attention
    enable_fused_attention(True)
    print("# fused attention ON", file=sys.stderr)

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
        leaf["bias"] = leaf["bias"] * (0.0 if nm == "cc_mean" else 0.0) + leaf["bias"] * 0.02
codec.variables = {"params": params}
codec.update()
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)


def img(seed):
    r = np.random.default_rng(seed)
    g = r.uniform(size=(1, H // 16, W // 16, 3))
    im = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    return np.clip(im + r.normal(0, 0.02, im.shape), 0, 1).astype(np.float32)


def packed_batch(s0):
    return jnp.asarray(
        np.concatenate([img(s0 + i) for i in range(B)], 0).reshape(B, H, W * 3)
    )


x = packed_batch(0)
t0 = time.time()
enc = codec.compress_device_analytic(x, k=K)
dec = codec.decompress_device_analytic(enc, raw_u8=True)
raw = np.asarray(dec["rgb_raw"])
print(f"# compile {time.time()-t0:.0f}s bpp={enc['nbytes']*8/(B*H*W):.3f}",
      file=sys.stderr)

# correctness vs forward (f32 path)
img_u8 = unshuffle_u8(raw)
out = codec.forward(jnp.asarray(np.asarray(x).reshape(B, H, W, 3)), training=False)
ref8 = np.round(np.asarray(jnp.clip(out["x_hat"], 0, 1)) * 255).astype(np.uint8)
err = int(np.max(np.abs(img_u8.astype(int) - ref8.astype(int))))
print(f"# u8 max err vs fp32-precision forward: {err}", file=sys.stderr)

for it in range(2):
    t0 = time.perf_counter()
    enc = codec.compress_device_analytic(x, k=K)
    t1 = time.perf_counter()
    dec = codec.decompress_device_analytic(enc, raw_u8=True)
    raw = np.asarray(dec["rgb_raw"])
    t2 = time.perf_counter()
    print(f"enc={1000*(t1-t0):.0f}ms dec+fetch={1000*(t2-t1):.0f}ms "
          f"roundtrip {MP/(t2-t0):.2f} MP/s")

# pipelined duplex: encode all batches (async), decode + fetch in threads
xs = [packed_batch(100 + j * B) for j in range(NBATCH)]


def run_pipe():
    t0 = time.perf_counter()
    outs = codec.serve_roundtrip_pipelined(xs, k=K)
    dt = time.perf_counter() - t0
    return dt, outs


run_pipe()
dt = min(run_pipe()[0] for _ in range(2))
print(f"pipelined {NBATCH}x: {NBATCH*MP/dt:.2f} MP/s ({dt*1000:.0f}ms)")


# metrics profile: on-device PSNR, only container+scalars cross the link
def run_metrics():
    t0 = time.perf_counter()
    outs = codec.serve_roundtrip_metrics(xs, k=K)
    dt = time.perf_counter() - t0
    return dt, outs

dtm, outs = run_metrics()
dtm = min(dtm, run_metrics()[0], run_metrics()[0])
ps = np.concatenate([o["psnr"] for o in outs])
print(f"metrics-pipeline {NBATCH}x: {NBATCH*MP/dtm:.2f} MP/s ({dtm*1000:.0f}ms) psnr_mean={ps.mean():.2f}")
