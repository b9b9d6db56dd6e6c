"""Stage-level timing of the TCM codec pipeline on the real chip.

Times each jitted device program (analysis, hyper, per-slice params/quant/
finish, pack, synth), the packed D2H transfer, host rANS, and the device
coder's scan programs, to locate the bottleneck for the >20 MP/s goal.
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
MP = B * H * W / 1e6

dev = jax.devices()[0]
print(f"# device: {dev}", file=sys.stderr)

t0 = time.time()
codec = make_tcm(N=N, M=M, rng=jax.random.PRNGKey(0), fast_init=True)
module = codec.module
prec = os.environ.get("PROF_PREC")
if prec:
    codec.set_matmul_precision(prec)
    print(f"# matmul_precision={prec}", file=sys.stderr)
codec.update()
print(f"# init {time.time()-t0:.0f}s", file=sys.stderr)

x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, H, W, 3)), jnp.float32)
x = jax.device_put(x, dev)

scale_table = jnp.asarray(codec.gaussian_conditional.scale_table)
y_shape = (H // 16, W // 16)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t) / reps * 1000
    print(f"{name:28s} {dt:8.1f} ms")
    return out


analysis = codec._jit("analysis_0", lambda v, xx: module.apply(
    v, xx, 0, method=ChannelARModule.analysis))
y, z, z_hat = timeit("analysis (g_a+h_a+round)", analysis, codec.variables, x)

hyper = codec._jit("hyper_0", lambda v, zz: module.apply(
    v, zz, 0, method=ChannelARModule.hyper_synthesis))
latent_means, latent_scales = timeit("hyper_synthesis", hyper, codec.variables, z_hat)

syms, idxs, y_hat_slices = [], [], []
t_params = t_quant = t_finish = 0.0
for i in range(module.num_slices):
    step = codec._jit(f"dec_params_{i}_{y_shape}_{B}", codec._make_params_fn(i, y_shape))
    jax.block_until_ready(step(codec.variables, latent_means, latent_scales, scale_table, *y_hat_slices))
    t = time.time()
    for _ in range(3):
        mu, indexes, mean_support = step(codec.variables, latent_means, latent_scales, scale_table, *y_hat_slices)
        jax.block_until_ready(mu)
    t_params += (time.time() - t) / 3 * 1000

    quant = codec._jit(f"quant_{i}", lambda v, yy, m, _i=i: module.apply(
        v, _i, yy, m, method=ChannelARModule.quantize_slice))
    jax.block_until_ready(quant(codec.variables, y, mu))
    t = time.time()
    for _ in range(3):
        sym = quant(codec.variables, y, mu)
        jax.block_until_ready(sym)
    t_quant += (time.time() - t) / 3 * 1000

    finish = codec._jit(f"dec_finish_{i}_{B}", codec._make_finish_fn(i))
    jax.block_until_ready(finish(codec.variables, mean_support, sym, mu))
    t = time.time()
    for _ in range(3):
        fs = finish(codec.variables, mean_support, sym, mu)
        jax.block_until_ready(fs)
    t_finish += (time.time() - t) / 3 * 1000
    y_hat_slices.append(fs)
    syms.append(sym)
    idxs.append(indexes)

print(f"{'5x dec_params':28s} {t_params:8.1f} ms")
print(f"{'5x quant':28s} {t_quant:8.1f} ms")
print(f"{'5x finish (dequant+LRP)':28s} {t_finish:8.1f} ms")

pack8 = codec._jit("pack_i8", lambda v, s, ii, zz: module.apply(
    v, list(s), list(ii), zz, method=ChannelARModule.pack_for_host_i8))
packed8 = timeit("pack_i8", pack8, codec.variables, tuple(syms), tuple(idxs), z)

t = time.time()
for _ in range(3):
    host = np.asarray(packed8)
t_d2h = (time.time() - t) / 3 * 1000
print(f"{'D2H packed int8':28s} {t_d2h:8.1f} ms   ({host.nbytes/1e6:.2f} MB)")

# host rANS encode
n = y_shape[0] * y_shape[1] * M
symbols = host[:, :n].astype(np.int32)
indexes_h = host[:, n:2 * n].view(np.uint8).astype(np.int32)
t_tab = codec.gaussian_conditional.tables
from reslic_tcm_tpu.coding.rans import encode_with_indexes
from concurrent.futures import ThreadPoolExecutor

def enc_one(i):
    return encode_with_indexes(symbols[i], indexes_h[i], t_tab.quantized_cdf,
                               t_tab.cdf_length, t_tab.offset)

with ThreadPoolExecutor(max_workers=8) as pool:
    list(pool.map(enc_one, range(B)))
t = time.time()
for _ in range(3):
    with ThreadPoolExecutor(max_workers=8) as pool:
        strings = list(pool.map(enc_one, range(B)))
t_rans = (time.time() - t) / 3 * 1000
print(f"{'host rANS enc (8 thr)':28s} {t_rans:8.1f} ms   ({sum(len(s) for s in strings)/1e3:.0f} KB)")

# decode-side H2D of symbols per slice
sym16 = np.ascontiguousarray(symbols[:, :n // 5].astype(np.int16).reshape(B, y_shape[0], y_shape[1], -1))
t = time.time()
for _ in range(3):
    d = jax.device_put(sym16, dev)
    jax.block_until_ready(d)
t_h2d = (time.time() - t) / 3 * 1000
print(f"{'H2D syms 1 slice':28s} {t_h2d:8.1f} ms   ({sym16.nbytes/1e6:.2f} MB)")

idx_np_1 = np.ascontiguousarray(indexes_h[:, :n // 5].astype(np.uint8))
from reslic_tcm_tpu.coding.rans import RansDecoder
decs = [RansDecoder() for _ in range(B)]
for i, d in enumerate(decs):
    d.set_stream(strings[i])

def dec_one(j):
    return decs[j].decode_stream(idx_np_1[j].reshape(-1), t_tab.quantized_cdf,
                                 t_tab.cdf_length, t_tab.offset)

t = time.time()
with ThreadPoolExecutor(max_workers=8) as pool:
    list(pool.map(dec_one, range(B)))
t_rdec = (time.time() - t) * 1000
print(f"{'host rANS dec 1 slice (8thr)':28s} {t_rdec:8.1f} ms")

# indexes D2H per slice (uint8)
idx_dev = idxs[0]
t = time.time()
for _ in range(3):
    _ = np.asarray(idx_dev)
t_idxd2h = (time.time() - t) / 3 * 1000
print(f"{'D2H idx 1 slice (uint8)':28s} {t_idxd2h:8.1f} ms")

synth = codec._jit("synth_0", lambda v, yy: module.apply(
    v, yy, 0, method=ChannelARModule.synthesize))
y_hat = jnp.concatenate(y_hat_slices, axis=-1)
timeit("synthesize (g_s)", synth, codec.variables, y_hat)

# device coder scans
from reslic_tcm_tpu.coding import device_rans as dr
(yt_all, et_all) = codec._device_tables(0)
yt, y_inv, y_packed = yt_all[:3], yt_all[3], yt_all[4]
k = 1024
n_total = B * module.num_slices * (n // 5)
sym_cat = jnp.concatenate([s.reshape(-1).astype(jnp.int32) for s in syms])
idx_cat = jnp.concatenate([i.reshape(-1).astype(jnp.int32) for i in idxs])
cap = max(64, n_total // k)
enc_fn = jax.jit(lambda s, ii: dr.encode_interleaved(s, ii, *yt, k=k, cap=cap, packed=y_packed))
words, counts, ovf = timeit(f"dev rANS enc (k={k})", enc_fn, sym_cat, idx_cat)
print(f"  n={n_total} -> {n_total/1e6:.2f} Msym, ovf={bool(ovf)}")

dec_fn = jax.jit(lambda w, c, ii: dr.decode_interleaved(
    w, c, ii, *yt, n=n_total, k=k, inverse=y_inv, packed=y_packed))
timeit(f"dev rANS dec (k={k})", dec_fn, words, counts, idx_cat)
