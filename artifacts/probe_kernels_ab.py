"""A/B the round-3 kernels on the real chip at TCM-Large stage-0 shapes.

1. Flash Swin sub-block: composed XLA vs Pallas 'bd' (block-diagonal)
   vs 'hp' (head-packed) layouts.
2. ResidualBlock: composed XLA convs vs the fused Pallas kernel
   (ops/fused_conv.py), plus correctness vs the composed path.

Timing syncs by fetching a scalar with a data dependency on the output
(block_until_ready does not synchronize through the axon tunnel)."""
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

from reslic_tcm_tpu.ops import layers as L
from reslic_tcm_tpu.ops import window_attention as W

B, H, Wd, C = 8, 384, 256, 128
print(f"# device: {jax.devices()[0]}  shape=({B},{H},{Wd},{C})",
      file=sys.stderr)

_fetch = jax.jit(lambda t: jnp.sum(t).astype(jnp.float32))


def timed(name, fn, reps=5):
    out = None

    def run():
        nonlocal out
        out = np.asarray(_fetch(fn()))

    run()
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:44s} {dt:8.1f} ms   (sum={out:.4f})")
    return dt, out


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, Wd, C)).astype(np.float32),
                jnp.bfloat16)

with jax.default_matmul_precision("bfloat16"):
    # ---- Swin sub-block (type SW exercises the shift masks) ----
    m = W.SwinTransformerBlock(dim=C, head_dim=8, window_size=8, type="SW")
    v = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda vv, xx: m.apply(vv, xx))

    W.enable_fused_attention(False)
    _, ref = timed("swin composed XLA", lambda: f(v, x))
    for layout in ("bd", "hp"):
        W.enable_fused_attention(True, layout=layout)
        fl = jax.jit(lambda vv, xx: m.apply(vv, xx))
        _, got = timed(f"swin flash layout={layout}", lambda: fl(v, x))
        print(f"   vs composed sum drift: {abs(float(got) - float(ref)):.4e}")
    W.enable_fused_attention(False)

    # ---- ResidualBlock ----
    rb = L.ResidualBlock(features=C)
    vr = rb.init(jax.random.PRNGKey(1), x)
    fr = jax.jit(lambda vv, xx: rb.apply(vv, xx))
    _, ref = timed("residualblock composed XLA", lambda: fr(vr, x))

    L.enable_fused_convs(True)
    frf = jax.jit(lambda vv, xx: rb.apply(vv, xx))
    _, got = timed("residualblock fused pallas", lambda: frf(vr, x))
    L.enable_fused_convs(False)
    print(f"   vs composed sum drift: {abs(float(got) - float(ref)):.4e}")

    # element-wise correctness on a small slab
    xs = x[:1, :64, :64]
    L.enable_fused_convs(True)
    a = np.asarray(jax.jit(lambda vv, xx: rb.apply(vv, xx))(vr, xs),
                   np.float32)
    L.enable_fused_convs(False)
    b = np.asarray(jax.jit(lambda vv, xx: rb.apply(vv, xx))(vr, xs),
                   np.float32)
    print(f"rb fused-vs-composed maxerr (bf16): "
          f"{np.abs(a - b).max():.4e}")

    # ---- RBWS conv2+GDN+skip at stage-0 (the 929 GFLOP case is C=256
    # at 384x256; conv1 output feeds it, skip comes from the 1x1) ----
    C2 = 256
    x2 = jnp.asarray(rng.normal(size=(B, 384, 256, C2)).astype(np.float32),
                     jnp.bfloat16)
    rbws = L.ResidualBlockWithStride(features=C2, stride=2)
    # drive conv2+gdn directly: build params, call the fused vs composed tail
    vimg = jnp.asarray(rng.normal(size=(B, 768, 512, 3)).astype(np.float32),
                       jnp.bfloat16)
    vws = rbws.init(jax.random.PRNGKey(2), vimg)
    fws = jax.jit(lambda vv, xx: rbws.apply(vv, xx))
    _, ref = timed("rbws (conv1+conv2+gdn+skip) XLA", lambda: fws(vws, vimg))
    L.enable_fused_convs(True)
    fwsf = jax.jit(lambda vv, xx: rbws.apply(vv, xx))
    _, got = timed("rbws with fused conv2+gdn", lambda: fwsf(vws, vimg))
    L.enable_fused_convs(False)
    print(f"   vs composed sum drift: {abs(float(got) - float(ref)):.4e}")

    rbu = L.ResidualBlockUpsample(features=C2, upsample=2)
    xu = jnp.asarray(rng.normal(size=(B, 192, 128, C2)).astype(np.float32),
                     jnp.bfloat16)
    vu = rbu.init(jax.random.PRNGKey(3), xu)
    fu = jax.jit(lambda vv, xx: rbu.apply(vv, xx))
    _, ref = timed("rbu (subpel+conv+igdn) XLA", lambda: fu(vu, xu))
    L.enable_fused_convs(True)
    fuf = jax.jit(lambda vv, xx: rbu.apply(vv, xx))
    _, got = timed("rbu with fused conv+igdn", lambda: fuf(vu, xu))
    L.enable_fused_convs(False)
    print(f"   vs composed sum drift: {abs(float(got) - float(ref)):.4e}")
