"""Per-stage g_a breakdown: RBWS convs vs ConvTransBlocks vs Swin internals."""
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

import flax.linen as nn
from reslic_tcm_tpu.ops.layers import ResidualBlock, ResidualBlockWithStride
from reslic_tcm_tpu.ops.window_attention import SwinTransformerBlock
from reslic_tcm_tpu.models.tcm import ConvTransBlock

PREC = os.environ.get("PROF_PREC", "bfloat16")
print(f"# device: {jax.devices()[0]} prec={PREC}", file=sys.stderr)
N = 128
rng = np.random.default_rng(0)
_fetch = jax.jit(lambda t: t.ravel()[0].astype(jnp.float32))


def timed(name, mod, shape, reps=5, flops=None):
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    with jax.default_matmul_precision(PREC):
        vs = mod.init(jax.random.PRNGKey(0), x)

        def f(inp, eps):
            with jax.default_matmul_precision(PREC):
                return mod.apply(vs, inp + eps)
        fn = jax.jit(f)
    out = fn(x, jnp.float32(0))
    np.asarray(_fetch(out))
    t0 = time.perf_counter()
    e = jnp.float32(0)
    for _ in range(reps):
        out = fn(x, e)
        e = _fetch(out) * 0.0
    np.asarray(e)
    dt = (time.perf_counter() - t0) / reps
    extra = f"  {flops/dt/1e12:5.1f} TF/s" if flops else ""
    print(f"{name:40s} {dt*1e3:8.1f} ms{extra}")


B = 8
# stage 1: 384x256, 2N=256 ch
timed("RBWS 3->256 s2 (in 768x512)", ResidualBlockWithStride(256, 2), (B, 768, 512, 3),
      flops=2 * 9 * (3 * 256 + 256 * 256) * 384 * 256 * B)
timed("CTB stage0 W (384x256)", ConvTransBlock(N, N, 8, 8, 0.0, "W"), (B, 384, 256, 256))
timed("CTB stage0 SW (384x256)", ConvTransBlock(N, N, 8, 8, 0.0, "SW"), (B, 384, 256, 256))
timed("  ResidualBlock 128 (384x256)", ResidualBlock(128), (B, 384, 256, 128),
      flops=2 * 9 * 128 * 128 * 2 * 384 * 256 * B)
timed("  SwinBlock W (384x256, hd8)", SwinTransformerBlock(128, 8, 8, 0.0, "W"), (B, 384, 256, 128))
timed("  SwinBlock SW (384x256, hd8)", SwinTransformerBlock(128, 8, 8, 0.0, "SW"), (B, 384, 256, 128))
timed("RBWS 256->256 s2 (384x256)", ResidualBlockWithStride(256, 2), (B, 384, 256, 256),
      flops=2 * 9 * (256 * 256 + 256 * 256) * 192 * 128 * B)
timed("CTB stage1 W (192x128)", ConvTransBlock(N, N, 16, 8, 0.0, "W"), (B, 192, 128, 256))
timed("CTB stage2 W (96x64)", ConvTransBlock(N, N, 32, 8, 0.0, "W"), (B, 96, 64, 256))

# conv-only 3x3 reference at stage-1 spatial
class PlainConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(256, (3, 3), padding="SAME")(x)

timed("plain conv3x3 256 (384x256)", PlainConv(), (B, 384, 256, 256),
      flops=2 * 9 * 256 * 256 * 384 * 256 * B)
