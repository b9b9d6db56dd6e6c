"""Why is ANY formulation of the 3-channel input conv slow? Raw variants."""
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

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
rng = np.random.default_rng(0)
_fetch = jax.jit(lambda t: t.ravel()[0].astype(jnp.float32))
B, H, W = 8, 768, 512
x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
w9 = jnp.asarray(rng.normal(0, 0.1, (27, 256)).astype(np.float32))


def timed(name, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(_fetch(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        np.asarray(_fetch(out))
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms")
    return out


timed("identity+1 on [8,768,512,3]", lambda t: t + 1.0, x)
timed("pad HW by 1", lambda t: jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0))), x)
timed("transpose to NCHW", lambda t: t.transpose(0, 3, 1, 2), x)


def patches_nhwc(t):
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [jax.lax.slice(tp, (0, a, b, 0), (B, a + 767, b + 511, 3), (1, 2, 2, 1))
         for a in range(3) for b in range(3)], axis=-1)


pt = timed("patches NHWC (9 strided slices)", patches_nhwc, x)
timed("einsum patches@w [*,27]@[27,256]", lambda t: jnp.einsum("bhwc,cf->bhwf", t, w9), pt)
timed("full patch-dot NHWC", lambda t: jnp.einsum("bhwc,cf->bhwf", patches_nhwc(t), w9), x)


def patch_nchw(t):
    tc = t.transpose(0, 3, 1, 2)  # [B,3,H,W] dense minor dims
    tp = jnp.pad(tc, ((0, 0), (0, 0), (1, 1), (1, 1)))
    pats = jnp.stack(
        [jax.lax.slice(tp, (0, 0, a, b), (B, 3, a + 767, b + 511), (1, 1, 2, 2))
         for a in range(3) for b in range(3)], axis=1)  # [B, 9, 3, Ho, Wo]
    return pats.reshape(B, 27, 384, 256)


pc = timed("patches NCHW", patch_nchw, x)
timed("einsum NCHW patches", lambda t: jnp.einsum("bchw,cf->bhwf", t, w9), pc)
timed("full patch-dot NCHW", lambda t: jnp.einsum("bchw,cf->bhwf", patch_nchw(t), w9), x)

# host-side preprocessed: if input arrived as [B,H/2,W/2,12] already
x12 = jnp.asarray(rng.normal(0, 1, (B, 384, 256, 12)).astype(np.float32))
w12 = jnp.asarray(rng.normal(0, 0.1, (2, 2, 12, 256)).astype(np.float32))
timed("conv2x2 12->256 (s2d-style)", lambda t: jax.lax.conv_general_dilated(
    t, w12, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")), x12)
w48 = jnp.asarray(rng.normal(0, 0.1, (48, 256)).astype(np.float32))


def pd12(t):
    tp = jnp.pad(t, ((0, 0), (1, 0), (1, 0), (0, 0)))
    pats = jnp.concatenate(
        [jax.lax.slice(tp, (0, a, b, 0), (B, a + 384, b + 256, 12))
         for a in range(2) for b in range(2)], axis=-1)
    return jnp.einsum("bhwc,cf->bhwf", pats, w48)


timed("patch-dot 12ch s2d", pd12, x12)
