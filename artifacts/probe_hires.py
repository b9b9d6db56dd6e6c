"""On-chip high-res evidence (BASELINE config 3 / VERDICT r3 #7).

Generates 1280x1280 and 2048x1408 synthetic images, then measures the
eval forward at full resolution vs --tile 512 overlap-tiled inference:
wall ms, MP/s, and the tiled-vs-monolithic RD delta (PSNR + estimated
bpp). Single chip; the spatial mesh path (shard-spatial) is equivalence-
tested on the 8-device CPU mesh in tests/test_spatial.py and the same
halo-exchange code has no single-chip observable, so this probe focuses
on the tiling path the one real chip can evidence.

Usage: python artifacts/probe_hires.py [--N 64 --M 320] [--ckpt path]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--M", type=int, default=320)
    ap.add_argument("--ckpt")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from reslic_tcm_tpu.models.tcm import make_tcm
    from reslic_tcm_tpu.parallel.spatial import tiled_forward
    from reslic_tcm_tpu.utils.metrics import psnr

    net = make_tcm(N=args.N, M=args.M, fast_init=not args.ckpt)
    if args.ckpt:
        from reslic_tcm_tpu.utils.checkpoint import load_checkpoint

        restored = load_checkpoint(args.ckpt)
        state = restored.get("state", restored)
        params = state["params"] if "params" in state else state
        net.variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    net.set_matmul_precision("bfloat16")

    print(f"# device: {jax.devices()[0]}  tile={args.tile}", flush=True)
    for (h, w) in ((1280, 1280), (2048, 1408)):
        rng = np.random.default_rng(h)
        g = rng.uniform(size=(1, h // 32, w // 32, 3))
        x = jnp.asarray(
            np.clip(
                np.repeat(np.repeat(g, 32, 1), 32, 2)
                + rng.normal(scale=0.02, size=(1, h, w, 3)),
                0, 1,
            ),
            jnp.float32,
        )

        def run_mono():
            out = net.forward(x, training=False)
            # sync by fetching a data-dependent scalar: block_until_ready
            # does not synchronize through the axon tunnel (PERFORMANCE.md
            # measurement protocol); the tiled path syncs the same way via
            # its float(bits) fetch.
            float(jnp.sum(out["x_hat"][0, ::256, ::256]))
            return out

        def run_tiled():
            # tiled_forward's float(bits) return is the sync point; x_hat
            # stays device-resident (in-program stitch), matching mono
            xh, bits = tiled_forward(net, x, tile=args.tile, overlap=64)
            return xh, bits

        out = run_mono()  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run_mono()
        t_mono = (time.perf_counter() - t0) / args.reps * 1e3
        bpp_mono = float(sum(
            -jnp.log2(l).sum() for l in out["likelihoods"].values()
        )) / (h * w)

        xh, bits = run_tiled()  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            xh, bits = run_tiled()
        t_tile = (time.perf_counter() - t0) / args.reps * 1e3
        bpp_tile = float(bits) / (h * w)

        mono_x = jnp.clip(out["x_hat"], 0, 1)
        p_mono = float(psnr(x, mono_x))
        p_tile = float(psnr(x, jnp.clip(xh, 0, 1)))
        mp = h * w / 1e6
        print(
            f"[{h}x{w}] mono {t_mono:7.1f} ms ({mp / (t_mono / 1e3):5.2f} "
            f"MP/s) psnr={p_mono:.2f} bpp={bpp_mono:.4f} | "
            f"tile{args.tile} {t_tile:7.1f} ms ({mp / (t_tile / 1e3):5.2f} "
            f"MP/s) psnr={p_tile:.2f} bpp={bpp_tile:.4f} | "
            f"dPSNR={p_tile - p_mono:+.3f} dB dbpp="
            f"{(bpp_tile - bpp_mono) / max(bpp_mono, 1e-9) * 100:+.2f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
