"""Benchmark: TCM encode+decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.json): TCM-Large (N=128) encode+decode
> 20 megapixels/sec/chip on TPU v5e. vs_baseline = value / 20.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=320)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from reslic_tcm_tpu.models.tcm import make_tcm

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    codec = make_tcm(N=args.N, M=args.M, input_shape=(args.height, args.width))
    codec.update()

    rng = np.random.default_rng(0)
    g = rng.uniform(size=(1, args.height // 16, args.width // 16, 3))
    img = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    img = np.clip(img + rng.normal(scale=0.02, size=img.shape), 0, 1)
    x = jnp.asarray(img, jnp.float32)

    # warmup (compiles encoder/decoder programs)
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        enc = codec.compress(x)
        dec = codec.decompress(enc["strings"], enc["shape"])
        jax.block_until_ready(dec["x_hat"])
        best = min(best, time.perf_counter() - t0)

    mp = args.height * args.width / 1e6
    mps = mp / best
    nbytes = len(enc["strings"][0][0]) + sum(len(s) for s in enc["strings"][1])
    bpp = nbytes * 8 / (args.height * args.width)
    print(f"# best={best*1000:.1f}ms bpp={bpp:.3f}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"tcm_n{args.N}_encdec_throughput",
                "value": round(mps, 3),
                "unit": "MP/s/chip",
                "vs_baseline": round(mps / 20.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
