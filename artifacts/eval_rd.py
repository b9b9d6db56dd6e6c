"""RD evaluation harness: forward-estimate vs real-coded (bpp, PSNR).

Evaluates a trained checkpoint on a held-out image directory with BOTH the
differentiable forward estimate and the real rANS codec path (the M3 gate
from SURVEY §7: coded bpp must track the likelihood estimate to <1%), and
writes docs/RD_RESULTS.md + a JSON record.

Usage:
  python artifacts/eval_rd.py --ckpt runs/<...>/_very_best.ckpt \
      --data data_synth/test/data --N 64 --lmbda 0.0025
"""
import argparse
import json
import math
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
if os.environ.get("EVAL_RD_CPU"):
    # config API beats the hosted TPU plugin's JAX_PLATFORMS override
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default="data_synth/test/data")
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--M", type=int, default=320)
    ap.add_argument("--lmbda", type=float, default=0.0025)
    ap.add_argument("--out", default="docs/RD_RESULTS.md")
    ap.add_argument("--max-images", type=int, default=0)
    args = ap.parse_args()

    from reslic_tcm_tpu.data.datasets import list_images, read_image
    from reslic_tcm_tpu.models.tcm import make_tcm
    from reslic_tcm_tpu.ops.math import compute_padding, crop_nhwc, pad_nhwc
    from reslic_tcm_tpu.utils.checkpoint import load_checkpoint
    from reslic_tcm_tpu.utils.metrics import compute_psnr

    net = make_tcm(N=args.N, M=args.M, input_shape=(256, 256))
    restored = load_checkpoint(args.ckpt)
    state = restored.get("state", restored)
    params = state["params"] if "params" in state else state
    net.variables = {"params": params}
    extra = restored.get("extra") or {}
    net.update()

    imgs = list_images(args.data)
    if args.max_images:
        imgs = imgs[: args.max_images]
    rows = []
    for path in imgs:
        x = jnp.asarray(read_image(path))[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, 128)
        xp = pad_nhwc(x, pad)
        n_px = h * w

        out = net.forward(xp, training=False)
        est_bpp = float(sum(-jnp.log2(l).sum()
                            for l in out["likelihoods"].values())) / n_px
        x_hat_f = crop_nhwc(jnp.clip(out["x_hat"], 0, 1), pad)
        est_psnr = compute_psnr(x, x_hat_f)

        t0 = time.time()
        enc = net.compress(xp)
        dec = net.decompress(enc["strings"], enc["shape"])
        dt = time.time() - t0
        nbytes = len(enc["strings"][0][0]) + sum(
            len(s) for s in enc["strings"][1])
        real_bpp = nbytes * 8.0 / n_px
        x_hat_r = crop_nhwc(dec["x_hat"], pad)
        real_psnr = compute_psnr(x, x_hat_r)
        bitexact = bool(jnp.array_equal(
            jnp.round(jnp.clip(x_hat_r, 0, 1) * 255),
            jnp.round(x_hat_f * 255)))

        rows.append(dict(name=os.path.basename(str(path)), est_bpp=est_bpp,
                         real_bpp=real_bpp, est_psnr=est_psnr,
                         real_psnr=real_psnr,
                         delta_pct=100 * (real_bpp - est_bpp) / est_bpp,
                         bitexact=bitexact, codec_s=dt))
        print(f"{rows[-1]['name']}: est {est_bpp:.4f} bpp / {est_psnr:.2f} dB"
              f" | coded {real_bpp:.4f} bpp / {real_psnr:.2f} dB"
              f" (+{rows[-1]['delta_pct']:.2f}%, u8-exact={bitexact})")

    m = lambda k: float(np.mean([r[k] for r in rows]))  # noqa: E731
    summary = dict(
        model=f"TCM-Small N={args.N}", lmbda=args.lmbda,
        ckpt_epoch=int(extra.get("epoch", -1)),
        val_loss=float(extra.get("val_loss", float("nan"))),
        n_images=len(rows), est_bpp=m("est_bpp"), real_bpp=m("real_bpp"),
        est_psnr=m("est_psnr"), real_psnr=m("real_psnr"),
        delta_pct=m("delta_pct"),
        all_bitexact=all(r["bitexact"] for r in rows),
    )
    print(json.dumps(summary))

    md = [
        "# RD results (round 2)",
        "",
        "Training data: the procedural natural-image-statistics corpus",
        "(`data/synthetic.py`; this environment ships no natural-image",
        "dataset and has no network egress, so the published Kodak anchors",
        "(BASELINE.md) are not directly comparable — same-corpus numbers",
        "below demonstrate the training pipeline converging and the",
        "M3 coded-vs-estimate gate).",
        "",
        f"Model: {summary['model']}, λ={args.lmbda} (BASELINE config 1/2 "
        "recipe: batch 16, 256² crops, lr 1e-4, ReduceLROnPlateau), "
        f"checkpoint epoch {summary['ckpt_epoch']}.",
        "",
        f"Held-out set: {summary['n_images']} images (512×768).",
        "",
        "| metric | forward estimate | real rANS codec |",
        "|---|---|---|",
        f"| bpp | {summary['est_bpp']:.4f} | {summary['real_bpp']:.4f} |",
        f"| PSNR (dB) | {summary['est_psnr']:.2f} | {summary['real_psnr']:.2f} |",
        "",
        f"Coded vs estimated bpp: **+{summary['delta_pct']:.2f}%** "
        "(gate: <1%). Decoded u8 reconstruction bit-exact vs the eval "
        f"forward on all images: **{summary['all_bitexact']}**.",
        "",
        "Per-image:",
        "",
        "| image | est bpp | coded bpp | Δ% | PSNR |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(f"| {r['name']} | {r['est_bpp']:.4f} | {r['real_bpp']:.4f} "
                  f"| {r['delta_pct']:+.2f} | {r['real_psnr']:.2f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(md) + "\n")
    with open(args.out.replace(".md", ".json"), "w") as f:
        json.dump(dict(summary=summary, rows=rows), f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
