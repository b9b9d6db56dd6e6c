"""Evaluation CLI (reference src/eval.py).

Same flag surface and reporting: loads a TCM checkpoint, pads each image to
a multiple of p=128, runs either the real codec path (--real:
compress -> decompress through the rANS coder) or the forward-only bpp
estimate, and reports average PSNR / MS-SSIM(dB) / bpp / wall time.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np


def parse_args(argv):
    parser = argparse.ArgumentParser(description="Example testing script.")
    parser.add_argument("--cuda", action="store_true", help="Use cuda")
    parser.add_argument(
        "--clip_max_norm",
        default=1.0,
        type=float,
        help="gradient clipping max norm (default: %(default)s",
    )
    parser.add_argument("--checkpoint", type=str, help="Path to a checkpoint")
    parser.add_argument("--data", type=str, help="Path to dataset")
    parser.add_argument("--real", action="store_true", default=True)
    parser.set_defaults(real=False)
    # framework extras
    parser.add_argument("--N", type=int, default=128)
    parser.add_argument("--M", type=int, default=320)
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--tile", type=int, default=0,
                        help="overlap-tiled inference for high-res inputs "
                             "(e.g. 512; 0 = monolithic)")
    parser.add_argument("--tile-overlap", type=int, default=64)
    parser.add_argument("--shard-spatial", type=int, default=0,
                        help="shard each image's H across this many devices "
                             "(halo-exchange sharded forward; 0 = off)")
    parser.add_argument("--device-coder", action="store_true",
                        help="with --real: use the analytic fused device "
                             "coder (TPU-native serving profile; framework "
                             "stream format) instead of the host rANS coder")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 MXU precision + flash attention "
                             "kernels (throughput mode)")
    parser.add_argument("--model", type=str, default="tcm",
                        help="registry model to evaluate (default tcm, the "
                             "reference eval's hardcoded choice; any "
                             "models_dict name works — stanh/gain variants "
                             "evaluate every rate level)")
    parser.add_argument("--lambda_list", nargs="+", type=float,
                        default=[0.0025],
                        help="rate levels for multi-rate models (gain/stanh)")
    parser.add_argument("--gauss_num_sigmoids", nargs="+", type=int,
                        default=None,
                        help="stanh models: per-level num_sigmoids the "
                             "checkpoint was trained with")
    parser.add_argument("--gauss_extrema", nargs="+", type=int, default=None,
                        help="stanh models: per-level extrema the "
                             "checkpoint was trained with")
    parser.add_argument("--gauss_trainable", nargs="+", type=str,
                        default=None,
                        help="stanh models: per-level trainable flags the "
                             "checkpoint was trained with")
    parser.add_argument("--lv", type=int, default=-1,
                        help="evaluate only this rate level (-1 = all)")
    args = parser.parse_args(argv)
    return args


def _eval_generic(args):
    """Evaluate any registry model (the reference eval.py:86 hardcodes TCM;
    this framework exposes its full model zoo through the same CLI)."""
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..data.datasets import list_images
    from ..models import get_model
    from ..training.codec_eval import compress_with_ac
    from ..utils.checkpoint import load_checkpoint
    from ..utils.metrics import compute_psnr
    from ..utils.parser import parse_args as train_parse

    img_list = list_images(args.data)
    if not img_list:
        print(f"no images under {args.data}")
        return 1
    if args.model == "scale_gain_sc":
        print("scale_gain_sc needs a quality map input; evaluate it via "
              "tests/test_gain_models.py or a custom driver")
        return 1

    targs = train_parse([])
    targs.model, targs.N, targs.M = args.model, args.N, args.M
    targs.lambda_list = args.lambda_list
    for knob in ("gauss_num_sigmoids", "gauss_extrema", "gauss_trainable"):
        v = getattr(args, knob)
        if v is not None:
            setattr(targs, knob, v)
    net, *_ = get_model(targs, input_shape=(256, 256))

    if args.checkpoint:
        print("Loading", args.checkpoint)
        restored = load_checkpoint(args.checkpoint)
        params = (restored["state"]["params"] if "state" in restored
                  else restored["params"])
        net.variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    n_levels = getattr(net.module, "n_rates",
                       getattr(net.module, "levels", 1))
    levels = [args.lv] if args.lv >= 0 else list(range(n_levels))

    if args.real:
        net.update()
        for lv in levels:
            bpp, psnr_v = compress_with_ac(net, img_list, lv=lv)
            print(f"[level {lv}] average_Bit-rate: {bpp:.3f} bpp | "
                  f"average_PSNR: {psnr_v:.2f}dB")
        return 0

    from ..data.datasets import read_image
    from ..ops.math import compute_padding, crop_nhwc, pad_nhwc

    for lv in levels:
        PSNR = Bit_rate = 0.0
        for img_path in img_list:
            x = jnp.asarray(read_image(img_path))[None]
            h, w = x.shape[1], x.shape[2]
            pad, _ = compute_padding(h, w, 128)
            xp = pad_nhwc(x, pad)
            out = net.forward(xp, training=False, lv=lv)
            x_hat = crop_nhwc(jnp.clip(out["x_hat"], 0, 1), pad)
            num_pixels = xp.shape[1] * xp.shape[2]
            Bit_rate += float(sum(
                -jnp.log2(l).sum() for l in out["likelihoods"].values()
            ) / num_pixels)
            PSNR += compute_psnr(x, x_hat)
        n = len(img_list)
        print(f"[level {lv}] average_PSNR: {PSNR/n:.2f}dB | "
              f"average_Bit-rate: {Bit_rate/n:.3f} bpp")
    return 0


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.model != "tcm":
        return _eval_generic(args)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from ..data.datasets import list_images, read_image
    from ..models.tcm import make_tcm
    from ..ops.math import compute_padding, crop_nhwc, pad_nhwc
    from ..utils.checkpoint import load_checkpoint
    from ..utils.metrics import compute_psnr, ms_ssim, msssim_to_db

    p = 128
    img_list = [f for f in list_images(args.data)]
    if not img_list:
        print(f"no images under {args.data}")
        return 1

    net = make_tcm(N=args.N, M=args.M, input_shape=(256, 256))
    if args.bf16:
        from ..ops.window_attention import enable_fused_attention

        net.set_matmul_precision("bfloat16")
        if jax.devices()[0].platform != "cpu":
            enable_fused_attention(True)
            # Fused convs stay OFF here: the eval forward keeps f32
            # activations (only matmul precision is bf16), and at eval
            # shapes the f32 operands blow the kernel's scoped-vmem
            # budget on the current toolchain ("39.50M > 16.00M limit"
            # at [1,256,384,128] — round-5 night notes). Opt back in via
            # RESLIC_EVAL_FUSED_CONVS=1 on toolchains where it fits.
            if os.environ.get("RESLIC_EVAL_FUSED_CONVS") == "1":
                from ..ops.layers import enable_fused_convs

                enable_fused_convs(True)
    if args.checkpoint:
        print("Loading", args.checkpoint)
        if args.checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            # released PyTorch checkpoints (reference README.md:41-49)
            from ..utils.torch_convert import convert_state_dict, load_torch_state_dict

            sd = load_torch_state_dict(args.checkpoint)
            params, report = convert_state_dict(sd, net.params)
            if report["missing"] or report["unused"]:
                print(f"converter: {len(report['missing'])} missing, "
                      f"{len(report['unused'])} unused torch keys")
            net.variables = {"params": params}
        else:
            restored = load_checkpoint(args.checkpoint)
            params = restored["state"]["params"] if "state" in restored else restored["params"]
            net.variables = {"params": params}

    count = 0
    PSNR = 0.0
    Bit_rate = 0.0
    MS_SSIM = 0.0
    total_time = 0.0

    if args.real:
        net.update()

    for img_path in img_list:
        img = read_image(img_path)
        x = jnp.asarray(img)[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, p)
        x_padded = pad_nhwc(x, pad)
        count += 1
        if args.real:
            s = time.time()
            if args.device_coder:
                enc = net.compress_device_analytic(x_padded)
                dec = net.decompress_device_analytic(enc)
                x_hat_full = np.asarray(dec["x_hat"])
                e = time.time()
                total_time += e - s
                x_hat = crop_nhwc(jnp.asarray(x_hat_full), pad)
                num_pixels = h * w
                bpp = enc["nbytes"] * 8.0 / num_pixels
                psnr_v = compute_psnr(x, x_hat)
                msssim_v = msssim_to_db(float(ms_ssim(x, x_hat)))
                print(f"Bitrate: {bpp:.3f}bpp")
                print(f"MS-SSIM: {msssim_v:.2f}dB")
                print(f"PSNR: {psnr_v:.2f}dB")
                Bit_rate += bpp
                PSNR += psnr_v
                MS_SSIM += msssim_v
                continue
            out_enc = net.compress(x_padded)
            out_dec = net.decompress(out_enc["strings"], out_enc["shape"])
            jax.block_until_ready(out_dec["x_hat"])
            e = time.time()
            total_time += e - s
            x_hat = crop_nhwc(out_dec["x_hat"], pad)
            num_pixels = h * w
            bpp = (len(out_enc["strings"][0][0]) + sum(
                len(t) for t in out_enc["strings"][1])) * 8.0 / num_pixels
            psnr_v = compute_psnr(x, x_hat)
            msssim_v = msssim_to_db(float(ms_ssim(x, x_hat)))
            print(f"Bitrate: {bpp:.3f}bpp")
            print(f"MS-SSIM: {msssim_v:.2f}dB")
            print(f"PSNR: {psnr_v:.2f}dB")
            Bit_rate += bpp
            PSNR += psnr_v
            MS_SSIM += msssim_v
        else:
            s = time.time()
            if args.shard_spatial:
                from jax.sharding import Mesh

                from ..parallel.spatial import mesh_sharded_forward

                n_dev = args.shard_spatial
                # pad H so every shard is a multiple of 128 (window floor)
                hp = -(-x_padded.shape[1] // (128 * n_dev)) * (128 * n_dev)
                extra = ((0, hp - x_padded.shape[1]), (0, 0))
                xs = jnp.pad(
                    x_padded, ((0, 0),) + extra + ((0, 0),), mode="edge"
                )
                mesh = Mesh(
                    np.asarray(jax.devices()[:n_dev]).reshape(n_dev),
                    ("spatial",),
                )
                halo = min(128, hp // n_dev)
                x_hat_full, bits = mesh_sharded_forward(
                    net.module, net.variables, xs, mesh, "spatial", halo=halo
                )
                jax.block_until_ready(x_hat_full)
                e = time.time()
                total_time += e - s
                x_hat = crop_nhwc(x_hat_full[:, : x_padded.shape[1]], pad)
                bpp = float(bits) / (xs.shape[1] * xs.shape[2])
            elif args.tile and max(x_padded.shape[1], x_padded.shape[2]) > args.tile:
                from ..parallel.spatial import tiled_forward

                x_hat_full, bits = tiled_forward(
                    net, x_padded, tile=args.tile, overlap=args.tile_overlap
                )
                jax.block_until_ready(x_hat_full)
                e = time.time()
                total_time += e - s
                x_hat = crop_nhwc(x_hat_full, pad)
                bpp = bits / (x_padded.shape[1] * x_padded.shape[2])
            else:
                out_net = net.forward(x_padded, training=False)
                jax.block_until_ready(out_net["x_hat"])
                e = time.time()
                total_time += e - s
                x_hat = crop_nhwc(jnp.clip(out_net["x_hat"], 0, 1), pad)
                num_pixels = x_padded.shape[1] * x_padded.shape[2]
                bpp = float(sum(
                    -jnp.log2(l).sum() for l in out_net["likelihoods"].values()
                ) / num_pixels)
            psnr_v = compute_psnr(x, x_hat)
            msssim_v = msssim_to_db(float(ms_ssim(x, x_hat)))
            print(f"PSNR: {psnr_v:.2f}dB")
            print(f"MS-SSIM: {msssim_v:.2f}dB")
            print(f"Bit-rate: {bpp:.3f}bpp")
            PSNR += psnr_v
            MS_SSIM += msssim_v
            Bit_rate += bpp

    PSNR /= count
    MS_SSIM /= count
    Bit_rate /= count
    total_time /= count
    print(f"average_PSNR: {PSNR:.2f}dB")
    print(f"average_MS-SSIM: {MS_SSIM:.4f}")
    print(f"average_Bit-rate: {Bit_rate:.3f} bpp")
    print(f"average_time: {total_time:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
