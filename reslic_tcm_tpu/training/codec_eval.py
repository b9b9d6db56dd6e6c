"""Real-codec evaluation during/after training (reference
training/step.py:222-312): pad each file to a multiple of 2^6, run
compress -> decompress through the actual rANS coder, and report average
bpp / PSNR / MS-SSIM computed from the decoded pixels and true stream sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import read_image
from ..ops.math import compute_padding, crop_nhwc, pad_nhwc
from ..utils.helper import AverageMeter
from ..utils.metrics import ms_ssim, psnr


def bpp_calculation(num_pixels: int, strings) -> tuple[float, float, float]:
    """(total, hyper, main) bpp from stream lengths (reference step.py:297-312)."""
    bpp_hyper = sum(len(s) for s in strings[1]) * 8.0 / num_pixels
    bpp_main = len(strings[0][0]) * 8.0 / num_pixels
    return bpp_hyper + bpp_main, bpp_hyper, bpp_main


def compress_with_ac(codec, filelist, lv: int = 0, min_div: int = 64,
                     wandb_run=None, epoch: int = 0, verbose: bool = True):
    """Average (bpp, psnr) over image files via the real codec path."""
    bpp_m, psnr_m, ssim_m = AverageMeter(), AverageMeter(), AverageMeter()
    for i, path in enumerate(filelist):
        x = jnp.asarray(read_image(path))[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, min_div=min_div)
        x_padded = pad_nhwc(x, pad)

        try:
            enc = codec.compress(x_padded, lv=lv)
            dec = codec.decompress(enc["strings"], enc["shape"], lv=lv)
        except TypeError:
            try:  # gain codecs use (s, l) discrete/interp levels
                enc = codec.compress(x_padded, s=lv)
                dec = codec.decompress(enc["strings"], enc["shape"], s=lv)
            except TypeError:  # codecs without a rate level argument
                enc = codec.compress(x_padded)
                dec = codec.decompress(enc["strings"], enc["shape"])

        x_hat = crop_nhwc(jnp.clip(dec["x_hat"], 0, 1), pad)
        bpp, bpp_h, bpp_y = bpp_calculation(h * w, enc["strings"])
        p = float(psnr(x, x_hat))
        bpp_m.update(bpp)
        psnr_m.update(p)
        try:
            ssim_m.update(float(ms_ssim(x, x_hat)))
        except ValueError:
            pass  # image too small for 5-scale MS-SSIM
        if verbose:
            print(f"[{i}] bpp={bpp:.4f} (y={bpp_y:.4f} z={bpp_h:.4f}) psnr={p:.2f}")

    if wandb_run is not None:
        wandb_run.log({
            "compress": epoch,
            "compress/bpp_with_ac": bpp_m.avg,
            "compress/psnr_with_ac": psnr_m.avg,
            "compress/mssim_with_ac": ssim_m.avg,
        })
    return bpp_m.avg, psnr_m.avg
