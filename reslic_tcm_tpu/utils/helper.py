"""Cross-cutting helpers (reference utils/helper.py)."""

from __future__ import annotations

import math
from datetime import datetime
from os.path import join

import numpy as np

from ..entropy.annealings import configure_annealings  # re-export (helper.py:118)
from .metrics import compute_msssim, compute_psnr  # re-export

__all__ = [
    "configure_latent_space_policy",
    "configure_annealings",
    "create_savepath",
    "read_image",
    "compute_psnr",
    "compute_msssim",
    "AverageMeter",
]


def configure_latent_space_policy(args, multi: bool = False):
    """Per-lambda stanh configuration dicts (reference helper.py:16-46)."""

    def pick(v, i):
        return v[i] if isinstance(v, list) else v

    if not multi:
        return [{
            "beta": pick(args.gauss_beta, 0),
            "num_sigmoids": pick(args.gauss_num_sigmoids, 0),
            "annealing": pick(args.gauss_annealing, 0),
            "symmetry": args.symmetry,
            "gap_factor": pick(args.gauss_gp, 0),
            "extrema": pick(args.gauss_extrema, 0),
            "trainable": False,
            "removing_mean": args.removing_mean,
        }]
    out = []
    for i in range(len(args.lambda_list)):
        out.append({
            "beta": args.gauss_beta[i],
            "num_sigmoids": args.gauss_num_sigmoids[i],
            "annealing": args.gauss_annealing[i],
            "symmetry": args.symmetry,
            "gap_factor": args.gauss_gp[i],
            "extrema": args.gauss_extrema[i],
            "trainable": args.gauss_trainable[i] == "yes",
            "removing_mean": args.removing_mean,
        })
    return out


def create_savepath(args, epoch, base_path):
    """Checkpoint path scheme (reference helper.py:55-73)."""
    date_time = datetime.now().strftime("%m%d")
    c = join(date_time, "_lambda_", str(args.lambda_list[0]), "_epoch_", str(epoch)).replace("/", "_")
    c_best = join(c, "best").replace("/", "_")
    c = join(c, ".ckpt").replace("/", "_")
    c_best = join(c_best, ".ckpt").replace("/", "_")
    savepath = join(base_path, c)
    savepath_best = join(base_path, c_best)
    very_best = join(base_path, "_very_best.ckpt")
    return savepath, savepath_best, very_best


def read_image(filepath) -> np.ndarray:
    """HWC float32 in [0,1] (reference helper.py:76-80)."""
    from ..data.datasets import read_image as _ri

    return _ri(filepath)


class AverageMeter:
    """Running average (reference helper.py:88-101)."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def sec_to_hours(seconds: float) -> str:
    a = int(seconds // 3600)
    b = int((seconds % 3600) // 60)
    c = int((seconds % 3600) % 60)
    msg = f"{a} hours {b} mins {c} seconds"
    print(msg)
    return msg
