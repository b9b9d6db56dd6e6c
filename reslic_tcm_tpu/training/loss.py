"""Rate-distortion loss (reference training/loss.py:7-35), pure JAX."""

from __future__ import annotations

import math

import jax.numpy as jnp


def rate_distortion_loss(output: dict, target, lmbda: float, loss_type: str = "mse") -> dict:
    """loss = lambda * 255^2 * MSE + bpp  (or lambda*(1-msssim) + bpp).

    target: NHWC in [0,1]. output: forward dict with "likelihoods".
    """
    n, h, w, _ = target.shape
    num_pixels = n * h * w
    out = {}
    out["bpp_loss"] = sum(
        jnp.sum(jnp.log(lik)) / (-math.log(2) * num_pixels)
        for lik in output["likelihoods"].values()
    )
    if loss_type == "mse":
        out["mse_loss"] = jnp.mean((output["x_hat"] - target) ** 2)
        out["loss"] = lmbda * 255**2 * out["mse_loss"] + out["bpp_loss"]
    else:
        from ..utils.metrics import ms_ssim

        out["ms_ssim_loss"] = ms_ssim(output["x_hat"], target)
        out["loss"] = lmbda * (1 - out["ms_ssim_loss"]) + out["bpp_loss"]
    return out
