"""Image quality metrics in pure JAX (NHWC).

Replaces the reference's third-party metric deps: pytorch_msssim.ms_ssim
(reference utils/helper.py:83-84, eval.py:24-25) and the PSNR helpers
(eval.py:20-22). MS-SSIM follows the standard Wang et al. construction with
pytorch_msssim's defaults (win 11, sigma 1.5, K=(0.01, 0.03), 5 scales).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, data_range: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def compute_psnr(a, b) -> float:
    """Reference-compatible helper (eval.py:20-22), returns a Python float."""
    return float(psnr(a, b))


def _gaussian_kernel(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, kernel_1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur, valid padding. x: NHWC."""
    c = x.shape[-1]
    kh = jnp.tile(kernel_1d[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(kernel_1d[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x


def _ssim_components(x, y, kernel_1d, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, kernel_1d)
    mu_y = _blur(y, kernel_1d)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _blur(x * x, kernel_1d) - mu_xx
    sigma_y = _blur(y * y, kernel_1d) - mu_yy
    sigma_xy = _blur(x * y, kernel_1d) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    # mean over spatial, keep batch+channel
    return ssim_map.mean(axis=(1, 2)), cs.mean(axis=(1, 2))


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x average pool, zero-padding odd sizes; divides by 4 including pad
    (torch avg_pool2d count_include_pad=True — pytorch_msssim parity).

    pytorch_msssim passes padding=[H%2, W%2] to F.avg_pool2d, and torch
    pads SYMMETRICALLY (that amount on each side), so an odd dim gets one
    zero row/col on BOTH edges — not one trailing pad."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ssim(x, y, data_range: float = 1.0, win_size: int = 11, sigma: float = 1.5):
    k = jnp.asarray(_gaussian_kernel(win_size, sigma))
    s, _ = _ssim_components(x, y, k, data_range)
    return s.mean()


def ms_ssim(
    x,
    y,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    weights=_MSSSIM_WEIGHTS,
):
    """Multi-scale SSIM; inputs NHWC in [0, data_range]."""
    min_side = min(x.shape[1], x.shape[2])
    if min_side <= (win_size - 1) * 2 ** (len(weights) - 1):
        raise ValueError(
            f"image side {min_side} too small for {len(weights)}-scale MS-SSIM "
            f"with win={win_size} (needs > {(win_size - 1) * 2 ** (len(weights) - 1)})"
        )
    k = jnp.asarray(_gaussian_kernel(win_size, sigma))
    levels = len(weights)
    w = jnp.asarray(weights)

    mcs = []
    for i in range(levels):
        s, cs = _ssim_components(x, y, k, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _downsample2(x)
            y = _downsample2(y)
    s = jax.nn.relu(s)
    stack = jnp.stack(mcs + [s], axis=0)  # [levels, B, C]
    val = jnp.prod(stack ** w[:, None, None], axis=0)
    return val.mean()


def compute_msssim(a, b) -> jnp.ndarray:
    """Reference-compatible helper (helper.py:83-84)."""
    return ms_ssim(a, b, data_range=1.0)


def msssim_db(a, b) -> float:
    """-10 log10(1 - msssim), the reporting unit of eval.py:24-25."""
    return msssim_to_db(float(ms_ssim(a, b)))


def msssim_to_db(v: float) -> float:
    """dB transform with an fp guard: ms_ssim can land at 1.0 (or 1+ulp)
    on near-perfect reconstructions — cs is mathematically <= 1 but f32
    rounding crosses it, and log10(1 - 1.0) is a domain error (hit on a
    converged checkpoint's eval). 120 dB caps the scale well above any
    real codec operating point."""
    return float(min(-10 * math.log10(max(1.0 - v, 1e-12)), 120.0))
