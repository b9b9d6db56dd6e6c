"""MS-SSIM / PSNR vs pytorch_msssim + torch oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reslic_tcm_tpu.utils import metrics as M

try:
    from pytorch_msssim import ms_ssim as torch_msssim

    HAVE_PM = True
except ImportError:
    HAVE_PM = False


def _pair(seed=0, h=192, w=224, noise=0.05):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(2, h // 8, w // 8, 3))
    a = np.repeat(np.repeat(g, 8, axis=1), 8, axis=2).astype(np.float32)
    b = np.clip(a + rng.normal(scale=noise, size=a.shape), 0, 1).astype(np.float32)
    return np.clip(a, 0, 1), b


def test_psnr():
    a, b = _pair()
    got = float(M.psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = np.mean((a - b) ** 2)
    assert abs(got - (-10 * np.log10(mse))) < 1e-3


@pytest.mark.skipif(not HAVE_PM, reason="pytorch_msssim not installed")
def test_ms_ssim_matches_pytorch_msssim():
    a, b = _pair()
    got = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    want = float(
        torch_msssim(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
            data_range=1.0,
        )
    )
    assert abs(got - want) < 1e-4, (got, want)


def test_ms_ssim_basic_properties():
    a, b = _pair()
    same = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(a)))
    diff = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    worse = float(
        M.ms_ssim(jnp.asarray(a), jnp.asarray(np.clip(b + 0.2, 0, 1)))
    )
    assert same > 0.999
    assert 0 < worse < diff < same


def test_ms_ssim_odd_sizes():
    a, b = _pair(h=224, w=200)
    a, b = a[:, :221, :197], b[:, :221, :197]
    v = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0 < v <= 1
