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


# ---------------------------------------------------------------------------
# Oracle checks: the in-repo torch reimplementation of pytorch_msssim
# (tests/torch_msssim_model.py — independent primitives: torch conv2d /
# avg_pool2d) and the frozen goldens it generated.
# ---------------------------------------------------------------------------


def _load_goldens():
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "msssim_golden.json")
    with open(path) as f:
        return json.load(f)


def test_ms_ssim_matches_torch_oracle_live():
    """JAX MS-SSIM vs the torch oracle computed at test time, on even and
    odd spatial sizes (odd sizes exercise the avg_pool both-edge pad)."""
    from torch_msssim_model import ms_ssim_torch

    for h, w in ((192, 224), (221, 197)):
        a, b = _pair(h=((h + 7) // 8) * 8, w=((w + 7) // 8) * 8)
        a, b = a[:, :h, :w], b[:, :h, :w]
        got = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
        want = float(
            ms_ssim_torch(
                torch.from_numpy(a.transpose(0, 3, 1, 2)),
                torch.from_numpy(b.transpose(0, 3, 1, 2)),
            )
        )
        assert abs(got - want) < 2e-5, (h, w, got, want)


def test_ms_ssim_matches_frozen_goldens():
    """JAX MS-SSIM vs the committed goldens (runs torch-free)."""
    from gen_msssim_golden import make_pair

    for case in _load_goldens():
        a, b = make_pair(case["seed"], case["h"], case["w"], case["noise"])
        got = float(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(got - case["ms_ssim"]) < 2e-5, (case, got)


def test_ms_ssim_loss_path_matches_oracle():
    """The --type ms-ssim RD loss distortion term equals the torch oracle
    (reference training/loss.py:31-33 uses pytorch_msssim directly)."""
    from torch_msssim_model import ms_ssim_torch

    from reslic_tcm_tpu.training.loss import rate_distortion_loss

    a, b = _pair(h=192, w=192)
    out = {
        "x_hat": jnp.asarray(b),
        "likelihoods": {"y": jnp.full((1, 4), 0.5)},
    }
    losses = rate_distortion_loss(out, jnp.asarray(a), 0.01, "ms-ssim")
    want = float(
        ms_ssim_torch(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        )
    )
    assert abs(float(losses["ms_ssim_loss"]) - want) < 2e-5
