"""End-to-end oracle: the reference's own TCM (imported in place from
/root/reference against vendored compressai stubs) vs this framework's TCM
at matched converted weights.

Gates BASELINE.md "RD fidelity vs PyTorch reference within 0.1%": forward
bpp and PSNR must agree to <0.1% relative on several images, and the
mu/sigma -> scale-index mapping must agree element-wise (SURVEY §7.3.1
index-level harness). Fails if the JAX forward drifts from the reference
semantics (reference models/reference/tcm.py:425-478).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.torch_oracle.load_reference import (
    load_reference_tcm,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

N, M = 64, 320
CONFIG = (1, 1, 1, 1, 1, 1)
HEAD_DIM = (8, 16, 32, 32, 16, 8)
# 256 px: the reference's SWAtten SwinBlock requires y-spatial > window_size
# (its <=window pad path at tcm.py:296-303 miscomputes; the reference only
# ever runs 256-px crops)
HW = 256
N_IMAGES = 4


def _images():
    rng = np.random.default_rng(7)
    imgs = []
    for _ in range(N_IMAGES):
        # piecewise-smooth content (like the bench/procedural corpus):
        # block-upsampled low-res field + mild noise
        g = rng.uniform(size=(1, HW // 16, HW // 16, 3))
        im = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
        im = np.clip(im + rng.normal(0, 0.03, im.shape), 0, 1)
        imgs.append(im.astype(np.float32))
    return np.concatenate(imgs, axis=0)  # [N_IMAGES, H, W, 3] NHWC


@pytest.fixture(scope="module")
def matched_pair():
    import torch

    from reslic_tcm_tpu.models.tcm import make_tcm
    from reslic_tcm_tpu.utils.torch_convert import convert_state_dict

    TCM = load_reference_tcm()
    torch.manual_seed(0)
    tnet = TCM(
        config=list(CONFIG),
        head_dim=list(HEAD_DIM),
        drop_path_rate=0,
        N=N,
        M=M,
    )
    tnet.eval()

    # Give the random torch net trained-ish statistics so likelihoods are
    # informative (same latent-attenuation recipe as bench.py).
    with torch.no_grad():
        tnet.g_a[-1].weight.mul_(0.02)
        tnet.g_a[-1].bias.mul_(0.02)
        tnet.h_a[-1].weight.mul_(0.05)
        tnet.h_a[-1].bias.mul_(0.05)
        for i in range(tnet.num_slices):
            tnet.cc_scale_transforms[i][-1].weight.mul_(0.02)
            tnet.cc_scale_transforms[i][-1].bias.zero_()
            tnet.cc_mean_transforms[i][-1].weight.mul_(0.02)
            tnet.cc_mean_transforms[i][-1].bias.mul_(0.02)

    sd = {k: v.detach().cpu().numpy() for k, v in tnet.state_dict().items()}

    codec = make_tcm(N=N, M=M, config=CONFIG, head_dim=HEAD_DIM, fast_init=True)
    params, report = convert_state_dict(sd, codec.params)
    assert not report["missing"], f"unconverted JAX leaves: {report['missing'][:8]}"
    assert not report["unused"], f"unused torch keys: {report['unused'][:8]}"
    codec.variables = {"params": params}
    return tnet, codec


def _torch_forward(tnet, x_nhwc):
    import torch

    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        out = tnet(x)
    num_px = x.shape[0] * x.shape[2] * x.shape[3]
    bpp_y = float(
        (-torch.log2(out["likelihoods"]["y"])).sum() / num_px
    )
    bpp_z = float(
        (-torch.log2(out["likelihoods"]["z"])).sum() / num_px
    )
    x_hat = out["x_hat"].numpy().transpose(0, 2, 3, 1)
    scales = out["para"]["scales"].numpy().transpose(0, 2, 3, 1)
    return bpp_y, bpp_z, x_hat, scales


def _jax_forward(codec, x_nhwc):
    import jax.numpy as jnp

    out = codec.forward(jnp.asarray(x_nhwc), training=False)
    num_px = x_nhwc.shape[0] * x_nhwc.shape[1] * x_nhwc.shape[2]
    bpp_y = float(-jnp.log2(out["likelihoods"]["y"]).sum() / num_px)
    bpp_z = float(-jnp.log2(out["likelihoods"]["z"]).sum() / num_px)
    return bpp_y, bpp_z, np.asarray(out["x_hat"]), np.asarray(out["para"]["scales"])


def _psnr(x, x_hat):
    mse = float(np.mean((x - x_hat) ** 2))
    return -10 * math.log10(mse)


def test_forward_bpp_psnr_within_0p1pct(matched_pair):
    tnet, codec = matched_pair
    x = _images()

    t_bpp_y, t_bpp_z, t_xhat, _ = _torch_forward(tnet, x)
    j_bpp_y, j_bpp_z, j_xhat, _ = _jax_forward(codec, x)

    t_psnr = _psnr(x, t_xhat)
    j_psnr = _psnr(x, j_xhat)

    def rel(a, b):
        return abs(a - b) / max(abs(a), 1e-12)

    assert rel(t_bpp_y, j_bpp_y) < 1e-3, (t_bpp_y, j_bpp_y)
    assert rel(t_bpp_z, j_bpp_z) < 1e-3, (t_bpp_z, j_bpp_z)
    assert rel(t_psnr, j_psnr) < 1e-3, (t_psnr, j_psnr)
    # sanity: the comparison is on non-degenerate, finite numbers (random
    # g_s weights reconstruct poorly — ~5 dB — which is fine for parity)
    assert t_bpp_y + t_bpp_z > 0.01
    assert math.isfinite(t_psnr) and t_psnr > 1


def test_per_image_agreement(matched_pair):
    """Per-image (not just aggregate) agreement, one image at a time."""
    tnet, codec = matched_pair
    xs = _images()
    for i in range(xs.shape[0]):
        x = xs[i : i + 1]
        t_bpp_y, t_bpp_z, t_xhat, _ = _torch_forward(tnet, x)
        j_bpp_y, j_bpp_z, j_xhat, _ = _jax_forward(codec, x)
        t_total, j_total = t_bpp_y + t_bpp_z, j_bpp_y + j_bpp_z
        assert abs(t_total - j_total) / t_total < 1e-3, (i, t_total, j_total)
        assert abs(_psnr(x, t_xhat) - _psnr(x, j_xhat)) / _psnr(x, t_xhat) < 1e-3


def test_scale_index_agreement(matched_pair):
    """mu/sigma -> scale-table-index harness (SURVEY §7.3.1): the indexes
    that drive real coding must match element-wise (tiny fp drift at bin
    boundaries tolerated at <0.1% of elements)."""
    import jax.numpy as jnp
    import torch

    from reslic_tcm_tpu.ops.math import build_indexes

    tnet, codec = matched_pair
    x = _images()
    _, _, _, t_scales = _torch_forward(tnet, x)
    _, _, _, j_scales = _jax_forward(codec, x)

    # 64 log-spaced scales in [0.11, 256] (reference tcm.py:26-34)
    table = np.exp(np.linspace(math.log(0.11), math.log(256), 64)).astype(
        np.float32
    )
    tnet.gaussian_conditional.update_scale_table(table.tolist())
    t_idx = tnet.gaussian_conditional.build_indexes(
        torch.from_numpy(np.ascontiguousarray(t_scales.transpose(0, 3, 1, 2)))
    ).numpy()
    j_idx = np.asarray(
        build_indexes(jnp.asarray(j_scales), jnp.asarray(table))
    ).transpose(0, 3, 1, 2)

    mismatch = np.mean(t_idx != j_idx)
    assert mismatch < 1e-3, f"scale-index mismatch rate {mismatch:.5f}"
