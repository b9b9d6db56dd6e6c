"""Numerics tests for the layer library against torch-CPU oracles.

torch here is a third-party numerical reference only (these are the layouts
converted PyTorch checkpoints arrive in), never part of the framework.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from reslic_tcm_tpu.ops import layers as L
from reslic_tcm_tpu.ops import window_attention as W


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2).copy())


def _to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_conv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 12, 5)).astype(np.float32)
    for k, s in [(5, 2), (3, 1), (3, 2), (1, 1)]:
        m = L.Conv(7, kernel_size=k, stride=s)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        # inject torch weights: torch OIHW -> HWIO
        tconv = torch.nn.Conv2d(5, 7, k, stride=s, padding=k // 2)
        wt = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
        bt = tconv.bias.detach().numpy()
        v = {"params": {"conv": {"kernel": jnp.asarray(wt), "bias": jnp.asarray(bt)}}}
        got = np.asarray(m.apply(v, jnp.asarray(x)))
        want = _to_nhwc(tconv(_nchw(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_deconv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 7, 4)).astype(np.float32)
    for k, s in [(5, 2), (3, 2), (2, 2)]:
        tdeconv = torch.nn.ConvTranspose2d(
            4, 6, k, stride=s, output_padding=s - 1, padding=k // 2
        )
        # torch weight [in, out, kh, kw] -> flip spatial -> HWIO [kh, kw, in, out]
        wt = tdeconv.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        bt = tdeconv.bias.detach().numpy()
        m = L.Deconv(6, kernel_size=k, stride=s)
        v = {"params": {"kernel": jnp.asarray(wt.copy()), "bias": jnp.asarray(bt)}}
        got = np.asarray(m.apply({"params": v["params"]}, jnp.asarray(x)))
        want = _to_nhwc(tdeconv(_nchw(x)))
        assert got.shape == want.shape, (k, s, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 4, 18)).astype(np.float32)
    got = np.asarray(L.PixelShuffle(3).apply({}, jnp.asarray(x)))
    want = _to_nhwc(torch.nn.PixelShuffle(3)(_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gdn_matches_formula():
    rng = np.random.default_rng(3)
    c = 6
    x = rng.normal(size=(1, 4, 4, c)).astype(np.float32)
    ped = (2**-18) ** 2
    beta = rng.uniform(0.5, 2.0, size=c).astype(np.float32)
    gamma = (rng.uniform(0, 0.2, size=(c, c)) + 0.1 * np.eye(c)).astype(np.float32)
    params = {
        "beta": jnp.asarray(np.sqrt(beta + ped)),
        "gamma": jnp.asarray(np.sqrt(gamma + ped)),
    }
    got = np.asarray(L.GDN().apply({"params": params}, jnp.asarray(x)))
    norm = np.einsum("bhwj,kj->bhwk", x**2, gamma) + beta
    want = x / np.sqrt(norm)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got_inv = np.asarray(L.GDN(inverse=True).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got_inv, x * np.sqrt(norm), rtol=1e-5, atol=1e-6)


def test_gelu_matches_torch_exact():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    got = np.asarray(L.gelu(jnp.asarray(x)))
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_layernorm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 8)).astype(np.float32)
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5)
    v = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(ln.apply(v, jnp.asarray(x)))
    want = torch.nn.LayerNorm(8)(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    wins = W.window_partition(jnp.asarray(x), 8)
    assert wins.shape == (2, 2 * 3, 64, 3)
    back = W.window_reverse(wins, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_wmsa_window_locality():
    """type-'W' attention must not mix information across windows."""
    m = W.WMSA(dim=16, head_dim=8, window_size=4, type="W")
    x = np.zeros((1, 8, 8, 16), np.float32)
    x[:, :4, :4] = np.random.default_rng(6).normal(size=(1, 4, 4, 16))
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y0 = np.asarray(m.apply(v, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 4:, 4:] = 1.0  # perturb a different window
    y1 = np.asarray(m.apply(v, jnp.asarray(x2)))
    np.testing.assert_array_equal(y0[:, :4, :4], y1[:, :4, :4])
    assert np.abs(y0[:, 4:, 4:] - y1[:, 4:, 4:]).max() > 0


def test_wmsa_matches_manual_attention_single_window():
    """One window, one head: WMSA == dense softmax attention + rel bias."""
    dim, w = 4, 4
    m = W.WMSA(dim=dim, head_dim=4, window_size=w, type="W")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, w, w, dim)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = v["params"]
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    xt = x.reshape(w * w, dim)
    qkv = xt @ np.asarray(p["embedding_layer"]["kernel"]) + np.asarray(
        p["embedding_layer"]["bias"]
    )
    q, k, vv = qkv[:, :dim], qkv[:, dim : 2 * dim], qkv[:, 2 * dim :]
    sim = (q @ k.T) * (4**-0.5)
    idx = W.relative_position_index(w)
    table = np.asarray(p["relative_position_params"]).reshape(1, -1)
    sim = sim + table[0][idx]
    probs = np.exp(sim - sim.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = probs @ vv
    want = out @ np.asarray(p["linear"]["kernel"]) + np.asarray(p["linear"]["bias"])
    np.testing.assert_allclose(got.reshape(w * w, dim), want, rtol=1e-4, atol=1e-5)


def test_shifted_wmsa_mask_blocks_wrapped_pairs():
    """After a cyclic shift, wrapped-in pixels must not attend to true
    neighbors; verify via the mask structure itself."""
    mask = W.shift_window_mask(2, 2, 4, shift=2)
    assert mask.shape == (4, 16, 16)
    # windows not on the last row/col are unmasked
    assert not mask[0].any()
    # the last window (bottom-right) blocks cross-half pairs in both axes
    m = mask[-1].reshape(4, 4, 4, 4)
    assert m[:2, :, 2:, :].all() or m[2:, :, :2, :].all()


def test_swin_block_pads_non_divisible_inputs():
    m = W.SwinBlock(dim=8, head_dim=4, window_size=4)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 6, 10, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_win_noshift_attention_shapes_and_shift():
    for shift in (0, 2):
        m = W.Win_noShift_Attention(dim=16, num_heads=4, window_size=4, shift_size=shift)
        x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 8, 8, 16)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_residual_blocks_shapes():
    x = jnp.asarray(np.random.default_rng(10).normal(size=(1, 8, 8, 6)), jnp.float32)
    for m, out_shape in [
        (L.ResidualBlock(6), (1, 8, 8, 6)),
        (L.ResidualBlock(12), (1, 8, 8, 12)),
        (L.ResidualBlockWithStride(12, stride=2), (1, 4, 4, 12)),
        (L.ResidualBlockUpsample(12, upsample=2), (1, 16, 16, 12)),
        (L.SubpelConv3x3(3, r=2), (1, 16, 16, 3)),
    ]:
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == out_shape, (type(m).__name__, y.shape)
