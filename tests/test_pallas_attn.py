"""Fused Pallas window attention == composed XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.ops import window_attention as W


@pytest.mark.parametrize("typ", ["W", "SW"])
@pytest.mark.parametrize("layout", ["bd", "hp"])
def test_fused_swin_transformer_block_matches_composed(typ, layout):
    """The flash kernel (LN+attn+proj+MLP in one pallas_call) matches the
    composed XLA SwinTransformerBlock."""
    m = W.SwinTransformerBlock(dim=16, head_dim=8, window_size=4, type=typ)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True, layout=layout)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("layout", ["bd", "hp"])
def test_fused_swin_block_matches(tmp_path, layout):
    m = W.SwinBlock(dim=16, head_dim=8, window_size=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True, layout=layout)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("layout", ["bd", "hp"])
def test_fused_tile1_fallback_window_count_indivisible(layout):
    """Window-row counts with no tile divisor >1 (nww=3 here) fall back to
    the untiled kernel (tile=1) and still match the composed path. The
    kernel has no grid-padding path: indivisible counts select tile=1."""
    # 8x12 input at window 4 -> 3 window columns; SW adds masking on top.
    m = W.SwinTransformerBlock(dim=16, head_dim=8, window_size=4, type="SW")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 12, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True, layout=layout)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("layout", ["bd", "hp"])
def test_fused_tile4_shifted_mask(layout):
    """tile>1 with the shifted (SW) mask: 8x16 at window 4 -> nww=4 selects
    tile=4, so one grid step carries a full row of 4 differently-masked
    windows; must match the composed path exactly."""
    m = W.SwinTransformerBlock(dim=16, head_dim=8, window_size=4, type="SW")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 16, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(3), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True, layout=layout)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_residual_block_matches_composed():
    """ops/fused_conv.py kernel (interpret) == the composed ResidualBlock:
    two 3x3 convs + leaky_relu + skip over halo'd DMA tiles."""
    from reslic_tcm_tpu.ops import layers as L

    m = L.ResidualBlock(features=128)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 16, 24, 128)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(5), x)
    ref = np.asarray(m.apply(v, x))
    try:
        L.enable_fused_convs(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        L.enable_fused_convs(False)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cls_inverse", [False, True])
def test_fused_conv_gdn_matches_composed(cls_inverse):
    """fused_conv_gdn (interpret) == composed RBWS conv2+GDN+skip / RBU
    conv+IGDN+identity."""
    from reslic_tcm_tpu.ops import layers as L

    if cls_inverse:
        m = L.ResidualBlockUpsample(features=128, upsample=2)
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(1, 8, 12, 128)), jnp.float32
        )
    else:
        m = L.ResidualBlockWithStride(features=128, stride=2)
        x = jnp.asarray(
            np.random.default_rng(6).normal(size=(1, 16, 24, 128)), jnp.float32
        )
    v = m.init(jax.random.PRNGKey(6), x)
    ref = np.asarray(m.apply(v, x))
    try:
        L.enable_fused_convs(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        L.enable_fused_convs(False)
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("shift", [0, 4])
@pytest.mark.parametrize("layout", ["bd", "hp"])
def test_fused_winbased_attention_matches_composed(shift, layout):
    """WACNN's WinBasedAttention through the flash kernel (with_ln/with_mlp
    off) == the composed path. Composed mask is -100 vs kernel -1e9;
    post-softmax difference < 1e-40."""
    m = W.WinBasedAttention(dim=16, num_heads=2, window_size=8,
                            shift_size=shift)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 16, 24, 16)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(9), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True, layout=layout)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_residual_block_small_channels_min_tile():
    """C=64 (TCM-Small conv branch) at the minimum 8x8 tile: lanes are
    half-used but the kernel must stay correct."""
    from reslic_tcm_tpu.ops import layers as L

    m = L.ResidualBlock(features=64)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(1, 8, 8, 64)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(11), x)
    ref = np.asarray(m.apply(v, x))
    try:
        L.enable_fused_convs(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        L.enable_fused_convs(False)
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)
