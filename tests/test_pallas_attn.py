"""Fused Pallas window attention == composed XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.ops import window_attention as W


@pytest.mark.parametrize("typ", ["W", "SW"])
def test_fused_swin_transformer_block_matches_composed(typ):
    """The flash kernel (LN+attn+proj+MLP in one pallas_call) matches the
    composed XLA SwinTransformerBlock."""
    m = W.SwinTransformerBlock(dim=16, head_dim=8, window_size=4, type=typ)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fused_swin_block_matches(tmp_path):
    m = W.SwinBlock(dim=16, head_dim=8, window_size=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_window_count_not_divisible_by_tile():
    """Window counts that don't divide the flash kernel's tile still match
    the composed path (grid padding correctness)."""
    # 8x12 input at window 4 -> 6 windows; SW adds masking on top.
    m = W.SwinTransformerBlock(dim=16, head_dim=8, window_size=4, type="SW")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 12, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x)
    ref = np.asarray(m.apply(v, x))
    try:
        W.enable_fused_attention(True, interpret=True)
        got = np.asarray(m.apply(v, x))
    finally:
        W.enable_fused_attention(False)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
