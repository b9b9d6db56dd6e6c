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


def test_fused_padding_of_window_count():
    """Window counts that don't divide the tile size still work."""
    from reslic_tcm_tpu.ops.pallas_attn import fused_qkv_attention

    rng = np.random.default_rng(2)
    nw, p2, c, heads = 5, 16, 8, 2
    x = jnp.asarray(rng.normal(size=(nw, p2, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, p2, p2)) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    got = np.asarray(
        fused_qkv_attention(x, wqkv, bqkv, bias, wproj, bproj, tile=4, interpret=True)
    )

    # manual reference
    hd = c // heads
    qkv = np.asarray(x) @ np.asarray(wqkv) + np.asarray(bqkv)
    qkv = qkv.reshape(nw, p2, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = np.einsum("wphd,wqhd->whpq", q, k) * hd**-0.5 + np.asarray(bias)[None]
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    ctx = np.einsum("whpq,wqhd->wphd", probs, v).reshape(nw, p2, c)
    want = ctx @ np.asarray(wproj) + np.asarray(bproj)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
