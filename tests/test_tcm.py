"""Integration tests for the TCM flagship on a tiny config.

128x128 is the minimum input (pad-to-128 contract, reference eval.py:76):
y grid 8x8 (window 8), z grid 2x2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.models.tcm import make_tcm


@pytest.fixture(scope="module")
def tiny_codec():
    # N=32 is the smallest config compatible with head_dim=(8,16,32,...)
    return make_tcm(
        N=32, M=40, input_shape=(128, 128), hyper_ch=24, atten_inter_dim=16
    )


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    # piecewise-smooth image so latents aren't pure noise
    g = rng.uniform(size=(1, 8, 8, 3))
    img = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    img += rng.normal(scale=0.02, size=img.shape)
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


def test_forward_shapes_and_likelihoods(tiny_codec, image):
    out = tiny_codec.forward(image, training=True, rng=jax.random.PRNGKey(1))
    assert out["x_hat"].shape == image.shape
    assert out["likelihoods"]["y"].shape == (1, 8, 8, 40)
    assert out["likelihoods"]["z"].shape == (1, 2, 2, 24)
    for lik in out["likelihoods"].values():
        l = np.asarray(lik)
        assert (l > 0).all() and (l <= 1 + 1e-5).all()
    assert out["para"]["means"].shape == (1, 8, 8, 40)
    assert out["para"]["scales"].shape == (1, 8, 8, 40)


def test_forward_is_differentiable(tiny_codec, image):
    module, variables = tiny_codec.module, tiny_codec.variables

    def loss_fn(params):
        out = module.apply(
            {"params": params}, image, training=True,
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        mse = jnp.mean((out["x_hat"] - image) ** 2)
        bpp = sum(
            -jnp.log2(l).sum() for l in out["likelihoods"].values()
        ) / (128 * 128)
        return 0.01 * 255**2 * mse + bpp

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the analysis transform must receive gradient signal through the STE
    ga_leaves = jax.tree_util.tree_leaves(grads["g_a"])
    assert sum(float(np.abs(np.asarray(l)).sum()) for l in ga_leaves) > 0


def test_roundtrip_decoder_matches_eval_forward(tiny_codec, image):
    """decode(encode(x)) must reproduce the eval forward's x_hat exactly:
    the encoder mirrors the decoder (reference tcm.py:507-508)."""
    out = tiny_codec.forward(image, training=False)
    tiny_codec.update()
    enc = tiny_codec.compress(image)
    assert set(enc.keys()) == {"strings", "shape"}
    assert len(enc["strings"]) == 2
    dec = tiny_codec.decompress(enc["strings"], enc["shape"])

    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    got = np.asarray(dec["x_hat"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_real_bpp_tracks_estimate(tiny_codec, image):
    out = tiny_codec.forward(image, training=False)
    est_bpp = float(
        sum(-jnp.log2(l).sum() for l in out["likelihoods"].values()) / (128 * 128)
    )
    tiny_codec.update()
    enc = tiny_codec.compress(image)
    nbytes = len(enc["strings"][0][0]) + len(enc["strings"][1][0])
    real_bpp = nbytes * 8 / (128 * 128)
    # random weights -> arbitrary sigmas; table quantization costs a bit
    assert real_bpp < est_bpp * 1.25 + 0.05
    assert real_bpp > est_bpp * 0.75


def test_aux_loss_scalar(tiny_codec):
    v = float(tiny_codec.aux_loss())
    assert np.isfinite(v) and v > 0
