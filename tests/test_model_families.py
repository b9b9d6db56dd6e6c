"""Round-trip integration tests for WACNN and the Balle-2018 family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.models.balle2018 import make_balle
from reslic_tcm_tpu.models.wacnn import make_wacnn


def _image(h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(1, h // 16, w // 16, 3))
    img = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    img += rng.normal(scale=0.02, size=img.shape)
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


@pytest.mark.parametrize("kind", ["factorized", "scale", "mean-scale"])
def test_balle_roundtrip(kind):
    codec = make_balle(kind, N=16, M=24, input_shape=(64, 64))
    x = _image(64, 64)
    out = codec.forward(x, training=False)
    assert out["x_hat"].shape == x.shape
    codec.update()
    enc = codec.compress(x)
    dec = codec.decompress(enc["strings"], enc["shape"])
    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)

    est = float(sum(-jnp.log2(l).sum() for l in out["likelihoods"].values()))
    real = sum(sum(len(s) for s in group) for group in enc["strings"]) * 8
    assert real < est * 1.25 + 200


def test_balle_training_forward_differentiable():
    codec = make_balle("mean-scale", N=16, M=24, input_shape=(64, 64))
    x = _image(64, 64)
    module = codec.module

    def loss(params):
        out = module.apply(
            {"params": params}, x, training=True, rngs={"noise": jax.random.PRNGKey(0)}
        )
        return sum(-jnp.log2(l).sum() for l in out["likelihoods"].values()) / x.size

    g = jax.grad(loss)(codec.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


@pytest.fixture(scope="module")
def wacnn_tiny():
    return make_wacnn(
        N=32, M=40, input_shape=(128, 128),
        hyper_dims=(40, 36, 32), mean_dims=(32, 36, 40, 44), cc_dims=(28, 24, 20, 16),
    )


def test_wacnn_forward_and_roundtrip(wacnn_tiny):
    x = _image(128, 128, seed=1)
    out = wacnn_tiny.forward(x, training=False)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (1, 8, 8, 40)
    assert out["likelihoods"]["z"].shape == (1, 2, 2, 32)

    wacnn_tiny.update()
    enc = wacnn_tiny.compress(x)
    dec = wacnn_tiny.decompress(enc["strings"], enc["shape"])
    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_wacnn_ten_slices(wacnn_tiny):
    assert wacnn_tiny.module.num_slices == 10
    assert wacnn_tiny.module.max_support_slices == 5
    # cc transforms for late slices see capped support: 40 + 4*min(i,5)
    p = wacnn_tiny.params
    k9 = p["cc_mean_9"]["layers_0"]["conv"]["kernel"]
    assert k9.shape[2] == 40 + 4 * 5
