"""Gain-unit model tests: rate control via gains, interpolation, round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.models.gain.gained import (
    interpolate_gain,
    make_gained_hyperprior,
    make_gained_wacnn,
)
from reslic_tcm_tpu.models.gain.sc import make_sc_gained


def _boost_last_conv(codec, seq="g_a", f=8.0):
    """Amplify the final analysis conv so latents quantize to nonzero
    symbols: torch-default init (correctly) yields near-zero latents at
    init, which would make rate/modulation assertions vacuous."""
    import jax as _jax

    p = _jax.tree_util.tree_map(lambda a: a, codec.variables["params"])
    last = sorted(
        (k for k in p[seq] if k.startswith("layers_")),
        key=lambda k: int(k.split("_")[1]),
    )[-1]
    leaf = p[seq][last]["conv"]
    leaf["kernel"] = leaf["kernel"] * f
    leaf["bias"] = leaf["bias"] * f
    codec.variables = {"params": p}
    return codec


def _image(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(1, h // 8, w // 8, 3))
    img = np.repeat(np.repeat(g, 8, axis=1), 8, axis=2)
    img += rng.normal(scale=0.02, size=img.shape)
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


def test_interpolate_gain_endpoints():
    lo = jnp.asarray([1.0, 2.0])
    hi = jnp.asarray([4.0, 8.0])
    np.testing.assert_allclose(np.asarray(interpolate_gain(lo, hi, 0.0)), [1, 2])
    np.testing.assert_allclose(np.asarray(interpolate_gain(lo, hi, 1.0)), [4, 8])
    np.testing.assert_allclose(np.asarray(interpolate_gain(lo, hi, 0.5)), [2, 4])
    np.testing.assert_allclose(
        np.asarray(interpolate_gain(lo, hi, 0.5, "linear")), [2.5, 5]
    )


@pytest.fixture(scope="module")
def gained_ms():
    codec = make_gained_hyperprior("mean-scale", N=16, M=24,
                                   lmbda_list=(0.0025, 0.013, 0.05),
                                   input_shape=(64, 64))
    _boost_last_conv(codec)
    # make the levels actually differ (trained gains would)
    p = jax.tree_util.tree_map(lambda a: a, codec.variables["params"])
    p["Gain"] = jnp.asarray([[0.5] * 24, [1.0] * 24, [2.0] * 24], jnp.float32)
    p["InverseGain"] = jnp.asarray([[2.0] * 24, [1.0] * 24, [0.5] * 24], jnp.float32)
    codec.variables = {"params": p}
    return codec


def test_gained_forward_levels_change_rate(gained_ms):
    x = _image()
    rates = []
    for lv in range(3):
        out = gained_ms.module.apply(gained_ms.variables, x, training=False, lv=lv)
        rates.append(float(-jnp.log2(out["likelihoods"]["y"]).sum()))
    assert rates[0] < rates[1] < rates[2]  # bigger gain -> bigger symbols -> more bits


def test_gained_roundtrip_and_interpolation(gained_ms):
    x = _image(seed=1)
    gained_ms.update()
    sizes = []
    for (s, l) in [(0, 0.0), (0, 0.5), (0, 1.0), (1, 0.0)]:
        enc = gained_ms.compress(x, s=s, l=l)
        dec = gained_ms.decompress(enc["strings"], enc["shape"], s=s, l=l)
        assert np.isfinite(np.asarray(dec["x_hat"])).all()
        sizes.append(sum(len(b) for g in enc["strings"] for b in g))
    # interpolated rate sits between the endpoints
    assert sizes[0] <= sizes[1] <= sizes[2] or sizes[0] < sizes[2]
    # (s=0, l=1) and (s=1, l=0) are the same interpolated gain -> same stream
    assert sizes[2] == sizes[3]


def test_gained_scale_variant():
    codec = make_gained_hyperprior("scale", N=16, M=24, lmbda_list=(0.01, 0.05),
                                   input_shape=(64, 64))
    x = _image(seed=2)
    out = codec.module.apply(codec.variables, x, training=True, lv=1,
                             rngs={"noise": jax.random.PRNGKey(0)})
    assert out["x_hat"].shape == x.shape
    codec.update()
    enc = codec.compress(x, s=0, l=0.0)
    dec = codec.decompress(enc["strings"], enc["shape"], s=0, l=0.0)
    assert np.isfinite(np.asarray(dec["x_hat"])).all()


@pytest.fixture(scope="module")
def gained_wacnn():
    return make_gained_wacnn(
        N=32, M=40, lmbda_list=(0.0025, 0.05), input_shape=(128, 128),
        hyper_dims=(40, 36, 32), mean_dims=(32, 36, 40, 44),
        cc_dims=(28, 24, 20, 16),
    )


def test_gained_wacnn_forward_and_roundtrip(gained_wacnn):
    x = _image(128, 128, seed=3)
    # scale the gains apart so levels differ
    p = dict(gained_wacnn.variables["params"])
    p["Gain"] = jnp.asarray(np.stack([np.full(40, 0.7), np.full(40, 1.5)]), jnp.float32)
    p["InverseGain"] = jnp.asarray(
        np.stack([np.full(40, 1 / 0.7), np.full(40, 1 / 1.5)]), jnp.float32
    )
    gained_wacnn.variables = {"params": p}

    outs = [
        gained_wacnn.module.apply(gained_wacnn.variables, x, training=False, lv=lv)
        for lv in range(2)
    ]
    r0 = float(-jnp.log2(outs[0]["likelihoods"]["y"]).sum())
    r1 = float(-jnp.log2(outs[1]["likelihoods"]["y"]).sum())
    assert r0 < r1

    gained_wacnn.update()
    for lv in range(2):
        enc = gained_wacnn.compress(x, lv=lv)
        dec = gained_wacnn.decompress(enc["strings"], enc["shape"], lv=lv)
        want = np.clip(np.asarray(outs[lv]["x_hat"]), 0, 1)
        np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_sc_gained_forward_and_roundtrip():
    codec = make_sc_gained(N=16, M=24, lmbda_list=(0.01, 0.05), input_shape=(64, 64))
    _boost_last_conv(codec, seq="g_a4")  # SC model splits g_a into stages
    x = _image(seed=4)
    qmap = jnp.asarray(
        np.random.default_rng(5).uniform(size=(1, 64, 64, 1)), jnp.float32
    )
    out = codec.module.apply(
        codec.variables, x, qmap, training=True, lv=0,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    assert out["x_hat"].shape == x.shape
    codec.update()
    enc = codec.compress(x, qmap, s=0, l=0.5)
    dec = codec.decompress(enc["strings"], enc["shape"], s=0, l=0.5)
    assert np.isfinite(np.asarray(dec["x_hat"])).all()
    # qmap actually modulates the latent
    out2 = codec.module.apply(codec.variables, x, qmap * 0 + 1.0, training=False, lv=0)
    out1 = codec.module.apply(codec.variables, x, qmap * 0, training=False, lv=0)
    assert np.abs(np.asarray(out2["x_hat"]) - np.asarray(out1["x_hat"])).max() > 0


def test_gain_init_spread_seeds_level_separation():
    """gain_init_spread=2 puts the per-level y gains on a geometric ladder
    (0.5, 1, 2) with InverseGain = 1/Gain, so levels code different rates
    from epoch 0 (the reference's all-ones init, GainBalle2018.py:73-76,
    needs its full schedule to separate)."""
    from reslic_tcm_tpu.models.gain.gained import GainedScaleHyperprior

    m = GainedScaleHyperprior(N=16, M=32, levels=3, gain_init_spread=2.0)
    v = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), training=True,
    )
    g = np.asarray(v["params"]["Gain"])
    ig = np.asarray(v["params"]["InverseGain"])
    np.testing.assert_allclose(g[:, 0], [0.5, 1.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(ig, 1.0 / g, rtol=1e-6)
    # hyper gains stay at the reference ones-init
    np.testing.assert_allclose(np.asarray(v["params"]["HyperGain"]), 1.0)
    # default stays byte-identical to the reference init
    m0 = GainedScaleHyperprior(N=16, M=32, levels=3)
    v0 = m0.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), training=True,
    )
    np.testing.assert_allclose(np.asarray(v0["params"]["Gain"]), 1.0)
