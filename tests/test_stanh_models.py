"""Integration tests for the STanH variable-rate model variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.models.stanh.variants import (
    make_scale_stanh,
    make_wacnn_stanh,
)

GCFG = [
    {"beta": 10, "num_sigmoids": 0, "annealing": "gap_stoc", "symmetry": False,
     "gap_factor": 25, "extrema": 8, "trainable": True, "removing_mean": False}
    for _ in range(2)
]


def _image(h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(1, h // 16, w // 16, 3))
    img = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    img += rng.normal(scale=0.02, size=img.shape)
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


@pytest.fixture(scope="module")
def wacnn_stanh():
    return make_wacnn_stanh(
        GCFG, N=32, M=40, input_shape=(128, 128),
        hyper_dims=(40, 36, 32), mean_dims=(32, 36, 40, 44),
        cc_dims=(28, 24, 20, 16),
    )


def test_multi_rate_forward_and_gap(wacnn_stanh):
    x = _image()
    outs = []
    for lv in range(2):
        out = wacnn_stanh.module.apply(
            wacnn_stanh.variables, x, training=True, lv=lv,
            beta=jnp.float32(20.0), rngs={"noise": jax.random.PRNGKey(0)},
        )
        assert "gap_gaussian" in out
        assert np.isfinite(float(out["gap_gaussian"]))
        outs.append(out)
    # per-level quantizer params are stacked: same shapes, indexable
    p = wacnn_stanh.params["gaussian_conditional"]["stanh"]
    assert p["w"].shape[0] == 2


def test_wacnn_stanh_roundtrip(wacnn_stanh):
    x = _image(seed=1)
    out = wacnn_stanh.forward(x, training=False)
    wacnn_stanh.update()
    for lv in range(2):
        enc = wacnn_stanh.compress(x, lv=lv)
        dec = wacnn_stanh.decompress(enc["strings"], enc["shape"], lv=lv)
        out_lv = wacnn_stanh.module.apply(
            wacnn_stanh.variables, x, training=False, lv=lv
        )
        want = np.clip(np.asarray(out_lv["x_hat"]), 0, 1)
        np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_codec_consistent_forward_is_bit_exact(wacnn_stanh):
    """forward_codec_consistent reuses the codec's compiled programs, so
    its x_hat must match decompress(compress(x)) EXACTLY (not atol) and
    its bpp estimate must track the coded bytes (VERDICT r3 #8)."""
    x = _image(seed=7)
    wacnn_stanh.update()
    for lv in range(2):
        out = wacnn_stanh.forward_codec_consistent(x, lv=lv)
        enc = wacnn_stanh.compress(x, lv=lv)
        dec = wacnn_stanh.decompress(enc["strings"], enc["shape"], lv=lv)
        assert np.array_equal(np.asarray(out["x_hat"]),
                              np.asarray(dec["x_hat"])), f"lv={lv}"
        est_bits = float(sum(
            -jnp.log2(l).sum() for l in out["likelihoods"].values()
        ))
        coded_bits = 8.0 * sum(
            len(s) for grp in enc["strings"]
            for s in (grp if isinstance(grp, list) else [grp])
        )
        # untrained model: 16-bit CDF floor / outlier charging keep the
        # coded size within a loose band of the estimate
        assert coded_bits < est_bits * 1.3 + 200
        assert coded_bits > est_bits * 0.6


def test_wacnn_stanh_bpp_tracks_estimate(wacnn_stanh):
    x = _image(seed=2)
    wacnn_stanh.update()
    out = wacnn_stanh.module.apply(wacnn_stanh.variables, x, training=False, lv=0)
    est_y = float(-jnp.log2(out["likelihoods"]["y"]).sum())
    enc = wacnn_stanh.compress(x, lv=0)
    real_y = len(enc["strings"][0][0]) * 8
    assert real_y < est_y * 1.3 + 200
    assert real_y > est_y * 0.7


def test_beta_affects_training_forward(wacnn_stanh):
    x = _image(seed=3)
    outs = {}
    for beta in (1.0, 500.0):
        outs[beta] = wacnn_stanh.module.apply(
            wacnn_stanh.variables, x, training=True, lv=0,
            beta=jnp.float32(beta), rngs={"noise": jax.random.PRNGKey(0)},
        )
    d = np.abs(
        np.asarray(outs[1.0]["x_hat"]) - np.asarray(outs[500.0]["x_hat"])
    ).max()
    assert d > 1e-4  # temperature changes the soft quantizer output
    assert float(outs[500.0]["gap_gaussian"]) < float(outs[1.0]["gap_gaussian"])


@pytest.fixture(scope="module")
def scale_stanh():
    return make_scale_stanh(GCFG, N=16, M=24, fact_stanh=True, input_shape=(64, 64))


def test_scale_stanh_forward_gaps(scale_stanh):
    x = _image(64, 64, seed=4)
    out = scale_stanh.module.apply(
        scale_stanh.variables, x, training=True, lv=1, beta=jnp.float32(15.0),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    assert np.isfinite(float(out["gap_gaussian"]))
    assert np.isfinite(float(out["gap_factorized"]))
    assert out["x_hat"].shape == x.shape


def test_scale_stanh_roundtrip(scale_stanh):
    x = _image(64, 64, seed=5)
    scale_stanh.update()
    out = scale_stanh.module.apply(scale_stanh.variables, x, training=False, lv=0)
    enc = scale_stanh.compress(x, lv=0)
    dec = scale_stanh.decompress(enc["strings"], enc["shape"], lv=0)
    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_wacnn_stanh_refinement_modes():
    for refinement in ("convolution", "multiple"):
        codec = make_wacnn_stanh(
            GCFG, N=32, M=40, refinement=refinement, input_shape=(128, 128),
            hyper_dims=(40, 36, 32), mean_dims=(32, 36, 40, 44),
            cc_dims=(28, 24, 20, 16),
        )
        x = _image(seed=6)
        o0 = codec.module.apply(codec.variables, x, training=False, lv=0)
        o1 = codec.module.apply(codec.variables, x, training=False, lv=1)
        # different per-level decoders -> different reconstructions
        assert np.abs(np.asarray(o0["x_hat"]) - np.asarray(o1["x_hat"])).max() > 0

    # real-codec roundtrip through the per-level synthesis selection
    # (decompress runs apply_synthesis — nn.switch over the g_s clones for
    # the loop's last variant, 'multiple' — with a concrete lv)
    codec.update()
    enc = codec.compress(x, lv=1)
    dec = codec.decompress(enc["strings"], enc["shape"], lv=1)
    want = np.clip(np.asarray(o1["x_hat"]), 0.0, 1.0)  # decompress clamps
    assert np.abs(np.asarray(dec["x_hat"]) - want).max() < 1e-5


def test_tcm_stanh_forward_and_roundtrip():
    from reslic_tcm_tpu.models.stanh.variants import make_tcm_stanh

    codec = make_tcm_stanh(
        GCFG, N=32, M=40, hyper_ch=24, atten_inter_dim=16,
    )
    x = _image(seed=9)
    out = codec.module.apply(
        codec.variables, x, training=True, lv=1, beta=jnp.float32(25.0),
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    assert np.isfinite(float(out["gap_gaussian"]))
    codec.update()
    enc = codec.compress(x, lv=1)
    dec = codec.decompress(enc["strings"], enc["shape"], lv=1)
    out_eval = codec.module.apply(codec.variables, x, training=False, lv=1)
    want = np.clip(np.asarray(out_eval["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_stanh_grads_reach_selected_level(wacnn_stanh):
    """Regression: the RD loss must produce nonzero gradients into the
    STanH (w, b) row of the selected rate level — and only that row.

    Caught in round 3: a multi-lambda run trained with the parser-default
    --gauss_trainable no (trainable=False -> stop_gradient) leaves every
    level at the identical init, so the "multi-rate" model codes every
    level identically. With trainable=True the gradient must flow."""
    from reslic_tcm_tpu.training.loss import rate_distortion_loss

    codec = wacnn_stanh
    x = _image(seed=11)

    def loss_fn(params, lv):
        out = codec.module.apply(
            {"params": params}, x, training=True, lv=lv,
            beta=jnp.float32(10.0), rngs={"noise": jax.random.PRNGKey(0)},
        )
        return rate_distortion_loss(out, x, 0.0067)["loss"]

    params = codec.variables["params"]
    for lv in range(2):
        g = jax.grad(loss_fn)(params, lv)
        gw = np.asarray(g["gaussian_conditional"]["stanh"]["w"])
        gb = np.asarray(g["gaussian_conditional"]["stanh"]["b"])
        for row in range(2):
            wn, bn = np.linalg.norm(gw[row]), np.linalg.norm(gb[row])
            if row == lv:
                assert wn > 0 and bn > 0, (lv, row, wn, bn)
            else:
                assert wn == 0 and bn == 0, (lv, row, wn, bn)


def test_stanh_frozen_quantizer_gets_no_grads():
    """trainable=False (the parser default "no") must stop gradients — the
    reference's requires_grad=False parity — so training leaves the
    quantizer at init. (The train CLI warns about this for multi-lambda.)"""
    from reslic_tcm_tpu.training.loss import rate_distortion_loss

    gcfg = [dict(GCFG[0], trainable=False) for _ in range(2)]
    codec = make_wacnn_stanh(
        gcfg, N=32, M=40, input_shape=(128, 128),
        hyper_dims=(40, 36, 32), mean_dims=(32, 36, 40, 44),
        cc_dims=(28, 24, 20, 16),
    )
    x = _image(seed=12)

    def loss_fn(params):
        out = codec.module.apply(
            {"params": params}, x, training=True, lv=0,
            beta=jnp.float32(10.0), rngs={"noise": jax.random.PRNGKey(0)},
        )
        return rate_distortion_loss(out, x, 0.0067)["loss"]

    g = jax.grad(loss_fn)(codec.variables["params"])
    assert float(np.abs(np.asarray(g["gaussian_conditional"]["stanh"]["w"])).max()) == 0
    assert float(np.abs(np.asarray(g["gaussian_conditional"]["stanh"]["b"])).max()) == 0


def test_registry_names():
    from reslic_tcm_tpu.models import models_dict

    for name in ("tcm", "stanh", "scale_stanh", "scale_gain", "wacnn_gain",
                 "wacnn_stanh", "scale_gain_sc"):
        assert name in models_dict, name
