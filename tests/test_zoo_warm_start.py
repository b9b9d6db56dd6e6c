"""CompressAI-zoo warm-start parity (reference models/__init__.py:25-35,81-90).

The reference warm-starts ScaleHyperpriorStanH from a downloaded
bmshj2018_hyperprior zoo checkpoint: delete_keys() drops the derived CDF
buffers, then load_state_dict(strict=False) fills every name+shape match
(transforms AND the entropy-bottleneck chain — the stanh EB shares the
`entropy_bottleneck._matrix{i}` names) while stanh-specific params keep
their init. `warm_start_codec` reproduces that from a local state-dict file.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reslic_tcm_tpu.models.stanh.variants import make_scale_stanh  # noqa: E402
from reslic_tcm_tpu.utils.torch_convert import warm_start_codec  # noqa: E402

N, M = 32, 48

GCFG = dict(beta=10, num_sigmoids=0, activation="aann", symmetry=False,
            gap_factor=0, extrema=5, trainable=True)


def _bmshj2018_state_dict(rng):
    """Synthetic state dict with the exact key/shape layout of a CompressAI
    bmshj2018_hyperprior(N=32, M=48) checkpoint, CDF buffers included."""
    t = lambda *s: torch.from_numpy(rng.normal(scale=0.1, size=s).astype(np.float32))
    sd = {}
    # g_a: conv5x5 s2 / GDN alternating
    chans = [(3, N), (N, N), (N, N), (N, M)]
    for j, (ci, co) in enumerate(chans):
        sd[f"g_a.{2 * j}.weight"] = t(co, ci, 5, 5)
        sd[f"g_a.{2 * j}.bias"] = t(co)
        if j < 3:
            sd[f"g_a.{2 * j + 1}.beta"] = t(N)
            sd[f"g_a.{2 * j + 1}.gamma"] = t(N, N)
    # g_s: deconv5x5 s2 / IGDN alternating (ConvTranspose2d stores [I, O, kh, kw])
    chans = [(M, N), (N, N), (N, N), (N, 3)]
    for j, (ci, co) in enumerate(chans):
        sd[f"g_s.{2 * j}.weight"] = t(ci, co, 5, 5)
        sd[f"g_s.{2 * j}.bias"] = t(co)
        if j < 3:
            sd[f"g_s.{2 * j + 1}.beta"] = t(N)
            sd[f"g_s.{2 * j + 1}.gamma"] = t(N, N)
    # h_a: conv3x3 s1, relu, conv5x5 s2, relu, conv5x5 s2
    sd["h_a.0.weight"] = t(N, M, 3, 3); sd["h_a.0.bias"] = t(N)
    sd["h_a.2.weight"] = t(N, N, 5, 5); sd["h_a.2.bias"] = t(N)
    sd["h_a.4.weight"] = t(N, N, 5, 5); sd["h_a.4.bias"] = t(N)
    # h_s: deconv5x5 s2, relu, deconv5x5 s2, relu, conv3x3 s1
    sd["h_s.0.weight"] = t(N, N, 5, 5); sd["h_s.0.bias"] = t(N)
    sd["h_s.2.weight"] = t(N, N, 5, 5); sd["h_s.2.bias"] = t(N)
    sd["h_s.4.weight"] = t(M, N, 3, 3); sd["h_s.4.bias"] = t(M)
    # entropy bottleneck chain (filters (3,3,3,3)) + quantiles
    filt = [1, 3, 3, 3, 3, 1]
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = t(N, filt[i + 1], filt[i])
        sd[f"entropy_bottleneck._bias{i}"] = t(N, filt[i + 1], 1)
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = t(N, filt[i + 1], 1)
    sd["entropy_bottleneck.quantiles"] = t(N, 1, 3)
    # derived CDF buffers: present in a zoo checkpoint after update();
    # delete_keys() semantics say these must be ignored
    sd["entropy_bottleneck._quantized_cdf"] = torch.zeros(N, 17, dtype=torch.int32)
    sd["entropy_bottleneck._offset"] = torch.zeros(N, dtype=torch.int32)
    sd["entropy_bottleneck._cdf_length"] = torch.zeros(N, dtype=torch.int32)
    sd["gaussian_conditional._quantized_cdf"] = torch.zeros(64, 10, dtype=torch.int32)
    sd["gaussian_conditional._offset"] = torch.zeros(64, dtype=torch.int32)
    sd["gaussian_conditional._cdf_length"] = torch.zeros(64, dtype=torch.int32)
    sd["gaussian_conditional.scale_table"] = torch.zeros(64)
    return sd


def test_zoo_warm_start_cross_entropy_model(tmp_path):
    rng = np.random.default_rng(3)
    sd = _bmshj2018_state_dict(rng)
    path = tmp_path / "bmshj2018_hyperprior_q5.pth.tar"
    torch.save({"state_dict": sd}, path)

    codec = make_scale_stanh([GCFG], N=N, M=M, fact_stanh=True,
                             rng=jax.random.PRNGKey(0), input_shape=(64, 64))
    init_params = jax.tree_util.tree_map(np.asarray, codec.params)

    report = warm_start_codec(codec, str(path))
    p = codec.params

    # transforms warmed (layout-transformed)
    np.testing.assert_allclose(
        np.asarray(p["g_a"]["layers_0"]["conv"]["kernel"]),
        sd["g_a.0.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["g_a"]["layers_1"]["gamma"]),
        sd["g_a.1.gamma"].numpy(), rtol=1e-6)
    # deconv: IOHW -> flip -> HWIO
    w = sd["g_s.0.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(p["g_s"]["layers_0"]["kernel"]),
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1), rtol=1e-6)
    # EB chain warmed through the entropy_bottleneck_stanh rename
    np.testing.assert_allclose(
        np.asarray(p["entropy_bottleneck_stanh"]["matrix1"]),
        sd["entropy_bottleneck._matrix1"].numpy(), rtol=1e-6)
    # stanh params have no torch twin -> keep init
    np.testing.assert_array_equal(
        np.asarray(p["entropy_bottleneck_stanh"]["stanh"]["w"]),
        init_params["entropy_bottleneck_stanh"]["stanh"]["w"])
    assert any("stanh" in ".".join(m[0].split(".")) or "stanh" in m[0]
               for m in report["missing"])

    # CDF buffers ignored WITHOUT appearing as unexpected keys
    assert not any("_quantized_cdf" in k or "_offset" in k or
                   "_cdf_length" in k or "scale_table" in k
                   for k in report["unused"])
    # quantiles is stanh-EB-absent here; tolerated either way
    leftovers = [k for k in report["unused"] if "quantiles" not in k]
    assert leftovers == [], f"unexpected unused torch keys: {leftovers}"

    # the warm-started model is functional
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    out = codec.module.apply(codec.variables, x, training=False,
                             rngs={"noise": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out["x_hat"])).all()
