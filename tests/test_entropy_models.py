import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.entropy import factorized as fz
from reslic_tcm_tpu.entropy.gaussian import GaussianConditional
from reslic_tcm_tpu.ops.math import get_scale_table


def _init_eb(channels=8, seed=0):
    eb = fz.EntropyBottleneck(channels=channels)
    x = jnp.zeros((1, 4, 4, channels))
    variables = eb.init(
        {"params": jax.random.PRNGKey(seed), "noise": jax.random.PRNGKey(seed + 1)},
        x,
        training=True,
    )
    return eb, variables


def test_entropy_bottleneck_forward_shapes_and_bounds():
    eb, variables = _init_eb()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8)) * 3
    xh, lik = eb.apply(variables, x, training=True, rngs={"noise": jax.random.PRNGKey(3)})
    assert xh.shape == x.shape and lik.shape == x.shape
    lik = np.asarray(lik)
    assert (lik > 0).all() and (lik <= 1.0 + 1e-6).all()
    # noise quantization stays within 0.5 of the input
    assert np.abs(np.asarray(xh) - np.asarray(x)).max() <= 0.5 + 1e-6


def test_entropy_bottleneck_eval_rounds_to_medians():
    eb, variables = _init_eb()
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 8)) * 2
    xh, _ = eb.apply(variables, x, training=False)
    med = eb.apply(variables, method=lambda m: m.medians())
    want = np.round(np.asarray(x) - np.asarray(med)) + np.asarray(med)
    assert np.allclose(np.asarray(xh), want, atol=1e-6)


def test_entropy_bottleneck_aux_loss_positive_and_differentiable():
    eb, variables = _init_eb()

    def loss_fn(params):
        return eb.apply({"params": params}, method=lambda m: m.aux_loss())

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert float(val) > 0
    gq = np.asarray(grads["quantiles"])
    assert np.abs(gq).sum() > 0
    # aux loss only touches quantiles-vs-chain; matrix grads exist too (chain
    # is stop-gradiented) -> matrix grads must be zero
    assert np.abs(np.asarray(grads["matrix0"])).sum() == 0


def test_entropy_bottleneck_likelihood_integrates_to_one():
    """Sum of likelihoods over all integers ~ 1 for each channel."""
    eb, variables = _init_eb(channels=4)
    grid = jnp.arange(-150, 151, dtype=jnp.float32)
    x = jnp.tile(grid[None, :, None, None], (1, 1, 1, 4))

    # evaluate likelihood at integer points via eval-mode forward
    xh, lik = eb.apply(variables, x, training=False)
    totals = np.asarray(lik).sum(axis=1).reshape(-1)
    assert np.all(totals > 0.98) and np.all(totals < 1.02)


def test_entropy_bottleneck_roundtrip_coding():
    eb, variables = _init_eb(channels=6, seed=10)
    params = variables["params"]
    tables = fz.build_tables(params)
    rng = np.random.default_rng(11)
    z = rng.normal(scale=4.0, size=(2, 8, 8, 6)).astype(np.float32)
    med = np.asarray(params["quantiles"][:, 0, 1])

    strings = fz.compress(z, med, tables)
    assert all(isinstance(s, bytes) and len(s) > 0 for s in strings)
    out = fz.decompress(strings, (8, 8), med, tables)
    want = np.round(z - med.reshape(1, 1, 1, -1)) + med.reshape(1, 1, 1, -1)
    assert np.allclose(out, want, atol=1e-5)


def test_entropy_bottleneck_coded_size_tracks_estimate():
    """Real bitstream length within a few percent of the -log2 estimate."""
    eb, variables = _init_eb(channels=16, seed=12)
    params = variables["params"]
    tables = fz.build_tables(params)
    rng = np.random.default_rng(13)
    z = rng.normal(scale=3.0, size=(1, 32, 32, 16)).astype(np.float32)

    _, lik = eb.apply(variables, jnp.asarray(z), training=False)
    est_bits = -np.log2(np.asarray(lik)).sum()
    med = np.asarray(params["quantiles"][:, 0, 1])
    strings = fz.compress(z, med, tables)
    actual_bits = len(strings[0]) * 8
    assert abs(actual_bits - est_bits) / est_bits < 0.05


def test_gaussian_conditional_roundtrip():
    gc = GaussianConditional().update_scale_table()
    rng = np.random.default_rng(14)
    shape = (2, 16, 16, 8)
    scales = rng.uniform(0.05, 10.0, size=shape).astype(np.float32)
    means = rng.normal(size=shape).astype(np.float32)
    y = means + rng.normal(size=shape).astype(np.float32) * scales

    idx = np.asarray(gc.indexes(jnp.asarray(scales)))
    strings = gc.compress(y, idx, means)
    out = gc.decompress(strings, idx, means)
    want = np.rint(y - means) + means
    assert np.allclose(out, want, atol=1e-5)


def test_gaussian_conditional_coded_size_tracks_estimate():
    gc = GaussianConditional().update_scale_table()
    rng = np.random.default_rng(15)
    shape = (1, 32, 32, 16)
    scales = rng.uniform(0.2, 4.0, size=shape).astype(np.float32)
    y = rng.normal(size=shape).astype(np.float32) * scales

    y_hat = np.rint(y)
    lik = np.asarray(gc.likelihood(jnp.asarray(y_hat), jnp.asarray(scales)))
    est_bits = -np.log2(lik).sum()
    idx = np.asarray(gc.indexes(jnp.asarray(scales)))
    strings = gc.compress(y, idx)
    actual_bits = len(strings[0]) * 8
    # indexed-table coding quantizes sigma upward -> small overhead only
    assert actual_bits < est_bits * 1.10 + 64
    assert actual_bits > est_bits * 0.90
