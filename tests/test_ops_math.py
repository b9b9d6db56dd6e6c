import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from reslic_tcm_tpu.ops import math as om


def test_scale_table_matches_reference_values():
    t = np.asarray(om.get_scale_table())
    assert t.shape == (64,)
    assert np.isclose(t[0], 0.11, atol=1e-6)
    assert np.isclose(t[-1], 256.0, rtol=1e-5)
    # log-spaced
    ratios = t[1:] / t[:-1]
    assert np.allclose(ratios, ratios[0], rtol=1e-4)


def test_ste_round_value_and_gradient():
    x = jnp.array([0.2, 0.5, -1.7, 3.49])
    y = om.ste_round(x)
    assert np.allclose(np.asarray(y), np.array([0.0, 0.0, -2.0, 3.0]))  # round-half-even
    g = jax.grad(lambda v: jnp.sum(om.ste_round(v) * 2.0))(x)
    assert np.allclose(np.asarray(g), 2.0)


def test_lower_bound_gradient_semantics():
    def f(x):
        return jnp.sum(om.lower_bound(x, jnp.asarray(1.0)))

    g = jax.grad(f)(jnp.array([0.5, 1.5]))
    # below bound with positive upstream grad: blocked; above bound: passes
    assert np.allclose(np.asarray(g), [0.0, 1.0])

    def f_neg(x):
        return jnp.sum(-om.lower_bound(x, jnp.asarray(1.0)))

    g = jax.grad(f_neg)(jnp.array([0.5, 1.5]))
    # negative upstream grad passes even below the bound
    assert np.allclose(np.asarray(g), [-1.0, -1.0])


def test_gaussian_likelihood_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32) * 3
    mu = rng.normal(size=x.shape).astype(np.float32)
    sigma = (rng.uniform(0.2, 5.0, size=x.shape)).astype(np.float32)

    got = np.asarray(om.gaussian_likelihood(jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(mu)))
    v = np.abs(x - mu)
    want = scipy.stats.norm.cdf((0.5 - v) / sigma) - scipy.stats.norm.cdf((-0.5 - v) / sigma)
    assert np.allclose(got, np.maximum(want, 1e-9), rtol=2e-4, atol=1e-7)


def test_gaussian_likelihood_scale_lower_bound():
    x = jnp.zeros((1, 1, 1, 1))
    tiny = om.gaussian_likelihood(x, jnp.full_like(x, 1e-6), None)
    bounded = om.gaussian_likelihood(x, jnp.full_like(x, 0.11), None)
    assert np.allclose(np.asarray(tiny), np.asarray(bounded))


def test_build_indexes_matches_reference_loop():
    table = np.asarray(om.get_scale_table())
    rng = np.random.default_rng(2)
    scales = rng.uniform(0.01, 300.0, size=(2, 8, 8, 4)).astype(np.float32)

    got = np.asarray(om.build_indexes(jnp.asarray(scales), jnp.asarray(table)))

    # reference semantics (adaptive_gaussian_conditional.py:606-617)
    s = np.maximum(scales, table[0])
    want = np.full(s.shape, len(table) - 1, np.int32)
    for t in table[:-1]:
        want -= (s <= t).astype(np.int32)
    assert np.array_equal(got, want)
    # exact table values map to their own index
    exact = np.asarray(om.build_indexes(jnp.asarray(table), jnp.asarray(table)))
    assert np.array_equal(exact, np.arange(64))


def test_padding_roundtrip():
    pad, _ = om.compute_padding(500, 753, 64)
    x = jnp.ones((1, 500, 753, 3))
    xp = om.pad_nhwc(x, pad)
    assert xp.shape[1] % 64 == 0 and xp.shape[2] % 64 == 0
    xc = om.crop_nhwc(xp, pad)
    assert xc.shape == x.shape
    assert np.allclose(np.asarray(xc), 1.0)
