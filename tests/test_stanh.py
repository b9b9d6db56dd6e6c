"""STanH quantizer + adaptive entropy model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.entropy import stanh as sq
from reslic_tcm_tpu.entropy.annealings import (
    RandomAnnealing,
    StanhAnnealing,
    TriangleAnnealing,
    configure_annealings,
)
from reslic_tcm_tpu.entropy.stanh_models import (
    StanhGaussianConditional,
    build_stanh_scale_tables,
    stanh_gaussian_likelihood,
)


def _state(symmetric, seed=0, perturb=True):
    w, b = sq.init_w_b(0, 5, symmetric)
    if perturb:
        rng = np.random.default_rng(seed)
        w = w * rng.uniform(0.7, 1.4, w.shape).astype(np.float32)
        b = b + rng.uniform(-0.2, 0.2, b.shape).astype(np.float32)
    return sq.derive_state(jnp.asarray(w), jnp.asarray(b), symmetric)


@pytest.mark.parametrize("symmetric", [False, True])
def test_soft_converges_to_hard(symmetric):
    state = _state(symmetric)
    x = jnp.linspace(-6, 6, 301)
    hard = sq.hard_quantize(x, state, symmetric)
    soft_hi = sq.soft_quantize(x, state, jnp.float32(5000.0))
    # away from thresholds the soft staircase matches the hard one
    d = np.abs(np.asarray(x)[:, None] - np.asarray(state.b)[None, :]).min(1)
    mask = d > 0.05
    np.testing.assert_allclose(
        np.asarray(soft_hi)[mask], np.asarray(hard)[mask], atol=1e-3
    )


@pytest.mark.parametrize("symmetric", [False, True])
def test_symbols_roundtrip_matches_hard(symmetric):
    state = _state(symmetric, seed=3)
    x = jnp.asarray(np.random.default_rng(4).uniform(-8, 8, 2000), jnp.float32)
    hard = sq.hard_quantize(x, state, symmetric)
    k = sq.to_symbols(x, state)
    recon = sq.from_symbols(k, state)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(hard), atol=1e-5)
    assert int(k.min()) >= 0 and int(k.max()) < state.cum_w.shape[0]


def test_levels_structure_nonsym():
    state = _state(False, perturb=False)
    cw = np.asarray(state.cum_w)
    assert cw.shape == (11,)  # extrema=5, num_sigmoids=0 -> 10 steps, 11 levels
    np.testing.assert_allclose(cw, np.arange(-5, 6), atol=1e-6)


def test_levels_structure_sym():
    state = _state(True, perturb=False)
    cw = np.asarray(state.cum_w)
    assert cw.shape == (11,)
    np.testing.assert_allclose(cw, np.arange(-5, 6), atol=1e-6)
    np.testing.assert_allclose(cw, -cw[::-1], atol=1e-6)  # exact symmetry


def test_interval_likelihood_sums_to_one_minus_tail():
    """P over all levels = 1 - mass outside the outermost intervals (that
    tail is what the coder's bypass bin absorbs)."""
    import scipy.stats

    state = _state(False, seed=5)
    levels = state.cum_w
    cw = np.asarray(state.cum_w)
    for s in [0.3, 1.0, 4.0]:
        lik = stanh_gaussian_likelihood(
            levels, jnp.full_like(levels, s), state, likelihood_bound=0
        )
        total = float(np.asarray(lik).sum())
        tail = scipy.stats.norm.cdf(cw[0] / s) + (1 - scipy.stats.norm.cdf(cw[-1] / s))
        assert abs(total - (1 - tail)) < 0.02, (s, total, tail)


def test_uniform_init_matches_unit_gaussian_likelihood():
    """At init (unit steps) the stanh likelihood must equal the standard
    rounding likelihood on integer values."""
    from reslic_tcm_tpu.ops.math import gaussian_likelihood

    state = _state(False, perturb=False)
    v = jnp.asarray([-3.0, -1.0, 0.0, 2.0, 4.0])
    s = jnp.asarray([0.5, 1.0, 2.0, 3.0, 0.2])
    got = stanh_gaussian_likelihood(v, s, state, likelihood_bound=0)
    want = gaussian_likelihood(v, s, None, likelihood_bound=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_scale_tables_consistent_with_likelihood():
    state = _state(False, seed=6)
    w = np.asarray(state.w)  # build from same params
    from reslic_tcm_tpu.ops.math import get_scale_table

    table = np.asarray(get_scale_table())
    w0, b0 = sq.init_w_b(0, 5, False)
    t = build_stanh_scale_tables(w0, b0, False, table)
    assert t.quantized_cdf.shape[0] == 64
    assert (t.offset == 0).all()
    assert (np.diff(t.quantized_cdf, axis=1)[:, : t.cdf_length[0] - 1] > 0).all()


def test_gap_shrinks_with_beta():
    state = _state(False)
    y = jnp.asarray(np.random.default_rng(7).normal(0, 2, 4000), jnp.float32)
    gaps = []
    for beta in [1.0, 10.0, 100.0]:
        soft = sq.soft_quantize(y, state, jnp.float32(beta))
        hard = sq.hard_quantize(y, state, False)
        gaps.append(float(sq.compute_gap(y, soft, hard)))
    assert gaps[2] < gaps[0]


def test_annealing_schedules():
    a = StanhAnnealing(beta=1.0, factor=10.0, type="gap")
    b0 = a.beta
    a.step(gap=0.5)
    assert a.beta == b0 + 5.0

    a = StanhAnnealing(beta=1.0, factor=10.0, type="gap_stoc", max_beta=100)
    for _ in range(50):
        a.step(gap=1.0)
    assert 1.0 <= a.beta <= 100.0

    a = StanhAnnealing(beta=1.0, type="constant")
    a.step(gap=9.9)
    assert a.beta == 1.0

    a = StanhAnnealing(beta=1.0, factor=2.0, type="AugmentBetaOnPlateau",
                       patience=1, threshold=1e-3)
    for _ in range(5):
        a.step(loss=1.0, plateau=True)
    assert a.beta > 1.0

    r = RandomAnnealing(left_beta=2.0, right_beta=3.0)
    r.step()
    assert 2.0 <= r.beta <= 3.0

    t = TriangleAnnealing(beta=5.0, factor=1.0)
    t.step(gap=2.0)
    assert 1.0 <= t.beta <= 7.0

    cfg = {"annealing": "gap", "beta": 2.0, "gap_factor": 3.0}
    s = configure_annealings(cfg)
    assert isinstance(s, StanhAnnealing) and s.beta == 2.0
    assert configure_annealings({"annealing": "none"}) is None


def test_stanh_gc_module_forward():
    m = StanhGaussianConditional(n_rates=3, num_sigmoids=0, extrema=5)
    rng = np.random.default_rng(8)
    y = jnp.asarray(rng.normal(0, 2, (1, 4, 4, 8)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.2, 3, (1, 4, 4, 8)), jnp.float32)
    mu = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), y, s, mu)
    assert v["params"]["stanh"]["w"].shape == (3, 10)

    for lv in range(3):
        y_hat, lik = m.apply(v, y, s, mu, training=True, beta=jnp.float32(50.0), lv=lv)
        assert y_hat.shape == y.shape
        assert (np.asarray(lik) > 0).all()
    # eval mode: hard, mean-centered
    y_hat, _ = m.apply(v, y, s, mu, training=False, lv=0)
    state = sq.derive_state(v["params"]["stanh"]["w"][0], v["params"]["stanh"]["b"][0], False)
    want = np.asarray(sq.hard_quantize(y - mu, state, False) + mu)
    np.testing.assert_allclose(np.asarray(y_hat), want, atol=1e-5)


def test_per_level_extrema_orders_rates_at_init():
    """Per-level extrema (fixed num_sigmoids, equal L) gives each rate level
    a different step size at init — the stacked-parameter equivalent of the
    reference's per-level ModuleList configs (models/__init__.py:38-116):
    coarser steps (larger extrema/num_sigmoids jump) -> fewer bits."""
    m = StanhGaussianConditional(
        n_rates=3, num_sigmoids=20, extrema=(20, 10, 5)
    )
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.normal(0, 2.5, (1, 8, 8, 16)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.3, 3, (1, 8, 8, 16)), jnp.float32)
    mu = jnp.zeros_like(y)
    v = m.init(jax.random.PRNGKey(0), y, s, mu)
    assert v["params"]["stanh"]["w"].shape == (3, 20)
    # row step sizes: 2*extrema/num_sigmoids approx (2e-1)/ns exactly
    w = np.asarray(v["params"]["stanh"]["w"])
    assert w[0, 0] > w[1, 0] > w[2, 0]

    bits = []
    for lv in range(3):
        _, lik = m.apply(v, y, s, mu, training=False, lv=lv)
        bits.append(float(-jnp.sum(jnp.log2(lik))))
    # coarse (lv 0) codes fewer bits than fine (lv 2)
    assert bits[0] < bits[1] < bits[2], bits


def test_per_level_unequal_L_rejected():
    with pytest.raises(ValueError, match="same number of steps"):
        sq.StanhQuantizer(n_rates=2, num_sigmoids=0, extrema=(10, 5)).init(
            jax.random.PRNGKey(0), 0, method=sq.StanhQuantizer.state
        )


def test_per_level_knobs_with_single_rate_fact_stanh():
    """ScaleHyperpriorStanh's factorized stanh is single-rate (reference
    builds one EntropyBottleneckStanh from factorized_configuration[0],
    balle18_stanh.py:36-47): per-level gaussian knobs must collapse to the
    level-0 value there instead of erroring."""
    from reslic_tcm_tpu.models.stanh.variants import ScaleHyperpriorStanh

    m = ScaleHyperpriorStanh(
        N=16, M=32, n_rates=3, num_sigmoids=8, extrema=(12, 6, 3),
        fact_stanh=True,
    )
    v = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), training=True,
    )
    assert v["params"]["gaussian_conditional"]["stanh"]["w"].shape == (3, 8)
    # EB stanh collapsed to level 0 (extrema=12), single rate row
    assert v["params"]["entropy_bottleneck_stanh"]["stanh"]["w"].shape == (1, 8)
    w_eb = np.asarray(v["params"]["entropy_bottleneck_stanh"]["stanh"]["w"])
    w_gc = np.asarray(v["params"]["gaussian_conditional"]["stanh"]["w"])
    np.testing.assert_allclose(w_eb[0], w_gc[0], atol=1e-6)


def test_per_level_cfg_normalization():
    assert sq.per_level_cfg(7, 3) == (7, 7, 7)
    assert sq.per_level_cfg([4], 3) == (4, 4, 4)
    assert sq.per_level_cfg((1, 2, 3), 3) == (1, 2, 3)
    with pytest.raises(ValueError):
        sq.per_level_cfg((1, 2), 3)
