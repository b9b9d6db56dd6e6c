"""Entropy models under STanH quantization (adaptive bottleneck/conditional).

TPU-native re-implementation of the reference's adaptive entropy models
(reference entropy_models/adaptive_entropy_bottleneck.py:24-772 and
adaptive_gaussian_conditional.py:17-736):

* StanhGaussianConditional — conditional Gaussian likelihood integrated over
  the *non-uniform* STanH intervals (asymmetric positive/negative erfc
  branches), with per-rate-level stacked quantizer params.
* StanhEntropyBottleneck — the factorized learned-CDF chain with STanH
  quantization.

Coding note: the reference's stanh compress/decompress path is broken
(undefined names, float offsets fed to the integer coder — see SURVEY.md
section 7.4); here the codec path is *designed correct*: symbols are level
indexes (offset 0), CDF rows integrate the model pmf over stanh levels, and
encode/decode are mutually bit-exact (mirrored compiled programs). The
separately-compiled monolithic eval forward can differ from the codec by
fp-level rounding: near a staircase threshold b_i the (y - mu) difference
flips the symbol, and the finer the steps the more flips (measured on a
trained 3-level staircase: coarse/mid levels exact, finest level ~3% of
pixels at |x_hat diff| <= 0.013 — artifacts/eval_rd_stanh.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound, standardized_cumulative
from .factorized import CodingTables, logits_cumulative_chain
from . import stanh as sq


def stanh_gaussian_likelihood(
    values,
    scales,
    state: sq.StanhState,
    means=None,
    scale_bound: float = 0.11,
    likelihood_bound: float = 1e-9,
):
    """P(level bin of v | sigma) under non-uniform intervals
    (reference adaptive_gaussian_conditional.py:541-580)."""
    v = values - means if means is not None else values
    v0, v1 = sq.interval_bounds(v, state)
    s = lower_bound(scales, jnp.asarray(scale_bound, scales.dtype))

    pos = v >= 0
    upper = jnp.where(
        pos,
        standardized_cumulative((v0 - v) / s),
        standardized_cumulative((v + v1) / s),
    )
    lower = jnp.where(
        pos,
        standardized_cumulative((-v1 - v) / s),
        standardized_cumulative((v - v0) / s),
    )
    lik = upper - lower
    if likelihood_bound > 0:
        lik = lower_bound(lik, jnp.asarray(likelihood_bound, lik.dtype))
    return lik


class StanhGaussianConditional(nn.Module):
    """Per-rate-level STanH Gaussian conditional (reference
    adaptive_gaussian_conditional.py:312-617)."""

    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 5
    symmetric: bool = False
    trainable: bool = True
    removing_mean: bool = False
    scale_bound: float = 0.11
    likelihood_bound: float = 1e-9

    def setup(self):
        self.stanh = sq.StanhQuantizer(
            n_rates=self.n_rates,
            num_sigmoids=self.num_sigmoids,
            extrema=self.extrema,
            symmetric=self.symmetric,
            trainable=self.trainable,
        )

    def __call__(self, values, scales, means=None, training: bool = True,
                 beta=10.0, lv=0):
        state = self.stanh.state(lv)
        if training:
            # reference quantize("training"): mean removal only if configured
            if means is not None and self.removing_mean:
                y_hat = sq.soft_quantize(values - means, state, beta) + means
            else:
                y_hat = sq.soft_quantize(values, state, beta)
        else:
            # quantize("dequantize"): always mean-centered hard staircase
            if means is not None:
                y_hat = (
                    sq.hard_quantize(values - means, state, self.symmetric) + means
                )
            else:
                y_hat = sq.hard_quantize(values, state, self.symmetric)
        lik = stanh_gaussian_likelihood(
            y_hat, scales, state, means, self.scale_bound, self.likelihood_bound
        )
        return y_hat, lik

    def gap(self, values, beta, lv):
        state = self.stanh.state(lv)
        soft = sq.soft_quantize(values, state, beta)
        hard = sq.hard_quantize(values, state, self.symmetric)
        return sq.compute_gap(values, soft, hard)

    # ------------------------- codec-path helpers -------------------------

    def symbols(self, values, means, lv):
        state = self.stanh.state(lv)
        v = values - means if means is not None else values
        return sq.to_symbols(v, state)

    def dequantize(self, symbols, means, lv):
        state = self.stanh.state(lv)
        v = sq.from_symbols(symbols, state)
        return v + means if means is not None else v


def build_stanh_scale_tables(
    w: np.ndarray, b: np.ndarray, symmetric: bool, scale_table: np.ndarray
) -> CodingTables:
    """Per-scale-index CDF rows over the stanh levels (reference
    adaptive_gaussian_conditional.py:397-455, with offset=0 and symbols =
    level indexes — the corrected coding contract)."""
    from ..coding.rans import pmf_to_quantized_cdf

    state = sq.np_state(w, b, symmetric)
    samples = state.cum_w[None, :].astype(np.float32)  # [1, L]
    v0 = state.distance_left[None, :].astype(np.float32)
    v1 = state.distance_right[None, :].astype(np.float32)
    s = np.asarray(scale_table, np.float32)[:, None]  # [K, 1]

    pos = samples >= 0
    upper = np.where(pos, _cum((v0 - samples) / s), _cum((samples + v1) / s))
    lower = np.where(pos, _cum((-v1 - samples) / s), _cum((samples - v0) / s))
    pmf = np.maximum(upper - lower, 0.0)
    tail = np.maximum(2 * lower[:, :1], 1e-12)

    n_levels = samples.shape[1]
    k = s.shape[0]
    cdf = np.zeros((k, n_levels + 2), np.int32)
    for i in range(k):
        prob = np.concatenate([pmf[i], tail[i]], axis=0)
        q = pmf_to_quantized_cdf(prob, 16)
        cdf[i, : q.shape[0]] = q
    return CodingTables(
        quantized_cdf=cdf,
        cdf_length=np.full(k, n_levels + 2, np.int32),
        offset=np.zeros(k, np.int32),
    )


def _cum(x):
    import scipy.special

    return (0.5 * scipy.special.erfc(-(2**-0.5) * np.asarray(x, np.float64))).astype(
        np.float64
    )


class StanhEntropyBottleneck(nn.Module):
    """Factorized prior with STanH quantization (reference
    adaptive_entropy_bottleneck.py:299-708). No quantiles/aux loss — the
    stanh levels bound the support instead."""

    channels: int
    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 5
    symmetric: bool = False
    trainable: bool = True
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    likelihood_bound: float = 1e-9

    def setup(self):
        import math

        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        ch = self.channels
        chain = {}
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / f[i + 1]))
            chain[f"matrix{i}"] = self.param(
                f"matrix{i}",
                lambda rng, shape, v=init: jnp.full(shape, v, jnp.float32),
                (ch, f[i + 1], f[i]),
            )
            chain[f"bias{i}"] = self.param(
                f"bias{i}",
                lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -0.5, 0.5),
                (ch, f[i + 1], 1),
            )
            if i < len(self.filters):
                chain[f"factor{i}"] = self.param(
                    f"factor{i}", nn.initializers.zeros, (ch, f[i + 1], 1)
                )
        self._chain = chain
        self.stanh = sq.StanhQuantizer(
            n_rates=self.n_rates,
            num_sigmoids=self.num_sigmoids,
            extrema=self.extrema,
            symmetric=self.symmetric,
            trainable=self.trainable,
        )

    def _logits(self, inputs, stop_gradient: bool):
        return logits_cumulative_chain(self._chain, self.filters, inputs, stop_gradient)

    def _likelihood(self, values):
        """values: [C, 1, N]. Interval likelihood at absolute positions
        (reference adaptive_entropy_bottleneck.py:551-666)."""
        state = self.stanh.state(0)
        v0d, v1d = sq.interval_bounds(values, state)
        lower = self._logits(values - v0d, stop_gradient=False)
        upper = self._logits(values + v1d, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, x, training: bool = True, beta=10.0, lv=0):
        """x: NHWC -> (x_hat, likelihoods)."""
        bsz, h, w, c = x.shape
        values = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)
        state = self.stanh.state(0)
        if training:
            v_hat = sq.soft_quantize(values, state, beta)
        else:
            v_hat = sq.hard_quantize(values, state, self.symmetric)
        lik = self._likelihood(v_hat)
        if self.likelihood_bound > 0:
            lik = lower_bound(lik, jnp.asarray(self.likelihood_bound, lik.dtype))
        v_hat = v_hat.reshape(c, bsz, h, w).transpose(1, 2, 3, 0)
        lik = lik.reshape(c, bsz, h, w).transpose(1, 2, 3, 0)
        return v_hat, lik

    def gap(self, x, beta):
        c = x.shape[-1]
        values = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)
        state = self.stanh.state(0)
        soft = sq.soft_quantize(values, state, beta)
        hard = sq.hard_quantize(values, state, self.symmetric)
        return sq.compute_gap(values, soft, hard)

    def aux_loss(self):
        return jnp.zeros(())

    def medians_nhwc(self):
        return jnp.zeros((1, 1, 1, 1), jnp.float32)


def build_stanh_factorized_tables(
    chain_params: dict,
    w: np.ndarray,
    b: np.ndarray,
    symmetric: bool,
    filters: Tuple[int, ...] = (3, 3, 3, 3),
) -> CodingTables:
    """Per-channel CDF rows over stanh levels via the learned chain
    (reference adaptive_entropy_bottleneck.py:481-514)."""
    from ..coding.rans import pmf_to_quantized_cdf
    from .factorized import _np_logits_cumulative, _sigmoid

    state = sq.np_state(w, b, symmetric)
    channels = np.asarray(chain_params["matrix0"]).shape[0]
    lvl = state.cum_w.astype(np.float32)  # [L]
    samples = np.tile(lvl[None, None, :], (channels, 1, 1))  # [C,1,L]
    v0 = samples - state.distance_left[None, None, :]
    v1 = samples + state.distance_right[None, None, :]

    lower = _np_logits_cumulative(chain_params, filters, v0)
    upper = _np_logits_cumulative(chain_params, filters, v1)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]
    # mass outside the level range (below first / above last interval)
    tail = np.maximum(
        _sigmoid(lower[:, 0, :1]) + _sigmoid(-upper[:, 0, -1:]), 1e-12
    )

    n_levels = lvl.shape[0]
    cdf = np.zeros((channels, n_levels + 2), np.int32)
    for i in range(channels):
        prob = np.concatenate([pmf[i], tail[i]], axis=0)
        q = pmf_to_quantized_cdf(prob, 16)
        cdf[i, : q.shape[0]] = q
    return CodingTables(
        quantized_cdf=cdf,
        cdf_length=np.full(channels, n_levels + 2, np.int32),
        offset=np.zeros(channels, np.int32),
    )
