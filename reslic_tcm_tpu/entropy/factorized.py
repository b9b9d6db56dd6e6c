"""Factorized-prior entropy bottleneck, TPU-native.

Re-implements CompressAI's EntropyBottleneck (the univariate learned-CDF
factorized prior from Balle et al. 2018, used by every model in the reference
— e.g. reference models/reference/tcm.py:416) as a flax.linen module whose
forward pass is fully vectorized and jit-compiled; the CDF-table build for
real coding runs host-side (numpy + the native CDF quantizer).

The learned CDF is the matrix/bias/factor monotone-MLP chain; the reference's
own copy of the math is at
reference entropy_models/adaptive_entropy_bottleneck.py:525-543.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound


@dataclasses.dataclass(frozen=True)
class CodingTables:
    """Derived integer-CDF state built by update(); not checkpointed."""

    quantized_cdf: np.ndarray  # int32 [num_indexes, max_cdf_length]
    cdf_length: np.ndarray  # int32 [num_indexes]
    offset: np.ndarray  # int32 [num_indexes]


def logits_cumulative_chain(params: dict, filters: Tuple[int, ...], inputs, stop_gradient: bool):
    """Monotone cumulative-logit chain c(x); sigmoid(c) is the learned CDF.

    params holds matrix{i} [C, f_{i+1}, f_i], bias{i} [C, f_{i+1}, 1] and
    factor{i} [C, f_{i+1}, 1]; inputs is [C, 1, N].
    """
    logits = inputs
    for i in range(len(filters) + 1):
        matrix = params[f"matrix{i}"]
        bias = params[f"bias{i}"]
        if stop_gradient:
            matrix = jax.lax.stop_gradient(matrix)
            bias = jax.lax.stop_gradient(bias)
        logits = jnp.matmul(jax.nn.softplus(matrix), logits) + bias
        if i < len(filters):
            factor = params[f"factor{i}"]
            if stop_gradient:
                factor = jax.lax.stop_gradient(factor)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


class EntropyBottleneck(nn.Module):
    """Learned factorized prior over a [B, H, W, C] latent (NHWC).

    Call returns (values_hat, likelihoods); training quantization is
    additive-uniform noise, eval is round-to-medians — identical semantics to
    CompressAI's module at matched weights.
    """

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
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
        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([[[-self.init_scale, 0.0, self.init_scale]]], jnp.float32),
                (ch, 1, 1),
            ),
            (ch, 1, 3),
        )

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        return logits_cumulative_chain(self._chain, self.filters, inputs, stop_gradient)

    def medians(self) -> jnp.ndarray:
        """Per-channel median of the learned distribution, shape [C]."""
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def medians_nhwc(self) -> jnp.ndarray:
        """Medians broadcastable against an NHWC latent: [1, 1, 1, C]."""
        return self.medians()[None, None, None, :]

    def _likelihood(self, values):
        """values: [C, 1, N] (already channels-major)."""
        half = jnp.asarray(0.5, values.dtype)
        lower = self._logits_cumulative(values - half, stop_gradient=False)
        upper = self._logits_cumulative(values + half, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, x: jnp.ndarray, training: bool = True, noise_rng=None):
        """x: NHWC. Returns (x_hat, likelihoods) both NHWC."""
        b, h, w, c = x.shape
        values = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)

        medians = self.medians()[:, None, None]
        if training:
            if noise_rng is None:
                noise_rng = self.make_rng("noise")
            noise = jax.random.uniform(noise_rng, values.shape, values.dtype, -0.5, 0.5)
            values_hat = values + noise
        else:
            values_hat = jnp.round(values - medians) + medians

        likelihood = self._likelihood(values_hat)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(
                likelihood, jnp.asarray(self.likelihood_bound, likelihood.dtype)
            )

        values_hat = values_hat.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        likelihood = likelihood.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        return values_hat, likelihood

    def aux_loss(self) -> jnp.ndarray:
        """Quantile-fitting loss optimized by the separate aux Adam
        (semantics of CompressAI EntropyBottleneck.loss; see the reference's
        docstring at models/base.py:104-131)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2 / self.tail_mass - 1)
        target = jnp.array([-t, 0.0, t], jnp.float32)[None, None, :]
        return jnp.sum(jnp.abs(logits - target))


# ----------------------------------------------------------------------------
# Host-side derived state (CDF tables) + coding. Pure functions over the
# parameter pytree so they work outside any linen context.
# ----------------------------------------------------------------------------


def _np_logits_cumulative(params: dict, filters: Tuple[int, ...], inputs: np.ndarray):
    logits = inputs.astype(np.float32)
    for i in range(len(filters) + 1):
        matrix = np.asarray(params[f"matrix{i}"], np.float32)
        logits = np.matmul(np.logaddexp(0.0, matrix), logits)  # softplus
        logits = logits + np.asarray(params[f"bias{i}"], np.float32)
        if i < len(filters):
            factor = np.asarray(params[f"factor{i}"], np.float32)
            logits = logits + np.tanh(factor) * np.tanh(logits)
    return logits


def build_tables(params: dict, filters: Tuple[int, ...] = (3, 3, 3, 3)) -> CodingTables:
    """Rebuild integer CDF tables from the learned chain + quantiles.

    Same construction as CompressAI EntropyBottleneck.update(): support
    [median - minima, median + maxima] from the fitted quantiles, pmf from
    sigmoid of the cumulative logits at sample ± 0.5, then the deterministic
    integer quantizer. Derived state — never checkpointed.
    """
    from ..coding.rans import pmf_to_quantized_cdf

    quantiles = np.asarray(params["quantiles"], np.float32)
    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0)
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0)

    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float32)
    samples = samples[None, None, :] + pmf_start[:, None, None]  # [C,1,L]

    half = np.float32(0.5)
    lower = _np_logits_cumulative(params, filters, samples - half)
    upper = _np_logits_cumulative(params, filters, samples + half)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]
    tail_mass = _sigmoid(lower[:, 0, :1]) + _sigmoid(-upper[:, 0, -1:])

    c = pmf.shape[0]
    cdf = np.zeros((c, max_length + 2), dtype=np.int32)
    for i in range(c):
        prob = np.concatenate([pmf[i, : pmf_length[i]], tail_mass[i]], axis=0)
        q = pmf_to_quantized_cdf(prob, 16)
        cdf[i, : q.shape[0]] = q

    return CodingTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-minima).astype(np.int32),
    )


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _channel_indexes(shape_bhwc) -> np.ndarray:
    """Per-element CDF index = channel id, flattened channels-major [C*B*H*W]."""
    b, h, w, c = shape_bhwc
    return np.repeat(np.arange(c, dtype=np.int32), b * h * w)


def compress(z: np.ndarray, medians: np.ndarray, tables: CodingTables) -> list[bytes]:
    """Encode an NHWC latent to one string per batch element."""
    from ..coding.rans import encode_with_indexes

    z = np.asarray(z, np.float32)
    b, h, w, c = z.shape
    med = np.asarray(medians, np.float32).reshape(1, 1, 1, c)
    symbols = np.rint(z - med).astype(np.int32)
    # channels-major flattening to match index layout
    symbols = symbols.transpose(3, 0, 1, 2)
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    strings = []
    for i in range(b):
        strings.append(
            encode_with_indexes(
                symbols[:, i].reshape(-1),
                indexes,
                tables.quantized_cdf,
                tables.cdf_length,
                tables.offset,
            )
        )
    return strings


def decompress(
    strings: list[bytes], shape_hw, medians: np.ndarray, tables: CodingTables
) -> np.ndarray:
    """Decode strings back to the NHWC latent (medians re-added)."""
    from ..coding.rans import decode_with_indexes

    h, w = shape_hw
    c = tables.quantized_cdf.shape[0]
    indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
    out = np.empty((len(strings), h, w, c), np.float32)
    med = np.asarray(medians, np.float32).reshape(c, 1)
    for i, s in enumerate(strings):
        vals = decode_with_indexes(
            s, indexes, tables.quantized_cdf, tables.cdf_length, tables.offset
        )
        vals = vals.reshape(c, h * w).astype(np.float32) + med
        out[i] = vals.reshape(c, h, w).transpose(1, 2, 0)
    return out
