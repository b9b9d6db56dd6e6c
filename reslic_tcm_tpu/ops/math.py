"""Core quantization / likelihood math, TPU-native (pure JAX).

Re-implements the numerical primitives the reference stack gets from
CompressAI + torch (reference: /root/reference/src/models/reference/tcm.py:26-37,
src/models/reference/utils.py:6-19, and CompressAI's LowerBound /
GaussianConditional internals) as vectorized, jit-friendly JAX functions.

Everything here is shape-polymorphic, dtype-explicit and free of Python-level
control flow on traced values, so it fuses cleanly under XLA.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# From Balle's tensorflow compression examples (reference tcm.py:26-28).
SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(
    min_scale: float = SCALES_MIN,
    max_scale: float = SCALES_MAX,
    levels: int = SCALES_LEVELS,
) -> jnp.ndarray:
    """Log-spaced table of Gaussian scales (reference tcm.py:33-34)."""
    return jnp.exp(
        jnp.linspace(math.log(min_scale), math.log(max_scale), levels, dtype=jnp.float32)
    )


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through gradient (reference tcm.py:36-37)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """max(x, bound) with CompressAI's gradient semantics.

    The gradient passes through where ``x >= bound`` OR where the incoming
    gradient pushes x *down* past the bound would be blocked — i.e. grad flows
    if ``x >= bound`` or ``g < 0`` (identical to compressai.ops.LowerBound).
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def standardized_cumulative(inputs: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF via erfc for max numerical precision.

    Matches GaussianConditional._standardized_cumulative
    (reference tcm.py:584-588).
    """
    half = jnp.asarray(0.5, inputs.dtype)
    const = jnp.asarray(-(2 ** -0.5), inputs.dtype)
    return half * jax.lax.erfc(const * inputs)


def gaussian_likelihood(
    inputs: jnp.ndarray,
    scales: jnp.ndarray,
    means: jnp.ndarray | None = None,
    scale_bound: float = SCALES_MIN,
    likelihood_bound: float = 1e-9,
) -> jnp.ndarray:
    """P(round(x - mu) | sigma) under a unit-width quantizer.

    Mirrors CompressAI GaussianConditional._likelihood (also inlined at
    reference tcm.py:570-582): fold to |values|, integrate the standard
    normal between (-0.5 - v)/s and (0.5 - v)/s.
    """
    values = inputs - means if means is not None else inputs
    scales = lower_bound(scales, jnp.asarray(scale_bound, scales.dtype))
    values = jnp.abs(values)
    upper = standardized_cumulative((0.5 - values) / scales)
    lower = standardized_cumulative((-0.5 - values) / scales)
    likelihood = upper - lower
    if likelihood_bound is not None and likelihood_bound > 0:
        likelihood = lower_bound(
            likelihood, jnp.asarray(likelihood_bound, likelihood.dtype)
        )
    return likelihood


def quantize_noise(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Additive-uniform-noise surrogate quantizer used at train time."""
    noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    return x + noise


def quantize_ste_offset(x: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """STE-round around an offset: ste_round(x - offset) + offset.

    This is the z_hat path in the reference forward (tcm.py:431-433).
    """
    return ste_round(x - offset) + offset


def build_indexes(scales: jnp.ndarray, scale_table: jnp.ndarray) -> jnp.ndarray:
    """Map each sigma to the index of the smallest table scale >= sigma.

    Semantics of GaussianConditional.build_indexes (and the stanh variant at
    reference adaptive_gaussian_conditional.py:606-617): start from
    len(table)-1 and subtract 1 for every table entry (except the last) that
    is >= the value. Vectorized as a sum over the table axis.
    """
    scales = lower_bound(scales, scale_table[0].astype(scales.dtype))
    # indexes = (L-1) - sum_{s in table[:-1]} [scales <= s]
    le = scales[..., None] <= scale_table[:-1].astype(scales.dtype)
    return (scale_table.shape[0] - 1 - jnp.sum(le, axis=-1)).astype(jnp.int32)


def compute_padding(h: int, w: int, min_div: int = 64):
    """Centered padding to the next multiple of min_div.

    Same contract as compressai.ops.compute_padding used at
    reference training/step.py:237 and the pad() helper in eval.py:33-47.
    Returns (pad, unpad) as ((top, bottom), (left, right)) tuples for
    jnp.pad on NHWC, plus the inverse crop slices.
    """
    new_h = (h + min_div - 1) // min_div * min_div
    new_w = (w + min_div - 1) // min_div * min_div
    pad_left = (new_w - w) // 2
    pad_right = new_w - w - pad_left
    pad_top = (new_h - h) // 2
    pad_bottom = new_h - h - pad_top
    pad = (pad_top, pad_bottom, pad_left, pad_right)
    unpad = (-pad_top, -pad_bottom, -pad_left, -pad_right)
    return pad, unpad


def pad_nhwc(x: jnp.ndarray, pad) -> jnp.ndarray:
    top, bottom, left, right = pad
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


def crop_nhwc(x: jnp.ndarray, pad) -> jnp.ndarray:
    top, bottom, left, right = pad
    h, w = x.shape[1], x.shape[2]
    return x[:, top : h - bottom, left : w - right, :]
