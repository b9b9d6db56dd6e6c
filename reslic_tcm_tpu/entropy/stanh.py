"""STanH: learnable sum-of-tanh soft-to-hard quantizer, TPU-native.

Re-implements the reference's parametric quantizer (reference
quantization/activation.py: NonSymStanH at :7, SymStanH at :157): a staircase
of `L` steps with learnable heights `w` and positions `b`, smoothed by a
temperature beta —

    soft(x)  = sum_i (w_i / 2) * (2*sigmoid(2*beta*(x - b_i)) - 1)
    hard(x)  = the beta -> inf limit (an exact staircase over levels cum_w)

Derived state (cumulative levels `cum_w`, decision midpoints, half-widths)
is recomputed functionally from (w, b) inside the jitted step — the
reference's mutate-in-place `update_state()` (activation.py:72-78) becomes
pure functions, and its per-element Python symbol-mapping dictionaries
(adaptive_gaussian_conditional.py:149-152) become a single vectorized
searchsorted.

beta is a host-controlled argument (annealing schedules mutate it between
steps), and per-lambda quantizers are a stacked [n_rates, L] parameter
indexed by a traced `lv` — no Python ModuleList, no recompilation across
rate levels.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class StanhState(NamedTuple):
    """Derived quantizer state for one rate level (all computable in-graph)."""

    w: jnp.ndarray  # effective step heights (mirrored for symmetric)
    b: jnp.ndarray  # effective sorted step positions
    cum_w: jnp.ndarray  # quantization levels, ascending
    average_points: jnp.ndarray  # decision thresholds between levels
    distance_left: jnp.ndarray  # half-width to left neighbor, per level
    distance_right: jnp.ndarray  # half-width to right neighbor, per level


def init_w_b(num_sigmoids: int, extrema: int, symmetric: bool):
    """Reference initialization (activation.py:18-39, 171-194)."""
    if symmetric:
        rng = np.arange(0.5, extrema, 1.0, dtype=np.float32)
        if num_sigmoids > 0:
            jump = len(rng) / num_sigmoids
            b = np.arange(jump / 2, extrema + jump / 2, len(rng) / num_sigmoids,
                          dtype=np.float32)[:num_sigmoids]
            w = np.full(num_sigmoids, jump, np.float32)
        else:
            b = rng.copy()
            w = np.ones(len(rng), np.float32)
    else:
        rng = np.arange(-extrema + 0.5, extrema, 1.0, dtype=np.float32)
        if num_sigmoids > 0:
            jump = len(rng) / num_sigmoids
            b = np.arange(-extrema + jump / 2, extrema + jump / 2,
                          len(rng) / num_sigmoids, dtype=np.float32)[:num_sigmoids]
            w = np.full(num_sigmoids, jump, np.float32)
        else:
            b = rng.copy()
            w = np.ones(len(rng), np.float32)
    return w, b


def derive_state(w, b, symmetric: bool) -> StanhState:
    """Pure version of update_state() (activation.py:72-98, 214-234)."""
    if symmetric:
        w_eff = jnp.concatenate([jnp.flip(w, 0), w], axis=0)
        b_eff = jnp.sort(jnp.concatenate([-jnp.flip(b, 0), b], axis=0))
        half = jnp.cumsum(w, axis=0)
        cum_w = jnp.concatenate(
            [-jnp.flip(half, 0), jnp.zeros((1,), w.dtype), half], axis=0
        )
    else:
        w_eff = w
        b_eff = jnp.sort(b)
        cum = jnp.concatenate([jnp.zeros((1,), w.dtype), jnp.cumsum(w, axis=0)])
        cum_w = cum - jnp.sum(w) / 2

    avg = (cum_w[1:] + cum_w[:-1]) / 2
    dist = (cum_w[1:] - cum_w[:-1]) / 2
    zero = jnp.zeros((1,), w.dtype)
    return StanhState(
        w=w_eff,
        b=b_eff,
        cum_w=cum_w,
        average_points=avg,
        distance_left=jnp.concatenate([zero, dist]),
        distance_right=jnp.concatenate([dist, zero]),
    )


def soft_quantize(x, state: StanhState, beta) -> jnp.ndarray:
    """Differentiable staircase at temperature beta (activation.py:135-150)."""
    d = x[..., None] - state.b  # [..., L]
    f = 2.0 * jax.nn.sigmoid(2.0 * beta * d) - 1.0
    return jnp.sum((state.w / 2.0) * f, axis=-1)


def hard_quantize(x, state: StanhState, symmetric: bool) -> jnp.ndarray:
    """beta -> inf staircase (the reference's beta == -1 branch)."""
    d = x[..., None] - state.b
    if symmetric:
        return jnp.sum((state.w / 2.0) * jnp.sign(d), axis=-1)
    return jnp.sum(state.w * (d > 0), axis=-1) - jnp.sum(state.w) / 2.0


def to_symbols(x, state: StanhState) -> jnp.ndarray:
    """Level index produced by the hard staircase: #{b_i < x}.

    The staircase jumps at the b positions (NOT at level midpoints — they
    only coincide at init), so symbolization must threshold on b to agree
    with hard_quantize: hard(x) == cum_w[to_symbols(x)]. Vectorized
    replacement for the reference's hard-pass + per-element dict lookup
    (adaptive_gaussian_conditional.py:127, 149-152)."""
    return jnp.searchsorted(state.b, x).astype(jnp.int32)


def from_symbols(k, state: StanhState) -> jnp.ndarray:
    return state.cum_w[k]


def interval_bounds(values, state: StanhState):
    """(v0, v1): half-distances to the neighbor levels of each value's bin
    (vectorized define_v0_and_v1, adaptive_gaussian_conditional.py:495-537)."""
    k = jnp.searchsorted(state.average_points, values)
    return state.distance_left[k], state.distance_right[k]


def per_level_cfg(value, n_rates: int):
    """Normalize an int-or-sequence quantizer knob to one int per rate level.

    The reference builds one GaussianConditionalStanh per level from per-level
    config dicts (models/__init__.py:38-116 + helper.py:16-46), so
    `--gauss_num_sigmoids 160 160 160 --gauss_extrema 160 80 40` gives each
    level its own staircase init (coarse at low lambda, fine at high). Here
    the levels live in one stacked [n_rates, L] parameter, so per-level
    values are allowed as long as every level yields the same L."""
    if isinstance(value, (tuple, list)):
        vals = tuple(int(v) for v in value)
        if len(vals) == 1:
            vals = vals * n_rates
        if len(vals) != n_rates:
            raise ValueError(
                f"per-level quantizer config {vals} has {len(vals)} entries "
                f"for {n_rates} rate levels"
            )
        return vals
    return (int(value),) * n_rates


class StanhQuantizer(nn.Module):
    """Stacked per-rate-level STanH parameters.

    n_rates quantizers share one [n_rates, L] parameter pair; `lv` selects a
    row inside the jitted step. trainable=False freezes via stop_gradient
    (parameters remain in the checkpoint like the reference's
    requires_grad=False params).

    num_sigmoids / extrema accept either one int (all levels identical, the
    reference parser defaults) or one int per level — per-level staircase
    inits seed rate separation the way the reference's per-level configs do,
    under the constraint that every level has the same number of steps L
    (the stacked-parameter design; use num_sigmoids>0 to fix L and vary
    extrema for per-level step size 2*extrema/num_sigmoids)."""

    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 5
    symmetric: bool = False
    trainable: bool = True

    def _level_inits(self):
        ns = per_level_cfg(self.num_sigmoids, self.n_rates)
        ex = per_level_cfg(self.extrema, self.n_rates)
        inits = [init_w_b(n, e, self.symmetric) for n, e in zip(ns, ex)]
        lengths = {len(w) for w, _ in inits}
        if len(lengths) != 1:
            raise ValueError(
                "per-level stanh configs must all produce the same number of "
                f"steps L (got lengths {sorted(lengths)} from num_sigmoids="
                f"{ns}, extrema={ex}); fix num_sigmoids>0 across levels and "
                "vary extrema to vary the step size at equal L"
            )
        return inits

    def setup(self):
        inits = self._level_inits()
        w0 = np.stack([w for w, _ in inits])
        b0 = np.stack([b for _, b in inits])
        self.w = self.param("w", lambda rng: jnp.asarray(w0))
        self.b = self.param("b", lambda rng: jnp.asarray(b0))

    @property
    def n_levels(self) -> int:
        w0, _ = self._level_inits()[0]
        return (2 * len(w0) + 1) if self.symmetric else (len(w0) + 1)

    def state(self, lv) -> StanhState:
        w = jnp.take(self.w, lv, axis=0)
        b = jnp.take(self.b, lv, axis=0)
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        return derive_state(w, b, self.symmetric)

    def soft(self, x, beta, lv):
        return soft_quantize(x, self.state(lv), beta)

    def hard(self, x, lv):
        return hard_quantize(x, self.state(lv), self.symmetric)


def np_state(w: np.ndarray, b: np.ndarray, symmetric: bool) -> StanhState:
    """Host-side (numpy) derived state for CDF-table building."""
    return jax.tree_util.tree_map(
        np.asarray, derive_state(jnp.asarray(w), jnp.asarray(b), symmetric)
    )


def compute_gap(y, y_soft, y_hard) -> jnp.ndarray:
    """|MSE(y, soft) - MSE(y, hard)| — the beta-annealing drive signal
    (reference wacnn_stanh.py:261-274)."""
    f_tilde = jnp.mean((y - y_soft) ** 2)
    f_hat = jnp.mean((y - y_hard) ** 2)
    return jax.lax.stop_gradient(jnp.abs(f_tilde - f_hat))
