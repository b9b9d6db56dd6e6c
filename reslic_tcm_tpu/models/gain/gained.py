"""Gain-unit variable-rate models (after Cui et al., "Asymmetric Gained
Deep Image Compression with Continuous Rate Adaptation").

Rebuild of reference models/gain/GainBalle2018.py and gain_wacnn.py:
per-level channel gain vectors Gain/InverseGain (on y) and HyperGain/
InverseHyperGain (on z), applied as |G[lv]| elementwise; continuous rate at
inference via exponential interpolation |G[s]|^(1-l) * |G[s+1]|^l.

Interpolation note: the reference mixes geometric and linear interpolation
inconsistently between encode and decode (GainBalle2018.py:128-131 vs
165-166, 338-346 vs 374-381 — the later linear assignments override the
geometric ones). Here the paper's exponential interpolation is used on both
sides, selectable via `interp="geometric"|"linear"`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...entropy import factorized as fz
from ...ops.layers import Conv, Deconv, GDN, leaky_relu
from ...ops.math import gaussian_likelihood, get_scale_table
from ..balle2018 import HyperpriorCodec, _g_a, _g_s
from ..base import ChannelARCodec
from ..wacnn import WACNN
from ...entropy.factorized import EntropyBottleneck


def interpolate_gain(g_lo, g_hi, l: float, mode: str = "geometric"):
    g_lo, g_hi = jnp.abs(g_lo), jnp.abs(g_hi)
    if mode == "linear":
        return g_lo * (1 - l) + g_hi * l
    return g_lo ** (1 - l) * g_hi**l


class _GainParams:
    """Mixin: the four gain matrices (reference GainBalle2018.py:73-76)."""

    def _make_gains(self, levels: int, M: int, N: int):
        ones = nn.initializers.ones
        spread = float(getattr(self, "gain_init_spread", 0.0) or 0.0)
        if spread > 1.0 and levels > 1:
            # Geometric ladder over the y gains: level 0 (lowest lambda)
            # scales y down by 1/spread, the top level up by spread, so the
            # levels code visibly different rates from epoch 0. The
            # reference inits every gain at ones (GainBalle2018.py:73-76)
            # and relies on per-level lambda gradients to separate them over
            # its full training schedule; with short budgets the ones-init
            # levels stay within 0.1% of each other (runs/r3cpu2). Hyper
            # gains stay at ones — z is a small fraction of the rate.
            expo = 2.0 * np.arange(levels, dtype=np.float32) / (levels - 1) - 1.0
            g = np.repeat((spread ** expo)[:, None], M, axis=1)
            self.Gain = self.param("Gain", lambda rng: jnp.asarray(g))
            self.InverseGain = self.param(
                "InverseGain", lambda rng: jnp.asarray(1.0 / g)
            )
        else:
            self.Gain = self.param("Gain", ones, (levels, M))
            self.InverseGain = self.param("InverseGain", ones, (levels, M))
        self.HyperGain = self.param("HyperGain", ones, (levels, N))
        self.InverseHyperGain = self.param("InverseHyperGain", ones, (levels, N))


class GainedScaleHyperprior(nn.Module, _GainParams):
    """Scale hyperprior with gain units (reference GainBalle2018.py:21-245)."""

    N: int = 192
    M: int = 320
    levels: int = 1
    gain_init_spread: float = 0.0
    dtype: Any = None

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype
        self.g_a = _g_a(N, M, dt)
        self.g_s = _g_s(N, dt)
        self.h_a = nn.Sequential([
            Conv(N, 3, 1, dtype=dt), jax.nn.relu,
            Conv(N, 5, 2, dtype=dt), jax.nn.relu,
            Conv(N, 5, 2, dtype=dt),
        ])
        self.h_s = nn.Sequential([
            Deconv(N, 5, 2, dtype=dt), jax.nn.relu,
            Deconv(N, 5, 2, dtype=dt), jax.nn.relu,
            Conv(M, 3, 1, dtype=dt), jax.nn.relu,
        ])
        self.entropy_bottleneck = EntropyBottleneck(N)
        self._make_gains(self.levels, M, N)

    def mean_scale(self) -> bool:
        return False

    def gaussian_params(self, z_hat):
        return self.h_s(z_hat), None

    def __call__(self, x, training: bool = True, lv: int = 0, beta=None):
        y = self.g_a(x) * jnp.abs(self.Gain[lv])[None, None, None, :]
        z = self.h_a(y) * jnp.abs(self.HyperGain[lv])[None, None, None, :]
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        z_hat = z_hat * jnp.abs(self.InverseHyperGain[lv])[None, None, None, :]
        scales, means = self.gaussian_params(z_hat)

        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, y.dtype, -0.5, 0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y - means) + means if means is not None else jnp.round(y)
        y_lik = gaussian_likelihood(y_hat, scales, means)
        y_hat = y_hat * jnp.abs(self.InverseGain[lv])[None, None, None, :]
        x_hat = self.g_s(y_hat)
        return {
            "y": y,
            "y_hat": y_hat,
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    # codec-path device pieces (gain vectors passed in for interpolation)
    def analyze_gained(self, x, gain, hyper_gain):
        y = self.g_a(x) * gain[None, None, None, :]
        z = self.h_a(y) * hyper_gain[None, None, None, :]
        return y, z

    def params_from_z_gained(self, z_hat, inv_hyper_gain):
        return self.gaussian_params(z_hat * inv_hyper_gain[None, None, None, :])

    def synthesize_gained(self, y_hat, inv_gain):
        return jnp.clip(self.g_s(y_hat * inv_gain[None, None, None, :]), 0.0, 1.0)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class GainedMSHyperprior(GainedScaleHyperprior):
    """Mean-scale variant (reference GainBalle2018.py:248-394)."""

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype
        self.g_a = _g_a(N, M, dt)
        self.g_s = _g_s(N, dt)
        self.h_a = nn.Sequential([
            Conv(N, 3, 1, dtype=dt), leaky_relu,
            Conv(N, 5, 2, dtype=dt), leaky_relu,
            Conv(N, 5, 2, dtype=dt),
        ])
        self.h_s = nn.Sequential([
            Deconv(M, 5, 2, dtype=dt), leaky_relu,
            Deconv(M * 3 // 2, 5, 2, dtype=dt), leaky_relu,
            Conv(M * 2, 3, 1, dtype=dt),
        ])
        self.entropy_bottleneck = EntropyBottleneck(N)
        self._make_gains(self.levels, M, N)

    def mean_scale(self) -> bool:
        return True

    def gaussian_params(self, z_hat):
        scales, means = jnp.split(self.h_s(z_hat), 2, axis=-1)
        return scales, means


class GainedWACNN(WACNN, _GainParams):
    """WACNN with gain units around the slice loop (reference
    gain_wacnn.py:8-93) — via the ChannelARModule gain hooks, which also
    gives it the working compress/decompress the reference lacks."""

    levels: int = 1
    gain_init_spread: float = 0.0

    def setup(self):
        WACNN.setup(self)
        self._make_gains(self.levels, self.M, self.N)

    def gain_y(self, y, lv):
        return y * jnp.abs(self.Gain[lv])[None, None, None, :]

    def gain_z(self, z, lv):
        return z * jnp.abs(self.HyperGain[lv])[None, None, None, :]

    def inv_gain_z(self, z_hat, lv):
        return z_hat * jnp.abs(self.InverseHyperGain[lv])[None, None, None, :]

    def inv_gain_y(self, y_hat, lv):
        return y_hat * jnp.abs(self.InverseGain[lv])[None, None, None, :]


class GainedHyperpriorCodec(HyperpriorCodec):
    """compress(x, s, l) / decompress(strings, shape, s, l) with gain
    interpolation (reference GainBalle2018.py:124-178)."""

    interp: str = "geometric"

    def _gains(self, name: str, s: int, l: float) -> jnp.ndarray:
        g = np.asarray(self.params[name])
        lo = jnp.asarray(g[s])
        hi = jnp.asarray(g[min(s + 1, g.shape[0] - 1)])
        if s == g.shape[0] - 1:
            return jnp.abs(lo)
        return interpolate_gain(lo, hi, l, self.interp)

    def compress(self, x, s: int = 0, l: float = 0.0) -> dict:
        assert self.eb_tables is not None, "call update() first"
        gain = self._gains("Gain", s, l)
        hyper_gain = self._gains("HyperGain", s, l)
        inv_hyper = self._gains("InverseHyperGain", s, l)

        y, z = self._jit(
            "an_g",
            lambda v, xx, g, hg: self.module.apply(
                v, xx, g, hg, method=type(self.module).analyze_gained
            ),
        )(self.variables, x, gain, hyper_gain)
        z = np.asarray(z)
        z_strings = fz.compress(z, self._medians(), self.eb_tables)
        z_hat = fz.decompress(
            z_strings, (z.shape[1], z.shape[2]), self._medians(), self.eb_tables
        )
        scales, means = self._jit(
            "pz_g",
            lambda v, zz, ihg: self.module.apply(
                v, zz, ihg, method=type(self.module).params_from_z_gained
            ),
        )(self.variables, jnp.asarray(z_hat), inv_hyper)
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        means_np = None if means is None else np.asarray(means)
        y_strings = self.gaussian_conditional.compress(np.asarray(y), indexes, means_np)
        return {"strings": [y_strings, z_strings], "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape, s: int = 0, l: float = 0.0) -> dict:
        inv_gain = self._gains("InverseGain", s, l)
        inv_hyper = self._gains("InverseHyperGain", s, l)

        z_hat = fz.decompress(strings[1], shape, self._medians(), self.eb_tables)
        scales, means = self._jit(
            "pz_g",
            lambda v, zz, ihg: self.module.apply(
                v, zz, ihg, method=type(self.module).params_from_z_gained
            ),
        )(self.variables, jnp.asarray(z_hat), inv_hyper)
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        means_np = None if means is None else np.asarray(means)
        y_hat = self.gaussian_conditional.decompress(strings[0], indexes, means_np)
        x_hat = self._jit(
            "sy_g",
            lambda v, yy, ig: self.module.apply(
                v, yy, ig, method=type(self.module).synthesize_gained
            ),
        )(self.variables, jnp.asarray(y_hat), inv_gain)
        return {"x_hat": x_hat}


def make_gained_hyperprior(kind: str = "scale", N: int = 192, M: int = 320,
                           lmbda_list: Sequence[float] = (0.043,), rng=None,
                           input_shape: Tuple[int, int] = (256, 256), **kwargs):
    cls = {"scale": GainedScaleHyperprior, "mean-scale": GainedMSHyperprior}[kind]
    module = cls(N=N, M=M, levels=len(lmbda_list), **kwargs)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from ...utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, training=True)
    return GainedHyperpriorCodec(module, variables)


def make_gained_wacnn(N: int = 192, M: int = 320, lmbda_list=(0.05,), rng=None,
                      input_shape: Tuple[int, int] = (256, 256), **kwargs):
    module = GainedWACNN(N=N, M=M, levels=len(lmbda_list), **kwargs)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from ...utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, training=True)
    return ChannelARCodec(module, variables)
