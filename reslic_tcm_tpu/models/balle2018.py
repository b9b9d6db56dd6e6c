"""Balle-2018 hyperprior family: Factorized / Scale / Mean-Scale.

TPU-native rebuild of reference models/Balle2018.py:43-268 (which follows
CompressAI's bmshj2018 models): conv/GDN transforms, factorized prior on z
(or directly on y), sigma-only or (mu, sigma) Gaussian conditional on y.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import factorized as fz
from ..entropy.gaussian import GaussianConditional
from ..entropy.factorized import EntropyBottleneck
from ..ops.layers import Conv, Deconv, GDN, leaky_relu
from ..ops.math import gaussian_likelihood, get_scale_table


def _g_a(N, M, dt=None):
    return nn.Sequential([
        Conv(N, 5, 2, dtype=dt), GDN(),
        Conv(N, 5, 2, dtype=dt), GDN(),
        Conv(N, 5, 2, dtype=dt), GDN(),
        Conv(M, 5, 2, dtype=dt),
    ])


def _g_s(N, dt=None):
    return nn.Sequential([
        Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
        Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
        Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
        Deconv(3, 5, 2, dtype=dt),
    ])


class FactorizedPrior(nn.Module):
    """y -> EntropyBottleneck only (reference Balle2018.py:43-108)."""

    N: int = 128
    M: int = 192
    dtype: Any = None

    def setup(self):
        self.g_a = _g_a(self.N, self.M, self.dtype)
        self.g_s = _g_s(self.N, self.dtype)
        self.entropy_bottleneck = EntropyBottleneck(self.M)

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        y_hat, y_lik = self.entropy_bottleneck(y, training=training)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik}}

    def analyze(self, x):
        return self.g_a(x)

    def synthesize(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperprior(nn.Module):
    """z = h_a(|y|); sigma-only conditional (reference Balle2018.py:112-206)."""

    N: int = 128
    M: int = 192
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

    def hyper_input(self, y):
        return jnp.abs(y)

    def gaussian_params(self, z_hat):
        """Returns (scales, means-or-None)."""
        return self.h_s(z_hat), None

    def __call__(self, x, training: bool = True):
        y = self.g_a(x)
        z = self.h_a(self.hyper_input(y))
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        scales, means = self.gaussian_params(z_hat)

        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, y.dtype, -0.5, 0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y - means) + means if means is not None else jnp.round(y)
        y_lik = gaussian_likelihood(y_hat, scales, means)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    # codec-path pieces
    def analyze(self, x):
        y = self.g_a(x)
        z = self.h_a(self.hyper_input(y))
        return y, z

    def synthesize(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    def params_from_z(self, z_hat):
        return self.gaussian_params(z_hat)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class MeanScaleHyperprior(ScaleHyperprior):
    """(mu, sigma) from h_s chunks (reference Balle2018.py:210-268)."""

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

    def hyper_input(self, y):
        return y  # no abs

    def gaussian_params(self, z_hat):
        gp = self.h_s(z_hat)
        scales, means = jnp.split(gp, 2, axis=-1)
        return scales, means


class HyperpriorCodec:
    """Host wrapper: update()/compress()/decompress() for the Balle family
    (reference Balle2018.py:99-108, 187-206, 245-268)."""

    def __init__(self, module, variables, matmul_precision: str | None = None):
        self.module = module
        self.variables = variables
        self.gaussian_conditional = GaussianConditional()
        self.eb_tables = None
        self._jit_cache = {}
        self.matmul_precision = matmul_precision

    @property
    def params(self):
        return self.variables["params"]

    def set_matmul_precision(self, precision: str | None):
        """MXU precision for the codec device programs ("bfloat16" ~4x faster
        convs on v5e, see docs/PERFORMANCE.md). Clears compiled programs."""
        self.matmul_precision = precision
        self._jit_cache.clear()

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            prec = self.matmul_precision
            if prec is not None:
                def wrapped(*a, _fn=fn, _p=prec, **kw):
                    with jax.default_matmul_precision(_p):
                        return _fn(*a, **kw)
                self._jit_cache[name] = jax.jit(wrapped)
            else:
                self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def update(self, scale_table=None):
        if scale_table is None:
            scale_table = np.asarray(get_scale_table())
        self.gaussian_conditional.update_scale_table(scale_table)
        self.eb_tables = fz.build_tables(self.params["entropy_bottleneck"])
        return True

    def _medians(self):
        return np.asarray(self.params["entropy_bottleneck"]["quantiles"][:, 0, 1])

    def forward(self, x, training: bool = False, rng=None, lv: int = 0):
        # plain Balle modules take no rate level; gain/stanh subclasses do
        import inspect

        takes_lv = "lv" in inspect.signature(type(self.module).__call__).parameters
        kw = {"lv": lv} if takes_lv else {}
        if training:
            rngs = {"noise": rng if rng is not None else jax.random.PRNGKey(0)}
            return self.module.apply(self.variables, x, training=True,
                                     rngs=rngs, **kw)
        return self._jit(
            f"fwd_{lv if takes_lv else 0}",
            lambda v, xx: self.module.apply(v, xx, training=False, **kw),
        )(self.variables, x)

    def aux_loss(self):
        return self.module.apply(self.variables, method=lambda m: m.aux_loss())

    def compress(self, x) -> dict:
        assert self.eb_tables is not None, "call update() first"
        if isinstance(self.module, FactorizedPrior):
            y = self._jit(
                "an", lambda v, xx: self.module.apply(v, xx, method=type(self.module).analyze)
            )(self.variables, x)
            y = np.asarray(y)
            y_strings = fz.compress(y, self._medians(), self.eb_tables)
            return {"strings": [y_strings], "shape": (y.shape[1], y.shape[2])}

        y, z = self._jit(
            "an", lambda v, xx: self.module.apply(v, xx, method=type(self.module).analyze)
        )(self.variables, x)
        z = np.asarray(z)
        z_strings = fz.compress(z, self._medians(), self.eb_tables)
        z_hat = fz.decompress(
            z_strings, (z.shape[1], z.shape[2]), self._medians(), self.eb_tables
        )
        scales, means = self._jit(
            "pz", lambda v, zz: self.module.apply(v, zz, method=type(self.module).params_from_z)
        )(self.variables, jnp.asarray(z_hat))
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        means_np = None if means is None else np.asarray(means)
        y_strings = self.gaussian_conditional.compress(np.asarray(y), indexes, means_np)
        return {"strings": [y_strings, z_strings], "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape) -> dict:
        assert self.eb_tables is not None, "call update() first"
        if isinstance(self.module, FactorizedPrior):
            y_hat = fz.decompress(strings[0], shape, self._medians(), self.eb_tables)
            x_hat = self._jit(
                "sy", lambda v, yy: self.module.apply(v, yy, method=type(self.module).synthesize)
            )(self.variables, jnp.asarray(y_hat))
            return {"x_hat": x_hat}

        z_hat = fz.decompress(strings[1], shape, self._medians(), self.eb_tables)
        scales, means = self._jit(
            "pz", lambda v, zz: self.module.apply(v, zz, method=type(self.module).params_from_z)
        )(self.variables, jnp.asarray(z_hat))
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        means_np = None if means is None else np.asarray(means)
        y_hat = self.gaussian_conditional.decompress(strings[0], indexes, means_np)
        x_hat = self._jit(
            "sy", lambda v, yy: self.module.apply(v, yy, method=type(self.module).synthesize)
        )(self.variables, jnp.asarray(y_hat))
        return {"x_hat": x_hat}


def make_balle(kind: str = "mean-scale", N: int = 128, M: int = 192, rng=None,
               input_shape: Tuple[int, int] = (256, 256)) -> HyperpriorCodec:
    cls = {
        "factorized": FactorizedPrior,
        "scale": ScaleHyperprior,
        "mean-scale": MeanScaleHyperprior,
    }[kind]
    module = cls(N=N, M=M)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    from ..utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, training=True)
    return HyperpriorCodec(module, variables)
