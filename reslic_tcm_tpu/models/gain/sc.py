"""SCGainedHyperprior: spatial-channel gained hyperprior.

Rebuild of reference models/gain/GainBalle2018.py:466-737 — channel gain
vectors (as in gained.py) plus *spatial* modulation from a quality map via
SFT (spatial feature transform) blocks interleaved with the split analysis/
synthesis stages, after "Variable-Rate Deep Image Compression With a
Conditional Autoencoder" / SPADE-style conditioning.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...entropy.factorized import EntropyBottleneck
from ...ops.layers import Conv, Deconv, GDN
from ...ops.math import gaussian_likelihood
from .gained import GainedHyperpriorCodec


def leaky01(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def adaptive_avg_pool(x, out_hw):
    """Mean-pool NHWC to (out_h, out_w); integer-ratio fast path (the only
    case this architecture produces), torch adaptive_avg_pool2d semantics."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
        ) / (kh * kw)
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class SFT(nn.Module):
    """x * (1 + gamma(qmap)) + beta(qmap) (reference gain_utils.py:195-213)."""

    ks: int = 3
    nhidden: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, qmap):
        qmap = adaptive_avg_pool(qmap, x.shape[1:3])
        actv = Conv(self.nhidden, self.ks, 1, dtype=self.dtype, name="mlp_shared")(qmap)
        actv = jax.nn.relu(actv)
        gamma = Conv(x.shape[-1], self.ks, 1, dtype=self.dtype, name="mlp_gamma")(actv)
        beta = Conv(x.shape[-1], self.ks, 1, dtype=self.dtype, name="mlp_beta")(actv)
        return x * (1 + gamma) + beta


class SCGainedHyperprior(nn.Module):
    """Spatial-channel gained hyperprior (reference GainBalle2018.py:466-737)."""

    N: int = 192
    M: int = 320
    levels: int = 1
    dtype: Any = None

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype

        def seq(*layers):
            return nn.Sequential(list(layers))

        # qmap feature extractors along g_a (reference :475-499)
        self.qmap_feature_ga0 = seq(
            Conv(N * 2, 3, 1, dtype=dt), leaky01,
            Conv(N, 3, 1, dtype=dt), leaky01,
            Conv(N, 3, 1, dtype=dt),
        )
        self.qmap_feature_ga1 = seq(Conv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.qmap_feature_ga2 = seq(Conv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.qmap_feature_ga3 = seq(Conv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.ga_SFT1 = SFT(dtype=dt)
        self.ga_SFT2 = SFT(dtype=dt)
        self.ga_SFT3 = SFT(dtype=dt)

        self.g_a1 = seq(Conv(N, 5, 2, dtype=dt), GDN())
        self.g_a2 = seq(Conv(N, 5, 2, dtype=dt), GDN())
        self.g_a3 = seq(Conv(N, 5, 2, dtype=dt), GDN())
        self.g_a4 = seq(Conv(M, 5, 2, dtype=dt))

        # decoder-side qmap generation from z_hat (reference :519-552)
        self.qmap_feature_generation = seq(
            Deconv(N // 2, 3, 2, dtype=dt), leaky01,
            Deconv(N // 4, 5, 2, dtype=dt), leaky01,
            Conv(N // 4, 3, 1, dtype=dt),
        )
        self.qmap_feature_gs0 = seq(
            Conv(N * 4, 3, 1, dtype=dt), leaky01,
            Conv(N * 2, 3, 1, dtype=dt), leaky01,
            Conv(N, 3, 1, dtype=dt),
        )
        self.qmap_feature_gs1 = seq(Deconv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.qmap_feature_gs2 = seq(Deconv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.qmap_feature_gs3 = seq(Deconv(N, 3, 2, dtype=dt), leaky01, Conv(N, 1, 1, dtype=dt))
        self.gs_SFT0 = SFT(dtype=dt)
        self.gs_SFT1 = SFT(dtype=dt)
        self.gs_SFT2 = SFT(dtype=dt)
        self.gs_SFT3 = SFT(dtype=dt)

        self.g_s1 = seq(Deconv(N, 5, 2, dtype=dt), GDN(inverse=True))
        self.g_s2 = seq(Deconv(N, 5, 2, dtype=dt), GDN(inverse=True))
        self.g_s3 = seq(Deconv(N, 5, 2, dtype=dt), GDN(inverse=True))
        self.g_s4 = seq(Deconv(3, 5, 2, dtype=dt))

        self.h_a = seq(
            Conv(N, 3, 1, dtype=dt), jax.nn.leaky_relu,
            Conv(N, 5, 2, dtype=dt), jax.nn.leaky_relu,
            Conv(N, 5, 2, dtype=dt),
        )
        self.h_s = seq(
            Deconv(M, 5, 2, dtype=dt), jax.nn.leaky_relu,
            Deconv(M * 3 // 2, 5, 2, dtype=dt), jax.nn.leaky_relu,
            Conv(M, 3, 1, dtype=dt),
        )
        self.entropy_bottleneck = EntropyBottleneck(N)

        ones = nn.initializers.ones
        self.Gain = self.param("Gain", ones, (self.levels, M))
        self.InverseGain = self.param("InverseGain", ones, (self.levels, M))
        self.HyperGain = self.param("HyperGain", ones, (self.levels, N))
        self.InverseHyperGain = self.param("InverseHyperGain", ones, (self.levels, N))

    # ----------------------------- transforms -----------------------------

    def g_a(self, x, qmap):
        """SFT-modulated analysis (reference :601-617)."""
        q = self.qmap_feature_ga0(jnp.concatenate([qmap, x], axis=-1))
        q = self.qmap_feature_ga1(q)
        x = self.g_a1(x)
        x = self.ga_SFT1(x, q)
        q = self.qmap_feature_ga2(q)
        x = self.g_a2(x)
        x = self.ga_SFT2(x, q)
        q = self.qmap_feature_ga3(q)
        x = self.g_a3(x)
        x = self.ga_SFT3(x, q)
        return self.g_a4(x)

    def g_s(self, x, z_hat):
        """SFT-modulated synthesis conditioned on z_hat (reference :619-638)."""
        w = self.qmap_feature_generation(z_hat)
        w = self.qmap_feature_gs0(jnp.concatenate([w, x], axis=-1))
        x = self.gs_SFT0(x, w)
        w = self.qmap_feature_gs1(w)
        x = self.g_s1(x)
        x = self.gs_SFT1(x, w)
        w = self.qmap_feature_gs2(w)
        x = self.g_s2(x)
        x = self.gs_SFT2(x, w)
        w = self.qmap_feature_gs3(w)
        x = self.g_s3(x)
        x = self.gs_SFT3(x, w)
        return self.g_s4(x)

    def __call__(self, x, qmap, training: bool = True, lv: int = 0):
        """x NHWC, qmap [B, H, W, 1] (reference forward :640-662)."""
        y = self.g_a(x, qmap) * jnp.abs(self.Gain[lv])[None, None, None, :]
        z = self.h_a(y) * jnp.abs(self.HyperGain[lv])[None, None, None, :]
        z_hat, z_lik = self.entropy_bottleneck(z, training=training)
        z_hat = z_hat * jnp.abs(self.InverseHyperGain[lv])[None, None, None, :]
        scales = self.h_s(z_hat)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), y.shape, y.dtype, -0.5, 0.5
            )
            y_hat = y + noise
        else:
            y_hat = jnp.round(y)
        y_lik = gaussian_likelihood(y_hat, scales, None)
        y_hat = y_hat * jnp.abs(self.InverseGain[lv])[None, None, None, :]
        x_hat = self.g_s(y_hat, z_hat)
        return {
            "y": y,
            "y_hat": y_hat,
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    # codec-path pieces
    def analyze_gained(self, x, qmap, gain, hyper_gain):
        y = self.g_a(x, qmap) * gain[None, None, None, :]
        z = self.h_a(y) * hyper_gain[None, None, None, :]
        return y, z

    def params_from_z_gained(self, z_hat, inv_hyper_gain):
        z_hat = z_hat * inv_hyper_gain[None, None, None, :]
        return self.h_s(z_hat), z_hat

    def synthesize_gained(self, y_hat, z_hat_scaled, inv_gain):
        y_hat = y_hat * inv_gain[None, None, None, :]
        return jnp.clip(self.g_s(y_hat, z_hat_scaled), 0.0, 1.0)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class SCGainedCodec(GainedHyperpriorCodec):
    """compress(x, qmap, s, l) / decompress (reference :664-721)."""

    def compress(self, x, qmap, s: int = 0, l: float = 0.0) -> dict:
        import numpy as np
        from ...entropy import factorized as fz

        assert self.eb_tables is not None, "call update() first"
        gain = self._gains("Gain", s, l)
        hyper_gain = self._gains("HyperGain", s, l)
        inv_hyper = self._gains("InverseHyperGain", s, l)

        y, z = self._jit(
            "an_sc",
            lambda v, xx, qq, g, hg: self.module.apply(
                v, xx, qq, g, hg, method=SCGainedHyperprior.analyze_gained
            ),
        )(self.variables, x, qmap, gain, hyper_gain)
        z = np.asarray(z)
        z_strings = fz.compress(z, self._medians(), self.eb_tables)
        z_hat = fz.decompress(
            z_strings, (z.shape[1], z.shape[2]), self._medians(), self.eb_tables
        )
        scales, _ = self._jit(
            "pz_sc",
            lambda v, zz, ihg: self.module.apply(
                v, zz, ihg, method=SCGainedHyperprior.params_from_z_gained
            ),
        )(self.variables, jnp.asarray(z_hat), inv_hyper)
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        y_strings = self.gaussian_conditional.compress(np.asarray(y), indexes, None)
        return {"strings": [y_strings, z_strings], "shape": (z.shape[1], z.shape[2])}

    def decompress(self, strings, shape, s: int = 0, l: float = 0.0) -> dict:
        import numpy as np
        from ...entropy import factorized as fz

        inv_gain = self._gains("InverseGain", s, l)
        inv_hyper = self._gains("InverseHyperGain", s, l)
        z_hat = fz.decompress(strings[1], shape, self._medians(), self.eb_tables)
        scales, z_hat_scaled = self._jit(
            "pz_sc",
            lambda v, zz, ihg: self.module.apply(
                v, zz, ihg, method=SCGainedHyperprior.params_from_z_gained
            ),
        )(self.variables, jnp.asarray(z_hat), inv_hyper)
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))
        y_hat = self.gaussian_conditional.decompress(strings[0], indexes, None)
        x_hat = self._jit(
            "sy_sc",
            lambda v, yy, zz, ig: self.module.apply(
                v, yy, zz, ig, method=SCGainedHyperprior.synthesize_gained
            ),
        )(self.variables, jnp.asarray(y_hat), z_hat_scaled, inv_gain)
        return {"x_hat": x_hat}


def make_sc_gained(N: int = 192, M: int = 320, lmbda_list: Sequence[float] = (0.043,),
                   rng=None, input_shape: Tuple[int, int] = (256, 256)):
    module = SCGainedHyperprior(N=N, M=M, levels=len(lmbda_list))
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    qmap = jnp.zeros((1, 64, 64, 1), jnp.float32)
    from ...utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, qmap, training=True)
    return SCGainedCodec(module, variables)
