"""STanH variable-rate model variants: TCM-STanH, WACNN-STanH, Balle-STanH.

Rebuild of reference models/stanh/{tcm_stanh.py, wacnn_stanh.py,
balle18_stanh.py}: a shared rate-agnostic backbone with one learnable STanH
quantizer per rate level (stacked [n_rates, L] parameters), beta annealed
from the host, and a `gap` output driving the schedule.

Differences from the reference, by design (see SURVEY.md section 7.4):
* the per-level quantizers are one stacked parameter, not a ModuleList;
* the broken reference compress/decompress paths are replaced by a correct
  one (symbols = level indexes over per-level CDF tables);
* `update_state()` mutation becomes pure derived state inside the step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...entropy import factorized as fz
from ...entropy import stanh as sq
from ...entropy.stanh_models import (
    StanhEntropyBottleneck,
    StanhGaussianConditional,
    build_stanh_factorized_tables,
    build_stanh_scale_tables,
    stanh_gaussian_likelihood,
)
from ...entropy.gaussian import GaussianConditional
from ...ops.math import get_scale_table
from ..balle2018 import HyperpriorCodec, ScaleHyperprior
from ..base import ChannelARCodec, ChannelARModule
from ..tcm import TCM
from ..wacnn import WACNN

DEFAULT_BETA = 10.0  # plain float: no device arrays at import time


class _StackedConv1x1(nn.Module):
    """Level-indexed 1x1 refinement convs stacked into [n_rates, cin, cout]
    parameters (reference wacnn_stanh.py:174-206 keeps a ModuleList), so the
    rate level `lv` can be a TRACED scalar: one compile covers every level,
    like the stacked [n_rates, L] quantizer params elsewhere.

    Each level is initialized exactly like an independent 1x1 torch Conv2d
    (fan_in = cin), not with the stacked shape's inflated fan."""

    n_rates: int
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lv):
        from ...ops.layers import torch_bias_init, torch_kernel_init

        cin = x.shape[-1]

        def kinit(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, self.n_rates)
            per = [
                torch_kernel_init(k, (1, 1, cin, self.features), dtype)[0, 0]
                for k in keys
            ]
            return jnp.stack(per)

        def binit(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, self.n_rates)
            per = [
                torch_bias_init(cin)(k, (self.features,), dtype) for k in keys
            ]
            return jnp.stack(per)

        kernel = self.param(
            "kernel", kinit, (self.n_rates, cin, self.features)
        )
        bias = self.param("bias", binit, (self.n_rates, self.features))
        k = jnp.take(kernel, lv, axis=0)
        b = jnp.take(bias, lv, axis=0)
        if self.dtype is not None:
            x, k, b = x.astype(self.dtype), k.astype(self.dtype), b.astype(self.dtype)
        else:
            k, b = k.astype(x.dtype), b.astype(x.dtype)
        return x @ k + b


class _StanhChannelARMixin:
    """Slice-entropy + gap hooks shared by TCM/WACNN stanh variants."""

    def slice_entropy(self, i, y_slice, sigma, mu, training, beta, lv):
        beta = DEFAULT_BETA if beta is None else beta
        return self.gaussian_conditional(
            y_slice, sigma, means=mu, training=training, beta=beta, lv=lv
        )

    def extra_outputs(self, y, training, beta, lv):
        beta = DEFAULT_BETA if beta is None else beta
        return {"gap_gaussian": self.gaussian_conditional.gap(y, beta, lv)}

    def encode_stanh(self, x, scale_table, lv: int = 0):
        """Encoder-side compute for the stanh codec path: symbols are level
        indexes; reconstruction mirrors the decoder exactly."""
        from ...ops.math import build_indexes

        y = self.g_a(x)
        y_shape = y.shape[1:3]
        z = self.h_a(y)
        z_offset = self.entropy_bottleneck.medians_nhwc()
        z_hat = jnp.round(z - z_offset) + z_offset

        latent_scales = self.h_scale_s(z_hat)
        latent_means = self.h_mean_s(z_hat)
        state = self.gaussian_conditional.stanh.state(lv)

        y_slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices, symbols, indexes = [], [], []
        for i, y_slice in enumerate(y_slices):
            support = self.slice_support(y_hat_slices)
            mu, sigma, mean_support = self._mu_sigma(
                i, latent_means, latent_scales, support, y_shape
            )
            sym = sq.to_symbols(y_slice - mu, state)
            symbols.append(sym)
            indexes.append(build_indexes(sigma, scale_table))
            y_hat_slice = sq.from_symbols(sym, state) + mu
            y_hat_slices.append(self._lrp(i, mean_support, y_hat_slice))

        return {
            "z": z,
            "symbols": jnp.stack(symbols, axis=0),
            "indexes": jnp.stack(indexes, axis=0),
        }


class TCMStanh(_StanhChannelARMixin, TCM):
    """TCM with per-level STanH conditionals (reference
    models/stanh/tcm_stanh.py:312-463)."""

    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 80
    symmetric: bool = False
    stanh_trainable: bool = True
    removing_mean: bool = False

    def setup(self):
        TCM.setup(self)
        self.gaussian_conditional = StanhGaussianConditional(
            n_rates=self.n_rates,
            num_sigmoids=self.num_sigmoids,
            extrema=self.extrema,
            symmetric=self.symmetric,
            trainable=self.stanh_trainable,
            removing_mean=self.removing_mean,
        )


class WACNNStanh(_StanhChannelARMixin, WACNN):
    """WACNN with per-level STanH conditionals + decoder refinement modes
    (reference models/stanh/wacnn_stanh.py:131-335)."""

    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 80
    symmetric: bool = False
    stanh_trainable: bool = True
    removing_mean: bool = False
    refinement: str = "none"  # none | convolution | multiple

    def setup(self):
        WACNN.setup(self)
        assert self.refinement in ("none", "convolution", "multiple")
        self.gaussian_conditional = StanhGaussianConditional(
            n_rates=self.n_rates,
            num_sigmoids=self.num_sigmoids,
            extrema=self.extrema,
            symmetric=self.symmetric,
            trainable=self.stanh_trainable,
            removing_mean=self.removing_mean,
        )
        if self.refinement == "convolution":
            self.refine_layer = _StackedConv1x1(
                n_rates=self.n_rates, features=self.M, dtype=self.dtype,
                name="refine",
            )
        elif self.refinement == "multiple":
            # per-level synthesis: clone g_s n_rates times
            self.g_s_multi = [
                nn.Sequential(self._make_g_s(), name=f"g_s_{i}")
                for i in range(self.n_rates)
            ]

    def _make_g_s(self):
        from ...ops.layers import Deconv, GDN
        from ...ops.window_attention import Win_noShift_Attention

        N, M, dt = self.N, self.M, self.dtype
        return [
            Win_noShift_Attention(M, 8, 4, 2, dt),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Win_noShift_Attention(N, 8, 8, 4, dt),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Deconv(3, 5, 2, dtype=dt),
        ]

    def apply_synthesis(self, y_hat, lv):
        # Both refinement modes admit a TRACED lv (one compile across rate
        # levels, matching the stacked [n_rates, L] quantizer design):
        # 'convolution' indexes stacked [n_rates, cin, cout] params;
        # 'multiple' selects among per-level g_s clones with nn.switch
        # (all branches compile into ONE program, one executes).
        if self.refinement == "multiple":
            if self.is_initializing():
                # lv is concrete during init; nn.switch can't initialize
                # (each branch would create a different param set — flax
                # requires identical structures). init_levels touches the
                # remaining clones so every level's params exist.
                return self.g_s_multi[int(lv)](y_hat)
            branches = [
                (lambda m, y, _i=i: m.g_s_multi[_i](y))
                for i in range(self.n_rates)
            ]
            return nn.switch(lv, branches, self, y_hat)
        if self.refinement == "convolution":
            return self.g_s(self.refine_layer(y_hat, lv))
        return self.g_s(y_hat)

    def init_levels(self, x):
        """Init-time trace touching every per-level submodule so all rate
        levels' params exist (linen creates params lazily per trace)."""
        out = self(x, training=True, lv=0)
        if self.refinement == "multiple":
            y_hat = out["para"]["y"]
            for i in range(1, self.n_rates):
                _ = self.g_s_multi[i](y_hat)
        return out


class ScaleHyperpriorStanh(ScaleHyperprior):
    """Balle scale-hyperprior with STanH on y and (optionally) z
    (reference models/stanh/balle18_stanh.py:8-138)."""

    n_rates: int = 1
    num_sigmoids: "int | tuple" = 0
    extrema: "int | tuple" = 80
    symmetric: bool = False
    stanh_trainable: bool = True
    removing_mean: bool = False
    fact_stanh: bool = True

    def setup(self):
        ScaleHyperprior.setup(self)
        self.gaussian_conditional = StanhGaussianConditional(
            n_rates=self.n_rates,
            num_sigmoids=self.num_sigmoids,
            extrema=self.extrema,
            symmetric=self.symmetric,
            trainable=self.stanh_trainable,
            removing_mean=self.removing_mean,
        )
        if self.fact_stanh:
            # the factorized stanh is single-rate (reference builds ONE
            # EntropyBottleneckStanh from factorized_configuration[0],
            # balle18_stanh.py:36-47): collapse per-level gaussian knobs
            # to the level-0 value
            ns, ex = self.num_sigmoids, self.extrema
            self.entropy_bottleneck_stanh = StanhEntropyBottleneck(
                self.N,
                num_sigmoids=sq.per_level_cfg(ns, self.n_rates)[0],
                extrema=sq.per_level_cfg(ex, self.n_rates)[0],
                symmetric=self.symmetric,
                trainable=self.stanh_trainable,
            )

    def __call__(self, x, training: bool = True, lv: int = 0, beta=None,
                 beta_factorized=None):
        beta = DEFAULT_BETA if beta is None else beta
        beta_f = beta if beta_factorized is None else beta_factorized

        y = self.g_a(x)
        z = self.h_a(jnp.abs(y))

        if self.fact_stanh:
            eb = self.entropy_bottleneck_stanh
            gap_factorized = eb.gap(z, beta_f)
            # reference always runs the EB-stanh forward in 'training'
            # (soft) mode (balle18_stanh.py:124 with default tr)
            z_hat, z_lik = eb(z, training=training, beta=beta_f)
        else:
            gap_factorized = jnp.zeros(())
            z_hat, z_lik = self.entropy_bottleneck(z, training=training)

        scales_hat = self.h_s(z_hat)
        y_hat, y_lik = self.gaussian_conditional(
            y, scales_hat, means=None, training=training, beta=beta, lv=lv
        )
        x_hat = self.g_s(y_hat)
        gap_gaussian = self.gaussian_conditional.gap(y, beta, lv)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "gap_gaussian": gap_gaussian,
            "gap_factorized": gap_factorized,
        }

    def aux_loss(self):
        if self.fact_stanh:
            return jnp.zeros(())
        return self.entropy_bottleneck.aux_loss()


# ---------------------------------------------------------------------------
# Codec wrappers: per-level CDF tables, correct symbol contract.
# ---------------------------------------------------------------------------


class StanhChannelARCodec(ChannelARCodec):
    """compress/decompress for STanH channel-AR models at a given level."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        self.stanh_tables: dict[int, fz.CodingTables] = {}

    def _stanh_wb(self, lv: int):
        p = self.params["gaussian_conditional"]["stanh"]
        return np.asarray(p["w"][lv]), np.asarray(p["b"][lv])

    def update(self, scale_table=None):
        if scale_table is None:
            scale_table = np.asarray(get_scale_table())
        self.gaussian_conditional.update_scale_table(scale_table)
        filters = getattr(self.module, "eb_filters", (3, 3, 3, 3))
        self.eb_tables = fz.build_tables(self.params["entropy_bottleneck"], filters)
        for lv in range(self.module.n_rates):
            w, b = self._stanh_wb(lv)
            self.stanh_tables[lv] = build_stanh_scale_tables(
                w, b, self.module.symmetric, scale_table
            )
        return True

    def compress(self, x, lv: int = 0) -> dict:
        """Encoder mirroring the decoder's compiled programs (same executables
        for the per-slice (mu, sigma, index) math — see ChannelARCodec
        .compress_batch for why), with stanh symbolization per slice."""
        assert self.stanh_tables, "call update() first"
        from ..base import ChannelARModule

        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        y_shape = (x.shape[1] // 16, x.shape[2] // 16)
        b = x.shape[0]

        analysis = self._jit(
            f"analysis_{lv}",
            lambda v, xx, _lv=lv: self.module.apply(
                v, xx, _lv, method=ChannelARModule.analysis
            ),
        )
        y, z, z_hat = analysis(self.variables, x)

        def _hyper(v, zz, _lv=lv):
            return self.module.apply(
                v, zz, _lv, method=ChannelARModule.hyper_synthesis
            )

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )

        syms, idxs = [], []
        y_hat_slices = []
        for i in range(self.module.num_slices):
            step = self._jit(
                f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
            )
            mu, indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )

            def _sym_fn(v, yy, m, _i=i, _lv=lv):
                def inner(mod, yy, m):
                    c = mod.M // mod.num_slices
                    y_slice = jax.lax.slice_in_dim(
                        yy, _i * c, (_i + 1) * c, axis=-1
                    )
                    state = mod.gaussian_conditional.stanh.state(_lv)
                    return sq.to_symbols(y_slice - m, state).astype(jnp.int16)

                return self.module.apply(v, yy, m, method=inner)

            sym = self._jit(f"stanh_sym_{i}_{lv}", _sym_fn)(self.variables, y, mu)

            def _deq_fn(v, sy, m, _lv=lv):
                return self.module.apply(
                    v, sy, m, _lv,
                    method=lambda mod, s, mm, l: mod.gaussian_conditional.dequantize(
                        s, mm, l
                    ),
                )

            y_hat_raw = self._jit(f"deq_{lv}", _deq_fn)(self.variables, sym, mu)

            def _finish_fn(v, ms, yh, _i=i):
                return self.module.apply(
                    v, _i, ms, yh, method=ChannelARModule.decode_slice_finish
                )

            y_hat_slices.append(
                self._jit(f"dec_finish_{i}", _finish_fn)(
                    self.variables, mean_support, y_hat_raw
                )
            )
            syms.append(sym)
            idxs.append(indexes)

        pack = self._jit(
            "pack",
            lambda v, s, ii, zz: self.module.apply(
                v, list(s), list(ii), zz, method=ChannelARModule.pack_for_host
            ),
        )
        packed = np.asarray(pack(self.variables, tuple(syms), tuple(idxs), z))
        n = y_shape[0] * y_shape[1] * self.module.M
        symbols = packed[0, :n].astype(np.int32)
        indexes = packed[0, n : 2 * n].astype(np.int32)
        zh, zw = x.shape[1] // 64, x.shape[2] // 64
        zc = getattr(self.module, "hyper_ch", None) or self.module.N
        z_np = (
            np.ascontiguousarray(packed[:, 2 * n :])
            .reshape(b, zh, zw, zc, 2)
            .view(np.float32)[..., 0]
        )
        z_strings = fz.compress(z_np, self._eb_medians(), self.eb_tables)

        from ...coding.rans import encode_with_indexes

        t = self.stanh_tables[lv]
        y_string = encode_with_indexes(
            symbols, indexes, t.quantized_cdf, t.cdf_length, t.offset
        )
        return {"strings": [[y_string], z_strings], "shape": (zh, zw), "lv": lv}

    def forward_codec_consistent(self, x, lv: int = 0) -> dict:
        """Eval forward routed through the codec's OWN compiled programs.

        The monolithic eval forward and the per-slice codec programs are
        different XLA fusions of the same math; near a staircase threshold
        the fp-level difference flips a symbol (measured ~3% of pixels at
        the finest level of a trained 3-level staircase — module
        docstring, entropy/stanh_models.py). This forward reuses the
        compress() executables VERBATIM (same _jit cache keys ->
        literally the same compiled programs), so its symbols — and
        therefore x_hat and the bpp estimate — are bit-identical to what
        compress()/decompress() produce. Returns the monolithic forward's
        {"x_hat", "likelihoods": {"y", "z"}} contract.

        Estimate semantics: y likelihood is the stanh interval integral at
        the CODED symbol (what the rANS tables quantize to 16 bits);
        z likelihood is the factorized model at round(z - median).
        """
        from ..base import ChannelARModule

        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        y_shape = (x.shape[1] // 16, x.shape[2] // 16)
        b = x.shape[0]

        analysis = self._jit(
            f"analysis_{lv}",
            lambda v, xx, _lv=lv: self.module.apply(
                v, xx, _lv, method=ChannelARModule.analysis
            ),
        )
        y, z, z_hat = analysis(self.variables, x)

        def _hyper(v, zz, _lv=lv):
            return self.module.apply(
                v, zz, _lv, method=ChannelARModule.hyper_synthesis
            )

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )

        def _z_lik(v, zz):
            return self.module.apply(
                v, zz,
                method=lambda mod, t: mod.entropy_bottleneck(
                    t, training=False
                )[1],
            )

        z_likelihoods = self._jit("z_lik", _z_lik)(self.variables, z)

        y_hat_slices, y_liks = [], []
        for i in range(self.module.num_slices):
            step = self._jit(
                f"dec_params_{i}_{y_shape}_{b}", self._make_params_fn(i, y_shape)
            )
            mu, _indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )

            # sigma for the likelihood estimate (separate program; only the
            # SYMBOL math must be fusion-identical to the coder)
            def _sigma_fn(v, lm, ls, *sl, _i=i, _ys=y_shape):
                return self.module.apply(
                    v, _i, lm, ls, list(sl), _ys,
                    method=ChannelARModule.decode_slice_params_sigma,
                )[1]

            sigma = self._jit(f"slice_sigma_{i}_{y_shape}", _sigma_fn)(
                self.variables, latent_means, latent_scales, *y_hat_slices
            )

            def _sym_fn(v, yy, m, _i=i, _lv=lv):
                def inner(mod, yy, m):
                    c = mod.M // mod.num_slices
                    y_slice = jax.lax.slice_in_dim(
                        yy, _i * c, (_i + 1) * c, axis=-1
                    )
                    state = mod.gaussian_conditional.stanh.state(_lv)
                    return sq.to_symbols(y_slice - m, state).astype(jnp.int16)

                return self.module.apply(v, yy, m, method=inner)

            sym = self._jit(f"stanh_sym_{i}_{lv}", _sym_fn)(self.variables, y, mu)

            def _deq_fn(v, sy, m, _lv=lv):
                return self.module.apply(
                    v, sy, m, _lv,
                    method=lambda mod, s, mm, l: mod.gaussian_conditional.dequantize(
                        s, mm, l
                    ),
                )

            y_hat_raw = self._jit(f"deq_{lv}", _deq_fn)(self.variables, sym, mu)

            def _lik_fn(v, yh, sg, m, _lv=lv):
                return self.module.apply(
                    v, yh, sg, m,
                    method=lambda mod, a, s, mm: stanh_gaussian_likelihood(
                        a, s, mod.gaussian_conditional.stanh.state(_lv), mm,
                        mod.gaussian_conditional.scale_bound,
                        mod.gaussian_conditional.likelihood_bound,
                    ),
                )

            y_liks.append(
                self._jit(f"slice_lik_{lv}", _lik_fn)(
                    self.variables, y_hat_raw, sigma, mu
                )
            )

            def _finish_fn(v, ms, yh, _i=i):
                return self.module.apply(
                    v, _i, ms, yh, method=ChannelARModule.decode_slice_finish
                )

            y_hat_slices.append(
                self._jit(f"dec_finish_{i}", _finish_fn)(
                    self.variables, mean_support, y_hat_raw
                )
            )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)

        def _synth(v, yy, _lv=lv):
            return self.module.apply(
                v, yy, _lv,
                method=lambda mod, h, l: jnp.clip(mod.apply_synthesis(h, l), 0.0, 1.0),
            )

        x_hat = self._jit(f"synth_{lv}", _synth)(self.variables, y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {
                "y": jnp.concatenate(y_liks, axis=-1),
                "z": z_likelihoods,
            },
        }

    def decompress(self, strings, shape, lv: int = 0) -> dict:
        from ...coding.rans import RansDecoder

        z_hat = jnp.asarray(
            fz.decompress(strings[1], shape, self._eb_medians(), self.eb_tables)
        )
        def _hyper(v, zz, _lv=lv):
            return self.module.apply(
                v, zz, _lv, method=ChannelARModule.hyper_synthesis
            )

        latent_means, latent_scales = self._jit(f"hyper_{lv}", _hyper)(
            self.variables, z_hat
        )
        y_shape = (shape[0] * 4, shape[1] * 4)
        scale_table = jnp.asarray(self.gaussian_conditional.scale_table)
        t = self.stanh_tables[lv]

        decoder = RansDecoder()
        decoder.set_stream(strings[0][0])
        y_hat_slices = []
        for i in range(self.module.num_slices):

            def _params_fn(v, lm, ls, st, *sl, _i=i, _ys=y_shape):
                return self.module.apply(
                    v, _i, lm, ls, list(sl), _ys, st,
                    method=ChannelARModule.decode_slice_params,
                )

            step = self._jit(f"dec_params_{i}_{y_shape}", _params_fn)
            mu, indexes, mean_support = step(
                self.variables, latent_means, latent_scales, scale_table,
                *y_hat_slices,
            )
            idx_np = np.asarray(indexes[0]).transpose(2, 0, 1).reshape(-1)
            rv = decoder.decode_stream(idx_np, t.quantized_cdf, t.cdf_length, t.offset)
            c = mu.shape[-1]
            rv = rv.reshape(c, y_shape[0], y_shape[1]).transpose(1, 2, 0)[None]

            def _deq_fn(v, sym, m, _lv=lv):
                return self.module.apply(
                    v, sym, m, _lv,
                    method=lambda mod, s, mm, l: mod.gaussian_conditional.dequantize(
                        s, mm, l
                    ),
                )

            y_hat_raw = self._jit(f"deq_{lv}", _deq_fn)(
                self.variables, jnp.asarray(rv), mu
            )

            def _finish_fn(v, ms, yh, _i=i):
                return self.module.apply(
                    v, _i, ms, yh, method=ChannelARModule.decode_slice_finish
                )

            y_hat_slices.append(
                self._jit(f"dec_finish_{i}", _finish_fn)(
                    self.variables, mean_support, y_hat_raw
                )
            )

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)

        def _synth(v, yy, _lv=lv):
            return self.module.apply(
                v, yy, _lv,
                method=lambda mod, h, l: jnp.clip(mod.apply_synthesis(h, l), 0.0, 1.0),
            )

        return {"x_hat": self._jit(f"synth_{lv}", _synth)(self.variables, y_hat)}


class StanhHyperpriorCodec(HyperpriorCodec):
    """compress/decompress for ScaleHyperpriorStanh at a given level."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        self.stanh_tables: dict[int, fz.CodingTables] = {}

    def update(self, scale_table=None):
        if scale_table is None:
            scale_table = np.asarray(get_scale_table())
        self.gaussian_conditional.update_scale_table(scale_table)
        gp = self.params["gaussian_conditional"]["stanh"]
        for lv in range(self.module.n_rates):
            self.stanh_tables[lv] = build_stanh_scale_tables(
                np.asarray(gp["w"][lv]), np.asarray(gp["b"][lv]),
                self.module.symmetric, scale_table,
            )
        if self.module.fact_stanh:
            ebp = self.params["entropy_bottleneck_stanh"]
            chain = {k: v for k, v in ebp.items() if k != "stanh"}
            self.eb_tables = build_stanh_factorized_tables(
                chain, np.asarray(ebp["stanh"]["w"][0]),
                np.asarray(ebp["stanh"]["b"][0]), self.module.symmetric,
            )
        else:
            self.eb_tables = fz.build_tables(self.params["entropy_bottleneck"])
        return True

    def _z_symbols_tables(self):
        return self.eb_tables

    def compress(self, x, lv: int = 0) -> dict:
        assert self.stanh_tables, "call update() first"
        from ...coding.rans import encode_with_indexes

        y, z = self._jit(
            "an", lambda v, xx: self.module.apply(v, xx, method=type(self.module).analyze)
        )(self.variables, x)
        y, z = np.asarray(y), np.asarray(z)

        if self.module.fact_stanh:
            # z symbols = stanh level indexes, channel-indexed CDF rows
            def _zsym(v, zz):
                return self.module.apply(
                    v, zz,
                    method=lambda m, a: sq.to_symbols(
                        jnp.transpose(a, (0, 3, 1, 2)),
                        m.entropy_bottleneck_stanh.stanh.state(0),
                    ),
                )

            zs = np.asarray(self._jit("zsym", _zsym)(self.variables, jnp.asarray(z)))
            c = z.shape[-1]
            idx = np.repeat(np.arange(c, dtype=np.int32), z.shape[1] * z.shape[2])
            t = self.eb_tables
            z_strings = [
                encode_with_indexes(zs[i].reshape(-1), idx, t.quantized_cdf,
                                    t.cdf_length, t.offset)
                for i in range(z.shape[0])
            ]
            z_hat = self._decode_z(z_strings, (z.shape[1], z.shape[2]))
        else:
            z_strings = fz.compress(z, self._medians(), self.eb_tables)
            z_hat = fz.decompress(
                z_strings, (z.shape[1], z.shape[2]), self._medians(), self.eb_tables
            )

        scales = self._jit(
            "hs", lambda v, zz: self.module.apply(v, zz, method=lambda m, a: m.h_s(a))
        )(self.variables, jnp.asarray(z_hat))
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))

        def _ysym(v, yy, _lv=lv):
            return self.module.apply(
                v, yy,
                method=lambda m, a: sq.to_symbols(
                    a, m.gaussian_conditional.stanh.state(_lv)
                ),
            )

        ys = np.asarray(self._jit(f"ysym_{lv}", _ysym)(self.variables, jnp.asarray(y)))
        t = self.stanh_tables[lv]
        y_strings = [
            encode_with_indexes(
                ys[i].transpose(2, 0, 1).reshape(-1),
                indexes[i].transpose(2, 0, 1).reshape(-1),
                t.quantized_cdf, t.cdf_length, t.offset,
            )
            for i in range(y.shape[0])
        ]
        return {"strings": [y_strings, z_strings],
                "shape": (z.shape[1], z.shape[2]), "lv": lv}

    def _decode_z(self, z_strings, shape):
        from ...coding.rans import decode_with_indexes

        t = self.eb_tables
        c = t.quantized_cdf.shape[0]
        idx = np.repeat(np.arange(c, dtype=np.int32), shape[0] * shape[1])
        outs = []
        for s in z_strings:
            ks = decode_with_indexes(s, idx, t.quantized_cdf, t.cdf_length, t.offset)
            outs.append(ks.reshape(c, shape[0], shape[1]))
        ks = jnp.asarray(np.stack(outs, 0).transpose(0, 2, 3, 1))

        def _deq(v, kk):
            return self.module.apply(
                v, kk,
                method=lambda m, a: sq.from_symbols(
                    a, m.entropy_bottleneck_stanh.stanh.state(0)
                ),
            )

        return np.asarray(self._jit("zdeq", _deq)(self.variables, ks))

    def decompress(self, strings, shape, lv: int = 0) -> dict:
        from ...coding.rans import decode_with_indexes

        if self.module.fact_stanh:
            z_hat = self._decode_z(strings[1], shape)
        else:
            z_hat = fz.decompress(strings[1], shape, self._medians(), self.eb_tables)

        scales = self._jit(
            "hs", lambda v, zz: self.module.apply(v, zz, method=lambda m, a: m.h_s(a))
        )(self.variables, jnp.asarray(z_hat))
        indexes = np.asarray(self.gaussian_conditional.indexes(scales))

        t = self.stanh_tables[lv]
        outs = []
        for i, s in enumerate(strings[0]):
            ks = decode_with_indexes(
                s, indexes[i].transpose(2, 0, 1).reshape(-1),
                t.quantized_cdf, t.cdf_length, t.offset,
            )
            c = indexes.shape[-1]
            outs.append(ks.reshape(c, indexes.shape[1], indexes.shape[2]))
        ks = jnp.asarray(np.stack(outs, 0).transpose(0, 2, 3, 1))

        def _deq(v, kk, _lv=lv):
            return self.module.apply(
                v, kk,
                method=lambda m, a: sq.from_symbols(
                    a, m.gaussian_conditional.stanh.state(_lv)
                ),
            )

        y_hat = self._jit(f"ydeq_{lv}", _deq)(self.variables, ks)
        x_hat = self._jit(
            "sy", lambda v, yy: self.module.apply(v, yy, method=type(self.module).synthesize)
        )(self.variables, y_hat)
        return {"x_hat": x_hat}


# ------------------------------- factories --------------------------------


def _stanh_kwargs(gaussian_configuration: Sequence[dict]):
    """Per-level quantizer knobs from the per-lambda config dicts.

    The reference honors per-level num_sigmoids/extrema through its
    per-level ModuleList (models/__init__.py:38-116); here they reach the
    stacked StanhQuantizer as tuples (collapsed to a scalar when uniform so
    single-rate module metadata stays unchanged)."""
    g0 = gaussian_configuration[0]

    def knob(key):
        vals = tuple(int(g[key]) for g in gaussian_configuration)
        return vals[0] if len(set(vals)) == 1 else vals

    return dict(
        n_rates=len(gaussian_configuration),
        num_sigmoids=knob("num_sigmoids"),
        extrema=knob("extrema"),
        symmetric=bool(g0["symmetry"]),
        stanh_trainable=bool(g0.get("trainable", True)),
        removing_mean=bool(g0.get("removing_mean", False)),
    )


def make_wacnn_stanh(gaussian_configuration, N=192, M=320, refinement="none",
                     rng=None, input_shape=(256, 256), **kwargs):
    module = WACNNStanh(
        N=N, M=M, refinement=refinement,
        **_stanh_kwargs(gaussian_configuration), **kwargs,
    )
    return _init_channel_ar(module, rng, input_shape, StanhChannelARCodec)


def make_tcm_stanh(gaussian_configuration, N=128, M=320, rng=None,
                   input_shape=(256, 256), **kwargs):
    module = TCMStanh(N=N, M=M, **_stanh_kwargs(gaussian_configuration), **kwargs)
    return _init_channel_ar(module, rng, input_shape, StanhChannelARCodec)


def make_scale_stanh(gaussian_configuration, N=128, M=192, fact_stanh=True,
                     rng=None, input_shape=(256, 256), **kwargs):
    kw = _stanh_kwargs(gaussian_configuration)
    kw.pop("removing_mean")
    module = ScaleHyperpriorStanh(
        N=N, M=M, fact_stanh=fact_stanh,
        removing_mean=bool(gaussian_configuration[0].get("removing_mean", False)),
        **kw, **kwargs,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    from ...utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, training=True)
    return StanhHyperpriorCodec(module, variables)


def _init_channel_ar(module, rng, input_shape, codec_cls):
    from ...utils.device import init_on_cpu

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    init_method = getattr(type(module), "init_levels", None)
    rngs = {"params": p_rng, "noise": n_rng}
    if init_method is not None and getattr(module, "refinement", "none") != "none":
        variables = init_on_cpu(module, rngs, x, method=init_method)
    else:
        variables = init_on_cpu(module, rngs, x, training=True)
    return codec_cls(module, variables)
