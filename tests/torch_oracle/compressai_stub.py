"""Minimal, faithful torch implementations of the CompressAI surface the
reference models import (compressai is not installed in this image).

Semantics follow the published CompressAI math — the same equations this
repo already implements twice in JAX (reslic_tcm_tpu/entropy/factorized.py,
entropy/gaussian.py) and once in C++ (coding/csrc/rans.cpp) — expressed as
torch modules whose state-dict key layout matches real CompressAI, so the
repo's torch->JAX converter sees exactly the released-checkpoint naming
(reference README.md:41-49).

Only what the reference forward path needs is provided: eval/training
likelihood math, GDN, the residual/attention blocks, and inert ANS stubs.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- ops
class LowerBound(nn.Module):
    """max(x, bound) with straight-through-ish gradient (forward parity is
    all the oracle needs)."""

    def __init__(self, bound: float):
        super().__init__()
        # plain attribute, NOT a registered buffer: real compressai's
        # LowerBound keeps no state-dict entries
        self.bound = torch.tensor([float(bound)])

    def forward(self, x):
        return torch.max(x, self.bound)


class NonNegativeParametrizer(nn.Module):
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2**-18):
        super().__init__()
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset**2
        bound = (self.minimum + self.pedestal) ** 0.5
        self.lower_bound = LowerBound(bound)

    def init(self, x):
        return torch.sqrt(torch.max(x + self.pedestal, torch.tensor(self.pedestal)))

    def forward(self, x):
        return self.lower_bound(x) ** 2 - self.pedestal


# ------------------------------------------------------------------ layers
def conv1x1(in_ch: int, out_ch: int, stride: int = 1) -> nn.Module:
    return nn.Conv2d(in_ch, out_ch, kernel_size=1, stride=stride)


def conv3x3(in_ch: int, out_ch: int, stride: int = 1) -> nn.Module:
    return nn.Conv2d(in_ch, out_ch, kernel_size=3, stride=stride, padding=1)


def subpel_conv3x3(in_ch: int, out_ch: int, r: int = 1) -> nn.Sequential:
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch * r**2, kernel_size=3, padding=1),
        nn.PixelShuffle(r),
    )


class GDN(nn.Module):
    def __init__(self, in_channels: int, inverse: bool = False,
                 beta_min: float = 1e-6, gamma_init: float = 0.1):
        super().__init__()
        self.inverse = bool(inverse)
        self.beta_reparam = NonNegativeParametrizer(minimum=beta_min)
        beta = self.beta_reparam.init(torch.ones(in_channels))
        self.beta = nn.Parameter(beta)
        self.gamma_reparam = NonNegativeParametrizer()
        gamma = self.gamma_reparam.init(gamma_init * torch.eye(in_channels))
        self.gamma = nn.Parameter(gamma)

    def forward(self, x):
        _, C, _, _ = x.size()
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma).reshape(C, C, 1, 1)
        norm = F.conv2d(x**2, gamma, beta)
        norm = torch.sqrt(norm) if self.inverse else torch.rsqrt(norm)
        return x * norm


class ResidualBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.conv1 = conv3x3(in_ch, out_ch)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv2 = conv3x3(out_ch, out_ch)
        self.skip = conv1x1(in_ch, out_ch) if in_ch != out_ch else None

    def forward(self, x):
        identity = self.skip(x) if self.skip is not None else x
        out = self.conv1(x)
        out = self.leaky_relu(out)
        out = self.conv2(out)
        out = self.leaky_relu(out)
        return out + identity


class ResidualBlockWithStride(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int = 2):
        super().__init__()
        self.conv1 = conv3x3(in_ch, out_ch, stride=stride)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv2 = conv3x3(out_ch, out_ch)
        self.gdn = GDN(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.skip = conv1x1(in_ch, out_ch, stride=stride)
        else:
            self.skip = None

    def forward(self, x):
        identity = self.skip(x) if self.skip is not None else x
        out = self.conv1(x)
        out = self.leaky_relu(out)
        out = self.conv2(out)
        out = self.gdn(out)
        return out + identity


class ResidualBlockUpsample(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, upsample: int = 2):
        super().__init__()
        self.subpel_conv = subpel_conv3x3(in_ch, out_ch, upsample)
        self.leaky_relu = nn.LeakyReLU(inplace=True)
        self.conv = conv3x3(out_ch, out_ch)
        self.igdn = GDN(out_ch, inverse=True)
        self.upsample = subpel_conv3x3(in_ch, out_ch, upsample)

    def forward(self, x):
        identity = self.upsample(x)
        out = self.subpel_conv(x)
        out = self.leaky_relu(out)
        out = self.conv(out)
        out = self.igdn(out)
        return out + identity


class AttentionBlock(nn.Module):
    """Cheng2020 simplified attention (a * sigmoid(b) + x)."""

    def __init__(self, N: int):
        super().__init__()

        class ResidualUnit(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Sequential(
                    conv1x1(N, N // 2),
                    nn.ReLU(inplace=True),
                    conv3x3(N // 2, N // 2),
                    nn.ReLU(inplace=True),
                    conv1x1(N // 2, N),
                )
                self.relu = nn.ReLU(inplace=True)

            def forward(self, x):
                return self.relu(self.conv(x) + x)

        self.conv_a = nn.Sequential(ResidualUnit(), ResidualUnit(), ResidualUnit())
        self.conv_b = nn.Sequential(
            ResidualUnit(), ResidualUnit(), ResidualUnit(), conv1x1(N, N)
        )

    def forward(self, x):
        a = self.conv_a(x)
        b = self.conv_b(x)
        return a * torch.sigmoid(b) + x


# ---------------------------------------------------------- entropy models
class EntropyBottleneck(nn.Module):
    """Univariate learned-CDF factorized prior (Balle 2018), matching the
    matrix/bias/factor chain in reslic_tcm_tpu/entropy/factorized.py."""

    def __init__(self, channels: int, filters=(3, 3, 3, 3),
                 init_scale: float = 10.0, tail_mass: float = 1e-9,
                 likelihood_bound: float = 1e-9):
        super().__init__()
        self.channels = int(channels)
        self.filters = tuple(int(f) for f in filters)
        self.init_scale = float(init_scale)
        self.tail_mass = float(tail_mass)
        self.use_likelihood_bound = likelihood_bound > 0
        self.likelihood_lower_bound = LowerBound(likelihood_bound)

        f = (1,) + self.filters + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / f[i + 1]))
            matrix = torch.full((self.channels, f[i + 1], f[i]), init)
            self.register_parameter(f"_matrix{i:d}", nn.Parameter(matrix))
            bias = torch.empty(self.channels, f[i + 1], 1).uniform_(-0.5, 0.5)
            self.register_parameter(f"_bias{i:d}", nn.Parameter(bias))
            if i < len(self.filters):
                factor = torch.zeros(self.channels, f[i + 1], 1)
                self.register_parameter(f"_factor{i:d}", nn.Parameter(factor))

        self.quantiles = nn.Parameter(
            torch.tensor([-self.init_scale, 0.0, self.init_scale])
            .repeat(self.channels, 1, 1)
        )
        target = math.log(2 / self.tail_mass - 1)
        self.register_buffer("target", torch.tensor([-target, 0.0, target]))

    def _get_medians(self):
        return self.quantiles[:, :, 1:2].detach()

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = getattr(self, f"_matrix{i:d}")
            bias = getattr(self, f"_bias{i:d}")
            if stop_gradient:
                matrix = matrix.detach()
                bias = bias.detach()
            logits = torch.matmul(F.softplus(matrix), logits) + bias
            if i < len(self.filters):
                factor = getattr(self, f"_factor{i:d}")
                if stop_gradient:
                    factor = factor.detach()
                logits = logits + torch.tanh(factor) * torch.tanh(logits)
        return logits

    def _likelihood(self, inputs):
        half = 0.5
        lower = self._logits_cumulative(inputs - half, stop_gradient=False)
        upper = self._logits_cumulative(inputs + half, stop_gradient=False)
        sign = -torch.sign(lower + upper).detach()
        return torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))

    def quantize(self, inputs, mode: str, means=None):
        if mode == "noise":
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs = outputs - means
        outputs = torch.round(outputs)
        if means is not None:
            outputs = outputs + means
        return outputs

    def forward(self, x, training=None):
        if training is None:
            training = self.training
        # channels-major: [B, C, ...] -> [C, 1, B*spatial]
        perm = list(range(x.dim()))
        perm[0], perm[1] = perm[1], perm[0]
        xp = x.permute(*perm).contiguous()
        shape = xp.size()
        values = xp.reshape(xp.size(0), 1, -1)
        outputs = self.quantize(
            values, "noise" if training else "dequantize", self._get_medians()
        )
        likelihood = self._likelihood(outputs)
        if self.use_likelihood_bound:
            likelihood = self.likelihood_lower_bound(likelihood)
        outputs = outputs.reshape(shape).permute(*perm).contiguous()
        likelihood = likelihood.reshape(shape).permute(*perm).contiguous()
        return outputs, likelihood


class GaussianConditional(nn.Module):
    """Conditional Gaussian likelihood with lower-bounded scale, matching
    reslic_tcm_tpu/entropy/gaussian.py."""

    def __init__(self, scale_table=None, scale_bound: float = 0.11,
                 tail_mass: float = 1e-9, likelihood_bound: float = 1e-9):
        super().__init__()
        self.tail_mass = float(tail_mass)
        self.use_likelihood_bound = likelihood_bound > 0
        self.likelihood_lower_bound = LowerBound(likelihood_bound)
        self.lower_bound_scale = LowerBound(scale_bound)
        self.register_buffer(
            "scale_table",
            torch.tensor(tuple(scale_table) if scale_table else ()),
        )

    def update_scale_table(self, scale_table, force=False):
        self.scale_table = torch.tensor(tuple(float(s) for s in scale_table))
        return True

    @staticmethod
    def _standardized_cumulative(inputs):
        half = 0.5
        const = -(2**-0.5)
        return half * torch.erfc(const * inputs)

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = self.lower_bound_scale(scales)
        values = torch.abs(values)
        upper = self._standardized_cumulative((0.5 - values) / scales)
        lower = self._standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def quantize(self, inputs, mode: str, means=None):
        if mode == "noise":
            noise = torch.empty_like(inputs).uniform_(-0.5, 0.5)
            return inputs + noise
        outputs = inputs.clone()
        if means is not None:
            outputs = outputs - means
        outputs = torch.round(outputs)
        if means is not None:
            outputs = outputs + means
        return outputs

    def forward(self, inputs, scales, means=None, training=None):
        if training is None:
            training = self.training
        outputs = self.quantize(
            inputs, "noise" if training else "dequantize", means
        )
        likelihood = self._likelihood(outputs, scales, means)
        if self.use_likelihood_bound:
            likelihood = self.likelihood_lower_bound(likelihood)
        return outputs, likelihood

    def build_indexes(self, scales):
        scales = self.lower_bound_scale(scales)
        indexes = torch.full_like(scales, len(self.scale_table) - 1).int()
        for s in self.scale_table[:-1]:
            indexes -= (scales <= s).int()
        return indexes


# ----------------------------------------------------------------- extras
def update_registered_buffers(module, module_name, buffer_names, state_dict,
                              policy="resize_if_empty", dtype=torch.int):
    """No-op: the oracle never loads CDF buffers (derived state)."""


class BufferedRansEncoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("oracle stub: forward-pass parity only")


class RansDecoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("oracle stub: forward-pass parity only")


def trunc_normal_(tensor, mean: float = 0.0, std: float = 1.0,
                  a: float = -2.0, b: float = 2.0):
    with torch.no_grad():
        tensor.normal_(mean, std).clamp_(a * std, b * std)
    return tensor


class DropPath(nn.Module):
    """Stochastic depth; identity at eval / rate 0 (the reference builds TCM
    with drop_path_rate=0)."""

    def __init__(self, drop_prob: float = 0.0):
        super().__init__()
        self.drop_prob = float(drop_prob)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask_shape = (x.shape[0],) + (1,) * (x.dim() - 1)
        mask = torch.bernoulli(torch.full(mask_shape, keep, device=x.device))
        return x / keep * mask
