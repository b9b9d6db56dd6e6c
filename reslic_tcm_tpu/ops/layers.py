"""NN layer library, TPU-native (flax.linen, NHWC layout).

Provides the building blocks every codec in the framework uses: torch-padding
convolutions, transposed convs, sub-pixel upsampling, GDN/IGDN, and the
CompressAI-style residual blocks. Semantics match the layers the reference
imports from compressai.layers (see reference models/reference/tcm.py:4-11,
layers.py:29-43) so converted PyTorch checkpoints reproduce outputs exactly;
shapes/layouts are NHWC so XLA tiles convs straight onto the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .math import lower_bound

# torch nn.GELU default is the exact erf formulation.
gelu = partial(jax.nn.gelu, approximate=False)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


# Torch default init semantics. The reference trains with torch/timm
# defaults (kaiming_uniform(a=sqrt(5)) for every Conv2d/Linear,
# reference models/reference/tcm.py uses no explicit init except
# trunc_normal_ on relative-position tables, tcm.py:157). That default —
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)), std ~ 0.577/sqrt(fan_in) — attenuates
# each residual branch enough that the deep ConvTransBlock towers keep O(1)
# activations at init; flax's LeCun-normal (gain 1) instead doubles variance
# at every residual add, exploding y/z by ~40x and making training diverge
# from step 0. variance_scaling(1/3, fan_in, uniform) gives exactly the
# torch bound.
torch_kernel_init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch Conv2d/Linear bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        b = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


def torch_deconv_kernel_init(features: int, kernel_size: int) -> Callable:
    """torch ConvTranspose2d default: fan_in is computed on the
    [in, out, kh, kw] weight as out_channels * k^2 (not in_channels)."""
    fan = features * kernel_size * kernel_size

    def init(key, shape, dtype=jnp.float32):
        b = 1.0 / (fan ** 0.5)
        return jax.random.uniform(key, shape, dtype, -b, b)

    return init


class _PatchDotConv(nn.Module):
    """Small-Cin conv as strided-slice patch extraction + one matmul.

    XLA's TPU convolution lowering is pathological for tiny input channel
    counts (the image-input layers: ~0.1 TFLOP/s, 80 ms for g_a's first
    conv alone — artifacts/profile_rbws.py), regardless of stride. The same
    math as k*k strided slices concatenated into a [B,Ho,Wo,k^2*Cin] patch
    tensor contracted against the flattened kernel runs as a clean MXU
    matmul. Parameter stays the canonical [k,k,Cin,Cout] HWIO kernel
    (checkpoint-converter compatible); results match the conv lowering to
    accumulation-order ulps."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        packed = x.ndim == 3  # [B, H, W*3] packed RGB rows (see Conv)
        cin = 3 if packed else x.shape[-1]
        w = self.param(
            "kernel", torch_kernel_init, (k, k, cin, self.features)
        )
        bias = (
            self.param(
                "bias", torch_bias_init(cin * k * k), (self.features,)
            )
            if self.use_bias else None
        )
        p = k // 2
        if packed:
            b, h, w3 = x.shape
            wd = w3 // 3
            ho = (h + 2 * p - k) // s + 1
            wo = (wd + 2 * p - k) // s + 1
            # de-interleave channels as rank-3 strided slices: every tensor
            # stays dense-tiled ([.., W] minor), never materializing a
            # lane-padded [..,3] array
            chans = [
                jnp.pad(
                    jax.lax.slice(x, (0, 0, c), (b, h, w3), (1, 1, 3)),
                    ((0, 0), (p, p), (p, p)),
                )
                for c in range(3)
            ]
            pats = [
                jax.lax.slice(
                    chans[c], (0, a, bb),
                    (b, a + (ho - 1) * s + 1, bb + (wo - 1) * s + 1),
                    (1, s, s),
                )
                for a in range(k)
                for bb in range(k)
                for c in range(3)
            ]
            patches = jnp.stack(pats, axis=-1)  # (a, b, c) order
        else:
            b, h, wd, _ = x.shape
            ho = (h + 2 * p - k) // s + 1
            wo = (wd + 2 * p - k) // s + 1
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            patches = jnp.concatenate(
                [
                    jax.lax.slice(
                        xp,
                        (0, a, bb, 0),
                        (b, a + (ho - 1) * s + 1, bb + (wo - 1) * s + 1, cin),
                        (1, s, s, 1),
                    )
                    for a in range(k)
                    for bb in range(k)
                ],
                axis=-1,
            )
        kf = w.reshape(k * k * cin, self.features)
        if self.dtype is not None:
            patches = patches.astype(self.dtype)
            kf = kf.astype(self.dtype)
        out = jnp.einsum("bhwc,cf->bhwf", patches, kf)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


class Conv(nn.Module):
    """Conv2d with torch-style symmetric padding k//2 (reference
    models/reference/utils.py:117-124)."""

    features: int
    kernel_size: int = 5
    stride: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3 or (
            self.kernel_size > 1
            and x.shape[-1] * self.kernel_size ** 2 <= 512
        ):
            # rank-3 input = [B, H, W*3] packed RGB rows: the image-layer
            # fast path that avoids lane-padded C=3 tensors entirely (an
            # elementwise op on [8,768,512,3] costs ~26 ms on v5e because
            # the minor dim pads 3 -> 128 lanes; packed it is free).
            return _PatchDotConv(
                self.features, self.kernel_size, self.stride,
                self.use_bias, self.dtype, name="conv",
            )(x)
        p = self.kernel_size // 2
        fan_in = x.shape[-1] * self.kernel_size * self.kernel_size
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


def conv3x3(features: int, stride: int = 1, dtype=None) -> Conv:
    return Conv(features, kernel_size=3, stride=stride, dtype=dtype)


def conv1x1(features: int, stride: int = 1, dtype=None) -> Conv:
    return Conv(features, kernel_size=1, stride=stride, dtype=dtype)


class Deconv(nn.Module):
    """ConvTranspose2d(k, stride s, padding k//2, output_padding s-1):
    upsamples H,W by exactly s (reference models/reference/utils.py:127-134).

    Implemented as an input-dilated convolution so the kernel layout is a
    plain HWIO conv kernel; the checkpoint converter flips/transposes torch
    transposed-conv weights into this layout.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        p = k // 2
        op = s - 1
        kernel = self.param(
            "kernel",
            torch_deconv_kernel_init(self.features, k),
            (k, k, x.shape[-1], self.features),
        )
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(self.features * k * k), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y


class PixelShuffle(nn.Module):
    """Depth-to-space with torch PixelShuffle channel ordering
    (out[c, h*r+i, w*r+j] = in[c*r^2 + i*r + j, h, w])."""

    r: int

    @nn.compact
    def __call__(self, x):
        b, h, w, crr = x.shape
        r = self.r
        c = crr // (r * r)
        x = x.reshape(b, h, w, c, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
        return x.reshape(b, h * r, w * r, c)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsampling (reference layers.py:34-38)."""

    features: int
    r: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, shuffle: bool = True):
        x = Conv(self.features * self.r**2, kernel_size=3, dtype=self.dtype, name="conv")(x)
        if not shuffle:
            # pre-shuffle output (torch channel order c*r^2 + i*r + j) for
            # callers that do the depth-to-space on the host — materializing
            # a lane-padded [B,H,W,3] image on TPU costs ~26 ms (see Conv)
            return x
        return PixelShuffle(self.r)(x)


_GDN_BETA_MIN = 1e-6
_GDN_GAMMA_INIT = 0.1
_GDN_REPARAM_OFFSET = 2**-18


def _gdn_derived(beta_r, gamma_r, beta_min=_GDN_BETA_MIN,
                 reparam_offset=_GDN_REPARAM_OFFSET):
    """Resolve the CompressAI GDN reparametrization: stored weights are
    sqrt(value + pedestal), recovered via LowerBound + square."""
    pedestal = reparam_offset**2
    beta_bound = (beta_min + pedestal) ** 0.5
    beta = lower_bound(beta_r, jnp.asarray(beta_bound, beta_r.dtype)) ** 2 - pedestal
    gamma = (
        lower_bound(gamma_r, jnp.asarray(reparam_offset, gamma_r.dtype)) ** 2
        - pedestal
    )
    return beta, gamma


def _gdn_apply(x, beta, gamma, inverse: bool):
    # 1x1 conv on x^2: gamma[j, k] weights channel j's power into output k.
    # torch conv weight layout is [out, in, 1, 1] with gamma reshaped
    # row-major, so out k <- in j uses gamma[k, j]; NHWC contraction below
    # matches that with a transpose.
    norm = jnp.einsum("bhwj,kj->bhwk", x.astype(jnp.float32) ** 2, gamma) + beta
    norm = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
    return x * norm.astype(x.dtype)


def _gdn_beta_init(pedestal):
    return lambda rng, shape: jnp.full(
        shape, (1.0 + pedestal) ** 0.5, jnp.float32
    )


def _gdn_gamma_init(gamma_init, pedestal):
    return lambda rng, shape: jnp.sqrt(
        gamma_init * jnp.eye(shape[0], dtype=jnp.float32) + pedestal
    )


class GDN(nn.Module):
    """Generalized divisive normalization (Balle et al.), CompressAI
    parametrization: stored weights are sqrt(value + pedestal), recovered via
    LowerBound + square so non-negativity survives gradient descent.
    """

    inverse: bool = False
    beta_min: float = _GDN_BETA_MIN
    gamma_init: float = _GDN_GAMMA_INIT
    reparam_offset: float = _GDN_REPARAM_OFFSET

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pedestal = self.reparam_offset**2
        beta_r = self.param("beta", _gdn_beta_init(pedestal), (c,))
        gamma_r = self.param(
            "gamma", _gdn_gamma_init(self.gamma_init, pedestal), (c, c)
        )
        beta, gamma = _gdn_derived(beta_r, gamma_r, self.beta_min,
                                   self.reparam_offset)
        return _gdn_apply(x, beta, gamma, self.inverse)


class _GDNParams(nn.Module):
    """GDN with setup-exposed params (channel count known statically) so
    fused kernels can read the derived beta/gamma; params/paths/inits are
    identical to GDN's."""

    features: int
    inverse: bool = False

    def setup(self):
        pedestal = _GDN_REPARAM_OFFSET**2
        self.beta = self.param("beta", _gdn_beta_init(pedestal),
                               (self.features,))
        self.gamma = self.param(
            "gamma", _gdn_gamma_init(_GDN_GAMMA_INIT, pedestal),
            (self.features, self.features),
        )

    def derived(self):
        return _gdn_derived(self.beta, self.gamma)

    def __call__(self, x):
        beta, gamma = self.derived()
        return _gdn_apply(x, beta, gamma, self.inverse)


class ResidualUnit(nn.Module):
    """CompressAI AttentionBlock residual unit: 1x1 -> act -> 3x3 -> act ->
    1x1, residual add, trailing activation. The attention blocks in
    reference layers.py:52-71 use GELU; CompressAI's AttentionBlock uses
    ReLU — selectable."""

    features: int
    act: Callable = jax.nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n = self.features
        out = Conv(n // 2, kernel_size=1, dtype=self.dtype, name="conv1")(x)
        out = self.act(out)
        out = Conv(n // 2, kernel_size=3, dtype=self.dtype, name="conv2")(out)
        out = self.act(out)
        out = Conv(n, kernel_size=1, dtype=self.dtype, name="conv3")(out)
        return self.act(out + x)


# Serving-mode switch for the fused residual-conv Pallas kernel
# (ops/fused_conv.py). Read at trace time, like enable_fused_attention.
_FUSED_CONV = {"enabled": False, "interpret": False}


def enable_fused_convs(on: bool = True, interpret: bool = False):
    _FUSED_CONV["enabled"] = on
    _FUSED_CONV["interpret"] = interpret


def fused_conv_compiler_options() -> dict:
    """Per-program XLA options needed when the fused conv kernels are on.

    The 2026-08 toolchain's XLA stack-allocates pallas operands/results in
    scoped vmem and its default 16M budget rejects the kernel at serving
    shapes ("Scoped allocation with size 18.51M/39.50M ... exceeded");
    raising the cap to 64M compiles and runs (measured on the v5e,
    round-5 notes). Empty when the kernels are off so cache keys and
    executables stay identical to the default path."""
    if _FUSED_CONV["enabled"] and not _FUSED_CONV["interpret"]:
        return {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    return {}


class _RawConv(nn.Module):
    """Conv2d with setup-exposed params (paths/names match the Conv
    wrapper's nn.Conv child) so fused kernels can read raw kernels; the
    composed path is the same lax conv nn.Conv lowers to."""

    features: int
    kernel_size: int
    cin: int
    dtype: Any = None

    def setup(self):
        k = self.kernel_size
        self.kernel = self.param(
            "kernel", torch_kernel_init, (k, k, self.cin, self.features)
        )
        self.bias = self.param(
            "bias", torch_bias_init(self.cin * k * k), (self.features,)
        )

    def __call__(self, x):
        from flax.linen import dtypes

        x, kernel, bias = dtypes.promote_dtype(
            x, self.kernel, self.bias, dtype=self.dtype
        )
        p = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class _ConvHolder(nn.Module):
    """Mirrors the Conv wrapper's module nesting (child named 'conv') so
    param paths stay checkpoint/converter-compatible."""

    features: int
    kernel_size: int
    cin: int
    dtype: Any = None

    def setup(self):
        self.conv = _RawConv(self.features, self.kernel_size, self.cin,
                             self.dtype, name="conv")

    def __call__(self, x):
        return self.conv(x)


class ResidualBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu + skip (compressai.layers).

    With enable_fused_convs() on (and cin == features, the TCM
    ConvTransBlock conv-branch case, reference tcm.py:239-287), both
    convs + activations + skip run as ONE Pallas kernel over halo'd VMEM
    tiles (ops/fused_conv.py) — the intermediate activation never touches
    HBM."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        c1 = _ConvHolder(self.features, 3, cin, self.dtype, name="conv1")
        c2 = _ConvHolder(self.features, 3, self.features, self.dtype,
                         name="conv2")
        if _FUSED_CONV["enabled"] and cin == self.features:
            from .fused_conv import fused_residual_block
            from .window_attention import _score_dtype

            sd = _score_dtype()
            out = fused_residual_block(
                x,
                c1.conv.kernel,
                c1.conv.bias,
                c2.conv.kernel,
                c2.conv.bias,
                compute_dtype=sd if sd is not None else jnp.float32,
                interpret=_FUSED_CONV["interpret"],
            )
            if out is not None:
                return out
        out = c1(x)
        out = leaky_relu(out)
        out = c2(out)
        out = leaky_relu(out)
        if cin != self.features:
            x = Conv(self.features, kernel_size=1, dtype=self.dtype,
                     name="skip")(x)
        return out + x


class ResidualBlockWithStride(nn.Module):
    """conv3x3(stride) -> lrelu -> conv3x3 -> GDN + strided-1x1 skip.

    With enable_fused_convs() on, conv2+GDN+skip-add run as one Pallas
    kernel (ops/fused_conv.py fused_conv_gdn) — this is the largest
    single conv of the TCM analysis transform (929 GFLOP at stage 0,
    TCM-Large 768x512 B=8)."""

    features: int
    stride: int = 2
    dtype: Any = None

    def setup(self):
        self.conv2 = _ConvHolder(self.features, 3, self.features,
                                 self.dtype, name="conv2")
        self.gdn = _GDNParams(self.features, name="gdn")

    @nn.compact
    def __call__(self, x):
        out = Conv(
            self.features, kernel_size=3, stride=self.stride, dtype=self.dtype, name="conv1"
        )(x)
        out = leaky_relu(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            skip = Conv(
                self.features, kernel_size=1, stride=self.stride, dtype=self.dtype, name="skip"
            )(x)
        else:
            skip = x
        if _FUSED_CONV["enabled"]:
            from .fused_conv import fused_conv_gdn
            from .window_attention import _score_dtype

            beta, gamma = self.gdn.derived()
            sd = _score_dtype()
            res = fused_conv_gdn(
                out, self.conv2.conv.kernel, self.conv2.conv.bias,
                gamma, beta, skip, inverse=False,
                compute_dtype=sd if sd is not None else jnp.float32,
                interpret=_FUSED_CONV["interpret"],
            )
            if res is not None:
                return res
        out = self.conv2(out)
        out = self.gdn(out)
        return out + skip


class ResidualBlockUpsample(nn.Module):
    """subpel-up -> lrelu -> conv3x3 -> IGDN + subpel-up skip.

    With enable_fused_convs() on, conv+IGDN+identity-add run as one
    Pallas kernel (the synthesis-side mirror of RBWS's fusion)."""

    features: int
    upsample: int = 2
    dtype: Any = None

    def setup(self):
        self.conv = _ConvHolder(self.features, 3, self.features,
                                self.dtype, name="conv")
        self.igdn = _GDNParams(self.features, inverse=True, name="igdn")

    @nn.compact
    def __call__(self, x):
        out = SubpelConv3x3(self.features, self.upsample, dtype=self.dtype, name="subpel")(x)
        out = leaky_relu(out)
        identity = SubpelConv3x3(
            self.features, self.upsample, dtype=self.dtype, name="upsample"
        )(x)
        if _FUSED_CONV["enabled"]:
            from .fused_conv import fused_conv_gdn
            from .window_attention import _score_dtype

            beta, gamma = self.igdn.derived()
            sd = _score_dtype()
            res = fused_conv_gdn(
                out, self.conv.conv.kernel, self.conv.conv.bias,
                gamma, beta, identity, inverse=True,
                compute_dtype=sd if sd is not None else jnp.float32,
                interpret=_FUSED_CONV["interpret"],
            )
            if res is not None:
                return res
        out = self.conv(out)
        out = self.igdn(out)
        return out + identity


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)
