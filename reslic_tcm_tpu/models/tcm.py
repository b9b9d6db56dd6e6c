"""LIC-TCM: Learned Image Compression with Mixed Transformer-CNN blocks.

TPU-native rebuild of the flagship model (reference
models/reference/tcm.py:310-635; CVPR'23 Liu/Sun/Katto). Architecture:

  g_a: RBWS(3->2N) -> [ConvTransBlock x2, RBWS] x2 -> ConvTransBlock x2 -> conv3x3(->M, s2)
  g_s: mirror with ResidualBlockUpsample + subpel output
  h_a / h_mean_s / h_scale_s: window-4 ConvTransBlock hyper transforms
  entropy: factorized z + channel-AR Gaussian over num_slices=5 slices with
  SWAtten support attention and latent residual prediction.

Everything is NHWC; the AR slice loop unrolls into one XLA program (see
models/base.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.factorized import EntropyBottleneck
from ..ops.layers import (
    Conv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    ResidualUnit,
    SubpelConv3x3,
    gelu,
)
from ..ops.window_attention import SwinBlock, SwinTransformerBlock
from .base import ChannelARCodec, ChannelARModule


class ConvTransBlock(nn.Module):
    """Parallel conv/transformer mixture block (reference tcm.py:238-264).

    1x1 split into a conv branch (ResidualBlock + extra skip) and a swin
    branch, 1x1 merge, residual add.
    """

    conv_dim: int
    trans_dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    type: str = "W"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        both = self.conv_dim + self.trans_dim
        h = Conv(both, kernel_size=1, dtype=self.dtype, name="conv1_1")(x)
        conv_x, trans_x = h[..., : self.conv_dim], h[..., self.conv_dim :]
        conv_x = ResidualBlock(self.conv_dim, dtype=self.dtype, name="conv_block")(conv_x) + conv_x
        trans_x = SwinTransformerBlock(
            self.trans_dim,
            self.head_dim,
            self.window_size,
            self.drop_path,
            self.type,
            self.dtype,
            name="trans_block",
        )(trans_x, deterministic)
        res = Conv(both, kernel_size=1, dtype=self.dtype, name="conv1_2")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        return x + res


class SWAtten(nn.Module):
    """Swin-augmented attention gate over slice supports
    (reference tcm.py:266-287): 1x1 in, a * sigmoid(b(swin(x))) + id, 1x1 out.
    Residual units use ReLU (CompressAI AttentionBlock convention)."""

    output_dim: int
    head_dim: int = 16
    window_size: int = 8
    drop_path: float = 0.0
    inter_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = self.inter_dim
        x = Conv(n, kernel_size=1, dtype=self.dtype, name="in_conv")(x)
        identity = x
        z = SwinBlock(
            n, self.head_dim, self.window_size, self.drop_path, self.dtype,
            name="non_local_block",
        )(x, deterministic)
        a = x
        for i in range(3):
            a = ResidualUnit(n, act=jax.nn.relu, dtype=self.dtype, name=f"conv_a{i}")(a)
        b = z
        for i in range(3):
            b = ResidualUnit(n, act=jax.nn.relu, dtype=self.dtype, name=f"conv_b{i}")(b)
        b = Conv(n, kernel_size=1, dtype=self.dtype, name="conv_b_out")(b)
        out = a * jax.nn.sigmoid(b) + identity
        return Conv(self.output_dim, kernel_size=1, dtype=self.dtype, name="out_conv")(out)


def _cc_transform(out_ch: int, dtype=None, name: str = "cc") -> nn.Sequential:
    """3-layer conv/GELU parameter transform (reference tcm.py:387-414)."""
    return nn.Sequential(
        [
            Conv(224, kernel_size=3, dtype=dtype),
            gelu,
            Conv(128, kernel_size=3, dtype=dtype),
            gelu,
            Conv(out_ch, kernel_size=3, dtype=dtype),
        ],
        name=name,
    )


class TCM(ChannelARModule):
    """Flagship TCM codec module (reference tcm.py:310-478)."""

    config: Sequence[int] = (2, 2, 2, 2, 2, 2)
    head_dim: Sequence[int] = (8, 16, 32, 32, 16, 8)
    drop_path_rate: float = 0.0
    N: int = 128
    M: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    hyper_ch: int = 192      # z channels (reference hardcodes 192, tcm.py:350)
    atten_inter_dim: int = 128  # SWAtten bottleneck (reference tcm.py:379)
    remat: bool = False      # checkpoint ConvTransBlocks (training memory:
    #                          the fp32 attention-score temps alone are
    #                          ~6 GB at the reference recipe of B=16 256^2)
    dtype: Any = None

    def setup(self):
        N, M = self.N, self.M
        cfg = self.config
        window = 8
        import numpy as np

        dpr = [float(x) for x in np.linspace(0, self.drop_path_rate, sum(cfg))]
        dt = self.dtype
        # (nn.Sequential passes only x, so `deterministic` stays its static
        # default inside the remat wrapper)
        CTB = nn.remat(ConvTransBlock) if self.remat else ConvTransBlock

        def ctb_stage(stage: int, w: int = window):
            return [
                CTB(
                    N, N, self.head_dim[stage], w, dpr[i], "W" if not i % 2 else "SW", dt
                )
                for i in range(cfg[stage])
            ]

        self.g_a = nn.Sequential(
            [ResidualBlockWithStride(2 * N, 2, dt)]
            + ctb_stage(0)
            + [ResidualBlockWithStride(2 * N, 2, dt)]
            + ctb_stage(1)
            + [ResidualBlockWithStride(2 * N, 2, dt)]
            + ctb_stage(2)
            + [Conv(M, kernel_size=3, stride=2, dtype=dt)]
        )
        self.g_s = nn.Sequential(
            [ResidualBlockUpsample(2 * N, 2, dt)]
            + ctb_stage(3)
            + [ResidualBlockUpsample(2 * N, 2, dt)]
            + ctb_stage(4)
            + [ResidualBlockUpsample(2 * N, 2, dt)]
            + ctb_stage(5)
            + [SubpelConv3x3(3, 2, dt)]
        )

        def hyper_ctbs():
            return [
                CTB(N, N, 32, 4, 0.0, "W" if not i % 2 else "SW", dt)
                for i in range(cfg[0])
            ]

        self.h_a = nn.Sequential(
            [ResidualBlockWithStride(2 * N, 2, dt)]
            + hyper_ctbs()
            + [Conv(self.hyper_ch, kernel_size=3, stride=2, dtype=dt)]
        )
        self.h_mean_s = nn.Sequential(
            [ResidualBlockUpsample(2 * N, 2, dt)]
            + hyper_ctbs()
            + [SubpelConv3x3(M, 2, dt)]
        )
        self.h_scale_s = nn.Sequential(
            [ResidualBlockUpsample(2 * N, 2, dt)]
            + hyper_ctbs()
            + [SubpelConv3x3(M, 2, dt)]
        )

        slice_ch = M // self.num_slices
        self.atten_mean = [
            SWAtten(
                M + slice_ch * min(i, 5), 16, 8, 0.0, self.atten_inter_dim, dt,
                name=f"atten_mean_{i}",
            )
            for i in range(self.num_slices)
        ]
        self.atten_scale = [
            SWAtten(
                M + slice_ch * min(i, 5), 16, 8, 0.0, self.atten_inter_dim, dt,
                name=f"atten_scale_{i}",
            )
            for i in range(self.num_slices)
        ]
        self.cc_mean_transforms = [
            _cc_transform(slice_ch, dt, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            _cc_transform(slice_ch, dt, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            _cc_transform(slice_ch, dt, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]

        self.entropy_bottleneck = EntropyBottleneck(self.hyper_ch, name="entropy_bottleneck")


def make_tcm(
    N: int = 128,
    M: int = 320,
    config: Tuple[int, ...] = (2, 2, 2, 2, 2, 2),
    head_dim: Tuple[int, ...] = (8, 16, 32, 32, 16, 8),
    drop_path_rate: float = 0.0,
    rng=None,
    input_shape: Tuple[int, int] = (256, 256),
    num_slices: int = 5,
    hyper_ch: int = 192,
    atten_inter_dim: int = 128,
    fast_init: bool = False,
    remat: bool = False,
    dtype=None,
) -> ChannelARCodec:
    """Build + init a TCM codec (weights random; use the checkpoint
    converter for pretrained PyTorch weights)."""
    module = TCM(
        config=tuple(config),
        head_dim=tuple(head_dim),
        drop_path_rate=drop_path_rate,
        N=N,
        M=M,
        num_slices=num_slices,
        hyper_ch=hyper_ch,
        atten_inter_dim=atten_inter_dim,
        remat=remat,
        dtype=dtype,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    # param shapes are spatial-size independent: init at the 128px minimum
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    from ..utils.device import fast_init as _fast, init_on_cpu

    rngs = {"params": p_rng, "noise": n_rng}
    if fast_init:
        variables = _fast(module, rngs, x, training=True)
    else:
        variables = init_on_cpu(module, rngs, x, training=True)
    codec = ChannelARCodec(module, variables)
    # fast_init statistics are approximately (not bit-) faithful to the
    # flax initializers — benchmark/codec-path use only. Marked so a
    # training entry point can refuse it.
    codec.approx_init = bool(fast_init)
    return codec
