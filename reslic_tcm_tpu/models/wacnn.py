"""WACNN: window-attention CNN codec (STF-style).

TPU-native rebuild of reference models/reference/wacnn.py:23-330 — conv+GDN
analysis/synthesis with Win_noShift_Attention blocks, plain conv hyper
transforms, and a 10-slice channel-AR Gaussian entropy model (no SWAtten in
the slice loop, 5-layer parameter transforms). Shares the forward/codec
machinery with TCM via ChannelARModule.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax

from ..entropy.factorized import EntropyBottleneck
from ..ops.layers import Conv, Deconv, GDN, SubpelConv3x3, gelu
from ..ops.window_attention import Win_noShift_Attention
from .base import ChannelARCodec, ChannelARModule


def _cc5(dims: Sequence[int], out_ch: int, dtype=None, name: str = "cc") -> nn.Sequential:
    """5-layer conv/GELU transform (reference wacnn.py:89-127)."""
    layers = []
    for d in dims:
        layers += [Conv(d, kernel_size=3, stride=1, dtype=dtype), gelu]
    layers += [Conv(out_ch, kernel_size=3, stride=1, dtype=dtype)]
    return nn.Sequential(layers, name=name)


class WACNN(ChannelARModule):
    """Window-attention CNN codec (reference wacnn.py:23-140)."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5
    # channel ladders (reference hardcodes these at wacnn.py:54-127)
    hyper_dims: Sequence[int] = (320, 288, 256)   # h_a pre-stride widths
    mean_dims: Sequence[int] = (192, 224, 256, 288)  # h_*_s widths
    cc_dims: Sequence[int] = (224, 176, 128, 64)
    dtype: Any = None

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype
        hd0, hd1, hd2 = self.hyper_dims

        self.g_a = nn.Sequential([
            Conv(N, 5, 2, dtype=dt), GDN(),
            Conv(N, 5, 2, dtype=dt), GDN(),
            Win_noShift_Attention(N, 8, 8, 4, dt),
            Conv(N, 5, 2, dtype=dt), GDN(),
            Conv(M, 5, 2, dtype=dt),
            Win_noShift_Attention(M, 8, 4, 2, dt),
        ])
        self.g_s = nn.Sequential([
            Win_noShift_Attention(M, 8, 4, 2, dt),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Win_noShift_Attention(N, 8, 8, 4, dt),
            Deconv(N, 5, 2, dtype=dt), GDN(inverse=True),
            Deconv(3, 5, 2, dtype=dt),
        ])

        m0, m1, m2, m3 = self.mean_dims
        self.h_a = nn.Sequential([
            Conv(hd0, 3, 1, dtype=dt), gelu,
            Conv(hd1, 3, 1, dtype=dt), gelu,
            Conv(hd2, 3, 2, dtype=dt), gelu,
            Conv(m1, 3, 1, dtype=dt), gelu,
            Conv(N, 3, 2, dtype=dt),
        ])
        self.h_mean_s = nn.Sequential([
            Conv(m0, 3, 1, dtype=dt), gelu,
            SubpelConv3x3(m1, 2, dt), gelu,
            Conv(m2, 3, 1, dtype=dt), gelu,
            SubpelConv3x3(m3, 2, dt), gelu,
            Conv(M, 3, 1, dtype=dt),
        ])
        self.h_scale_s = nn.Sequential([
            Conv(m0, 3, 1, dtype=dt), gelu,
            SubpelConv3x3(m1, 2, dt), gelu,
            Conv(m2, 3, 1, dtype=dt), gelu,
            SubpelConv3x3(m3, 2, dt), gelu,
            Conv(M, 3, 1, dtype=dt),
        ])

        slice_ch = M // self.num_slices
        self.cc_mean_transforms = [
            _cc5(self.cc_dims, slice_ch, dt, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            _cc5(self.cc_dims, slice_ch, dt, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            _cc5(self.cc_dims, slice_ch, dt, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(N)


def make_wacnn(
    N: int = 192,
    M: int = 320,
    rng=None,
    input_shape: Tuple[int, int] = (256, 256),
    **kwargs,
) -> ChannelARCodec:
    import jax.numpy as jnp

    module = WACNN(N=N, M=M, **kwargs)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    p_rng, n_rng = jax.random.split(rng)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    from ..utils.device import init_on_cpu
    variables = init_on_cpu(module, {"params": p_rng, "noise": n_rng}, x, training=True)
    return ChannelARCodec(module, variables)
