"""Auxiliary gain-model layers (reference models/gain/gain_utils.py:130-180).

ResBlock and NonLocalAttention are defined by the reference's gain utils
(ResBlock at :130, NonLocalAttention at :149) but not wired into any model;
they are provided here for API completeness. Note the reference's
NonLocalAttention.forward returns its input `x` (the attention output is
computed then discarded — gain_utils.py:180); here the computed output is
returned, with a flag to reproduce the reference's pass-through behavior.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.layers import Conv


class ResBlock(nn.Module):
    """conv3x3 -> ReLU -> conv3x3 + identity (gain_utils.py:130-146)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        r = Conv(self.channels, 3, 1, dtype=self.dtype, name="conv1")(x)
        r = jax.nn.relu(r)
        r = Conv(self.channels, 3, 1, dtype=self.dtype, name="conv2")(r)
        return x + r


class NonLocalAttention(nn.Module):
    """Trunk/attention two-branch block (gain_utils.py:149-180)."""

    channels: int
    passthrough_bug: bool = False  # reproduce the reference's `return x`
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        trunk = x
        for i in range(3):
            trunk = ResBlock(self.channels, self.dtype, name=f"trunk_{i}")(trunk)
        attn = x
        for i in range(3):
            attn = ResBlock(self.channels, self.dtype, name=f"attn_{i}")(attn)
        attn = Conv(self.channels, 1, 1, dtype=self.dtype, name="activate")(attn)
        attn = jax.nn.sigmoid(attn)
        out = x + trunk * attn
        return x if self.passthrough_bug else out
