"""Swin-style window attention, TPU-native (flax.linen, NHWC).

Covers both window-attention flavors the reference uses:

* WMSA / SwinTransformerBlock / ConvTransBlock's transformer branch
  (reference models/reference/tcm.py:139-264) — LayerNorm-in-block design
  with a (2w-1)^2 x heads relative-position table and shifted-window masks.
* WindowAttention / WinBasedAttention (reference
  models/reference/win_attention.py:37-207) — the STF-style block used by
  WACNN's Win_noShift_Attention, with qkv bias and a residual shortcut.

All attention is strictly window-local (w in {4, 8}), which is exactly the
structure that tiles onto the TPU: each (window^2, C) tile fits VMEM and the
qk/pv contractions are small MXU matmuls batched over windows. The latent
grid must be divisible by the window size — guaranteed by the model-level
pad-to-128 policy (reference eval.py:33-47).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import (Conv, DropPath, ResidualUnit, gelu, torch_bias_init,
                     torch_kernel_init)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, nWh*nWw, w*w, C]."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // w) * (wd // w), w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, wd: int) -> jnp.ndarray:
    """[B, nW, w*w, C] -> [B, H, W, C]."""
    b = windows.shape[0]
    c = windows.shape[-1]
    x = windows.reshape(b, h // w, wd // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, c)


def relative_position_index(w: int) -> np.ndarray:
    """[w*w, w*w] indices into a flattened (2w-1)x(2w-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[:, :, 0] * (2 * w - 1) + rel[:, :, 1]).astype(np.int32)


def shift_window_mask(h_windows: int, w_windows: int, w: int, shift: int) -> np.ndarray:
    """Boolean mask [nW, w*w, w*w], True = blocked; the SW-MSA mask of
    reference tcm.py:160-177 (last window row/col mix wrapped content)."""
    s = w - shift
    mask = np.zeros((h_windows, w_windows, w, w, w, w), dtype=bool)
    mask[-1, :, :s, :, s:, :] = True
    mask[-1, :, s:, :, :s, :] = True
    mask[:, -1, :, :s, :, s:] = True
    mask[:, -1, :, s:, :, :s] = True
    return mask.transpose(0, 1, 2, 3, 4, 5).reshape(
        h_windows * w_windows, w * w, w * w
    )


class _Dense(nn.Module):
    """Lazy-input-dim dense with readable params (paths match nn.Dense)."""

    features: int
    in_features: int
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features)
        )
        self.bias = self.param(
            "bias", torch_bias_init(self.in_features), (self.features,)
        )

    def __call__(self, x):
        return x @ self.kernel.astype(x.dtype) + self.bias.astype(x.dtype)


# Global switch for the fused Pallas attention path (inference). Read at
# trace time: set it BEFORE building/jitting a model.
_FUSED_ATTENTION = {"enabled": False, "interpret": False, "layout": "hp"}


def enable_fused_attention(on: bool = True, interpret: bool = False,
                           layout: str = "hp"):
    """layout: 'hp' (head-packed scores, the fast path) or 'bd' (the
    original block-diagonal layout, kept for A/B measurement)."""
    _FUSED_ATTENTION["enabled"] = on
    _FUSED_ATTENTION["interpret"] = interpret
    _FUSED_ATTENTION["layout"] = layout


def fused_attention_enabled() -> bool:
    return _FUSED_ATTENTION["enabled"]


def _score_dtype():
    """Attention-score storage dtype, decided at trace time.

    Under matmul_precision="bfloat16" (the serving/throughput mode, see
    ChannelARCodec.set_matmul_precision) the [.., heads, w^2, w^2] score
    tensors are stored in bfloat16: at stage-0 resolution they are the
    dominant HBM traffic of the whole transform (3.2 GB fp32 for
    8x768x512), and the matmuls feeding them are already single-pass bf16.
    Parity mode (default) keeps fp32."""
    try:
        prec = jax.config.jax_default_matmul_precision
    except AttributeError:
        prec = None
    return jnp.bfloat16 if prec == "bfloat16" else None


class WMSA(nn.Module):
    """Window multi-head self-attention of the TCM ConvTransBlock
    (reference tcm.py:139-212). type 'SW' applies a cyclic shift of w//2.

    Two equivalent execution paths: the composed XLA graph (training /
    default) and a fused Pallas kernel over VMEM-resident window tiles
    (enable_fused_attention)."""

    dim: int
    head_dim: int
    window_size: int
    type: str = "W"  # 'W' | 'SW'
    dtype: Any = None

    def setup(self):
        w = self.window_size
        n_heads = self.dim // self.head_dim
        self.relative_position_params = self.param(
            "relative_position_params",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            (n_heads, 2 * w - 1, 2 * w - 1),
        )
        self.embedding_layer = _Dense(3 * self.dim, self.dim, self.dtype)
        self.linear = _Dense(self.dim, self.dim, self.dtype)

    def _rel_bias(self):
        w = self.window_size
        n_heads = self.dim // self.head_dim
        idx = relative_position_index(w)
        return self.relative_position_params.reshape(n_heads, -1)[
            :, idx.reshape(-1)
        ].reshape(n_heads, w * w, w * w)

    def __call__(self, x):
        w = self.window_size
        n_heads = self.dim // self.head_dim
        scale = self.head_dim**-0.5
        b, h, wd, c = x.shape

        if self.type != "W":
            x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))

        windows = window_partition(x, w)  # [b, nW, p2, c]
        bias = self._rel_bias()

        sd = _score_dtype()
        in_dtype = windows.dtype
        if sd is not None:
            # run the whole attention body in bf16: qkv/proj matmuls are
            # single-pass MXU anyway and the intermediate tensors are the
            # block's dominant HBM traffic
            windows = windows.astype(sd)
        qkv = self.embedding_layer(windows)
        qkv = qkv.reshape(b, windows.shape[1], w * w, 3, n_heads, self.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        sim = jnp.einsum("bwphc,bwqhc->bwhpq", q, k) * jnp.asarray(
            scale, q.dtype
        )
        sim = sim + bias[None, None].astype(sim.dtype)
        if self.type != "W":
            mask = shift_window_mask(h // w, wd // w, w, shift=w // 2)
            sim = jnp.where(
                jnp.asarray(mask)[None, :, None],
                jnp.asarray(-jnp.inf, sim.dtype),
                sim,
            )
        probs = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bwhpq,bwqhc->bwphc", probs, v)
        out = out.reshape(b, windows.shape[1], w * w, self.dim)
        out = self.linear(out).astype(in_dtype)

        out = window_reverse(out, w, h, wd)
        if self.type != "W":
            out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
        return out


class _LNParams(nn.Module):
    """LayerNorm with setup-exposed params (paths match nn.LayerNorm) so the
    fused kernel path can read raw scale/bias without applying the op."""

    dim: int
    epsilon: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.epsilon)
        return y * self.scale + self.bias


class SwinTransformerBlock(nn.Module):
    """LN -> WMSA -> +res; LN -> MLP(4x, GELU) -> +res
    (reference tcm.py:214-236, class `Block`).

    With enable_fused_attention() on (and deterministic, no drop-path), the
    ENTIRE block runs as one Pallas kernel per window
    (ops/flash_window_attn.py) — scores and MLP intermediates never touch
    HBM."""

    dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    type: str = "W"
    dtype: Any = None

    def setup(self):
        self.ln1 = _LNParams(self.dim, name="ln1")
        self.msa = WMSA(self.dim, self.head_dim, self.window_size, self.type,
                        self.dtype, name="msa")
        self.ln2 = _LNParams(self.dim, name="ln2")
        self.mlp1 = _Dense(4 * self.dim, self.dim, self.dtype, name="mlp1")
        self.mlp2 = _Dense(self.dim, 4 * self.dim, self.dtype, name="mlp2")
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, deterministic: bool = True):
        if (
            fused_attention_enabled()
            and deterministic
            and self.drop_path == 0.0
            # Mosaic needs the block's sublane dim divisible by 8; the
            # window-4 hyper blocks stay on the composed path (tiny anyway)
            and (self.window_size % 8 == 0 or _FUSED_ATTENTION["interpret"])
            and x.shape[1] % self.window_size == 0
            and x.shape[2] % self.window_size == 0
        ):
            return self._fused(x)
        dp = self.dp
        sd = _score_dtype()
        y = self.ln1(x)
        y = self.msa(y)
        x = x + dp(y, deterministic)
        y = self.ln2(x)
        if sd is not None:
            y = y.astype(sd)  # bf16 MLP under the throughput precision mode
        y = self.mlp1(y)
        y = gelu(y)
        y = self.mlp2(y)
        return x + dp(y, deterministic).astype(x.dtype)

    def _fused(self, x):
        from .flash_window_attn import flash_window_block

        w = self.window_size
        shifted = self.type != "W"
        if shifted:
            x = jnp.roll(x, shift=(-(w // 2), -(w // 2)), axis=(1, 2))
        sd = _score_dtype()
        out = flash_window_block(
            x,
            self.msa.embedding_layer.kernel,
            self.msa.embedding_layer.bias,
            self.msa.linear.kernel,
            self.msa.linear.bias,
            self.ln1.scale,
            self.ln1.bias,
            self.msa._rel_bias(),
            mlp=(self.ln2.scale, self.ln2.bias, self.mlp1.kernel,
                 self.mlp1.bias, self.mlp2.kernel, self.mlp2.bias),
            head_dim=self.head_dim,
            window=w,
            shifted=shifted,
            compute_dtype=sd if sd is not None else jnp.float32,
            interpret=_FUSED_ATTENTION["interpret"],
            layout=_FUSED_ATTENTION["layout"],
        )
        if shifted:
            out = jnp.roll(out, shift=(w // 2, w // 2), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    """W + SW block pair on an NHWC feature map (reference tcm.py:289-308).

    The reference pads inputs smaller than the window but never crops back
    (a latent bug that crashes for tiny inputs); here we pad any
    non-divisible input up to a window multiple and crop the output back.
    """

    dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        w = self.window_size
        b, h, wd, c = x.shape
        ph = (-h) % w
        pw = (-wd) % w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = SwinTransformerBlock(
            self.dim, self.head_dim, w, self.drop_path, "W", self.dtype, name="block_1"
        )(x, deterministic)
        x = SwinTransformerBlock(
            self.dim, self.head_dim, w, self.drop_path, "SW", self.dtype, name="block_2"
        )(x, deterministic)
        if ph or pw:
            x = x[:, :h, :wd, :]
        return x


class WindowAttention(nn.Module):
    """Relative-position-bias window MHSA over [B_, N, C] windows
    (reference win_attention.py:37-115)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Any = None

    def setup(self):
        w = self.window_size
        self.bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02 / 0.87962566103423978),
            ((2 * w - 1) * (2 * w - 1), self.num_heads),
        )
        self.qkv = _Dense(self.dim * 3, self.dim, self.dtype, name="qkv")
        self.proj = _Dense(self.dim, self.dim, self.dtype, name="proj")

    def _rel_bias(self):
        """[num_heads, w*w, w*w] bias for the fused kernel."""
        w = self.window_size
        idx = relative_position_index(w)
        return jnp.transpose(
            self.bias_table[idx.reshape(-1)].reshape(
                w * w, w * w, self.num_heads
            ),
            (2, 0, 1),
        )

    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        w = self.window_size
        bias_table = self.bias_table

        qkv = self.qkv(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        sd = _score_dtype()
        if sd is not None:
            q, k, v = q.astype(sd), k.astype(sd), v.astype(sd)
        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k)

        idx = relative_position_index(w)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(x.dtype)
        return self.proj(out)


class WinBasedAttention(nn.Module):
    """Shifted-window attention block with residual shortcut
    (reference win_attention.py:118-207). Operates on NHWC.

    With enable_fused_attention() on (w divisible by 8, s in {0, w//2}),
    runs as the flash kernel with with_ln/with_mlp off — the same fused
    window attention as the TCM Swin blocks, minus their LN/MLP wrapping.
    (The composed mask uses -100 vs the kernel's -1e9; post-softmax the
    difference is < 1e-40.)"""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0
    dtype: Any = None

    def setup(self):
        self.attn = WindowAttention(self.dim, self.window_size,
                                    self.num_heads, self.dtype, name="attn")

    def _fused(self, x):
        from .flash_window_attn import flash_window_block

        w, s = self.window_size, self.shift_size
        if s > 0:
            x = jnp.roll(x, shift=(-s, -s), axis=(1, 2))
        a = self.attn
        head_dim = self.dim // self.num_heads
        sd = _score_dtype()
        out = flash_window_block(
            x,
            a.qkv.kernel,
            a.qkv.bias,
            a.proj.kernel,
            a.proj.bias,
            jnp.ones((self.dim,), jnp.float32),
            jnp.zeros((self.dim,), jnp.float32),
            a._rel_bias(),
            mlp=None,
            head_dim=head_dim,
            window=w,
            shifted=s > 0,
            compute_dtype=sd if sd is not None else jnp.float32,
            interpret=_FUSED_ATTENTION["interpret"],
            layout=_FUSED_ATTENTION["layout"],
            with_ln=False,
        )
        if s > 0:
            out = jnp.roll(out, shift=(s, s), axis=(1, 2))
        return out

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        w, s = self.window_size, self.shift_size
        if (
            fused_attention_enabled()
            and deterministic
            and (w % 8 == 0 or _FUSED_ATTENTION["interpret"])
            and s in (0, w // 2)
            and x.shape[1] % w == 0
            and x.shape[2] % w == 0
        ):
            return self._fused(x)
        shortcut = x
        # Pad to a window multiple (reference requires divisibility and
        # relies on model-level pad-to-128; we degrade gracefully instead).
        oh, ow = x.shape[1], x.shape[2]
        ph, pw = (-oh) % w, (-ow) % w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        b, h, wd, c = x.shape

        mask = None
        if s > 0:
            # Static (numpy) mask build so it constant-folds under jit.
            img = np.zeros((h, wd), np.int32)
            cnt = 0
            for hs in (slice(0, h - w), slice(h - w, h - s), slice(h - s, h)):
                for ws in (slice(0, wd - w), slice(wd - w, wd - s), slice(wd - s, wd)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = img.reshape(h // w, w, wd // w, w).transpose(0, 2, 1, 3)
            mw = mw.reshape(-1, w * w)
            diff = mw[:, None, :] - mw[:, :, None]
            mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
            x = jnp.roll(x, shift=(-s, -s), axis=(1, 2))

        windows = window_partition(x, w).reshape(-1, w * w, c)
        attn = self.attn(windows, mask)
        attn = attn.reshape(b, -1, w * w, c)
        x = window_reverse(attn, w, h, wd)

        if s > 0:
            x = jnp.roll(x, shift=(s, s), axis=(1, 2))
        if ph or pw:
            x = x[:, :oh, :ow, :]
        return shortcut + x


class Win_noShift_Attention(nn.Module):
    """Gated window-attention block a * sigmoid(b) + identity
    (reference layers.py:45-89)."""

    dim: int
    num_heads: int = 8
    window_size: int = 8
    shift_size: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = self.dim
        identity = x
        a = x
        for i in range(3):
            a = ResidualUnit(n, act=gelu, dtype=self.dtype, name=f"conv_a{i}")(a)
        b = WinBasedAttention(
            n, self.num_heads, self.window_size, self.shift_size, self.dtype, name="win_attn"
        )(x, deterministic)
        for i in range(3):
            b = ResidualUnit(n, act=gelu, dtype=self.dtype, name=f"conv_b{i}")(b)
        b = Conv(n, kernel_size=1, dtype=self.dtype, name="conv_b_out")(b)
        return a * jax.nn.sigmoid(b) + identity
