"""[SUPERSEDED benchmark artifact — kept for measurement reproduction only.]

This per-head fused window-attention kernel measurably LOSES to XLA's
composed path (its [64, head_dim] per-head contractions underutilize the MXU
~99%; see docs/PERFORMANCE.md). The production kernel is
reslic_tcm_tpu/ops/flash_window_attn.py, which computes all heads' scores in
one full-width block-diagonal MXU matmul. Not imported by the package.

Original description:

Fused window-attention Pallas kernel (TPU).

Fuses the per-window attention core of WMSA —
qkv projection -> scaled dot-product attention with relative position bias
(+ shifted-window mask) -> output projection —
into ONE kernel over VMEM-resident window tiles, saving the HBM round trips
of the qkv / scores / probs / context intermediates that the composed XLA
graph materializes for the [num_windows, p^2, C] activation.

Window partition, cyclic shift, LayerNorm and the residual add stay outside
(cheap elementwise/reshape work XLA fuses into neighbors). The kernel
processes TILE windows per program so the dense projections run as
[TILE*p^2, C] x [C, 3C] MXU matmuls.

Numerics match ops.window_attention.WMSA's composed path; equivalence is
tested in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref,
            mask_ref, out_ref, *, heads: int, p2: int, use_mask: bool):
    """Per-head attention with only leading-dim reshapes (Mosaic cannot
    shape-cast into sub-lane trailing dims like [..., heads, hd])."""
    t, _, c = x_ref.shape
    hd = c // heads
    scale = hd ** -0.5

    x = x_ref[:].astype(jnp.float32)  # [T, p2, C]

    flat = x.reshape(t * p2, c)  # merge leading dims only
    qkv = jnp.dot(flat, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).reshape(t, p2, 3 * c)  # split leading dims only

    mask = mask_ref[:] if use_mask else None
    ctx_heads = []
    for h in range(heads):  # static unroll; heads <= 16
        q = jax.lax.slice_in_dim(qkv, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(qkv, c + h * hd, c + (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * c + h * hd, 2 * c + (h + 1) * hd, axis=2)
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [T, p2, p2]
        scores = scores + bias_ref[h][None]
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_heads.append(
            jax.lax.dot_general(
                probs, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )  # [T, p2, hd]

    ctx = jnp.concatenate(ctx_heads, axis=-1).reshape(t * p2, c)
    out = jnp.dot(ctx, wproj_ref[:], preferred_element_type=jnp.float32)
    out = out + bproj_ref[:]
    out_ref[:] = out.reshape(t, p2, c).astype(out_ref.dtype)


def fused_qkv_attention(
    windows: jnp.ndarray,  # [Nw, p2, C]
    w_qkv: jnp.ndarray,  # [C, 3C]
    b_qkv: jnp.ndarray,
    rel_bias: jnp.ndarray,  # [heads, p2, p2]
    w_proj: jnp.ndarray,  # [C, C]
    b_proj: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [Nw, p2, p2] additive, or None
    tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """proj(softmax(q k^T / sqrt(d) + bias (+ mask)) v), fused per window."""
    nw, p2, c = windows.shape
    heads = rel_bias.shape[0]
    tile = min(tile, nw)
    pad = (-nw) % tile
    if pad:
        windows = jnp.pad(windows, ((0, pad), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))
    n_total = windows.shape[0]
    use_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((1, 1, 1), jnp.float32)

    in_specs = [
        pl.BlockSpec((tile, p2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if use_mask:
        in_specs.append(
            pl.BlockSpec((tile, p2, p2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, heads=heads, p2=p2, use_mask=use_mask)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_total, p2, c), windows.dtype),
        grid=(n_total // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, p2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(windows, w_qkv, b_qkv, rel_bias, w_proj, b_proj, mask)
    return out[:nw]
