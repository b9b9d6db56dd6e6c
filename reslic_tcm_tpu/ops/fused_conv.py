"""Fused residual-conv Pallas kernels (TPU serving path).

The stage-0 ConvTransBlock conv branches (ResidualBlock: conv3x3 ->
leaky_relu -> conv3x3 -> leaky_relu -> +x, reference
models/reference/tcm.py:239-287 via compressai.layers.ResidualBlock) are
the largest remaining conv cost of the serving path: XLA's TPU conv
lowering runs them at ~20-50% MXU and writes the intermediate activation
to HBM between the two convs (docs/PERFORMANCE.md).

This kernel runs BOTH convs and the activation/skip arithmetic on one
VMEM-resident tile: the grid walks (B, H/Ht, W/Wt) output tiles, each
step DMAs a (Ht+4, Wt+4) halo'd input block from HBM (overlapping halo
reads are not expressible with blocked BlockSpecs, so the input stays an
HBM ref and the kernel issues the copy itself), computes conv1 on the
(Ht+2, Wt+2) ring as 9 tap matmuls accumulated in fp32, applies bias +
leaky_relu, computes conv2 the same way, and adds the residual — the
intermediate never touches HBM. Each tap matmul contracts the full
C-lane width (C=128 for TCM conv branches), so the MXU streams
M = tile-pixels rows per tap at full occupancy.

Inference-only (no custom VJP): enabled through the same serving-mode
switch pattern as the flash attention kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_SLOPE = 0.01  # torch F.leaky_relu default, used by the reference


def _leaky(x):
    return jnp.where(x >= 0, x, _NEG_SLOPE * x)


def _rb_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xs, sem, *,
               Ht, Wt, Wf, C, H, W, cd):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * Ht, Ht + 4), pl.ds(k * Wt, Wf), :],
        xs,
        sem,
    )
    dma.start()
    dma.wait()
    x = xs[:]  # [Ht+4, Wf, C]; compute reads columns [0, Wt+4)

    # conv1 over the one-ring-larger tile (conv2 consumes its halo)
    mid = None
    for a in range(3):
        for b in range(3):
            sl = x[a : a + Ht + 2, b : b + Wt + 2, :].reshape(
                (Ht + 2) * (Wt + 2), C
            )
            t = jax.lax.dot_general(
                sl.astype(cd),
                w1_ref[(3 * a + b) * C : (3 * a + b + 1) * C, :].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            mid = t if mid is None else mid + t
    mid = _leaky(mid + b1_ref[:].astype(jnp.float32))
    mid = mid.reshape(Ht + 2, Wt + 2, C)
    # conv2's zero padding: ring positions OUTSIDE the image must be 0,
    # not conv1-evaluated-on-padding (bias/lrelu make those nonzero).
    # Ring row r sits at global row j*Ht - 1 + r; same for columns.
    grow = j * Ht - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (Ht + 2, Wt + 2, 1), 0
    )
    gcol = k * Wt - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (Ht + 2, Wt + 2, 1), 1
    )
    inside = (grow >= 0) & (grow < H) & (gcol >= 0) & (gcol < W)
    mid = jnp.where(inside, mid, 0.0).astype(cd)

    out = None
    for a in range(3):
        for b in range(3):
            sl = mid[a : a + Ht, b : b + Wt, :].reshape(Ht * Wt, C)
            t = jax.lax.dot_general(
                sl,
                w2_ref[(3 * a + b) * C : (3 * a + b + 1) * C, :].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = t if out is None else out + t
    out = _leaky(out + b2_ref[:].astype(jnp.float32))
    res = x[2 : 2 + Ht, 2 : 2 + Wt, :].reshape(Ht * Wt, C)
    out = out + res.astype(jnp.float32)
    o_ref[:] = out.reshape(1, Ht, Wt, C).astype(o_ref.dtype)


def _pick_tile(n: int, cands=(64, 32, 16, 8)) -> int | None:
    for c in cands:
        if n % c == 0:
            return c
    return None


# Mosaic constraint (v5e, observed on-chip): slicing an HBM memref along
# the second-minor (W) dim requires offset AND size aligned to the sublane
# tile (8).  Tile starts k*Wt are 8-aligned by _pick_tile; the halo'd fetch
# size Wt+2*halo is not — so the DMA over-fetches to the next multiple of
# 8 and the array is right-padded so the over-fetch stays in bounds.  The
# kernel's static compute slices read only the first Wt+2*halo columns.
_W_ALIGN = 8
# Lane (C) extents of sliced memrefs must be multiples of the lane tile
# (128): "Slice shape along dimension 3 must be aligned to tiling (128),
# but is 192" (observed for C in {64, 192, 320}). The wrappers pad C up to
# the next multiple of 128 with zeros — the MXU pads lanes to 128
# physically either way, so the padded kernel costs what the hardware was
# already paying — and slice the output back.
_C_ALIGN = 128


def _halo_fetch(Wt: int, halo: int) -> int:
    need = Wt + 2 * halo
    return (need + _W_ALIGN - 1) // _W_ALIGN * _W_ALIGN


def _pad_c(x, cp, value=0.0):
    pad = cp - x.shape[-1]
    if pad == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, cfg, constant_values=value)


def fused_residual_block(x, w1, b1, w2, b2, *, compute_dtype=jnp.bfloat16,
                         interpret=False):
    """x: [B, H, W, C] NHWC; w1/w2: [3, 3, C, C] HWIO; b1/b2: [C].

    Returns leaky(conv2(leaky(conv1(x)))) + x with torch-style symmetric
    padding 1 on each conv. Returns None when the shape doesn't fit the
    kernel (caller falls back to the composed path)."""
    B, H, W, C = x.shape
    if w1.shape != (3, 3, C, C) or w2.shape != (3, 3, C, C):
        return None
    Ht, Wt = _pick_tile(H), _pick_tile(W)
    if Ht is None or Wt is None or H < 8 or W < 8:
        return None

    C0 = C
    Cp = (C + _C_ALIGN - 1) // _C_ALIGN * _C_ALIGN
    if Cp != C:
        # zero pad channels: conv over zero inputs with zero weights adds
        # nothing; pad outputs are leaky(0 + bias 0) = 0, residual 0
        x = _pad_c(x, Cp)
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        b1 = _pad_c(b1, Cp)
        b2 = _pad_c(b2, Cp)
        C = Cp

    Wf = _halo_fetch(Wt, 2)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, Wf - Wt - 2), (0, 0)))
    w1f = w1.reshape(9 * C, C)
    w2f = w2.reshape(9 * C, C)

    kern = partial(_rb_kernel, Ht=Ht, Wt=Wt, Wf=Wf, C=C, H=H, W=W,
                   cd=compute_dtype)
    const = lambda *_: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, H // Ht, W // Wt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # halo'd DMA source
            pl.BlockSpec((9 * C, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((9 * C, C), const),
            pl.BlockSpec((1, C), const),
        ],
        out_specs=pl.BlockSpec((1, Ht, Wt, C),
                               lambda i, j, k: (i, j, k, 0)),
        scratch_shapes=[
            pltpu.VMEM((Ht + 4, Wf, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, w1f, b1.reshape(1, C), w2f, b2.reshape(1, C))
    return out[..., :C0] if C0 != C else out


def _cgdn_kernel(x_hbm, w_ref, b_ref, gt_ref, beta_ref, skip_ref, o_ref,
                 xs, sem, *, Ht, Wt, Wf, C, inverse, cd):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * Ht, Ht + 2), pl.ds(k * Wt, Wf), :],
        xs,
        sem,
    )
    dma.start()
    dma.wait()
    x = xs[:]  # [Ht+2, Wf, C]; compute reads columns [0, Wt+2)

    y = None
    for a in range(3):
        for b in range(3):
            sl = x[a : a + Ht, b : b + Wt, :].reshape(Ht * Wt, C)
            t = jax.lax.dot_general(
                sl.astype(cd),
                w_ref[(3 * a + b) * C : (3 * a + b + 1) * C, :].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = t if y is None else y + t
    y = y + b_ref[:].astype(jnp.float32)

    # GDN: norm = y^2 @ gamma^T + beta (1x1 conv on the squared signal);
    # out = y * rsqrt(norm), IGDN uses sqrt. gamma/beta arrive DERIVED
    # (lower-bound reparam resolved at trace level, ops/layers.py GDN).
    y2 = (y * y).astype(cd)
    norm = jax.lax.dot_general(
        y2, gt_ref[:].astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + beta_ref[:].astype(jnp.float32)
    norm = jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm)
    out = y * norm + skip_ref[:].reshape(Ht * Wt, C).astype(jnp.float32)
    o_ref[:] = out.reshape(1, Ht, Wt, C).astype(o_ref.dtype)


def fused_conv_gdn(x, w, b, gamma, beta, skip, *, inverse=False,
                   compute_dtype=jnp.bfloat16, interpret=False):
    """conv3x3(pad 1) -> GDN (inverse: IGDN) -> + skip, as one kernel.

    x: [B, H, W, C]; w: [3, 3, C, C]; b/beta: [C]; gamma: [C, C] DERIVED
    (GDN reparam resolved); skip: [B, H, W, C] added to the normalized
    output (RBWS strided-1x1 skip / RBU subpel identity — reference
    compressai.layers semantics). None when the shape doesn't fit."""
    B, H, W, C = x.shape
    if w.shape != (3, 3, C, C) or skip.shape != x.shape:
        return None
    Ht, Wt = _pick_tile(H), _pick_tile(W)
    if Ht is None or Wt is None:
        return None

    C0 = C
    Cp = (C + _C_ALIGN - 1) // _C_ALIGN * _C_ALIGN
    if Cp != C:
        # pad channels: conv output 0 (+bias 0); gamma rows/cols 0 with
        # beta 1 give norm 1 for pad channels -> out_pad = 0*1 + skip(0)
        x = _pad_c(x, Cp)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, Cp - C)))
        b = _pad_c(b, Cp)
        gamma = jnp.pad(gamma, ((0, Cp - C), (0, Cp - C)))
        beta = _pad_c(beta, Cp, value=1.0)
        skip = _pad_c(skip, Cp)
        C = Cp

    Wf = _halo_fetch(Wt, 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wf - Wt - 1), (0, 0)))
    wf = w.reshape(9 * C, C)
    # IGDN's sqrt(norm) multiplies (not divides): out = y * sqrt(norm)
    # matches layers.py GDN(inverse=True)
    kern = partial(_cgdn_kernel, Ht=Ht, Wt=Wt, Wf=Wf, C=C, inverse=inverse,
                   cd=compute_dtype)
    const = lambda *_: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, H // Ht, W // Wt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * C, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((C, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, Ht, Wt, C), lambda i, j, k: (i, j, k, 0)),
        ],
        out_specs=pl.BlockSpec((1, Ht, Wt, C),
                               lambda i, j, k: (i, j, k, 0)),
        scratch_shapes=[
            pltpu.VMEM((Ht + 2, Wf, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(xp, wf, b.reshape(1, C), gamma.T, beta.reshape(1, C), skip)
    return out[..., :C0] if C0 != C else out
