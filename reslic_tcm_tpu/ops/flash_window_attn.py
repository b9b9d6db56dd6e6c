"""Flash-style fused window attention (Pallas, TPU).

Fuses LN -> qkv -> per-head window attention (+rel-pos bias, +shift mask)
-> proj -> residual into ONE kernel, one grid step per 8x8 window. The
attention-score tensors never touch HBM — at stage-0 resolution they are
3.2 GB fp32 per pass and make the composed XLA SwinBlock HBM-bound
(~52 ms; docs/PERFORMANCE.md).

The per-head contraction uses a block-diagonal trick instead of 16 tiny
[64,8]x[8,64] matmuls (which underutilize the MXU ~99% and made the
previous per-head Pallas attempt LOSE to XLA): q is tiled across sublanes
once per head and masked to its head's columns,

    Qt[h*64+p, c] = q[p, c] * (c // head_dim == h)

so ALL heads' scores come from ONE full-width MXU matmul
    scores[h*64+p, q] = sum_c Qt[hp, c] * k[q, c]
and the PV product likewise. ~2x redundant FLOPs, but full MXU occupancy
— redundancy is free next to tiny-dot overhead.

Window partition/reverse transposes are absorbed by the BlockSpec index
map ([1, w, w, C] blocks of the NHWC feature map); cyclic shifts for the
'SW' flavor stay outside (jnp.roll), with the standard boundary masks
generated in-kernel from program ids (iota compare, branch-free).

Matches WMSA (window_attention.py) numerically; used by SwinTransformerBlock
when enable_fused_attention() is on. Reference semantics:
reference models/reference/tcm.py:139-236 (WMSA/Block).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| < 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax
    )
    return s * y


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, lns_ref,
            lnb_ref, bias_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, seg_ref, hm_ref, seg2_ref, penr_ref, penc_ref, o_ref,
            *, C, hd, w, shifted, nwh, nww, compute_dtype, with_mlp,
            with_ln, tile, layout):
    H = C // hd
    T = w * w  # tokens per window
    cd = compute_dtype

    # TILE consecutive windows along W per grid step: the token-wise dense
    # layers (LN/qkv/proj/MLP) run as [tile*T, C] full-occupancy MXU
    # matmuls and the per-grid-step pipeline overhead amortizes tile-fold
    # (one window per step = 12k tiny steps at stage-0, ~1 us each of pure
    # overhead). Only the per-window score/PV contractions stay per-window.
    xw = x_ref[:].reshape(w, tile, w, C)
    xcat = jnp.concatenate(
        [xw[:, t].reshape(T, C) for t in range(tile)], axis=0
    )  # [tile*T, C], window-major

    # LayerNorm (fp32 stats); with_ln=False (WinBasedAttention,
    # win_attention.py semantics) feeds x straight into qkv
    xf = xcat.astype(jnp.float32)
    if with_ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        ln = ln * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32
        )
    else:
        ln = xf

    # NOTE: the qkv weights arrive with hd^-0.5 already folded into the
    # q columns (flash_window_block), so q needs no in-kernel scaling.
    qkv = (
        jax.lax.dot_general(
            ln.astype(cd), wqkv_ref[:].astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    )

    # block-diagonal head mask [H*T, C] (row block h keeps head h's
    # columns) arrives as a VMEM-resident input — no per-step iota build
    head_mask = hm_ref[:]

    hp = layout == "hp"
    if shifted:
        # standard swin boundary masks, premultiplied by NEG_INF and
        # passed as inputs; only the program-id gating stays in-kernel
        is_last_i = (pl.program_id(1) == nwh - 1).astype(jnp.float32)
        is_last_tile = (pl.program_id(2) == nww // tile - 1).astype(
            jnp.float32
        )

    outs = []
    for t in range(tile):
        q = qkv[t * T : (t + 1) * T, :C]
        k = qkv[t * T : (t + 1) * T, C : 2 * C]
        v = qkv[t * T : (t + 1) * T, 2 * C :]

        if shifted:
            # column blocking applies only to the image's last window,
            # i.e. the last window of the last tile
            is_last_j = is_last_tile * jnp.float32(t == tile - 1)
            pen = penr_ref[:] * is_last_i + penc_ref[:] * is_last_j

        if hp:
            # Head-packed layout: scores [T, H*T] (rows p, lanes (h, q))
            # from ONE matmul of the dense q against the masked-replicated
            # K, and PV contracts the full (h, q) lane axis against the
            # masked-replicated V, emitting the head-combined [T, C]
            # directly — no output mask, no H-term row reduce. MXU cost
            # per weight tile streams M=T rows instead of M=H*T: scores
            # and PV each drop 2x vs 'bd' (output-bandwidth floor).
            k_bd = jnp.concatenate([k] * H, axis=0) * head_mask  # [H*T, C]
            scores = jax.lax.dot_general(
                q.astype(cd), k_bd.astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, H*T]
            scores = scores + bias_ref[:].astype(jnp.float32)
            if shifted:
                scores = scores + pen
            # Segment softmax: subtracting the ROW-global max is valid for
            # every (p, h) segment (softmax is shift-invariant and the row
            # max is constant across the row); exp then never overflows.
            # Normalization is deferred PAST the PV matmul: segment sums
            # come from one [T,H*T]x[H*T,H] indicator matmul and divide
            # the combined output per head's channel block. A segment
            # sitting ~87+ below the row max underflows to 0/eps -> that
            # head contributes ~0 (score spreads that wide do not occur
            # post-LN; guarded against 0/0 regardless).
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            v_bd = jnp.concatenate([v] * H, axis=0) * head_mask  # [H*T, C]
            out = jax.lax.dot_general(
                e.astype(cd), v_bd.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, C], heads already combined
            segsum = jax.lax.dot_general(
                e.astype(cd), seg_ref[:].astype(cd),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, H]
            recip = 1.0 / jnp.maximum(segsum, 1e-30)
            # broadcast [T, H] -> [T, C] over each head's hd channels via
            # a tiny indicator matmul (lane-repeat is not reliably
            # lowerable in Mosaic); the [H, C] indicator is an input
            rb = jax.lax.dot_general(
                recip, seg2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = out * rb
        else:
            qt = jnp.concatenate([q] * H, axis=0) * head_mask  # [H*T, C]
            scores = jax.lax.dot_general(
                qt.astype(cd), k.astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*T, T] rows (h, p), lanes q
            scores = scores + bias_ref[:].astype(jnp.float32)

            if shifted:
                scores = scores + pen

            probs = jax.nn.softmax(scores, axis=-1)
            outf = jax.lax.dot_general(
                probs.astype(cd), v.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*T, C]
            outf = outf * head_mask
            out = outf[:T]
            for h in range(1, H):
                out = out + outf[h * T : (h + 1) * T]
        outs.append(out)

    out_all = jnp.concatenate(outs, axis=0)  # [tile*T, C]
    y = (
        jax.lax.dot_general(
            out_all.astype(cd), wproj_ref[:].astype(cd),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:].astype(jnp.float32)
    )
    res = xf + y

    if with_mlp:
        # LN2 -> Dense(4C) -> GELU -> Dense(C) -> +res (Block, tcm.py:214)
        mu2 = jnp.mean(res, axis=-1, keepdims=True)
        var2 = jnp.mean((res - mu2) ** 2, axis=-1, keepdims=True)
        ln2 = (res - mu2) * jax.lax.rsqrt(var2 + 1e-5)
        ln2 = ln2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(
            jnp.float32
        )
        hmid = (
            jax.lax.dot_general(
                ln2.astype(cd), w1_ref[:].astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[:].astype(jnp.float32)
        )
        # GELU via a polynomial erf (Mosaic has no erf/erfc primitive):
        # Abramowitz-Stegun 7.1.26, |err| < 1.5e-7 — well under bf16 ulp.
        hmid = 0.5 * hmid * (1.0 + _erf_poly(
            hmid * np.float32(0.7071067811865476)
        ))
        res = res + (
            jax.lax.dot_general(
                hmid.astype(cd), w2_ref[:].astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[:].astype(jnp.float32)
        )

    # un-concatenate back to the [1, w, tile*w, C] block layout
    res_w = jnp.stack(
        [res[t * T : (t + 1) * T].reshape(w, w, C) for t in range(tile)],
        axis=1,
    )  # [w, tile, w, C]
    o_ref[:] = res_w.astype(x_ref.dtype).reshape(1, w, tile * w, C)


def flash_window_block(x, wqkv, bqkv, wproj, bproj, ln_scale, ln_bias,
                       rel_bias, mlp=None, *, head_dim, window, shifted,
                       compute_dtype=jnp.bfloat16, interpret=False,
                       tile: int | None = None, layout: str = "hp",
                       with_ln: bool = True):
    """x: NHWC [B, H, W, C] (H, W divisible by window; pre-roll for SW).
    rel_bias: [n_heads, w*w, w*w]. Returns x + proj(attn(LN(x))), and with
    mlp=(ln2_s, ln2_b, w1, b1, w2, b2) the full Swin sub-block including
    the LN2/MLP residual branch. One grid step per window; everything
    VMEM-resident.

    layout: 'hp' (head-packed, default — scores [T, H*T], PV emits the
    combined [T, C], 2x fewer MXU cycles on score/PV) or 'bd' (the
    original block-diagonal [H*T, T] layout, kept for A/B measurement)."""
    b, hgt, wid, C = x.shape
    w = window
    assert hgt % w == 0 and wid % w == 0, (hgt, wid, w)
    nwh, nww = hgt // w, wid // w
    H = C // head_dim
    T = w * w

    if tile is None:
        # measured on v5e at stage-0 [8,384,256,128]: tile=1 33 ms,
        # tile=2 24 ms, tile=4 20 ms, tile=8 21 ms — 4 is the sweet spot
        tile = 1
        for cand in (4, 8, 2):
            if nww % cand == 0:
                tile = cand
                break
    assert nww % tile == 0, (nww, tile)

    if layout == "hp":
        # [H, T, T] -> [T, H*T]: lanes h-major, q-minor
        bias_s = jnp.transpose(rel_bias, (1, 0, 2)).reshape(T, H * T)
        bias_s = bias_s.astype(jnp.float32)
    else:
        bias_s = rel_bias.reshape(H * T, T).astype(jnp.float32)
    # segment-sum indicator [H*T, H] (hp softmax normalization); tiny
    # constant, VMEM-resident
    seg = (
        np.arange(H * T)[:, None] // T == np.arange(H)[None, :]
    ).astype(np.float32)
    seg = jnp.asarray(seg)

    # fold the q scaling into the qkv weights (saves a [T, C] multiply per
    # window per grid step; fp32 weights scaled before the bf16 cast)
    scale = np.float32(head_dim) ** -0.5
    colscale = jnp.concatenate([
        jnp.full((C,), scale, jnp.float32), jnp.ones((2 * C,), jnp.float32)
    ])
    wqkv = wqkv.astype(jnp.float32) * colscale[None, :]
    bqkv = bqkv.astype(jnp.float32) * colscale

    # per-step constants, hoisted out of the kernel (no iota rebuilds):
    # block-diagonal head mask [H*T, C] and the [H, C] head->channel
    # indicator used by the hp normalization broadcast
    head_mask = jnp.asarray(
        (np.arange(H * T)[:, None] // T
         == np.arange(C)[None, :] // head_dim).astype(np.float32)
    )
    seg2 = jnp.asarray(
        (np.arange(C)[None, :] // head_dim
         == np.arange(H)[:, None]).astype(np.float32)
    )
    # shifted-window boundary penalties, premultiplied by NEG_INF.
    # 'bd': rows (h,p) -> %T gives p, lanes q. 'hp': rows p, lanes
    # (h,q) -> %T gives q. The same formulas cover both layouts.
    score_shape = (T, H * T) if layout == "hp" else (H * T, T)
    if shifted:
        p_tok = np.arange(score_shape[0])[:, None] % T
        q_tok = np.arange(score_shape[1])[None, :] % T
        s = w // 2
        blocked_r = ((p_tok // w < s) != (q_tok // w < s))
        blocked_c = ((p_tok % w < s) != (q_tok % w < s))
        pen_r = jnp.asarray(blocked_r.astype(np.float32) * NEG_INF)
        pen_c = jnp.asarray(blocked_c.astype(np.float32) * NEG_INF)
    else:
        # unread when shifted=False (static); minimal VMEM placeholder
        pen_r = pen_c = jnp.zeros((1, 128), jnp.float32)
    with_mlp = mlp is not None
    if with_mlp:
        ln2s, ln2b, w1, b1, w2, b2 = mlp
    else:
        ln2s = ln2b = jnp.zeros((C,), jnp.float32)
        w1 = jnp.zeros((C, 8), jnp.float32)
        b1 = jnp.zeros((8,), jnp.float32)
        w2 = jnp.zeros((8, C), jnp.float32)
        b2 = jnp.zeros((C,), jnp.float32)
    hid = w1.shape[1]

    kern = partial(
        _kernel, C=C, hd=head_dim, w=w, shifted=shifted, nwh=nwh, nww=nww,
        compute_dtype=compute_dtype, with_mlp=with_mlp, with_ln=with_ln,
        tile=tile, layout=layout,
    )
    const = lambda *_: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, nwh, nww // tile),
        in_specs=[
            pl.BlockSpec((1, w, tile * w, C), lambda i, j, kk: (i, j, kk, 0)),
            pl.BlockSpec((C, 3 * C), lambda *_: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda *_: (0, 0)),
            pl.BlockSpec((C, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec(bias_s.shape, const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((C, hid), const),
            pl.BlockSpec((1, hid), const),
            pl.BlockSpec((hid, C), const),
            pl.BlockSpec((1, C), const),
            pl.BlockSpec((H * T, H), const),
            pl.BlockSpec((H * T, C), const),
            pl.BlockSpec((H, C), const),
            pl.BlockSpec(pen_r.shape, const),
            pl.BlockSpec(pen_c.shape, const),
        ],
        out_specs=pl.BlockSpec((1, w, tile * w, C),
                               lambda i, j, kk: (i, j, kk, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        x,
        wqkv,
        bqkv.reshape(1, -1),
        wproj,
        bproj.reshape(1, -1),
        ln_scale.reshape(1, -1),
        ln_bias.reshape(1, -1),
        bias_s,
        ln2s.reshape(1, -1),
        ln2b.reshape(1, -1),
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
        seg,
        head_mask,
        seg2,
        pen_r,
        pen_c,
    )


def reference_window_block(x, wqkv, bqkv, wproj, bproj, ln_scale, ln_bias,
                           rel_bias, *, head_dim, window, shifted):
    """Composed-XLA reference of the same fused computation (for tests)."""
    from .window_attention import shift_window_mask, window_partition, window_reverse

    b, hgt, wid, C = x.shape
    w = window
    H = C // head_dim
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
    windows = window_partition(ln, w)
    qkv = windows @ wqkv + bqkv
    qkv = qkv.reshape(b, -1, w * w, 3, H, head_dim)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    sim = jnp.einsum("bwphc,bwqhc->bwhpq", q, k) * head_dim**-0.5
    sim = sim + rel_bias[None, None]
    if shifted:
        m = shift_window_mask(hgt // w, wid // w, w, shift=w // 2)
        sim = jnp.where(jnp.asarray(m)[None, :, None], NEG_INF + sim, sim)
    probs = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bwhpq,bwqhc->bwphc", probs, v)
    out = out.reshape(b, -1, w * w, C) @ wproj + bproj
    return x + window_reverse(out, w, hgt, wid)
