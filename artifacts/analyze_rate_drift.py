"""Decompose coded-vs-estimate rate drift for a trained TCM checkpoint.

VERDICT round-2 "weak" item 4: the converged TCM-Small run showed one
image (synth_00016, the highest-rate one) coding 2.21% BELOW the forward
estimate while every other image sat within 0.8%. This probe pinpoints
where such drift comes from by computing, per image, THREE rates:

  est_bpp   continuous-likelihood forward estimate (eval semantics:
            -log2(likelihood) with the 1e-9 likelihood bound)
  qcdf_bpp  ideal cost of the CODER'S actual symbols under the 16-bit
            quantized CDF tables, including the escape-bypass bits for
            out-of-range symbols (mirrors coding/csrc/rans.cpp push():
            tail-bin cost + 4-bit chunk count prefix + 4-bit chunks)
  real_bpp  actual stream bytes * 8

so that  real - qcdf  = rANS coding overhead (should be ~0.1%), and
         qcdf - est   = table-quantization effects: the 16-bit pmf floor
                        (estimate charges up to 30 bits/symbol at the
                        likelihood bound, tables floor any symbol at
                        ~16 bits), escape coding, and fp-level (mu,sigma)
                        differences between the monolithic eval forward
                        and the per-slice codec programs.

Also reports escape counts and the top drift-contributing scale buckets.

Usage:
  python artifacts/analyze_rate_drift.py --checkpoint CKPT --N 64 --M 320 \
      --images data_synth/test/data/synth_00016.png [more...]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def quantized_cost_bits(symbols, indexes, tables):
    """Exact information cost of coding `symbols` with our rANS semantics.

    Mirrors BufferedEncoder::push (coding/csrc/rans.cpp): out-of-range
    values code the tail bin then bypass raw_val in 4-bit chunks with a
    saturating 4-bit chunk-count prefix."""
    cdf = np.asarray(tables.quantized_cdf)
    cdf_len = np.asarray(tables.cdf_length)
    off = np.asarray(tables.offset)
    idx = np.asarray(indexes, np.int64)
    val = np.asarray(symbols, np.int64) - off[idx]
    max_value = cdf_len[idx] - 2

    neg = val < 0
    over = val >= max_value
    esc = neg | over
    raw = np.where(neg, -2 * val - 1, np.where(over, 2 * (val - max_value), 0))
    coded_bin = np.where(esc, max_value, val)

    freq = cdf[idx, coded_bin + 1] - cdf[idx, coded_bin]
    sym_bits = 16.0 - np.log2(np.maximum(freq, 1))

    # bypass chunks: n = #4-bit chunks of raw (0 if raw==0); prefix is
    # ceil((n+1)/15) saturating 4-bit values encoding n
    n_chunks = np.zeros_like(raw)
    nz = raw > 0
    n_chunks[nz] = (np.floor(np.log2(raw[nz])).astype(np.int64) // 4) + 1
    prefix = n_chunks // 15 + 1
    bypass_bits = 4.0 * (prefix + n_chunks)
    bits = sym_bits + np.where(esc, bypass_bits, 0.0)
    return bits, esc, sym_bits


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--M", type=int, default=320)
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--platform", default=None)
    p.add_argument("--lv", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from reslic_tcm_tpu.data.datasets import read_image
    from reslic_tcm_tpu.models.tcm import make_tcm
    from reslic_tcm_tpu.ops.math import compute_padding, pad_nhwc
    from reslic_tcm_tpu.utils.checkpoint import load_checkpoint

    codec = make_tcm(N=args.N, M=args.M, input_shape=(256, 256))
    restored = load_checkpoint(args.checkpoint)
    params = (restored["state"]["params"] if "state" in restored
              else restored["params"])
    codec.variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    codec.update()
    gt = codec.gaussian_conditional.tables
    eb = codec.eb_tables
    med = np.asarray(codec._eb_medians())

    for path in args.images:
        x = jnp.asarray(read_image(path))[None]
        h, w = x.shape[1], x.shape[2]
        pad, _ = compute_padding(h, w, 64)
        xp = pad_nhwc(x, pad)
        npix = xp.shape[1] * xp.shape[2]

        # 1. continuous estimate (eval forward)
        out = codec.forward(xp, training=False, lv=args.lv)
        est_y = float(-jnp.log2(out["likelihoods"]["y"]).sum())
        est_z = float(-jnp.log2(out["likelihoods"]["z"]).sum())

        # 2. the coder's actual symbols (same packed unpack as
        #    _compress_host_stage, models/base.py:587-622)
        staged, meta = codec._compress_device_stage(xp, args.lv)
        b, H, W = meta
        n = (H // 16) * (W // 16) * codec.module.M
        zh, zw = H // 64, W // 64
        zc = getattr(codec.module, "hyper_ch", None) or codec.module.N
        packed8, dev_tensors = staged
        packed = np.asarray(packed8)
        if packed[0, -1] == 0:
            symbols = packed[:, :n].astype(np.int32)
            indexes = packed[:, n:2 * n].view(np.uint8).astype(np.int32)
            z = (np.ascontiguousarray(packed[:, 2 * n:-1])
                 .reshape(b, zh, zw, zc, 4).view(np.float32)[..., 0])
        else:
            pack16 = codec._jit(
                "pack_i16",
                lambda v, s, ii, zz: codec.module.apply(
                    v, list(s), list(ii), zz,
                    method=type(codec.module).pack_for_host),
            )
            syms, idxs, zdev = dev_tensors
            packed = np.asarray(pack16(codec.variables, syms, idxs, zdev))
            symbols = packed[:, :n].astype(np.int32)
            indexes = packed[:, n:2 * n].astype(np.int32)
            z = (np.ascontiguousarray(packed[:, 2 * n:])
                 .reshape(b, zh, zw, zc, 2).view(np.float32)[..., 0])

        enc = codec._compress_host_stage(staged, meta)[0]
        real_y = len(enc["strings"][0][0]) * 8
        real_z = sum(len(s) for s in enc["strings"][1]) * 8

        yb, esc, _ = quantized_cost_bits(symbols[0], indexes[0], gt)
        zsym = np.rint(z[0] - med.reshape(1, 1, -1)).astype(np.int32)
        zsym = zsym.transpose(2, 0, 1).reshape(-1)
        zidx = np.repeat(np.arange(zc, dtype=np.int32), zh * zw)
        zb, zesc, _ = quantized_cost_bits(zsym, zidx, eb)

        qcdf_y, qcdf_z = float(yb.sum()), float(zb.sum())
        est, qcdf, real = est_y + est_z, qcdf_y + qcdf_z, real_y + real_z
        print(f"\n== {path} ({h}x{w}, coded at {H}x{W}) ==")
        print(f" est_bpp  = {est / npix:.5f}  (y {est_y / npix:.5f}, "
              f"z {est_z / npix:.5f})")
        print(f" qcdf_bpp = {qcdf / npix:.5f}  (y {qcdf_y / npix:.5f}, "
              f"z {qcdf_z / npix:.5f})")
        print(f" real_bpp = {real / npix:.5f}  (y {real_y / npix:.5f}, "
              f"z {real_z / npix:.5f})")
        print(f" real-vs-qcdf (rANS overhead) = {(real - qcdf) / qcdf * 100:+.3f}%")
        print(f" qcdf-vs-est (table effects)  = {(qcdf - est) / est * 100:+.3f}%")
        print(f" escapes: y {int(esc.sum())}/{esc.size}, "
              f"z {int(zesc.sum())}/{zesc.size}")
        # report how much of y cost sits in the 10 highest-cost symbols
        top = np.sort(yb)[-10:]
        print(f" top-10 y symbol costs (bits): {np.array2string(top, precision=1)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
