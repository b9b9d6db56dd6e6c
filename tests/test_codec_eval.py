"""compress_with_ac equivalent (training/codec_eval) end to end."""

import numpy as np
from PIL import Image

from reslic_tcm_tpu.models.balle2018 import make_balle
from reslic_tcm_tpu.training.codec_eval import bpp_calculation, compress_with_ac


def test_compress_with_ac(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    for i, (h, w) in enumerate([(100, 120), (128, 64)]):  # non-multiples of 64
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(arr).save(p)
        files.append(p)

    codec = make_balle("mean-scale", N=16, M=24, input_shape=(64, 64))
    codec.update()
    bpp, psnr = compress_with_ac(codec, files, verbose=False)
    assert np.isfinite(bpp) and bpp > 0
    assert np.isfinite(psnr)


def test_bpp_calculation():
    strings = [[b"x" * 100], [b"y" * 25]]
    total, hyper, main = bpp_calculation(1000, strings)
    assert main == 100 * 8 / 1000
    assert hyper == 25 * 8 / 1000
    assert abs(total - (main + hyper)) < 1e-12


def test_table_sigma_explains_estimate_gap():
    """The coded-vs-estimate bpp gap on high-rate content is the sigma ->
    scale-table CEIL (build_indexes picks the first table scale >= sigma,
    CompressAI semantics), not a coder defect: real coded bits match the
    table-sigma entropy within ~1%, and sit BELOW the continuous-sigma
    estimate when many |residual| >= 1 fall under sub-table-minimum sigmas
    (docs/RD_RESULTS.md, synth_00016 root cause)."""
    import math

    import jax.numpy as jnp
    from scipy.special import erf

    from reslic_tcm_tpu.coding.rans import RansDecoder, encode_with_indexes
    from reslic_tcm_tpu.entropy.gaussian import build_scale_tables
    from reslic_tcm_tpu.ops.math import build_indexes

    rng = np.random.default_rng(0)
    n = 20000
    table = np.exp(np.linspace(math.log(0.11), math.log(256), 64)).astype(
        np.float32
    )
    # heavy sub-minimum sigma population, like the outlier image
    sigma = np.where(
        rng.uniform(size=n) < 0.4,
        rng.uniform(0.03, 0.11, n),
        rng.uniform(0.11, 2.0, n),
    ).astype(np.float32)
    r = rng.normal(0, np.maximum(sigma, 0.35)).round().astype(np.int32)

    def p_of(rr, s):
        u = (rr + 0.5) / (s * np.sqrt(2.0))
        lo = (rr - 0.5) / (s * np.sqrt(2.0))
        return np.clip(0.5 * (erf(u) - erf(lo)), 1e-300, 1.0)

    est_bits = -np.log2(np.maximum(p_of(r, sigma), 1e-9)).sum()

    idx = np.asarray(
        build_indexes(jnp.asarray(sigma[None]), jnp.asarray(table))
    ).ravel()
    tbl_bits = -np.log2(np.maximum(p_of(r, table[idx]), 2.0**-16)).sum()

    t = build_scale_tables(table)
    stream = encode_with_indexes(
        r.tolist(), idx.tolist(), t.quantized_cdf.tolist(),
        t.cdf_length.tolist(), t.offset.tolist(),
    )
    coded_bits = len(stream) * 8
    dec = RansDecoder()
    back = dec.decode_with_indexes(
        stream, idx.tolist(), t.quantized_cdf.tolist(),
        t.cdf_length.tolist(), t.offset.tolist(),
    )
    np.testing.assert_array_equal(np.asarray(back, np.int32), r)

    # coded size ~= table-sigma entropy (16-bit CDF quantization noise)
    assert abs(coded_bits - tbl_bits) / tbl_bits < 0.01, (coded_bits, tbl_bits)
    # and clearly BELOW the continuous-sigma estimate on this population
    assert coded_bits < est_bits * 0.99, (coded_bits, est_bits)
