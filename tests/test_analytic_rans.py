"""Analytic (table-free) Gaussian rANS coder + fused serving-path tests.

The analytic coder is the TPU-native serving profile (coding/analytic_rans):
CDF boundaries computed from continuous sigma in closed form, no per-symbol
table gathers, no escape path (symbols clamped to +-6 sigma support).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.coding import analytic_rans as ar
from reslic_tcm_tpu.coding.device_rans import decoder_init


def _sym_sigma(rng, n, lo=0.05, hi=300.0):
    sigma = np.exp(rng.uniform(np.log(lo), np.log(hi), n)).astype(np.float32)
    p = ar.coder_params_np(sigma)
    sym = np.clip(np.round(rng.normal(0, sigma)), -p["c"], p["c"]).astype(np.int32)
    return sym, sigma


def test_numpy_reference_roundtrip(rng):
    sym, sigma = _sym_sigma(rng, 512)
    w, c, _ = ar.encode_gaussian_np(sym, sigma, k=8)
    out = ar.decode_gaussian_np(w, c, sigma, k=8)
    assert np.array_equal(out, sym)


def test_jax_roundtrip_exact(rng):
    n, k = 4096, 64
    sym, sigma = _sym_sigma(rng, n)
    p = ar.coder_params(jnp.asarray(sigma))
    symj = ar.clamp_symbols(jnp.asarray(sym), p["c"])
    w, c, ovf = jax.jit(lambda s, pp: ar.encode_gaussian(s, pp, k=k))(symj, p)
    assert not bool(ovf)
    vals = jax.jit(lambda ww, cc, pp: ar.decode_gaussian(ww, cc, pp, k=k))(w, c, p)
    assert np.array_equal(np.asarray(vals), np.asarray(symj))


def test_segment_chaining_matches_oneshot(rng):
    n, k = 4096, 64
    sym, sigma = _sym_sigma(rng, n)
    pj = ar.coder_params(jnp.asarray(sigma))
    symj = ar.clamp_symbols(jnp.asarray(sym), pj["c"])
    w, c, _ = ar.encode_gaussian(symj, pj, k=k)
    oneshot = np.asarray(ar.decode_gaussian(w, c, pj, k=k))

    p_np = {kk: np.asarray(vv) for kk, vv in pj.items()}
    carry = decoder_init(w, c)
    outs = []
    for i in range(4):
        seg = {kk: jnp.asarray(vv[i * 1024 : (i + 1) * 1024])
               for kk, vv in p_np.items()}
        carry, vals = ar.decode_gaussian_segment(carry, w, seg, k=k)
        outs.append(np.asarray(vals))
    assert np.array_equal(np.concatenate(outs), oneshot)


def test_compact_stream_flat_decode(rng):
    n, k = 4096, 64
    sym, sigma = _sym_sigma(rng, n)
    pj = ar.coder_params(jnp.asarray(sigma))
    symj = ar.clamp_symbols(jnp.asarray(sym), pj["c"])
    w, c, _ = ar.encode_gaussian(symj, pj, k=k)
    flat, fovf = ar.compact_stream(w, c, flat_cap=int(np.asarray(c).sum()) + 8)
    assert not bool(fovf)
    offs = ar.lane_offsets(c)
    vals = ar.decode_gaussian(flat, c, pj, k=k, offsets=offs)
    assert np.array_equal(np.asarray(vals), np.asarray(symj))


def test_compact_stream_overflow_flag(rng):
    n, k = 1024, 64
    sym, sigma = _sym_sigma(rng, n)
    pj = ar.coder_params(jnp.asarray(sigma))
    symj = ar.clamp_symbols(jnp.asarray(sym), pj["c"])
    w, c, _ = ar.encode_gaussian(symj, pj, k=k)
    _, fovf = ar.compact_stream(w, c, flat_cap=4)
    assert bool(fovf)


def test_rate_near_entropy(rng):
    """Coded size within ~10% of the Gaussian entropy estimate (the +1/bin
    floor and lane flushes cost a few percent)."""
    n, k = 8192, 64
    sigma = np.full(n, 2.0, np.float32)
    sym = np.round(rng.normal(0, sigma)).astype(np.int32)
    pj = ar.coder_params(jnp.asarray(sigma))
    symj = ar.clamp_symbols(jnp.asarray(sym), pj["c"])
    w, c, _ = ar.encode_gaussian(symj, pj, k=k)
    bits = int(np.asarray(c).sum()) * 16
    ent = n * 0.5 * np.log2(2 * np.pi * np.e * 4.0)  # ~3.05 bits/sym
    assert bits < ent * 1.10 + k * 32


def test_boundary_monotonic_extremes():
    """B(s) strictly increases and hits exactly M at s=nb for edge sigmas."""
    for s_val in (0.05, 0.11, 1.0, 64.0, 300.0):
        p = ar.coder_params_np(np.full(8, s_val, np.float32))
        nb = int(p["nb"][0])
        pp = {kk: v[:1] for kk, v in p.items()}
        bs = [int(ar._boundary_np(np.int32(s), pp)) for s in range(nb + 1)]
        assert bs[0] == 0
        assert bs[-1] == ar.M_TOTAL
        assert all(b2 > b1 for b1, b2 in zip(bs, bs[1:]))


@pytest.fixture(scope="module")
def small_codec():
    from reslic_tcm_tpu.models.tcm import make_tcm

    codec = make_tcm(N=32, M=80, fast_init=True)
    codec.update()
    return codec


def test_fused_analytic_model_roundtrip(small_codec, rng):
    """Packed-RGB input, single-container stream, bit-exact reconstruction
    vs the forward-pass eval path."""
    from reslic_tcm_tpu.models.base import unshuffle_u8

    codec = small_codec
    xn = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    xp = jnp.asarray(xn.reshape(1, 128, 3 * 128))

    enc = codec.compress_device_analytic(xp, k=128)
    assert enc["nbytes"] > 0
    dec = codec.decompress_device_analytic(enc)
    out = codec.forward(jnp.asarray(xn), training=False)
    ref = np.asarray(jnp.clip(out["x_hat"], 0, 1))
    assert np.array_equal(np.asarray(dec["x_hat"]), ref)

    # NHWC input produces the identical container
    enc2 = codec.compress_device_analytic(jnp.asarray(xn), k=128)
    assert np.array_equal(enc["packed"], enc2["packed"])

    # raw-u8 output + host depth-to-space == quantized f32 output
    dec8 = codec.decompress_device_analytic(enc, raw_u8=True)
    img = unshuffle_u8(np.asarray(dec8["rgb_raw"]))
    assert np.array_equal(img, np.round(ref * 255).astype(np.uint8))


def test_analytic_rate_beats_table_coder(small_codec, rng):
    """Continuous sigma should code no worse than the 64-level scale table."""
    codec = small_codec
    xn = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    enc_a = codec.compress_device_analytic(jnp.asarray(xn), k=128)
    enc_t = codec.compress_device_fused(jnp.asarray(xn), k=128)
    assert enc_a["nbytes"] <= enc_t["nbytes"] * 1.02
