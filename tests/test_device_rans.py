"""Device-side interleaved rANS: numpy reference + JAX scan equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.coding import device_rans as dr
from reslic_tcm_tpu.coding import rans


def _tables(n_indexes=4, support=16, seed=0):
    rng = np.random.default_rng(seed)
    max_len = support + 2
    cdfs = np.zeros((n_indexes, max_len), np.int32)
    lengths = np.zeros(n_indexes, np.int32)
    offsets = np.zeros(n_indexes, np.int32)
    for i in range(n_indexes):
        pmf = rng.uniform(0.01, 1.0, size=support).astype(np.float32)
        pmf /= pmf.sum() * 1.0001
        q = rans.pmf_to_quantized_cdf(np.concatenate([pmf, [1 - pmf.sum()]]), 16)
        cdfs[i, : q.shape[0]] = q
        lengths[i] = q.shape[0]
        offsets[i] = -(support // 2)
    return cdfs, lengths, offsets


def _data(n, seed=1, esc_frac=0.0, n_idx=4, support=16):
    rng = np.random.default_rng(seed)
    offsets_lo = -(support // 2)
    idx = rng.integers(0, n_idx, size=n).astype(np.int32)
    sym = rng.integers(0, support - 2, size=n).astype(np.int32) + offsets_lo
    if esc_frac:
        m = rng.uniform(size=n) < esc_frac
        sym = np.where(m, rng.integers(-60000, 60000, size=n), sym).astype(np.int32)
    return sym, idx


def test_numpy_reference_roundtrip():
    cdfs, lengths, offsets = _tables()
    sym, idx = _data(1000, esc_frac=0.05)
    st = dr.encode_interleaved_np(sym, idx, cdfs, lengths, offsets, k=8)
    out = dr.decode_interleaved_np(st, idx, cdfs, lengths, offsets, k=8)
    np.testing.assert_array_equal(out, sym)


def test_numpy_reference_nondivisible_n():
    cdfs, lengths, offsets = _tables(seed=3)
    sym, idx = _data(1003, seed=4, esc_frac=0.02)
    st = dr.encode_interleaved_np(sym, idx, cdfs, lengths, offsets, k=8)
    out = dr.decode_interleaved_np(st, idx, cdfs, lengths, offsets, k=8)
    np.testing.assert_array_equal(out, sym)


@pytest.mark.parametrize("esc", [0.0, 0.05])
def test_jax_encode_matches_numpy(esc):
    cdfs, lengths, offsets = _tables(seed=5)
    sym, idx = _data(512, seed=6, esc_frac=esc)
    k = 8
    ref = dr.encode_interleaved_np(sym, idx, cdfs, lengths, offsets, k=k)

    words, counts, overflow = jax.jit(
        lambda s, i: dr.encode_interleaved(
            s, i, jnp.asarray(cdfs), jnp.asarray(lengths), jnp.asarray(offsets),
            k=k, cap=256,
        )
    )(jnp.asarray(sym), jnp.asarray(idx))
    assert not bool(overflow)
    counts = np.asarray(counts)
    np.testing.assert_array_equal(counts, ref.counts)
    w = np.asarray(words)
    for lane in range(k):
        np.testing.assert_array_equal(
            w[lane, : counts[lane]], ref.words[lane, : ref.counts[lane]]
        )


@pytest.mark.parametrize("esc", [0.0, 0.05])
def test_jax_roundtrip(esc):
    cdfs, lengths, offsets = _tables(seed=7)
    sym, idx = _data(2000, seed=8, esc_frac=esc)
    k = 16
    words, counts, overflow = dr.encode_interleaved(
        jnp.asarray(sym), jnp.asarray(idx),
        jnp.asarray(cdfs), jnp.asarray(lengths), jnp.asarray(offsets),
        k=k, cap=512,
    )
    assert not bool(overflow)
    out = jax.jit(
        lambda w, c, i: dr.decode_interleaved(
            w, c, i, jnp.asarray(cdfs), jnp.asarray(lengths), jnp.asarray(offsets),
            n=sym.shape[0], k=k,
        )
    )(words, counts, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), sym)


def test_jax_roundtrip_gaussian_tables():
    """Real Gaussian CDF tables (64 scale rows, wide supports)."""
    from reslic_tcm_tpu.entropy.gaussian import build_scale_tables
    from reslic_tcm_tpu.ops.math import get_scale_table

    t = build_scale_tables(np.asarray(get_scale_table()))
    rng = np.random.default_rng(9)
    n = 4096
    idx = rng.integers(0, 20, size=n).astype(np.int32)  # small sigmas mostly
    sigma = np.asarray(get_scale_table())[idx]
    sym = np.rint(rng.normal(0, sigma)).astype(np.int32)

    k = 32
    words, counts, overflow = dr.encode_interleaved(
        jnp.asarray(sym), jnp.asarray(idx),
        jnp.asarray(t.quantized_cdf), jnp.asarray(t.cdf_length), jnp.asarray(t.offset),
        k=k, cap=1024,
    )
    assert not bool(overflow)
    out = dr.decode_interleaved(
        words, counts, jnp.asarray(idx),
        jnp.asarray(t.quantized_cdf), jnp.asarray(t.cdf_length), jnp.asarray(t.offset),
        n=n, k=k,
    )
    np.testing.assert_array_equal(np.asarray(out), sym)
    # compression sanity: stream smaller than raw int16 symbols
    nbytes = int(np.asarray(counts).sum()) * 2
    assert nbytes < n * 2


def test_overflow_flag():
    cdfs, lengths, offsets = _tables(seed=10)
    sym, idx = _data(512, seed=11, esc_frac=1.0)  # all escapes -> lots of words
    words, counts, overflow = dr.encode_interleaved(
        jnp.asarray(sym), jnp.asarray(idx),
        jnp.asarray(cdfs), jnp.asarray(lengths), jnp.asarray(offsets),
        k=8, cap=8,
    )
    assert bool(overflow)


@pytest.mark.parametrize("esc", [0.0, 0.08])
def test_compaction_formulations_bit_identical(esc):
    """'gather' (bisection + minor-axis gather; the serving default) and
    'scatter' (original sort-lowered formulation) must produce identical
    streams, counts, and overflow flags."""
    cdfs, lengths, offsets = _tables(seed=12)
    sym, idx = _data(1024, seed=13, esc_frac=esc)
    k = 8
    outs = {}
    for mode in ("gather", "scatter"):
        outs[mode] = dr.encode_interleaved(
            jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(cdfs),
            jnp.asarray(lengths), jnp.asarray(offsets),
            k=k, cap=256, compact=mode,
        )
    wg, cg, og = outs["gather"]
    ws, cs, osc = outs["scatter"]
    assert not bool(og) and not bool(osc)
    cg = np.asarray(cg)
    np.testing.assert_array_equal(cg, np.asarray(cs))
    for lane in range(k):
        np.testing.assert_array_equal(
            np.asarray(wg)[lane, : cg[lane]], np.asarray(ws)[lane, : cg[lane]]
        )
    # tight cap: both formulations must raise the overflow flag
    for mode in ("gather", "scatter"):
        _, _, ovf = dr.encode_interleaved(
            jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(cdfs),
            jnp.asarray(lengths), jnp.asarray(offsets),
            k=k, cap=int(cg.max()) - 1, compact=mode,
        )
        assert bool(ovf)
