import numpy as np
import pytest

from reslic_tcm_tpu.coding import rans


def _toy_tables(n_indexes=4, support=16, seed=0):
    """Random pmfs -> quantized cdf tables in the coder's layout."""
    rng = np.random.default_rng(seed)
    max_len = support + 2
    cdfs = np.zeros((n_indexes, max_len), np.int32)
    lengths = np.zeros(n_indexes, np.int32)
    offsets = np.zeros(n_indexes, np.int32)
    for i in range(n_indexes):
        pmf = rng.uniform(0.01, 1.0, size=support).astype(np.float32)
        pmf /= pmf.sum() * 1.0001  # leave tail mass
        tail = 1.0 - pmf.sum()
        q = rans.pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]), 16)
        cdfs[i, : q.shape[0]] = q
        lengths[i] = q.shape[0]
        offsets[i] = -(support // 2)
    return cdfs, lengths, offsets


def test_pmf_to_quantized_cdf_properties():
    pmf = np.array([0.1, 0.2, 0.3, 0.4, 1e-9], np.float32)
    cdf = rans.pmf_to_quantized_cdf(pmf, 16)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    diffs = np.diff(cdf)
    assert (diffs > 0).all()  # no zero-frequency bins after mass stealing
    # frequencies roughly proportional to pmf
    assert abs(diffs[3] / diffs[0] - 4.0) < 0.2


def test_pmf_to_quantized_cdf_steals_mass_for_zero_bins():
    pmf = np.array([0.5, 0.0, 0.5, 0.0], np.float32)
    cdf = rans.pmf_to_quantized_cdf(pmf, 16)
    diffs = np.diff(cdf)
    assert (diffs > 0).all()
    assert cdf[-1] == 1 << 16


def test_roundtrip_in_support():
    cdfs, lengths, offsets = _toy_tables()
    rng = np.random.default_rng(1)
    n = 5000
    indexes = rng.integers(0, 4, size=n).astype(np.int32)
    max_vals = lengths[indexes] - 2
    symbols = (
        rng.integers(0, 14, size=n).astype(np.int32) % max_vals + offsets[indexes]
    )
    s = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    out = rans.decode_with_indexes(s, indexes, cdfs, lengths, offsets)
    assert np.array_equal(out, symbols)


def test_roundtrip_bypass_out_of_range():
    """Symbols far outside the table support exercise the escape path."""
    cdfs, lengths, offsets = _toy_tables()
    indexes = np.array([0, 1, 2, 3, 0, 1], np.int32)
    symbols = np.array([-500, 100000, -8, 7, 9999, -12345], np.int32)
    s = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    out = rans.decode_with_indexes(s, indexes, cdfs, lengths, offsets)
    assert np.array_equal(out, symbols)


def test_roundtrip_empty():
    cdfs, lengths, offsets = _toy_tables()
    s = rans.encode_with_indexes(
        np.array([], np.int32), np.array([], np.int32), cdfs, lengths, offsets
    )
    out = rans.decode_with_indexes(
        s, np.array([], np.int32), cdfs, lengths, offsets
    )
    assert out.shape == (0,)


def test_buffered_encoder_matches_oneshot():
    """Per-slice pushes must produce the identical stream to one big encode
    (the channel-AR models rely on this: reference tcm.py:527-565)."""
    cdfs, lengths, offsets = _toy_tables(seed=3)
    rng = np.random.default_rng(4)
    chunks = []
    for _ in range(5):
        n = int(rng.integers(10, 200))
        idx = rng.integers(0, 4, size=n).astype(np.int32)
        sym = rng.integers(-10, 25, size=n).astype(np.int32)
        chunks.append((sym, idx))

    enc = rans.BufferedRansEncoder()
    for sym, idx in chunks:
        enc.encode_with_indexes(sym, idx, cdfs, lengths, offsets)
    buffered = enc.flush()

    all_sym = np.concatenate([c[0] for c in chunks])
    all_idx = np.concatenate([c[1] for c in chunks])
    oneshot = rans.encode_with_indexes(all_sym, all_idx, cdfs, lengths, offsets)
    assert buffered == oneshot


def test_streaming_decoder_slice_by_slice():
    cdfs, lengths, offsets = _toy_tables(seed=5)
    rng = np.random.default_rng(6)
    chunks = []
    for _ in range(5):
        n = int(rng.integers(10, 200))
        idx = rng.integers(0, 4, size=n).astype(np.int32)
        sym = rng.integers(-300, 300, size=n).astype(np.int32)
        chunks.append((sym, idx))
    all_sym = np.concatenate([c[0] for c in chunks])
    all_idx = np.concatenate([c[1] for c in chunks])
    stream = rans.encode_with_indexes(all_sym, all_idx, cdfs, lengths, offsets)

    dec = rans.RansDecoder()
    dec.set_stream(stream)
    for sym, idx in chunks:
        got = dec.decode_stream(idx, cdfs, lengths, offsets)
        assert np.array_equal(got, sym)


def test_compression_is_near_entropy():
    """Skewed distribution should compress close to its entropy."""
    pmf = np.array([0.9, 0.05, 0.03, 0.02], np.float64)
    q = rans.pmf_to_quantized_cdf(
        np.concatenate([pmf, [1e-9]]).astype(np.float32), 16
    )
    cdfs = q[None, :].astype(np.int32)
    lengths = np.array([q.shape[0]], np.int32)
    offsets = np.array([0], np.int32)
    rng = np.random.default_rng(7)
    n = 100000
    symbols = rng.choice(4, size=n, p=pmf).astype(np.int32)
    indexes = np.zeros(n, np.int32)
    s = rans.encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    entropy_bits = -(pmf * np.log2(pmf)).sum() * n
    actual_bits = len(s) * 8
    assert actual_bits < entropy_bits * 1.02 + 64


def test_malformed_streams_never_crash_or_hang():
    """Truncated/corrupted/garbage streams must decode to SOMETHING (values
    may be nonsense) without heap over-reads or infinite loops — the
    bounds-checked renorm contract (coding/csrc/rans.cpp:68-78)."""
    rng = np.random.default_rng(11)
    pmf = rng.gamma(1.0, 1.0, 16).astype(np.float32)
    pmf /= pmf.sum()
    cdf = rans.pmf_to_quantized_cdf(pmf, 16)
    table = cdf[None, :]
    lens = np.array([len(cdf)], np.int32)
    offs = np.array([-7], np.int32)
    idx = np.zeros(128, np.int32)
    syms = (rng.integers(0, 13, 128) - 7).astype(np.int32)
    good = rans.encode_with_indexes(syms, idx, table, lens, offs)

    cases = [b"", b"\x00" * 4, good[: len(good) // 2], good[:8],
             bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
             good + b"\xff" * 8]
    flip = bytearray(good)
    for i in range(0, len(flip), 7):
        flip[i] ^= 0xA5
    cases.append(bytes(flip))
    for s in cases:
        out = rans.decode_with_indexes(s, idx, table, lens, offs)
        assert out.shape == (128,)

    # decoding MORE symbols than encoded must also terminate
    big_idx = np.zeros(4096, np.int32)
    out = rans.decode_with_indexes(good, big_idx, table, lens, offs)
    assert out.shape == (4096,)


def test_mismatched_lengths_rejected():
    table = rans.pmf_to_quantized_cdf(np.float32([0.5, 0.3, 0.2]), 16)[None]
    lens = np.array([4], np.int32)
    offs = np.array([0], np.int32)
    with pytest.raises(ValueError):
        rans.encode_with_indexes(np.zeros(4, np.int32), np.zeros(3, np.int32),
                                 table, lens, offs)
    enc = rans.BufferedRansEncoder()
    with pytest.raises(ValueError):
        enc.encode_with_indexes(np.zeros(2, np.int32), np.zeros(5, np.int32),
                                table, lens, offs)


def test_pmf_rejects_negative_and_nan():
    for bad in ([0.5, -0.1, 0.6], [0.5, float("nan"), 0.5]):
        with pytest.raises(ValueError):
            rans.pmf_to_quantized_cdf(np.float32(bad), 16)
