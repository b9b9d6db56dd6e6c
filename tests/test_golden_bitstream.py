"""Golden bitstream-format tests (SURVEY §7.3.1 / M1 gate).

Two independent guards that the C++ coder's stream format is the canonical
ryg_rans64 + indexed-CDF + 4-bit-bypass format (the one the reference stack
speaks through compressai.ans, reference entropy_models/coder.py:10-56):

1. Cross-implementation equality: `tests/rans64_model.py` is a pure-Python
   from-scratch model of the format; every encode here must be byte-identical
   between the two, and each must decode the other's stream.
2. Recorded fixtures: `tests/golden/rans_fixtures.json` pins exact stream
   bytes (and pmf->CDF tables) committed to the repo. If either
   implementation's output ever drifts, these fail.

Regenerate fixtures (only after an *intentional* format change) with
`python tests/test_golden_bitstream.py --regen`.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import rans64_model as pymodel  # noqa: E402

from reslic_tcm_tpu.coding import rans  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "rans_fixtures.json")


# ---------------------------------------------------------------------------
# deterministic case construction
# ---------------------------------------------------------------------------

def _make_tables(rng, n_rows, max_support):
    """Build valid quantized CDF rows (via the production pmf converter) with
    varying support lengths, plus offsets."""
    rows, lengths, offsets, pmfs = [], [], [], []
    for _ in range(n_rows):
        support = int(rng.integers(3, max_support))
        pmf = rng.gamma(0.7, 1.0, size=support).astype(np.float32)
        pmf /= pmf.sum()
        pmf *= 0.98  # leave tail mass for the escape bin
        pmf = np.concatenate([pmf, np.float32([0.02])])
        cdf = rans.pmf_to_quantized_cdf(pmf, 16)
        rows.append(cdf)
        lengths.append(len(cdf))
        offsets.append(int(rng.integers(-10, 3)))
        pmfs.append(pmf)
    stride = max(lengths)
    table = np.zeros((n_rows, stride), dtype=np.int32)
    for i, rcdf in enumerate(rows):
        table[i, : len(rcdf)] = rcdf
    return table, np.array(lengths, np.int32), np.array(offsets, np.int32), pmfs


def _cases():
    rng = np.random.default_rng(20260817)
    cases = []

    # 1: single row, in-support symbols only (no escapes)
    table, lens, offs, _ = _make_tables(rng, 1, 12)
    max_v = lens[0] - 2
    syms = (rng.integers(0, max_v, size=64) + offs[0]).astype(np.int32)
    cases.append(("in_support", syms, np.zeros(64, np.int32), table, lens, offs))

    # 2: many rows, mixed escapes (negative + overflow)
    table, lens, offs, _ = _make_tables(rng, 8, 20)
    idx = rng.integers(0, 8, size=256).astype(np.int32)
    syms = np.array(
        [int(rng.integers(-6, lens[i])) + offs[i] for i in idx], np.int32
    )
    cases.append(("mixed_escape", syms, idx, table, lens, offs))

    # 3: extreme escapes -> multi-chunk bypass incl. the 8-chunk (32-bit) path
    table, lens, offs, _ = _make_tables(rng, 2, 8)
    idx = np.array([0, 1, 0, 1, 0, 1], np.int32)
    big = [int(lens[i] - 2 + offs[i]) for i in idx]
    syms = np.array(
        [big[0] + 1, big[1] + 300, big[2] + 70000, big[3] + (1 << 28),
         offs[4 % 2] - 40000, big[5] + (1 << 30)],
        np.int32,
    )
    cases.append(("extreme_escape", syms, idx, table, lens, offs))

    # 4: long stream exercising many renormalizations
    table, lens, offs, _ = _make_tables(rng, 4, 48)
    idx = rng.integers(0, 4, size=4096).astype(np.int32)
    syms = np.array(
        [int(rng.integers(0, lens[i] - 2)) + offs[i] for i in idx], np.int32
    )
    cases.append(("long_stream", syms, idx, table, lens, offs))

    return cases


def _pmf_cases():
    rng = np.random.default_rng(7)
    out = [("uniform", np.full(9, 1 / 9, np.float32))]
    for k, shape in [("peaky", 0.2), ("flat", 5.0)]:
        pmf = rng.gamma(shape, 1.0, size=17).astype(np.float32)
        out.append((k, pmf / pmf.sum()))
    out.append(("tiny_bins", np.float32([0.9, 1e-9, 0.05, 0.0, 0.05])))
    return out


# ---------------------------------------------------------------------------
# cross-implementation tests (no fixtures needed)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name_i", range(4))
def test_cpp_stream_matches_python_model(name_i):
    name, syms, idx, table, lens, offs = _cases()[name_i]
    cpp = rans.encode_with_indexes(syms, idx, table, lens, offs)
    py = pymodel.encode(syms.tolist(), idx.tolist(), table.tolist(),
                        lens.tolist(), offs.tolist())
    assert cpp == py, f"stream mismatch in case {name}"

    # cross-decode both directions
    dec_cpp = rans.decode_with_indexes(py, idx, table, lens, offs)
    np.testing.assert_array_equal(dec_cpp, syms)
    dec_py = pymodel.decode(cpp, idx.tolist(), table.tolist(),
                            lens.tolist(), offs.tolist())
    np.testing.assert_array_equal(np.asarray(dec_py, np.int32), syms)


def test_buffered_encoder_matches_one_shot():
    _, syms, idx, table, lens, offs = _cases()[1]
    enc = rans.BufferedRansEncoder()
    for lo in range(0, len(syms), 50):
        enc.encode_with_indexes(syms[lo:lo + 50], idx[lo:lo + 50], table, lens, offs)
    assert enc.flush() == rans.encode_with_indexes(syms, idx, table, lens, offs)


# ---------------------------------------------------------------------------
# recorded-fixture tests
# ---------------------------------------------------------------------------

def _load_golden():
    if not os.path.exists(GOLDEN):
        pytest.fail(f"golden fixture file missing: {GOLDEN}")
    with open(GOLDEN) as f:
        return json.load(f)


def test_golden_streams_exact():
    g = _load_golden()
    by_name = {c[0]: c for c in _cases()}
    assert set(g["streams"]) == set(by_name)
    for name, rec in g["streams"].items():
        _, syms, idx, table, lens, offs = by_name[name]
        got = rans.encode_with_indexes(syms, idx, table, lens, offs).hex()
        assert got == rec["stream_hex"], f"stream format drifted in case {name}"
        np.testing.assert_array_equal(
            rans.decode_with_indexes(bytes.fromhex(rec["stream_hex"]),
                                     idx, table, lens, offs),
            syms,
        )


def test_golden_pmf_to_cdf_exact():
    g = _load_golden()
    by_name = dict(_pmf_cases())
    assert set(g["cdfs"]) == set(by_name)
    for name, rec in g["cdfs"].items():
        got = rans.pmf_to_quantized_cdf(by_name[name], 16)
        np.testing.assert_array_equal(got, np.asarray(rec["cdf"], np.int32)), name


def test_golden_cdf_rows_valid():
    g = _load_golden()
    for name, rec in g["cdfs"].items():
        cdf = np.asarray(rec["cdf"])
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert (np.diff(cdf) >= 1).all(), f"zero-frequency bin in {name}"


# ---------------------------------------------------------------------------
# fixture generation (manual; not run by pytest)
# ---------------------------------------------------------------------------

def _regen():
    streams = {}
    for name, syms, idx, table, lens, offs in _cases():
        cpp = rans.encode_with_indexes(syms, idx, table, lens, offs)
        py = pymodel.encode(syms.tolist(), idx.tolist(), table.tolist(),
                            lens.tolist(), offs.tolist())
        assert cpp == py, f"refusing to record divergent case {name}"
        streams[name] = {"n_symbols": int(len(syms)), "stream_hex": cpp.hex()}
    cdfs = {
        name: {"pmf": [float(x) for x in pmf],
               "cdf": rans.pmf_to_quantized_cdf(pmf, 16).tolist()}
        for name, pmf in _pmf_cases()
    }
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump({"format": "ryg_rans64/p16/bypass4", "streams": streams,
                   "cdfs": cdfs}, f, indent=1)
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        _regen()


@pytest.mark.parametrize("seed", range(12))
def test_cpp_matches_python_model_randomized(seed):
    """Seeded random sweep: tables of varying width/support, symbols spanning
    in-support, negative-escape, and overflow-escape ranges — C++ and the
    independent Python model must agree byte-for-byte on every stream."""
    rng = np.random.default_rng(1000 + seed)
    n_rows = int(rng.integers(1, 12))
    table, lens, offs, _ = _make_tables(rng, n_rows, int(rng.integers(4, 40)))
    n = int(rng.integers(1, 700))
    idx = rng.integers(0, n_rows, size=n).astype(np.int32)
    span = int(rng.integers(1, 60))
    syms = np.array(
        [int(rng.integers(-span, lens[i] + span)) + offs[i] for i in idx],
        np.int32,
    )
    cpp = rans.encode_with_indexes(syms, idx, table, lens, offs)
    py = pymodel.encode(syms.tolist(), idx.tolist(), table.tolist(),
                        lens.tolist(), offs.tolist())
    assert cpp == py
    np.testing.assert_array_equal(
        np.asarray(pymodel.decode(cpp, idx.tolist(), table.tolist(),
                                  lens.tolist(), offs.tolist()), np.int32),
        syms,
    )
