"""Golden fixtures for the STanH coding tables.

Same rationale as tests/test_golden_indexes.py: the stanh variants'
bitstreams depend bit-for-bit on the per-scale-index / per-channel quantized
CDF tables built from (w, b) staircase parameters (reference
adaptive_gaussian_conditional.py:397-455, adaptive_entropy_bottleneck.py:
481-514). These fixtures pin the table construction for fixed inputs so
numeric drift (erfc path, chain evaluation, pmf quantization) is caught.

Regenerate after an intentional change:
`python tests/test_golden_stanh.py --regen`.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np
import pytest

from reslic_tcm_tpu.entropy.stanh_models import (
    build_stanh_factorized_tables,
    build_stanh_scale_tables,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "stanh_tables.json")


def _wb(n_levels=11, seed=5):
    rng = np.random.default_rng(seed)
    w = np.abs(rng.normal(1.0, 0.2, n_levels)).astype(np.float32)
    b = np.sort(rng.normal(0.0, 2.0, n_levels)).astype(np.float32)
    return w, b


def _scale_tables():
    w, b = _wb()
    scale_table = np.exp(
        np.linspace(np.log(0.11), np.log(64.0), 16)
    ).astype(np.float32)
    return build_stanh_scale_tables(w, b, symmetric=False,
                                    scale_table=scale_table)


def _fact_tables():
    rng = np.random.default_rng(9)
    C, f = 6, (3, 3, 3, 3)
    dims = [1] + list(f) + [1]
    chain = {}
    for i in range(len(dims) - 1):
        chain[f"matrix{i}"] = rng.normal(-1.0, 0.3, (C, dims[i + 1], dims[i])).astype(np.float32)
        chain[f"bias{i}"] = rng.normal(0.0, 0.5, (C, dims[i + 1], 1)).astype(np.float32)
        if i < len(dims) - 2:
            chain[f"factor{i}"] = rng.normal(0.0, 0.1, (C, dims[i + 1], 1)).astype(np.float32)
    w, b = _wb(seed=6)
    return build_stanh_factorized_tables(chain, w, b, symmetric=False, filters=f)


def _digest(t):
    return {
        "cdf_sha256": hashlib.sha256(
            np.ascontiguousarray(t.quantized_cdf, np.int32).tobytes()
        ).hexdigest(),
        "cdf_shape": list(t.quantized_cdf.shape),
        "cdf_length": t.cdf_length.tolist(),
        "offset": t.offset.tolist(),
        "row0": t.quantized_cdf[0, : t.cdf_length[0]].tolist(),
        "row_last": t.quantized_cdf[-1, : t.cdf_length[-1]].tolist(),
    }


def _load():
    if not os.path.exists(GOLDEN):
        pytest.fail(f"golden fixture file missing: {GOLDEN}")
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("name,builder", [
    ("gaussian_stanh", _scale_tables), ("factorized_stanh", _fact_tables),
])
def test_stanh_tables_exact(name, builder):
    got = _digest(builder())
    ref = _load()[name]
    assert got["cdf_shape"] == ref["cdf_shape"]
    assert got["row0"] == ref["row0"], f"{name} CDF row 0 drifted"
    assert got["row_last"] == ref["row_last"], f"{name} last CDF row drifted"
    assert got == ref


def test_stanh_tables_valid():
    for t in (_scale_tables(), _fact_tables()):
        for i in range(t.quantized_cdf.shape[0]):
            row = t.quantized_cdf[i, : t.cdf_length[i]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert (np.diff(row) >= 1).all()


def _regen():
    fix = {"gaussian_stanh": _digest(_scale_tables()),
           "factorized_stanh": _digest(_fact_tables())}
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(fix, f, indent=1)
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        _regen()
