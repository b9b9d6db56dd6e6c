"""Index-level golden harness for the Gaussian coding tables (SURVEY §7.3.1).

Bitstream parity between two coder stacks requires more than stream-format
equality: the (sigma -> scale-index) mapping and the per-index quantized CDF
tables must match bit-for-bit, because a one-ULP sigma difference can flip a
scale index and desynchronize the decode (reference tcm.py:33-34 scale table;
CompressAI GaussianConditional.build_indexes / update()).

These tests pin, as committed fixtures in tests/golden/gaussian_tables.json:
  1. the default 64-entry log-spaced scale table, exact fp32 bit patterns;
  2. build_indexes outputs on a sigma grid that straddles every table entry
     by one fp32 ULP (the exact boundary, one below, one above);
  3. the full per-index quantized CDF table set (sha256 over the int32 bytes,
     plus three full rows for debuggability).

Regenerate only after an intentional change:
`python tests/test_golden_indexes.py --regen`.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np
import pytest

from reslic_tcm_tpu.entropy.gaussian import build_scale_tables
from reslic_tcm_tpu.ops.math import build_indexes, get_scale_table

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "gaussian_tables.json")


def _scale_table() -> np.ndarray:
    return np.asarray(get_scale_table(), np.float32)


def _sigma_grid(table: np.ndarray) -> np.ndarray:
    """Every table entry ± one fp32 ULP, plus the entry itself, plus
    off-table extremes."""
    below = np.nextafter(table, np.float32(0.0), dtype=np.float32)
    above = np.nextafter(table, np.float32(np.inf), dtype=np.float32)
    extremes = np.float32([0.0, 1e-6, 0.05, 300.0, 1e6])
    return np.concatenate([below, table, above, extremes]).astype(np.float32)


def _tables_digest(tables) -> dict:
    return {
        "cdf_sha256": hashlib.sha256(
            np.ascontiguousarray(tables.quantized_cdf, np.int32).tobytes()
        ).hexdigest(),
        "cdf_shape": list(tables.quantized_cdf.shape),
        "cdf_length": tables.cdf_length.tolist(),
        "offset": tables.offset.tolist(),
        "sample_rows": {
            str(i): tables.quantized_cdf[i, : tables.cdf_length[i]].tolist()
            for i in (0, 31, 63)
        },
    }


def _load():
    if not os.path.exists(GOLDEN):
        pytest.fail(f"golden fixture file missing: {GOLDEN}")
    with open(GOLDEN) as f:
        return json.load(f)


def test_scale_table_bit_exact():
    g = _load()
    got = _scale_table().view(np.uint32)
    np.testing.assert_array_equal(got, np.asarray(g["scale_table_u32"], np.uint32))


def test_build_indexes_boundary_exact():
    g = _load()
    table = _scale_table()
    grid = _sigma_grid(table)
    idx = np.asarray(build_indexes(grid, table))
    np.testing.assert_array_equal(idx, np.asarray(g["grid_indexes"], np.int32))
    # Semantics spot-checks independent of the fixture:
    n = table.shape[0]
    # sigma exactly at a table entry maps to that entry's own index
    np.testing.assert_array_equal(idx[n : 2 * n], np.arange(n))
    # one ULP above entry i maps to i+1 (except the last, which saturates)
    np.testing.assert_array_equal(idx[2 * n : 3 * n - 1], np.arange(1, n))
    assert idx[3 * n - 1] == n - 1
    # one ULP below entry i maps to i (entry 0 is clamped up by scale_bound)
    np.testing.assert_array_equal(idx[1 : n], np.arange(1, n))
    assert idx[0] == 0


def test_gaussian_cdf_tables_exact():
    g = _load()
    got = _tables_digest(build_scale_tables(_scale_table()))
    ref = g["tables"]
    assert got["cdf_shape"] == ref["cdf_shape"]
    assert got["cdf_length"] == ref["cdf_length"]
    assert got["offset"] == ref["offset"]
    for k, row in ref["sample_rows"].items():
        assert got["sample_rows"][k] == row, f"CDF row {k} drifted"
    assert got["cdf_sha256"] == ref["cdf_sha256"]


def _regen():
    table = _scale_table()
    fix = {
        "scale_table_u32": table.view(np.uint32).tolist(),
        "grid_indexes": np.asarray(build_indexes(_sigma_grid(table), table)).tolist(),
        "tables": _tables_digest(build_scale_tables(table)),
    }
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(fix, f, indent=1)
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        _regen()
