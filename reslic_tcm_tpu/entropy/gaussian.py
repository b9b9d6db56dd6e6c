"""Conditional Gaussian entropy model, TPU-native.

Re-implements CompressAI's GaussianConditional (used by every hyperprior
model in the reference, e.g. reference models/reference/tcm.py:417) as pure
JAX functions for the device paths (likelihood, index building, quantization)
plus a host-side scale-indexed CDF-table builder for real coding.

No learnable parameters live here, so this is a plain dataclass + functions
rather than a linen module — the idiomatic JAX shape for stateless math.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.stats

from ..ops.math import (
    SCALES_MIN,
    build_indexes,
    gaussian_likelihood,
    get_scale_table,
)
from .factorized import CodingTables

__all__ = [
    "GaussianConditional",
    "build_indexes",
    "gaussian_likelihood",
    "build_scale_tables",
]


def build_scale_tables(scale_table: np.ndarray, tail_mass: float = 1e-9) -> CodingTables:
    """Per-scale-index quantized CDF tables (CompressAI update() semantics).

    For each sigma in the table: support is ±ceil(sigma * Q(1 - tail/2))
    around 0; pmf is the unit-width Gaussian integral at each integer point;
    the last CDF bin absorbs 2 * tail mass for bypass coding.
    """
    from ..coding.rans import pmf_to_quantized_cdf

    scale_table = np.asarray(scale_table, np.float32)
    multiplier = -scipy.stats.norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int32) - pmf_center[:, None]
    ).astype(np.float32)
    s = scale_table[:, None]
    upper = _std_cum((0.5 - samples) / s)
    lower = _std_cum((-0.5 - samples) / s)
    pmf = upper - lower
    tail = 2 * lower[:, :1]

    n = scale_table.shape[0]
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = np.concatenate([pmf[i, : pmf_length[i]], tail[i]], axis=0)
        q = pmf_to_quantized_cdf(prob, 16)
        cdf[i, : q.shape[0]] = q

    return CodingTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-pmf_center).astype(np.int32),
    )


def _std_cum(x: np.ndarray) -> np.ndarray:
    import scipy.special

    return (0.5 * scipy.special.erfc(-(2 ** -0.5) * np.asarray(x, np.float32))).astype(
        np.float32
    )


@dataclasses.dataclass
class GaussianConditional:
    """Stateless conditional Gaussian codec component.

    Holds the scale table and (after update()) the derived integer CDF
    tables. Device math (likelihood / build_indexes) is delegated to the pure
    functions in ops.math so it stays jit-composable.
    """

    scale_table: np.ndarray | None = None
    scale_bound: float = SCALES_MIN
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9
    tables: CodingTables | None = None

    def update_scale_table(self, scale_table=None) -> "GaussianConditional":
        if scale_table is None:
            scale_table = np.asarray(get_scale_table())
        self.scale_table = np.asarray(scale_table, np.float32)
        self.tables = build_scale_tables(self.scale_table, self.tail_mass)
        return self

    # ------------------------- device-side helpers -------------------------

    def likelihood(self, inputs, scales, means=None):
        return gaussian_likelihood(
            inputs,
            scales,
            means,
            scale_bound=self.scale_bound,
            likelihood_bound=self.likelihood_bound,
        )

    def indexes(self, scales):
        import jax.numpy as jnp

        assert self.scale_table is not None, "call update_scale_table() first"
        return build_indexes(scales, jnp.asarray(self.scale_table))

    # -------------------------- host-side coding ---------------------------

    def _require_tables(self) -> CodingTables:
        if self.tables is None:
            raise ValueError("Uninitialized CDFs. Run update_scale_table() first")
        return self.tables

    def compress(self, values, indexes, means=None) -> list[bytes]:
        """values/indexes/means: [B, ...] arrays; one string per batch item."""
        from ..coding.rans import encode_with_indexes

        t = self._require_tables()
        values = np.asarray(values, np.float32)
        if means is not None:
            values = values - np.asarray(means, np.float32)
        symbols = np.rint(values).astype(np.int32)
        indexes = np.asarray(indexes, np.int32)
        return [
            encode_with_indexes(
                symbols[i].reshape(-1),
                indexes[i].reshape(-1),
                t.quantized_cdf,
                t.cdf_length,
                t.offset,
            )
            for i in range(symbols.shape[0])
        ]

    def decompress(self, strings, indexes, means=None) -> np.ndarray:
        from ..coding.rans import decode_with_indexes

        t = self._require_tables()
        indexes = np.asarray(indexes, np.int32)
        out = np.empty(indexes.shape, np.float32)
        flat_idx = indexes.reshape(indexes.shape[0], -1)
        for i, s in enumerate(strings):
            vals = decode_with_indexes(
                s, flat_idx[i], t.quantized_cdf, t.cdf_length, t.offset
            )
            out[i] = vals.astype(np.float32).reshape(indexes.shape[1:])
        if means is not None:
            out = out + np.asarray(means, np.float32)
        return out
