"""Main/aux optimizer split (reference utils/optimizer.py:5-42).

Main Adam trains everything except EntropyBottleneck quantiles; the aux Adam
trains only the quantiles (driven by aux_loss, which is data-independent).
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def _is_quantiles_path(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def quantiles_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_quantiles_path(path), params
    )


def main_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_quantiles_path(path), params
    )


def configure_optimizers(params, learning_rate: float = 1e-4,
                         aux_learning_rate: float = 1e-3,
                         clip_max_norm: float = 1.0):
    """Returns (main_tx, aux_tx) optax transforms, each masked to its
    parameter subset. Gradient clipping (global norm, reference
    training/step.py:90-92) is part of the main chain."""
    chain = []
    if clip_max_norm and clip_max_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_max_norm))
    chain.append(optax.adam(learning_rate))
    main_tx = optax.masked(optax.chain(*chain), main_mask)
    aux_tx = optax.masked(optax.adam(aux_learning_rate), quantiles_mask)
    return main_tx, aux_tx
