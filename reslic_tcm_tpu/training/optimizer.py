"""Main/aux optimizer split (reference utils/optimizer.py:5-42).

Main Adam trains everything except EntropyBottleneck quantiles; the aux Adam
trains only the quantiles (driven by aux_loss, which is data-independent).
Implemented with optax.multi_transform + set_to_zero so the complementary
partition receives exactly zero updates (optax.masked would pass raw
gradients through). Learning rates are injected hyperparams so the host-side
ReduceLROnPlateau can change them without recompilation.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def _is_quantiles_path(path) -> bool:
    return any(getattr(k, "key", None) == "quantiles" for k in path)


def param_labels(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "aux" if _is_quantiles_path(path) else "main", params
    )


def freeze_all_but_stanh_labels(params, g_s_tune: bool = False):
    """Label tree for the reference's unlock_only_stanh fine-tuning mode
    (reference balle18_stanh.py:65-86): only stanh w/b (and optionally the
    synthesis transform) stay trainable."""

    def lab(path, _):
        names = [getattr(k, "key", "") for k in path]
        if _is_quantiles_path(path):
            return "aux"
        if "stanh" in names:
            return "main"
        if g_s_tune and names and names[0].startswith("g_s"):
            return "main"
        return "frozen"

    return jax.tree_util.tree_map_with_path(lab, params)


def configure_optimizers(params, learning_rate: float = 1e-4,
                         aux_learning_rate: float = 1e-3,
                         clip_max_norm: float = 1.0,
                         labels=None):
    """Returns (main_tx, aux_tx): each updates only its parameter subset and
    zeroes the rest. Gradient clipping (global norm over the main subset,
    reference training/step.py:90-92) is part of the main chain. Pass a
    custom `labels` tree (values in {main, aux, frozen}) for fine-tuning
    modes like --freeze."""
    if labels is None:
        labels = param_labels(params)

    def main_chain(lr):
        parts = []
        if clip_max_norm and clip_max_norm > 0:
            parts.append(optax.clip_by_global_norm(clip_max_norm))
        parts.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr))
        return optax.chain(*parts)

    main_tx = optax.multi_transform(
        {"main": main_chain(learning_rate), "aux": optax.set_to_zero(),
         "frozen": optax.set_to_zero()},
        param_labels=lambda _: labels,
    )
    aux_tx = optax.multi_transform(
        {
            "aux": optax.inject_hyperparams(optax.adam)(
                learning_rate=aux_learning_rate
            ),
            "main": optax.set_to_zero(),
            "frozen": optax.set_to_zero(),
        },
        param_labels=lambda _: labels,
    )
    return main_tx, aux_tx


def set_learning_rate(opt_state, lr: float):
    """Immutably rewrite every injected learning_rate in an optax state."""
    import jax.numpy as jnp

    def rewrite(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or (
            hasattr(node, "hyperparams") and hasattr(node, "inner_state")
        ):
            hp = dict(node.hyperparams)
            if "learning_rate" in hp:
                hp["learning_rate"] = jnp.asarray(
                    lr, jnp.asarray(hp["learning_rate"]).dtype
                )
            return node._replace(hyperparams=hp, inner_state=rewrite(node.inner_state))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return node._replace(
                **{f: rewrite(getattr(node, f)) for f in node._fields}
            )
        if isinstance(node, tuple):
            return tuple(rewrite(v) for v in node)
        if isinstance(node, list):
            return [rewrite(v) for v in node]
        if isinstance(node, dict):
            return {k: rewrite(v) for k, v in node.items()}
        return node

    return rewrite(opt_state)


def current_learning_rate(opt_state) -> float | None:
    """Read back the first injected learning_rate found (for logging)."""
    found = []

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in getattr(
            node, "hyperparams", {}
        ):
            found.append(float(jax.numpy.asarray(node.hyperparams["learning_rate"])))
        if isinstance(node, tuple):
            for v in node:
                visit(v)
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)

    visit(opt_state)
    return found[0] if found else None
