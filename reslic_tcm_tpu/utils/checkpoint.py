"""Checkpoint save/load (orbax) + host-side LR scheduling.

The reference checkpoints a dict {epoch, state_dict, args, loss, optimizer,
aux_optimizer, lr_scheduler} (reference train.py:307-322). Here the
checkpoint carries {params, opt_state, aux_opt_state, epoch, best_loss,
scheduler state}; derived CDF tables are NOT checkpointed — update()
rebuilds them (they're functions of the params).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, extra: dict | None = None):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"state": jax.tree_util.tree_map(np.asarray, state)}
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)


def restore_tree(template: Any, data: Any):
    """Rebuild `template`'s pytree (incl. optax NamedTuple states) from an
    orbax-restored nested dict/list structure; leaf dtypes follow the
    template."""
    import jax.numpy as jnp

    if template is None:
        return None
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        return type(template)(
            *(restore_tree(getattr(template, f), data[f]) for f in template._fields)
        )
    if isinstance(template, dict):
        return {k: restore_tree(v, data[k]) for k, v in template.items()}
    if isinstance(template, (tuple, list)):
        return type(template)(
            restore_tree(v, data[i]) for i, v in enumerate(template)
        )
    return jnp.asarray(data, getattr(template, "dtype", None))


def load_checkpoint(path: str, template: Any = None):
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        restore_args = ocp.args.PyTreeRestore(
            item={"state": template, "extra": None}
        )
        return ckptr.restore(path)
    return ckptr.restore(path)


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics
    (mode='min', factor, patience; reference train.py:176)."""

    def __init__(self, init_lr: float, mode: str = "min", factor: float = 0.5,
                 patience: int = 4, threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = float(init_lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = None
        self.num_bad_epochs = 0

    def _is_better(self, a: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return a < self.best * (1 - self.threshold)
        return a > self.best * (1 + self.threshold)

    def step(self, metric: float) -> float:
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return dict(self.__dict__)

    def load_state_dict(self, d: dict):
        self.__dict__.update(d)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate inside a (possibly masked/chained)
    optax state built with inject_hyperparams."""
    import jax.numpy as jnp

    def visit(node):
        if hasattr(node, "hyperparams") and "learning_rate" in node.hyperparams:
            node.hyperparams["learning_rate"] = jnp.asarray(
                lr, node.hyperparams["learning_rate"].dtype
            )
            return True
        found = False
        if hasattr(node, "inner_state"):
            found |= visit(node.inner_state)
        if hasattr(node, "_asdict"):
            for v in node._asdict().values():
                if hasattr(v, "hyperparams") or hasattr(v, "_asdict") or isinstance(v, tuple):
                    found |= visit(v)
        elif isinstance(node, (tuple, list)):
            for v in node:
                found |= visit(v)
        return found

    visit(opt_state)
    return opt_state
