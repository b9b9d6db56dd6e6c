"""Jit-compiled train/eval steps with data-parallel sharding.

Replaces the reference's per-batch Python loop body (reference
training/step.py:30-114: forward, RD backward, grad clip, main step, aux
step) with ONE fused XLA program. Data parallelism is mesh-based: the batch
is sharded over the 'data' axis, parameters are replicated, and XLA inserts
the gradient all-reduce over ICI (no DataParallel scatter/gather).

This is the ONLY train-step implementation — the train CLI consumes it via
`shard_train_step`. Multi-rate STanH models thread the rate level `lv` and
annealing temperature `beta` through the same step as TRACED scalars (the
stacked [n_rates, L] quantizer params are indexed with jnp.take), so one
compilation covers every rate level — including the WACNN-STanH refinement
modes (stacked refine convs / nn.switch over g_s clones).
"""

from __future__ import annotations

import inspect
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .loss import rate_distortion_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    aux_opt_state: Any
    step: jnp.ndarray


def create_train_state(params, main_tx, aux_tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=main_tx.init(params),
        aux_opt_state=aux_tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def module_accepts(module, name: str) -> bool:
    return name in inspect.signature(type(module).__call__).parameters


def make_train_step(module, main_tx, aux_tx, loss_type: str = "mse",
                    matmul_precision: str | None = None):
    """Returns train_step(state, batch, lmbda, rng, lv=None, beta=None)
    -> (state, metrics).

    lmbda (and lv/beta for multi-rate models) are traced scalars so the
    per-batch random rate-level draw (reference train.py:37,214) does not
    trigger recompilation. matmul_precision="bfloat16" runs all convs /
    matmuls single-pass on the MXU (~4x on v5e; params, grads, and
    optimizer state stay fp32 — the standard mixed-precision recipe).
    """
    accepts_lv = module_accepts(module, "lv")
    accepts_beta = module_accepts(module, "beta")

    def train_step(state: TrainState, batch, lmbda, rng, lv=None, beta=None):
        if matmul_precision is not None:
            with jax.default_matmul_precision(matmul_precision):
                return _train_step_body(state, batch, lmbda, rng, lv, beta)
        return _train_step_body(state, batch, lmbda, rng, lv, beta)

    def _forward_kwargs(lv, beta):
        kwargs = {}
        if accepts_lv and lv is not None:
            kwargs["lv"] = lv
        if accepts_beta and beta is not None:
            kwargs["beta"] = beta
        return kwargs

    def _train_step_body(state: TrainState, batch, lmbda, rng, lv, beta):
        kwargs = _forward_kwargs(lv, beta)

        def loss_fn(params):
            out = module.apply(
                {"params": params}, batch, training=True,
                rngs={"noise": rng}, **kwargs
            )
            losses = rate_distortion_loss(out, batch, lmbda, loss_type)
            gap = out.get("gap_gaussian", jnp.zeros(()))
            return losses["loss"], (losses, gap)

        grads, (losses, gap) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = main_tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # aux loss only involves the entropy-bottleneck chain + quantiles
        def aux_fn(p):
            return module.apply({"params": p}, method=lambda m: m.aux_loss())

        aux_grads = jax.grad(aux_fn)(params)
        aux_updates, aux_opt_state = aux_tx.update(
            aux_grads, state.aux_opt_state, params
        )
        params = optax.apply_updates(params, aux_updates)

        metrics = {k: v for k, v in losses.items()}
        metrics["gap"] = gap
        metrics["aux_loss"] = aux_fn(params)
        new_state = TrainState(params, opt_state, aux_opt_state, state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(module, loss_type: str = "mse"):
    accepts_lv = module_accepts(module, "lv")

    def eval_step(params, batch, lmbda, lv=None):
        kwargs = {}
        if accepts_lv and lv is not None:
            kwargs["lv"] = lv
        out = module.apply({"params": params}, batch, training=False, **kwargs)
        losses = rate_distortion_loss(out, batch, lmbda, loss_type)
        mse = jnp.mean((jnp.clip(out["x_hat"], 0, 1) - batch) ** 2)
        losses["psnr"] = -10.0 * jnp.log10(mse)
        return losses

    return eval_step


def shard_train_step(train_step, mesh):
    """jit the step with batch sharded over the 'data' mesh axis and the
    state replicated; XLA lowers the gradient reduction to ICI collectives.
    The returned callable has the full (state, batch, lmbda, rng, lv, beta)
    signature; lv/beta default to None (absent from the trace)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("data", None, None, None))
    jitted = jax.jit(
        train_step,
        in_shardings=(None, batch_sharding, None, None, None, None),
        out_shardings=(None, None),
        donate_argnums=(0,),
    )

    def step(state, batch, lmbda, rng, lv=None, beta=None):
        return jitted(state, batch, lmbda, rng, lv, beta)

    return step
