"""Device placement helpers.

Model initialization runs on CPU (eager init on the tunneled TPU costs
minutes; CPU init takes seconds) and parameters are then transferred to the
default backend in one host->device copy.
"""

from __future__ import annotations

import jax


def fast_init(module, rngs, *args, **kwargs):
    """Structure-only init: jax.eval_shape for the param tree (no compute),
    leaves filled host-side with numpy by name pattern.

    Orders of magnitude faster than running the init forward (eager per-op
    CPU compiles cost ~15 min for TCM-Large). Initialization statistics are
    approximately — not bit — equal to the flax initializers; use
    init_on_cpu for training runs where init details matter, fast_init for
    benchmarks and codec-path work where weights get replaced anyway.
    """
    import math

    import numpy as np

    shapes = jax.eval_shape(lambda r, a: module.init(r, *a, **kwargs), rngs, args)
    rng = np.random.default_rng(0)

    def init_leaf(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        name = names[-1]
        shape, dtype = leaf.shape, leaf.dtype
        if name == "kernel":  # torch kaiming_uniform(a=sqrt(5)) default
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            b = 1 / math.sqrt(max(fan_in, 1))
            return rng.uniform(-b, b, shape)
        if name == "bias":
            return np.zeros(shape)
        if name.startswith("bias"):  # EB chain bias{i} ~ U(-.5, .5)
            return rng.uniform(-0.5, 0.5, shape)
        if name.startswith("matrix"):  # EB chain constant (see factorized.py)
            scale = 10.0 ** (1 / 5)
            return np.full(shape, math.log(math.expm1(1 / scale / shape[1])))
        if name.startswith("factor"):
            return np.zeros(shape)
        if name == "quantiles":
            q = np.tile(np.array([[-10.0, 0.0, 10.0]]), (shape[0], 1))
            return q.reshape(shape)
        if name == "scale":  # LayerNorm
            return np.ones(shape)
        if name == "beta":  # GDN reparam
            return np.full(shape, (1.0 + (2.0**-18) ** 2) ** 0.5)
        if name == "gamma":  # GDN reparam
            return np.sqrt(0.1 * np.eye(shape[0]) + (2.0**-18) ** 2)
        if "relative_position" in name:
            return rng.normal(0, 0.02, shape)
        if name in ("w", "b"):  # stanh params: unit staircase approximation
            from ..entropy.stanh import init_w_b

            # shape [n_rates, L]; recover an extrema giving L steps (nonsym)
            L = shape[-1]
            w0, b0 = init_w_b(0, max((L + 1) // 2, 1), False)
            if len(w0) != L:  # fallback: evenly spaced
                w0 = np.ones(L, np.float32)
                b0 = np.arange(L, dtype=np.float32) - L / 2 + 0.5
            base = w0 if name == "w" else b0
            return np.tile(base[None], (shape[0], 1)).reshape(shape)
        if name in ("Gain", "InverseGain", "HyperGain", "InverseHyperGain"):
            return np.ones(shape)
        return rng.normal(0, 0.02, shape)

    import jax.tree_util as jtu

    leaves = jtu.tree_map_with_path(
        lambda p, l: jax.numpy.asarray(init_leaf(p, l), l.dtype), shapes
    )
    return leaves


def init_on_cpu(module, rngs, *args, **kwargs):
    """module.init on the CPU backend; result moved to the default device.

    Inputs (and rngs) are placed on CPU first — eager ops follow operand
    placement, so a TPU-resident example input would drag the whole eager
    init onto the accelerator."""
    cpu = jax.devices("cpu")[0]
    args = jax.device_put(args, cpu)
    rngs = jax.device_put(rngs, cpu)
    with jax.default_device(cpu):
        # eager on purpose: jitting init would compile the full forward graph
        # (minutes for the big models); eager CPU init is seconds
        variables = module.init(rngs, *args, **kwargs)
    default = jax.devices()[0]
    if default.platform != "cpu":
        variables = jax.device_put(variables, default)
    return variables
