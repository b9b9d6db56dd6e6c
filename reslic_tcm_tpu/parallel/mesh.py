"""Device mesh construction for data / model parallel training.

The reference's only distribution mechanism is single-node nn.DataParallel
(reference utils/helper.py:106-113, train.py:168-169); here distribution is a
jax.sharding.Mesh: batch over 'data' (gradients all-reduced over ICI), with a
'model' axis reserved for sharding wide latent channels on large configs.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def tensor_parallel_specs(params, mesh: Mesh, min_channels: int = 128):
    """PartitionSpec tree sharding wide conv/dense kernels' output-channel
    axis over the 'model' mesh axis (GSPMD propagates activation shardings
    and inserts the collectives). Leaves that don't divide evenly stay
    replicated. This is the optional TP axis from SURVEY.md section 2.2 for
    wide-M configs; DP alone is parity with the reference."""
    n_model = mesh.shape["model"]

    def spec_for(path, leaf):
        if n_model <= 1 or leaf.ndim < 1:
            return P()
        names = [getattr(k, "key", "") for k in path]
        out_ch = leaf.shape[-1]
        is_kernel = names[-1] == "kernel" and leaf.ndim in (2, 4)
        if is_kernel and out_ch >= min_channels and out_ch % n_model == 0:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, tp: bool = False):
    """Place params on the mesh: replicated, or TP-sharded where eligible."""
    if not tp or mesh.shape.get("model", 1) <= 1:
        return replicate(mesh, params)
    specs = tensor_parallel_specs(params, mesh)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P),
    )
    return jax.device_put(params, shardings)
