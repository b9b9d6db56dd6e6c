"""Multi-process (multi-host) distributed initialization and data feeding.

The reference scales only by single-node nn.DataParallel (reference
utils/helper.py:106-113); BASELINE config 5's "data-parallel trained on
v5e-16" needs multi-host SPMD: every process calls
`initialize_distributed(...)`, after which `jax.devices()` is the GLOBAL
device list, `parallel.mesh.make_mesh()` spans all hosts, and the jitted
train step is a single SPMD program whose gradient all-reduce rides ICI
within a slice and DCN across slices — XLA inserts the collectives from the
mesh shardings; there is no NCCL/MPI-style code here.

Per-process data feeding goes through `distribute_batch`: each process loads
only its own batch rows and `jax.make_array_from_process_local_data`
assembles the global sharded array without any cross-host copy.

Tested with 2 CPU processes (gloo collectives) in tests/test_multihost.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: str,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Bring up the JAX distributed runtime (call once, before any device
    computation; safe on all platforms).

    coordinator: "host:port" of process 0. On TPU pods num_processes /
    process_id are inferred from the environment; on CPU/GPU they must be
    given. CPU backends get gloo cross-process collectives.
    """
    # NB: must not touch the backend (jax.devices/default_backend) before
    # initialize(). Reading the config is safe; gloo is harmless on TPU
    # (TPU cross-process collectives ride the TPU runtime, not the CPU
    # collective impl).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def distribute_batch(mesh: Mesh, batch) -> jax.Array:
    """Place a PROCESS-LOCAL batch onto the global mesh, sharded over 'data'.

    Single-process: plain device_put (identical to mesh.shard_batch).
    Multi-process: the local rows become this process's shards of a global
    array whose batch dim is the sum over processes — each process must pass
    the same local batch size.
    """
    batch = np.asarray(batch)
    spec = P("data", *([None] * (batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    global_shape = (batch.shape[0] * jax.process_count(),) + batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)


def local_batch_size(global_batch: int) -> int:
    """Rows THIS process must feed to distribute_batch for a given global
    batch size."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n


def replicated_to_host(x) -> np.ndarray:
    """Fetch a replicated (P()) jit output on any process."""
    return np.asarray(jax.device_get(x.addressable_data(0)))
