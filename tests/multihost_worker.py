"""Worker for tests/test_multihost.py: one (of N) processes of a
data-parallel train step over a global 4-device CPU mesh.

Usage: python multihost_worker.py PORT NUM_PROCESSES PROCESS_ID
Prints "MHLOSS <loss> <aux>" after one deterministic step.
"""

import sys


def main(port: int, nproc: int, pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # 4 global devices regardless of process count
    jax.config.update("jax_num_cpu_devices", 4 // nproc)
    if nproc > 1:
        from reslic_tcm_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(f"localhost:{port}", nproc, pid)

    import jax.numpy as jnp
    import numpy as np

    from reslic_tcm_tpu.parallel.mesh import make_mesh
    from reslic_tcm_tpu.parallel.multihost import distribute_batch, local_batch_size
    from reslic_tcm_tpu.training.optimizer import configure_optimizers
    from reslic_tcm_tpu.training.step import (
        create_train_state,
        make_train_step,
        shard_train_step,
    )

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_training import TinyFactorized

    module = TinyFactorized()
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x0
    )
    main_tx, aux_tx = configure_optimizers(variables["params"])
    # host-resident state: identical on every process, committed by the jit
    state = jax.tree_util.tree_map(
        np.asarray, create_train_state(variables["params"], main_tx, aux_tx)
    )
    step = make_train_step(module, main_tx, aux_tx)

    mesh = make_mesh(n_model=1)
    assert mesh.devices.size == 4, mesh.devices

    # deterministic GLOBAL batch; this process feeds only its rows
    rng = np.random.default_rng(7)
    global_batch = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
    lo = pid * local_batch_size(4)
    local = global_batch[lo : lo + local_batch_size(4)]

    with mesh:
        sharded = shard_train_step(step, mesh)
        batch = distribute_batch(mesh, local)
        state, metrics = sharded(
            state, batch, jnp.float32(0.0067), jax.random.PRNGKey(3)
        )
        loss = float(metrics["loss"])
        aux = float(metrics["aux_loss"])

    # the train CLI's validation path: a process-LOCAL param copy through a
    # shardings-free jit (global-mesh params would mix device sets)
    from reslic_tcm_tpu.training.step import make_eval_step

    if jax.process_count() > 1:
        eval_p = jax.tree_util.tree_map(
            lambda a: np.asarray(a.addressable_data(0)), state.params
        )
    else:
        eval_p = state.params
    ev = jax.jit(make_eval_step(module))
    out = ev(eval_p, jnp.asarray(global_batch), jnp.float32(0.0067))
    print(f"MHLOSS {loss:.8f} {aux:.8f} {float(out['loss']):.8f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
