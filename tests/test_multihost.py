"""Multi-host (2-process) data-parallel training equivalence.

Spawns two OS processes that each see 2 CPU devices, bring up the JAX
distributed runtime (gloo collectives), build the GLOBAL 4-device
('data', 'model') mesh, and run one deterministic train step with each
process feeding only its local batch rows. The resulting loss must equal a
single-process 4-device run on the same global batch — proving the
cross-process gradient all-reduce and the per-process data path
(`distribute_batch`) are correct. This is the runnable version of BASELINE
config 5's "data-parallel trained on v5e-16" story (the reference itself is
single-node nn.DataParallel only, reference utils/helper.py:106-113).
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(port, nproc, pid):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(HERE) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    return subprocess.Popen(
        [sys.executable, WORKER, str(port), str(nproc), str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _loss(out: str):
    for line in out.splitlines():
        if line.startswith("MHLOSS"):
            parts = line.split()
            return tuple(float(p) for p in parts[1:])
    raise AssertionError(f"no MHLOSS line in output:\n{out}")


def test_two_process_dp_matches_single_process():
    port = _free_port()
    procs = [_run(port, 2, pid) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{o}"
    losses = [_loss(o) for o in outs]
    # both processes observe the same replicated metrics
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    single = _run(port, 1, 0)
    out = single.communicate(timeout=600)[0]
    assert single.returncode == 0, out
    ref = _loss(out)
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)


def test_local_batch_size_and_distribute_single_process():
    import jax
    import jax.numpy as jnp
    import pytest

    from reslic_tcm_tpu.parallel.mesh import make_mesh
    from reslic_tcm_tpu.parallel.multihost import (
        distribute_batch,
        is_coordinator,
        local_batch_size,
    )

    assert is_coordinator()
    assert jax.process_count() == 1
    assert local_batch_size(16) == 16  # single process: local == global
    assert local_batch_size(7) == 7

    mesh = make_mesh(n_data=4, n_model=1)
    x = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3)
    arr = distribute_batch(mesh, x)
    assert arr.shape == x.shape
    np.testing.assert_array_equal(np.asarray(arr), x)
    # actually sharded over 'data'
    assert len(arr.sharding.device_set) == 4
