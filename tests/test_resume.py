"""Checkpoint/resume integrity: save mid-training, restore, continue; the
resumed run must match the uninterrupted one exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.training.optimizer import configure_optimizers
from reslic_tcm_tpu.training.step import create_train_state, make_train_step
from reslic_tcm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from tests.test_training import TinyFactorized, _batch


def test_resume_matches_uninterrupted(tmp_path):
    module = TinyFactorized()
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    main_tx, aux_tx = configure_optimizers(variables["params"])
    step = jax.jit(make_train_step(module, main_tx, aux_tx))

    def run(state, start, end):
        for i in range(start, end):
            state, m = step(state, _batch(seed=i), jnp.float32(0.01),
                            jax.random.PRNGKey(i))
        return state, m

    # uninterrupted 8 steps
    s_full = create_train_state(variables["params"], main_tx, aux_tx)
    s_full, m_full = run(s_full, 0, 8)

    # interrupted at 4, checkpointed, restored, continued
    s_half = create_train_state(variables["params"], main_tx, aux_tx)
    s_half, _ = run(s_half, 0, 4)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, s_half, extra={"epoch": 0})
    restored = load_checkpoint(path)

    import jax.tree_util as jtu

    from reslic_tcm_tpu.utils.checkpoint import restore_tree

    template = create_train_state(variables["params"], main_tx, aux_tx)
    s_resumed = restore_tree(template, restored["state"])
    s_resumed, m_resumed = run(s_resumed, 4, 8)

    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_resumed["loss"]), rtol=1e-6
    )
    for a, b in zip(jtu.tree_leaves(s_full.params), jtu.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
