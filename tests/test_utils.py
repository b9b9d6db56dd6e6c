"""Utils tests: schedulers, checkpointing, plotting, policy configs."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.training.optimizer import (
    configure_optimizers,
    current_learning_rate,
    set_learning_rate,
)
from reslic_tcm_tpu.utils.checkpoint import (
    ReduceLROnPlateau,
    load_checkpoint,
    save_checkpoint,
)


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(1e-4, factor=0.5, patience=2)
    for _ in range(3):
        assert s.step(1.0) == 1e-4  # improving-then-flat within patience
    # 3 more bad epochs -> exceeds patience -> halve
    lrs = [s.step(1.0) for _ in range(6)]
    assert min(lrs) <= 5e-5
    state = s.state_dict()
    s2 = ReduceLROnPlateau(1.0)
    s2.load_state_dict(state)
    assert s2.lr == s.lr and s2.best == s.best


def test_set_learning_rate_in_multi_transform_state():
    params = {"w": jnp.ones(3), "entropy_bottleneck": {"quantiles": jnp.ones(2)}}
    main, aux = configure_optimizers(params, learning_rate=1e-4)
    st = main.init(params)
    assert abs(current_learning_rate(st) - 1e-4) < 1e-9
    st2 = set_learning_rate(st, 3e-5)
    assert abs(current_learning_rate(st2) - 3e-5) < 1e-9
    # state still usable
    g = {"w": jnp.ones(3), "entropy_bottleneck": {"quantiles": jnp.ones(2)}}
    up, _ = main.update(g, st2, params)
    assert np.isfinite(np.asarray(up["w"])).all()


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.int32(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, extra={"epoch": 3})
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["state"]["params"]["w"], state["params"]["w"])
    assert int(restored["state"]["step"]) == 7
    assert restored["extra"]["epoch"] == 3


def test_plot_sos_and_rd(tmp_path):
    from reslic_tcm_tpu.entropy.stanh import init_w_b
    from reslic_tcm_tpu.utils.plotting import plot_rate_distorsion, plot_sos

    w, b = init_w_b(0, 5, False)
    fig = plot_sos(w, b, symmetric=False, beta=20.0)
    fig.savefig(tmp_path / "sos.png")
    fig2 = plot_rate_distorsion(
        {"ours": [0.1, 0.3, 0.6], "base": [0.12, 0.32]},
        {"ours": [29.0, 32.0, 35.0], "base": [28.5, 31.5]},
        epoch=1,
    )
    fig2.savefig(tmp_path / "rd.png")
    assert (tmp_path / "sos.png").stat().st_size > 0
    assert (tmp_path / "rd.png").stat().st_size > 0


def test_latent_space_policy_multi():
    from types import SimpleNamespace

    from reslic_tcm_tpu.utils.helper import configure_latent_space_policy

    args = SimpleNamespace(
        lambda_list=[0.0025, 0.05],
        gauss_beta=[10, 20],
        gauss_num_sigmoids=[0, 0],
        gauss_annealing=["gap_stoc", "gap"],
        symmetry=True,
        gauss_gp=[25, 30],
        gauss_extrema=[60, 80],
        gauss_trainable=["yes", "no"],
        removing_mean=False,
    )
    cfgs = configure_latent_space_policy(args, multi=True)
    assert len(cfgs) == 2
    assert cfgs[0]["trainable"] is True and cfgs[1]["trainable"] is False
    assert cfgs[1]["beta"] == 20 and cfgs[1]["gap_factor"] == 30
