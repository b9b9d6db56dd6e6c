"""dp x tp mesh: sharded step equals single-device step."""

import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    tensor_parallel_specs,
)
from reslic_tcm_tpu.training.optimizer import configure_optimizers
from reslic_tcm_tpu.training.step import (
    create_train_state,
    make_train_step,
    shard_train_step,
)
from tests.test_training import TinyFactorized, _batch


def test_tp_specs_select_wide_kernels():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "wide": {"kernel": jnp.zeros((3, 3, 64, 256)), "bias": jnp.zeros(256)},
        "narrow": {"kernel": jnp.zeros((3, 3, 8, 12)), "bias": jnp.zeros(12)},
    }
    specs = tensor_parallel_specs(params, mesh)
    assert specs["wide"]["kernel"] == jax.sharding.PartitionSpec(None, None, None, "model")
    assert specs["narrow"]["kernel"] == jax.sharding.PartitionSpec()


def test_dp_tp_step_matches_single_device():
    module = TinyFactorized(n=128)  # wide enough for TP selection
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    main_tx, aux_tx = configure_optimizers(variables["params"])
    step = make_train_step(module, main_tx, aux_tx)
    batch = _batch(n=4, seed=5)

    single = jax.jit(step)
    state0 = create_train_state(variables["params"], main_tx, aux_tx)
    s1, m1 = single(state0, batch, jnp.asarray(0.01), jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        params = shard_params(mesh, variables["params"], tp=True)
        state = create_train_state(params, main_tx, aux_tx)
        sharded = shard_train_step(step, mesh)
        s2, m2 = sharded(
            state, shard_batch(mesh, batch), jnp.asarray(0.01), jax.random.PRNGKey(0)
        )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_inference_codec_bit_exact():
    """compress/decompress over an 8-device data mesh must produce the very
    same bitstreams and reconstruction as the single-device codec."""
    import numpy as np
    from reslic_tcm_tpu.models.tcm import make_tcm
    from reslic_tcm_tpu.parallel.mesh import make_mesh

    codec = make_tcm(N=32, M=40, input_shape=(128, 128), hyper_ch=24,
                     atten_inter_dim=16)
    codec.update()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(8, 128, 128, 3)), jnp.float32)

    ref = codec.compress_batch(x)
    ref_dec = codec.decompress_batch([e["strings"] for e in ref],
                                     ref[0]["shape"])

    codec.shard_for_inference(make_mesh(n_data=8))
    enc = codec.compress_batch(x)
    for a, b in zip(enc, ref):
        assert a["strings"][0][0] == b["strings"][0][0]
        assert a["strings"][1][0] == b["strings"][1][0]
    dec = codec.decompress_batch([e["strings"] for e in enc], enc[0]["shape"])
    # bitstreams above are byte-identical (the index math mirrors the
    # decoder's executables); x_hat may differ by synthesis-fusion ulps
    # between the SPMD and single-device partitions
    np.testing.assert_allclose(np.asarray(dec["x_hat"]),
                               np.asarray(ref_dec["x_hat"]), atol=5e-6)
