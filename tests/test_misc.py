"""Misc coverage: jit-vs-eager equivalence, profiling helpers, extra layers."""

import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.models.gain.extra_layers import NonLocalAttention, ResBlock
from reslic_tcm_tpu.utils.profiling import throughput_mp_s, timed


def test_jit_eager_equivalence_tiny_codec():
    """jitted eval forward == eager eval forward (SURVEY section 5's
    substitute for race detection)."""
    from tests.test_training import TinyFactorized

    module = TinyFactorized()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)), jnp.float32)
    v = module.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x)
    eager = module.apply(v, x, training=False)
    jitted = jax.jit(lambda vv, xx: module.apply(vv, xx, training=False))(v, x)
    np.testing.assert_allclose(
        np.asarray(eager["x_hat"]), np.asarray(jitted["x_hat"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(eager["likelihoods"]["y"]),
        np.asarray(jitted["likelihoods"]["y"]),
        rtol=1e-5, atol=1e-7,
    )


def test_timed_and_throughput():
    res = {}
    with timed("block", results=res) as out:
        out["sync"] = jnp.ones(4) * 2
    assert res["block"] > 0
    assert abs(throughput_mp_s(2_000_000, 2.0) - 1.0) < 1e-9


def test_extra_gain_layers():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 6)), jnp.float32)
    rb = ResBlock(6)
    v = rb.init(jax.random.PRNGKey(0), x)
    y = rb.apply(v, x)
    assert y.shape == x.shape

    nla = NonLocalAttention(6)
    v = nla.init(jax.random.PRNGKey(0), x)
    y = nla.apply(v, x)
    assert y.shape == x.shape and np.abs(np.asarray(y - x)).max() > 0

    nla_bug = NonLocalAttention(6, passthrough_bug=True)
    y2 = nla_bug.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(x))


def test_fetch_multistream_uneven_batches():
    """Chunked device->host fetch reassembles exactly for any batch size
    (including sizes not divisible by the stream count)."""
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp
    import numpy as np

    from reslic_tcm_tpu.models.base import ChannelARCodec

    f = ChannelARCodec.fetch_multistream
    for b in (1, 2, 3, 4, 5, 6, 7, 8):
        arr = jnp.arange(b * 12, dtype=jnp.uint8).reshape(b, 12)
        with ThreadPoolExecutor(4) as pool:
            out = f(arr, pool, 4)()
        np.testing.assert_array_equal(out, np.asarray(arr))
