"""Device-coder profile: fully on-device encode/decode round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reslic_tcm_tpu.models.tcm import make_tcm


@pytest.fixture(scope="module")
def tiny_codec():
    c = make_tcm(N=32, M=40, input_shape=(128, 128), hyper_ch=24,
                 atten_inter_dim=16)
    c.update()
    return c


def _image(seed=0):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(1, 8, 8, 3))
    img = np.repeat(np.repeat(g, 16, axis=1), 16, axis=2)
    img += rng.normal(scale=0.02, size=img.shape)
    return jnp.asarray(np.clip(img, 0, 1), jnp.float32)


def test_device_codec_roundtrip_matches_host(tiny_codec):
    x = _image(1)
    # y slice: 8*8*8 = 512 symbols -> k must divide
    enc = tiny_codec.compress_device(x, k=128)
    dec = tiny_codec.decompress_device(enc)

    host_enc = tiny_codec.compress(x)
    host_dec = tiny_codec.decompress(host_enc["strings"], host_enc["shape"])
    np.testing.assert_allclose(
        np.asarray(dec["x_hat"]), np.asarray(host_dec["x_hat"]), atol=1e-6
    )

    # rate sanity: same order of magnitude as the host stream. At this tiny
    # size the per-lane flush (4B x lanes) and the 32-bit escape format (vs
    # the host coder's 4-bit chunks) dominate — with trained weights and
    # real image sizes the gap is a few percent (escapes ~0, flush amortized)
    host_bytes = len(host_enc["strings"][0][0]) + len(host_enc["strings"][1][0])
    # subtract the fixed per-lane flush (4 bytes x k lanes): at this tiny size
    # and near-empty streams it dwarfs the content bytes
    content = enc["nbytes"] - 4 * 128
    assert host_bytes * 0.5 < content < host_bytes * 2.0


def test_device_codec_matches_eval_forward(tiny_codec):
    x = _image(2)
    out = tiny_codec.forward(x, training=False)
    enc = tiny_codec.compress_device(x, k=128)
    dec = tiny_codec.decompress_device(enc)
    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_device_codec_batched(tiny_codec):
    xb = jnp.concatenate([_image(5), _image(6), _image(7)], axis=0)
    enc = tiny_codec.compress_device(xb, k=128)
    dec = tiny_codec.decompress_device(enc)
    out = tiny_codec.forward(xb, training=False)
    want = np.clip(np.asarray(out["x_hat"]), 0, 1)
    np.testing.assert_allclose(np.asarray(dec["x_hat"]), want, atol=1e-5)


def test_roundtrip_pipelined_matches_serial(tiny_codec):
    rng = np.random.default_rng(9)
    batches = [
        jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        for _ in range(2)
    ]
    outs = tiny_codec.roundtrip_pipelined(batches)
    assert len(outs) == 2
    for x, o in zip(batches, outs):
        encs = tiny_codec.compress_batch(x)
        dec = tiny_codec.decompress_batch(
            [e["strings"] for e in encs], encs[0]["shape"]
        )
        for a, c in zip(o["encs"], encs):
            assert a["strings"][0][0] == c["strings"][0][0]
        np.testing.assert_allclose(
            np.asarray(o["x_hat"]), np.asarray(dec["x_hat"]), atol=1e-6
        )


def test_compress_pipelined_matches_batch(tiny_codec):
    import numpy as np

    rng = np.random.default_rng(3)
    batches = [
        jnp.asarray(rng.uniform(size=(2, 128, 128, 3)), jnp.float32)
        for _ in range(3)
    ]
    piped = tiny_codec.compress_pipelined(batches)
    flat = []
    for b in batches:
        flat.extend(tiny_codec.compress_batch(b))
    assert len(piped) == len(flat) == 6
    for a, c in zip(piped, flat):
        assert a["strings"][0][0] == c["strings"][0][0]
        assert a["strings"][1][0] == c["strings"][1][0]
        assert a["shape"] == c["shape"]
