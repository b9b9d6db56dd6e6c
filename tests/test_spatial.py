"""Spatial sharding tests: halo exchange on an 8-device mesh, tiling."""

import jax
import jax.numpy as jnp
import numpy as np

from reslic_tcm_tpu.parallel.mesh import make_mesh
from reslic_tcm_tpu.parallel import spatial as sp


def test_sharded_conv_matches_unsharded():
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 3, 8, 4)) * 0.1, jnp.float32)

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), padding=((2, 2), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    with mesh:
        got = sp.sharded_conv2d(x, k, mesh, "data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tile_grid_covers_everything():
    for h, w in [(1200, 1200), (512, 768), (600, 500)]:
        pos = sp.tile_grid(h, w, 512 if min(h, w) >= 512 else 256, 64)
        tile = 512 if min(h, w) >= 512 else 256
        cov = np.zeros((h, w), bool)
        for (y, x) in pos:
            assert 0 <= y <= h - tile and 0 <= x <= w - tile
            cov[y : y + tile, x : x + tile] = True
        assert cov.all()


def test_tile_untile_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 300, 280, 3)), jnp.float32)
    tiles, pos = sp.tile_image(x, tile=128, overlap=32)
    # identity "model": untile the input tiles and compare
    back = sp.untile_image(tiles, pos, 300, 280, 128, 32)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_mesh_sharded_forward_matches_monolithic():
    """Full-stack spatially-sharded forward (halo exchange over the mesh)
    agrees with the monolithic forward away from shard seams."""
    from jax.sharding import Mesh

    from reslic_tcm_tpu.models.balle2018 import make_balle

    codec = make_balle("factorized", N=8, M=12, input_shape=(64, 64))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(1, 256, 64, 3)), jnp.float32)

    mono = codec.forward(x, training=False)
    mono_hat = np.clip(np.asarray(mono["x_hat"]), 0, 1)
    mono_bits = float(
        sum(-jnp.log2(l).sum() for l in mono["likelihoods"].values())
    )

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("spatial",))
    got, bits = sp.mesh_sharded_forward(
        codec.module, codec.variables, x, mesh, "spatial", halo=64
    )
    got = np.asarray(got)
    assert got.shape == mono_hat.shape
    diff = np.abs(got - mono_hat)
    assert diff.mean() < 0.02, diff.mean()
    # rate estimate within a few % (halo rows are cropped, not double-counted)
    assert abs(float(bits) - mono_bits) / mono_bits < 0.05, (float(bits), mono_bits)


def test_tiled_forward_matches_monolithic_interior():
    """Tiled eval forward equals the monolithic forward away from seams."""
    from reslic_tcm_tpu.models.balle2018 import make_balle

    codec = make_balle("factorized", N=8, M=12, input_shape=(64, 64))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(1, 192, 128, 3)), jnp.float32)

    mono = codec.forward(x, training=False)
    mono_hat = np.clip(np.asarray(mono["x_hat"]), 0, 1)
    tiled_hat, bits = sp.tiled_forward(codec, x, tile=128, overlap=32, tile_batch=4)
    tiled_hat = np.asarray(tiled_hat)

    assert np.isfinite(tiled_hat).all() and bits > 0
    # Tiled inference is approximate near seams (the g_a+g_s receptive field
    # exceeds small overlaps); require close agreement overall. Production
    # tiles (512/64) shrink the seam error further.
    diff = np.abs(tiled_hat - mono_hat)
    assert diff.mean() < 0.02, diff.mean()
    mse = float((diff**2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 25, psnr
