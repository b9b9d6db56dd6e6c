"""Procedural corpus generator: determinism, statistics, pipeline fit."""

import numpy as np

from reslic_tcm_tpu.data.datasets import ImageFolder, Loader
from reslic_tcm_tpu.data.synthetic import generate_corpus, synth_image


def test_synth_image_deterministic_and_valid():
    a = synth_image(np.random.default_rng(7), 128, 160)
    b = synth_image(np.random.default_rng(7), 128, 160)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (128, 160, 3) and a.dtype == np.float32
    assert 0.0 <= a.min() and a.max() <= 1.0
    # not degenerate: real spatial structure in every channel
    assert all(a[..., c].std() > 0.01 for c in range(3))


def test_generate_corpus_feeds_image_folder(tmp_path):
    root = str(tmp_path / "corpus")
    generate_corpus(root, n_train=6, n_test=2, train_size=(128, 128),
                    test_size=(128, 192), seed=1)
    ds = ImageFolder(root, num_images=6, split="train", patch_size=(64, 64),
                     train=True)
    loader = Loader(ds, batch_size=3, seed=0, num_threads=2)
    batch = next(iter(loader))
    assert batch.shape == (3, 64, 64, 3)
    assert batch.dtype == np.float32
    test_ds = ImageFolder(root, num_images=2, split="test",
                          patch_size=(64, 64), train=False)
    assert len(test_ds) == 2


def test_corpus_regen_is_idempotent(tmp_path):
    root = str(tmp_path / "corpus")
    generate_corpus(root, n_train=2, n_test=1, train_size=(64, 64),
                    test_size=(64, 64), seed=3)
    from PIL import Image

    p = tmp_path / "corpus" / "train" / "data" / "synth_00000.png"
    first = np.asarray(Image.open(p))
    generate_corpus(root, n_train=2, n_test=1, train_size=(64, 64),
                    test_size=(64, 64), seed=3)  # skip_existing
    np.testing.assert_array_equal(np.asarray(Image.open(p)), first)
