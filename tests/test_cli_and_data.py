"""CLI flag parity + data pipeline tests."""

import numpy as np
import pytest
from PIL import Image

from reslic_tcm_tpu.data.datasets import ImageFolder, KodakDataset, Loader
from reslic_tcm_tpu.utils.parser import parse_args

# Flag surface of the reference training CLI (reference utils/parser.py:5-55).
REFERENCE_FLAGS = {
    "--model": "wacnn_stanh",
    "--dataset": "/scratch/dataset/openimages",
    "--epochs": 100,
    "--learning-rate": 1e-4,
    "--num-workers": 8,
    "--num_images": 300000,
    "--num_images_val": 816,
    "--lambda_list": [0.0025],
    "--batch-size": 16,
    "--test-batch-size": 8,
    "--aux-learning-rate": 1e-3,
    "--patch-size": (256, 256),
    "--seed": 100,
    "--quality": 0,
    "--clip_max_norm": 1.0,
    "--checkpoint": "none",
    "--type": "mse",
    "--save_path": "/scratch/StanhLTM/models/",
    "--skip_epoch": 0,
    "--N": 192,
    "--M": 320,
    "--lr_epoch": [50, 100, 150],
    "--refinement": "none",
    "--gauss_beta": [10, 10, 10],
    "--gauss_num_sigmoids": [0, 0, 0],
    "--gauss_extrema": [80, 80, 80],
    "--gauss_gp": [25, 25, 25],
    "--gauss_annealing": ["gap_stoc", "gap_stoc", "gap_stoc"],
    "--gauss_trainable": ["no", "no", "no"],
    "--wandb_name": "stanh_der",
}


def test_parser_flag_parity():
    args = parse_args([])
    for flag, default in REFERENCE_FLAGS.items():
        name = flag.lstrip("-").replace("-", "_")
        assert hasattr(args, name), f"missing flag {flag}"
        got = getattr(args, name)
        if isinstance(default, tuple):
            assert tuple(got) == default, (flag, got)
        else:
            assert got == default, (flag, got, default)
    # store_true flags default False
    for name in ("continue_train", "removing_mean", "freeze", "fact_stanh",
                 "tester", "factorized_stanh", "symmetry"):
        assert getattr(args, name) is False, name


def test_parser_accepts_reference_invocation():
    args = parse_args(
        "-m wacnn_stanh -d /data -e 50 -lr 1e-4 --lambda_list 0.0025 0.05 "
        "--batch-size 16 --N 192 --M 320 --symmetry "
        "--gauss_beta 10 20 --gauss_extrema 60 80 "
        "--gauss_annealing gap_stoc gap".split()
    )
    assert args.lambda_list == [0.0025, 0.05]
    assert args.symmetry is True
    assert args.gauss_beta == [10, 20]


@pytest.fixture
def image_root(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in (("train", 6), ("test", 3)):
        d = tmp_path / split / "data"
        d.mkdir(parents=True)
        for i in range(n):
            arr = rng.integers(0, 255, size=(300, 280, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return tmp_path


def test_image_folder_and_loader(image_root):
    ds = ImageFolder(image_root, num_images=5, split="train",
                     patch_size=(64, 64), train=True)
    assert len(ds) == 5  # num_images cap
    loader = Loader(ds, batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b.shape == (2, 64, 64, 3)
        assert b.dtype == np.float32
        assert 0 <= b.min() and b.max() <= 1

    # epochs reshuffle deterministically by (seed, epoch)
    l2 = Loader(ds, batch_size=2, seed=0)
    a1 = list(l2)
    a2 = list(l2)
    assert not all(np.array_equal(x, y) for x, y in zip(a1, a2))


def test_center_crop_val(image_root):
    ds = ImageFolder(image_root, num_images=10, split="test",
                     patch_size=(128, 128), train=False)
    rng = np.random.default_rng(0)
    a = ds.get(0, rng)
    b = ds.get(0, rng)
    assert a.shape == (128, 128, 3)
    np.testing.assert_array_equal(a, b)  # deterministic center crop


def test_kodak_dataset(image_root):
    k = KodakDataset(image_root / "test" / "data")
    imgs = list(k)
    assert len(imgs) == 3
    assert imgs[0].shape == (1, 300, 280, 3)


def test_decoded_cache_bit_identical(image_root):
    """The uint8 RAM cache must produce exactly what a fresh float decode
    produces (crop-then-normalize == normalize-then-crop on uint8/255)."""
    from reslic_tcm_tpu.data.datasets import random_crop, read_image

    ds = ImageFolder(image_root, num_images=5, split="train",
                     patch_size=(64, 64), train=True)
    r1, r2 = np.random.default_rng(3), np.random.default_rng(3)
    for i in range(len(ds)):
        got = ds.get(i, r1)  # populates the cache
        want = random_crop(read_image(ds.samples[i]), ds.patch_size, r2)
        np.testing.assert_array_equal(got, want)
    assert ds._cache_bytes > 0
    # second pass is served from the cache and stays identical
    r3, r4 = np.random.default_rng(3), np.random.default_rng(3)
    for i in range(len(ds)):
        got = ds.get(i, r3)
        want = random_crop(read_image(ds.samples[i]), ds.patch_size, r4)
        np.testing.assert_array_equal(got, want)


def test_decoded_cache_budget_zero_disables(image_root):
    ds = ImageFolder(image_root, num_images=3, split="train",
                     patch_size=(64, 64), train=True, cache_mb=0)
    rng = np.random.default_rng(0)
    ds.get(0, rng)
    assert ds._cache_bytes == 0 and not ds._cache
