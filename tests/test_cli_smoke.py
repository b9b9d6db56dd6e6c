"""End-to-end CLI smoke tests: the full train main() (epoch loop, annealing,
checkpoint save, resume) and eval main() (forward + --real) actually run
on a tiny synthetic dataset (reference train.py:84-341, eval.py:74-159)."""

import glob

import numpy as np
import pytest


def _write_images(d, n, size=(96, 112)):
    from PIL import Image

    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        # piecewise-constant + noise: compressible, nontrivial statistics
        g = rng.uniform(size=(size[0] // 8, size[1] // 8, 3))
        arr = np.repeat(np.repeat(g, 8, axis=0), 8, axis=1)
        arr = np.clip(arr + rng.normal(scale=0.02, size=arr.shape), 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"img_{i}.png")


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    _write_images(root / "train" / "data", 4)
    _write_images(root / "test" / "data", 2)
    return root


def _train_args(root, out_dir, extra):
    return [
        "-m", "scale_stanh", "-d", str(root),
        "--epochs", "1", "--batch-size", "2", "--test-batch-size", "2",
        "--patch-size", "64", "64", "--N", "16", "--M", "24",
        "-n", "1", "--seed", "0",
        "--save_path", str(out_dir / "models"),
        "--kodak", str(out_dir / "nokodak"),
        "--num_images", "4", "--num_images_val", "2",
    ] + extra


def test_train_cli_smoke_and_resume(image_root, tmp_path, monkeypatch):
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from reslic_tcm_tpu.cli import train as train_cli

    rc = train_cli.main(_train_args(image_root, tmp_path, []))
    assert rc == 0
    ckpts = glob.glob(str(tmp_path / "models" / "*" / "_very_best.ckpt"))
    assert ckpts, "very-best checkpoint not written"

    # resume: optimizer/scheduler state restored, continues at epoch 1
    rc = train_cli.main(_train_args(image_root, tmp_path, [
        "--checkpoint", ckpts[0], "--continue_train", "--epochs", "2",
    ]))
    assert rc == 0


def test_train_cli_tester_mode(image_root, tmp_path, monkeypatch):
    """--tester: validation only, no train loop (reference train.py:175)."""
    monkeypatch.setenv("WANDB_MODE", "disabled")
    from reslic_tcm_tpu.cli import train as train_cli

    rc = train_cli.main(_train_args(image_root, tmp_path, ["--tester"]))
    assert rc == 0


def test_eval_cli_smoke_forward_and_real(tmp_path, capsys):
    from reslic_tcm_tpu.cli import eval as eval_cli

    # >160px sides for 5-scale MS-SSIM; odd sizes exercise pad-to-256
    _write_images(tmp_path / "eval", 2, size=(176, 192))
    data = str(tmp_path / "eval")
    # forward estimate path
    rc = eval_cli.main(["--data", data, "--N", "32", "--M", "40"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "average_PSNR" in out and "average_Bit-rate" in out

    # real codec path: compress -> rANS bytes -> decompress
    rc = eval_cli.main(["--data", data, "--N", "32", "--M", "40", "--real"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "average_Bit-rate" in out
