"""compress_with_ac equivalent (training/codec_eval) end to end."""

import numpy as np
from PIL import Image

from reslic_tcm_tpu.models.balle2018 import make_balle
from reslic_tcm_tpu.training.codec_eval import bpp_calculation, compress_with_ac


def test_compress_with_ac(tmp_path):
    rng = np.random.default_rng(0)
    files = []
    for i, (h, w) in enumerate([(100, 120), (128, 64)]):  # non-multiples of 64
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(arr).save(p)
        files.append(p)

    codec = make_balle("mean-scale", N=16, M=24, input_shape=(64, 64))
    codec.update()
    bpp, psnr = compress_with_ac(codec, files, verbose=False)
    assert np.isfinite(bpp) and bpp > 0
    assert np.isfinite(psnr)


def test_bpp_calculation():
    strings = [[b"x" * 100], [b"y" * 25]]
    total, hyper, main = bpp_calculation(1000, strings)
    assert main == 100 * 8 / 1000
    assert hyper == 25 * 8 / 1000
    assert abs(total - (main + hyper)) < 1e-12
