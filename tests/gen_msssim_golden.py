"""Regenerate tests/golden/msssim_golden.json from the torch oracle.

Run: python tests/gen_msssim_golden.py
Deterministic (seeded numpy inputs), so the goldens are reproducible from
a clean checkout wherever torch exists; the committed file lets
test_metrics.py check the JAX MS-SSIM even torch-free.
"""

import json
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_msssim_model import ms_ssim_torch  # noqa: E402

# (seed, H, W, noise) — even, odd-H, odd-W, odd-both, and a blocky pair
CASES = [
    (0, 192, 224, 0.05),
    (1, 176, 176, 0.02),
    (2, 221, 197, 0.05),
    (3, 189, 240, 0.10),
    (4, 256, 171, 0.03),
]


def make_pair(seed, h, w, noise):
    rng = np.random.default_rng(seed)
    g = rng.uniform(size=(2, (h + 7) // 8, (w + 7) // 8, 3))
    a = np.repeat(np.repeat(g, 8, axis=1), 8, axis=2)[:, :h, :w]
    b = np.clip(a + rng.normal(scale=noise, size=a.shape), 0, 1)
    return np.clip(a, 0, 1).astype(np.float32), b.astype(np.float32)


def main():
    out = []
    for seed, h, w, noise in CASES:
        a, b = make_pair(seed, h, w, noise)
        val = float(
            ms_ssim_torch(
                torch.from_numpy(a.transpose(0, 3, 1, 2)),
                torch.from_numpy(b.transpose(0, 3, 1, 2)),
            )
        )
        out.append(
            {"seed": seed, "h": h, "w": w, "noise": noise, "ms_ssim": val}
        )
        print(out[-1])
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "msssim_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
