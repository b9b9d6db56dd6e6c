"""Host-side data pipeline (PIL + numpy; no torch DataLoader).

Mirrors the reference's datasets: ImageFolder over root/{split}/data capped
at num_images (reference dataset/utils.py:21-60) with random 256x256 crops
for training / center crops for validation (reference train.py:106-112), and
the full-resolution Kodak test set (reference train.py:39-54). Batches are
NHWC float32 in [0, 1], produced with a small prefetch thread pool so the
TPU never waits on PIL decode.
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np
from PIL import Image

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp"}


def list_images(directory) -> list[Path]:
    files = []
    for f in sorted(Path(directory).iterdir()):
        if f.is_file() and f.suffix.lower() in _IMG_EXTS:
            files.append(f)
    return files


def read_image(path) -> np.ndarray:
    """HWC float32 in [0,1] (reference utils/helper.py:76-80)."""
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def random_crop(img: np.ndarray, size, rng: np.random.Generator) -> np.ndarray:
    h, w = img.shape[:2]
    th, tw = size
    if h < th or w < tw:  # torchvision pads-on-demand; upscale-pad here
        ph, pw = max(th - h, 0), max(tw - w, 0)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    i = int(rng.integers(0, h - th + 1))
    j = int(rng.integers(0, w - tw + 1))
    return img[i : i + th, j : j + tw]


def center_crop(img: np.ndarray, size) -> np.ndarray:
    h, w = img.shape[:2]
    th, tw = size
    if h < th or w < tw:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    i = (h - th) // 2
    j = (w - tw) // 2
    return img[i : i + th, j : j + tw]


class ImageFolder:
    """root/{split}/data image list capped at num_images.

    Decoded images are cached in RAM as uint8 (bounded by
    RESLIC_DATA_CACHE_MB, default 16384): PIL's PNG decode is the training
    wall on few-core hosts — one core decodes ~2 images/s, turning a
    ~35 s/epoch TPU step stream into a 10 min/epoch pipeline. Epoch 0 pays
    one decode per image; later epochs are crop+normalize only. Cropping
    the cached uint8 and then normalizing is bit-identical to normalizing
    first (both divide the same uint8 values by 255)."""

    def __init__(self, root, num_images: int = 300000, split: str = "train",
                 patch_size=(256, 256), train: bool = True,
                 cache_mb: float | None = None):
        splitdir = Path(root) / split / "data"
        if not splitdir.is_dir():
            raise RuntimeError(f'Invalid directory "{root}"')
        self.samples = list_images(splitdir)[:num_images]
        self.patch_size = tuple(patch_size)
        self.train = train
        if cache_mb is None:
            cache_mb = float(os.environ.get("RESLIC_DATA_CACHE_MB", 16384))
        self._cache_budget = int(cache_mb * 1e6)
        self._cache: dict = {}
        self._cache_bytes = 0

    def __len__(self):
        return len(self.samples)

    def _read_u8(self, index: int) -> np.ndarray:
        img = self._cache.get(index)
        if img is None:
            img = np.asarray(
                Image.open(self.samples[index]).convert("RGB"), np.uint8
            )
            if self._cache_bytes + img.nbytes <= self._cache_budget:
                # dict insert is GIL-atomic; worst case under the prefetch
                # pool is a redundant decode, never a torn entry
                self._cache[index] = img
                self._cache_bytes += img.nbytes
        return img

    def get(self, index: int, rng: np.random.Generator) -> np.ndarray:
        img = self._read_u8(index)
        crop = (random_crop(img, self.patch_size, rng) if self.train
                else center_crop(img, self.patch_size))
        return crop.astype(np.float32) / 255.0


class Loader:
    """Shuffling, prefetching batch iterator over an ImageFolder."""

    def __init__(self, dataset: ImageFolder, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True,
                 num_threads: int = 8, prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def worker():
            wrng = np.random.default_rng((self.seed, self.epoch, 1))
            for b in range(n_batches):
                idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                imgs = [self.ds.get(int(i), wrng) for i in idx]
                q.put(np.stack(imgs, axis=0))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        self.epoch += 1


class KodakDataset:
    """Full-resolution test images, batch 1 (reference train.py:39-54)."""

    def __init__(self, root):
        self.samples = list_images(root)
        if not self.samples:
            raise RuntimeError(f"no images under {root}")

    def __len__(self):
        return len(self.samples)

    def __iter__(self):
        for f in self.samples:
            yield read_image(f)[None]  # [1, H, W, 3]
