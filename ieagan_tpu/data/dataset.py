"""Event dataset: one item = all sensor images of one event.

Directory layout (reference: utils/dataloader.py:14-53, README.md:14-27):
    <root>/1.1.1/<event_file>, <root>/1.1.2/<event_file>, ...
with identical filenames across the per-sensor subdirectories; subdir order
(sorted) defines the label order 0..n_sensors-1.

Transform chain (reference: utils/dataloader.py:69-78): pad height 3+3
(250 -> 256), grayscale, [0,1], lognorm255, +U[0,4e-3) noise,
normalize(0.5, 0.5) -> [-1, 1]. Implemented in numpy on the host; the
uniform noise uses a per-call numpy Generator so loader workers stay
deterministic under a seeded run.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

_LOG256 = np.log(256.0)


def event_transform(img: np.ndarray, rng: np.random.Generator | None = None,
                    noise_scale: float = 4e-3) -> np.ndarray:
    """(H, W) uint8/float -> (H+6, W, 1) float32 in [-1, 1]."""
    x = np.asarray(img, np.float32)
    if x.ndim == 3:  # RGB -> luminance (transforms.Grayscale semantics)
        x = x @ np.array([0.299, 0.587, 0.114], np.float32)
    x = np.pad(x, ((3, 3), (0, 0)))
    x = x / 255.0
    x = np.log(255.0 * x + 1.0) / _LOG256
    if rng is not None and noise_scale:
        x = x + noise_scale * rng.random(x.shape, np.float32)
    x = (x - 0.5) / 0.5
    return x[..., None].astype(np.float32)


class ImageEventsDataset:
    """Index-addressable event dataset over the per-sensor directory tree."""

    def __init__(self, path: str, noise_scale: float = 4e-3,
                 seed: int | None = None):
        self.path = path
        self.subdirs: Sequence[str] = sorted(os.listdir(path))
        if not self.subdirs:
            raise ValueError(f"no sensor subdirectories under {path}")
        self.filenames: Sequence[str] = sorted(
            os.listdir(os.path.join(path, self.subdirs[0])))
        self.noise_scale = noise_scale
        self.seed = seed

    def __len__(self):
        return len(self.filenames)

    @property
    def n_sensors(self):
        return len(self.subdirs)

    def load_image(self, subdir: str, filename: str) -> np.ndarray:
        fp = os.path.join(self.path, subdir, filename)
        if Image is None:
            raise RuntimeError("PIL is required to load image datasets")
        with Image.open(fp) as im:
            return np.asarray(im.convert("L"))

    def __getitem__(self, event_idx: int):
        """-> (images (n_sensors, H, W, 1) float32, labels (n_sensors,) int32)."""
        rng = None
        if self.noise_scale:
            seed = (self.seed, event_idx) if self.seed is not None else None
            rng = np.random.default_rng(seed)
        imgs = np.stack([
            event_transform(self.load_image(sub, self.filenames[event_idx]),
                            rng, self.noise_scale)
            for sub in self.subdirs])
        labels = np.arange(self.n_sensors, dtype=np.int32)
        return imgs, labels


def load_dataset(data_path: str, num_workers: int = 8, shuffle: bool = True,
                 seed: int | None = None, events_per_batch: int = 1):
    """Reference-parity entry point (utils/dataloader.py:56-81) returning an
    iterable of device-ready (images, labels) event batches."""
    from ieagan_tpu.data.pipeline import EventLoader
    ds = ImageEventsDataset(data_path, seed=seed)
    return EventLoader(ds, num_workers=num_workers, shuffle=shuffle, seed=seed,
                       events_per_batch=events_per_batch)
