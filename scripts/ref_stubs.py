"""Import stubs for running the reference implementation as a test oracle
on this machine (boost_histogram and torchvision are not installed; the
reference only needs a thin functional slice of each on the training
path). Faithful re-implementations of the exact transforms the reference
dataloader composes (reference: utils/dataloader.py:67-78) — semantics
already pinned by tests/test_data.py against our own chain.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install():
    if "boost_histogram" not in sys.modules:
        bh = types.ModuleType("boost_histogram")
        bh.axis = types.SimpleNamespace(Regular=lambda *a, **k: None)
        bh.Histogram = lambda *a, **k: None
        sys.modules["boost_histogram"] = bh

    if "torchvision" in sys.modules:
        return
    import torch
    from PIL import Image, ImageOps

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Pad:
        def __init__(self, padding, fill=0):
            self.padding, self.fill = padding, fill

        def __call__(self, img):
            return ImageOps.expand(img, border=tuple(self.padding),
                                   fill=self.fill)

    class Grayscale:
        def __init__(self, num_output_channels=1):
            self.n = num_output_channels

        def __call__(self, img):
            return img.convert("L") if self.n == 1 else img

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr.copy())

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    for cls in (Compose, Pad, Grayscale, ToTensor, Lambda, Normalize):
        setattr(transforms, cls.__name__, cls)
    transforms.functional = types.SimpleNamespace()

    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.save_image = lambda *a, **k: None

    folder = types.SimpleNamespace(
        default_loader=lambda p: Image.open(p).convert("RGB"))
    datasets = types.ModuleType("torchvision.datasets")
    datasets.folder = folder

    tv.transforms, tv.utils, tv.datasets = transforms, utils_mod, datasets
    sys.modules.update({
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.utils": utils_mod,
        "torchvision.datasets": datasets,
    })

    # mycleanfid imports `cleanfid` at module scope; training never calls
    # into it (test_every is disabled) — reuse the fid_parity stub shape.
    if "cleanfid" not in sys.modules:
        pkg = types.ModuleType("cleanfid")
        dh = types.ModuleType("cleanfid.downloads_helper")
        dh.__all__ = []
        ip = types.ModuleType("cleanfid.inception_pytorch")
        ip.InceptionV3 = object
        pkg.downloads_helper, pkg.inception_pytorch = dh, ip
        sys.modules.update({"cleanfid": pkg,
                            "cleanfid.downloads_helper": dh,
                            "cleanfid.inception_pytorch": ip})
