"""clean-FID resize: PIL float-mode single-channel bilinear to 299x299.

The metric is *defined* by this resize (reference: mycleanfid/fid.py:151-196
— PIL mode-"F" bilinear on the single channel, replicated to 3 channels by
the zeros-buffer broadcast at fid.py:690-697). Host PIL is the bit-exact
reference path; ``jax_resize_single_channel`` is the on-device equivalent
(jax.image antialiased triangle filter == PIL bilinear) used by the fast
TPU pipeline, validated against PIL in tests.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def pil_resize_single_channel(x: np.ndarray, size=(299, 299),
                              interp: str = "bilinear") -> np.ndarray:
    """(H, W) float -> (299, 299) float32 via PIL mode-F resampling."""
    img = Image.fromarray(np.asarray(x, np.float32), mode="F")
    resample = (Image.BICUBIC if interp == "bicubic" else Image.BILINEAR)
    img = img.resize(size, resample=resample)
    return np.asarray(img, np.float32)


def pil_resize_batch(batch: np.ndarray, size=(299, 299),
                     interp: str = "bilinear") -> np.ndarray:
    """(B, H, W) -> (B, 299, 299, 3) float32, channel-replicated."""
    out = np.empty((batch.shape[0], size[1], size[0], 3), np.float32)
    for i in range(batch.shape[0]):
        r = pil_resize_single_channel(batch[i], size, interp)
        out[i] = r[..., None]
    return out


def jax_resize_single_channel(batch, size=(299, 299),
                              interp: str = "bilinear"):
    """(B, H, W) -> (B, 299, 299, 3) on device; antialiased resize — the
    jax.image equivalent of PIL's implementation ("linear" == PIL bilinear,
    "cubic" == PIL bicubic)."""
    import jax.numpy as jnp
    import jax.image
    method = "cubic" if interp == "bicubic" else "linear"
    out = jax.image.resize(batch, (batch.shape[0], size[1], size[0]),
                           method=method, antialias=True)
    return jnp.repeat(out[..., None], 3, axis=-1)
