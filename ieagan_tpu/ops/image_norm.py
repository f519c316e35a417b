"""Data-domain normalization transforms (reference: utils/norm.py:8-46).

The detector images are log-ADU transformed: pixel values in [0,255] ADU map
through log(255x+1)/log(256) (x in [0,1]) and are trained in [-1,1]. The
inverse (denorm) is 256^x - 1 with a clamp and the 256->250 row crop.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG256 = math.log(256.0)


def lognorm255(x):
    """[0,1] -> [0,1] log transform (reference: utils/norm.py:8-19)."""
    return jnp.log(255.0 * x + 1.0) / _LOG256


def lognorm(x):
    """uint8-range [0,255] -> [0,1] (reference: utils/norm.py:22-31)."""
    return jnp.log(x + 1.0) / _LOG256


def denorm(x):
    """Model output [-1,1] (N,H,W,1) -> ADU [0,255] with row crop 3:-3
    (reference: utils/norm.py:34-46, NCHW there)."""
    out = x * 0.5 + 0.5
    out = jnp.clip(jnp.power(256.0, out) - 1.0, 0.0, 255.0)
    return out[:, 3:-3, :, :]


def generate_postprocess(imgs, threshold: float = -0.26):
    """The deployment postprocess contract (reference: model.py:1140-1148 /
    ieagan.py:1343-1366): threshold low amplitudes to -1 ("cut the noise
    below 7 ADU"), map to ADU, crop rows, squeeze channel.

    imgs: (N, 256, W, 1) in [-1, 1] -> (N, 250, W) in [0, 255].
    """
    imgs = jnp.where(imgs > threshold, imgs, -1.0)
    imgs = imgs * 0.5 + 0.5
    imgs = jnp.clip(jnp.power(256.0, imgs) - 1.0, 0.0, 255.0)
    return imgs[:, 3:-3, :, 0]


def device_event_transform(raw_u8, key, noise_scale: float = 4e-3,
                           pad: int = 3):
    """Jittable twin of data/dataset.py::event_transform_stack: raw uint8
    sensor images (B, H, W) -> (B, H+2*pad, W, 1) float32 in [-1, 1].

    Enables uint8 uploads (4x less host->device traffic than f32) with the
    pad/lognorm255/noise/normalize chain fused into the jitted train step.
    The U[0, noise_scale) pixel noise draws from the jax key instead of the
    host numpy stream (same distribution; config key: device_transform).
    """
    import jax
    x = raw_u8.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = 2.0 * (jnp.log(x + 1.0) / _LOG256) - 1.0
    if noise_scale:
        out = out + (2.0 * noise_scale) * jax.random.uniform(
            key, out.shape, jnp.float32)
    return out[..., None]
