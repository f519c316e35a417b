"""Differentiable augmentation, pure-functional with explicit PRNG keys.

DiffAugment policy "color,translation,cutout" (reference: diff_aug.py:10-109,
policy hardcoded at model.py:971) and CR consistency augmentation
(reference: cr_diff_aug.py:11-63). Layout NHWC; all randomness comes from the
caller's key so the step stays jittable and reproducible.

Note the reference applies DiffAugment to *generated* images only (reference:
model.py:977-978 — real images reach D unaugmented); the train step preserves
that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = x.shape[0]
    r = jax.random.uniform(key, (b, 1, 1, 1), dtype=x.dtype) - 0.5
    return x + r


def rand_saturation(key, x):
    b = x.shape[0]
    x_mean = jnp.mean(x, axis=-1, keepdims=True)
    r = jax.random.uniform(key, (b, 1, 1, 1), dtype=x.dtype) * 2.0
    return (x - x_mean) * r + x_mean


def rand_contrast(key, x):
    b = x.shape[0]
    x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    r = jax.random.uniform(key, (b, 1, 1, 1), dtype=x.dtype) + 0.5
    return (x - x_mean) * r + x_mean


def _gather_hw(x_pad, idx_h, idx_w):
    """out[b,i,j,c] = x_pad[b, idx_h[b,i], idx_w[b,j], c] via per-sample takes."""
    def one(xb, ih, iw):
        return jnp.take(jnp.take(xb, ih, axis=0), iw, axis=1)
    return jax.vmap(one)(x_pad, idx_h, idx_w)


def rand_translation(key, x, ratio: float = 0.125):
    """Per-sample integer shift with zero padding (reference: diff_aug.py:46-69).
    The reference pads by 1 and clamps the shifted grid into the pad cells,
    i.e. zero-fill for out-of-range pixels — reproduced exactly."""
    b, h, w, _ = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    t_h = jax.random.randint(kh, (b, 1), -shift_h, shift_h + 1)
    t_w = jax.random.randint(kw, (b, 1), -shift_w, shift_w + 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    idx_h = jnp.clip(jnp.arange(h)[None, :] + t_h + 1, 0, h + 1)
    idx_w = jnp.clip(jnp.arange(w)[None, :] + t_w + 1, 0, w + 1)
    return _gather_hw(x_pad, idx_h, idx_w)


def rand_cutout(key, x, ratio: float = 0.5):
    """Per-sample rectangular zero mask (reference: diff_aug.py:72-102)."""
    b, h, w, _ = x.shape
    cut_h = int(h * ratio + 0.5)
    cut_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    off_h = jax.random.randint(kh, (b, 1, 1), 0, h + (1 - cut_h % 2))
    off_w = jax.random.randint(kw, (b, 1, 1), 0, w + (1 - cut_w % 2))
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    # Clamped-grid zero set == intersection of the box with the image.
    in_h = (rows >= off_h - cut_h // 2) & (rows < off_h - cut_h // 2 + cut_h)
    in_w = (cols >= off_w - cut_w // 2) & (cols < off_w - cut_w // 2 + cut_w)
    mask = 1.0 - (in_h & in_w).astype(x.dtype)
    return x * mask[..., None]


_AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}


def diff_augment(key, x, policy: str = "color,translation,cutout"):
    """Apply the DiffAugment policy chain (reference: diff_aug.py:10-20)."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in _AUGMENT_FNS[p]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x


def random_flip(key, x, p: float = 0.5):
    b = x.shape[0]
    flip = jax.random.uniform(key, (b, 1, 1, 1)) < p
    return jnp.where(flip, jnp.flip(x, axis=2), x)


def random_translation_reflect(key, x, ratio: float = 1.0 / 8.0):
    """Reflect-padded per-sample translation (reference: cr_diff_aug.py:38-63)."""
    b, h, w, _ = x.shape
    max_h, max_w = int(h * ratio), int(w * ratio)
    kh, kw = jax.random.split(key)
    t_h = jax.random.randint(kh, (b, 1), -max_h, max_h + 1)
    t_w = jax.random.randint(kw, (b, 1), -max_w, max_w + 1)
    x_pad = jnp.pad(x, ((0, 0), (max_h, max_h), (max_w, max_w), (0, 0)),
                    mode="reflect")
    idx_h = jnp.arange(h)[None, :] + t_h + max_h
    idx_w = jnp.arange(w)[None, :] + t_w + max_w
    return _gather_hw(x_pad, idx_h, idx_w)


def cr_diff_augment(key, x, flip: bool = True, translation: bool = True):
    """Consistency-regularization augmentation (reference: cr_diff_aug.py:11-18)."""
    if flip:
        key, sub = jax.random.split(key)
        x = random_flip(sub, x)
    if translation:
        key, sub = jax.random.split(key)
        x = random_translation_reflect(sub, x)
    return x
