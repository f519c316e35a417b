"""Latent/label samplers, sample sheets, interpolation, standing stats.

Functional analogs of the reference's sampling utilities:
  * ``sample_z``/``sample_y`` — the Distribution/prepare_z_y surface
    (reference: utils/__init__.py:41-158): z from normal / censored_normal
    / bernoulli, y categorical or a per-event permutation (the training
    default: every batch contains each sensor exactly once).
  * ``trunc_trick`` — rejection-resampled truncated z
    (utils/__init__.py:880-884) — re-exported from eval.fid.
  * ``sample_sheet`` / ``interp`` / ``interp_sheet``
    (utils/__init__.py:419-545).
  * ``generate_images`` — dump generated events as PNGs
    (utils/__init__.py:899-942; cv2 denoise path gated on cv2 presence).
  * ``accumulate_standing_stats`` (utils/__init__.py:278-296).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ieagan_tpu.eval.fid import trunc_trick  # noqa: F401  (re-export)


def sample_z(key, batch: int, dim_z: int, z_dist: str = "normal",
             z_var: float = 1.0, threshold: float = 1.0):
    """z sampler covering the reference's z_dist surface
    (utils/__init__.py:85-97)."""
    if z_dist == "normal":
        return jax.random.normal(key, (batch, dim_z)) * (z_var ** 0.5)
    if z_dist == "censored_normal":
        return jax.nn.relu(jax.random.normal(key, (batch, dim_z)) * (z_var ** 0.5))
    if z_dist == "bernoulli":
        return jax.random.bernoulli(key, 0.5, (batch, dim_z)).astype(jnp.float32)
    if z_dist == "truncated_normal":
        return trunc_trick(key, (batch, dim_z), bound=threshold)
    raise NotImplementedError(f"z_dist {z_dist!r}")


def sample_y(key, n_classes: int, events: int = 1, y_dist: str = "permuted"):
    """y sampler: 'permuted' gives each event a fresh permutation of all
    classes (the intra-event training contract, utils/__init__.py:98-106);
    'categorical' is iid classes."""
    if y_dist == "permuted":
        perms = [jax.random.permutation(jax.random.fold_in(key, i), n_classes)
                 for i in range(events)]
        return jnp.concatenate(perms).astype(jnp.int32)
    if y_dist == "categorical":
        return jax.random.randint(key, (n_classes * events,), 0, n_classes,
                                  dtype=jnp.int32)
    raise NotImplementedError(f"y_dist {y_dist!r}")


def _g_apply(G, params, state, z, y, key, train=False, accumulate=False,
             mutable=False):
    variables = {"params": params, **state}
    kwargs = dict(train=train, rngs={"rdof": key},
                  accumulate_standing=accumulate)
    if mutable:
        return G.apply(variables, z, y, mutable=list(state.keys()), **kwargs)
    return G.apply(variables, z, y, **kwargs)


def accumulate_standing_stats(G, params, state, config, key,
                              num_accumulations: int = 16):
    """Reset-and-accumulate standing BN statistics over fresh noise
    (reference: utils/__init__.py:278-296): run G in train mode with the
    accumulate flag; eval then divides by the counter."""
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    # reset: zero means/vars and counters in the batch_stats collection
    def reset(path, leaf):
        name = getattr(path[-1], "key", "")
        if name == "var":
            return jnp.zeros_like(leaf)  # accumulating raw sums
        if name in ("mean", "accumulation_counter"):
            return jnp.zeros_like(leaf)
        return leaf
    state = dict(state)
    state["batch_stats"] = jax.tree_util.tree_map_with_path(
        reset, state["batch_stats"])

    @jax.jit
    def step(state_bs, key):
        kz, ky, kr = jax.random.split(key, 3)
        z = jax.random.normal(kz, (es, dim_z))
        y = jax.random.randint(ky, (es,), 0, es, dtype=jnp.int32)
        st = dict(state, batch_stats=state_bs)
        _, ups = _g_apply(G, params, st, z, y, kr, train=True,
                         accumulate=True, mutable=True)
        return ups["batch_stats"]

    bs = state["batch_stats"]
    for i in range(num_accumulations):
        bs = step(bs, jax.random.fold_in(key, i))
    return dict(state, batch_stats=bs)


def sample_sheet(G, params, state, config, key, samples_per_class: int = 10):
    """Per-class sample sheet: (n_classes, samples_per_class, H-6, W) ADU
    (reference: utils/__init__.py:419-476 writes one sheet per class)."""
    from ieagan_tpu.ops.image_norm import denorm
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])

    @jax.jit
    def gen(key):
        kz, kr = jax.random.split(key)
        z = jax.random.normal(kz, (es, dim_z))
        y = jnp.arange(es, dtype=jnp.int32)
        return _g_apply(G, params, state, z, y, kr)

    sheets = []
    for i in range(samples_per_class):
        imgs = gen(jax.random.fold_in(key, i))
        sheets.append(np.asarray(denorm(imgs.astype(jnp.float32)))[..., 0])
    return np.stack(sheets, axis=1)  # (es, samples, H-6, W)


def interp(x0, x1, num_midpoints: int):
    """Linear interpolation grid (reference: utils/__init__.py:480-490):
    (B, ...) endpoints -> (B, num_midpoints+2, ...)."""
    lerp = jnp.linspace(0.0, 1.0, num_midpoints + 2)
    shape = (1, num_midpoints + 2) + (1,) * (x0.ndim - 1)
    lerp = lerp.reshape(shape)
    return x0[:, None] * (1.0 - lerp) + x1[:, None] * lerp


def interp_sheet(G, params, state, config, key, num_midpoints: int = 8,
                 fix_z: bool = False, fix_y: bool = True):
    """Latent-interpolation sheet (reference: utils/__init__.py:494-545).
    Returns (n_classes, num_midpoints+2, H-6, W) ADU images."""
    from ieagan_tpu.ops.image_norm import denorm
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    k0, k1, kr = jax.random.split(key, 3)
    if fix_z:
        z = jnp.tile(jax.random.normal(k0, (es, 1, dim_z)),
                     (1, num_midpoints + 2, 1))
    else:
        z = interp(jax.random.normal(k0, (es, dim_z)),
                   jax.random.normal(k1, (es, dim_z)), num_midpoints)
    y = jnp.arange(es, dtype=jnp.int32)
    y = jnp.tile(y[:, None], (1, num_midpoints + 2)).reshape(-1)
    imgs = _g_apply(G, params, state, z.reshape(-1, dim_z), y, kr)
    imgs = np.asarray(denorm(imgs.astype(jnp.float32)))[..., 0]
    return imgs.reshape(es, num_midpoints + 2, *imgs.shape[1:])


def generate_images(out_dir: str, G, params, state, config, key,
                    n_images: int):
    """Dump generated images as PNGs (reference:
    utils/__init__.py:899-942); trunc_z and denoise honored from config
    (denoise requires cv2 and degrades gracefully without it)."""
    from PIL import Image
    from ieagan_tpu.ops.image_norm import denorm
    es = int(config["n_classes"])
    dim_z = int(config["dim_z"])
    z_bound = float(config.get("trunc_z", 0.0) or 0.0)
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def gen(key):
        kz, kr = jax.random.split(key)
        if z_bound > 0.0:
            z = trunc_trick(kz, (es, dim_z), bound=z_bound)
        else:
            z = jax.random.normal(kz, (es, dim_z))
        y = jnp.arange(es, dtype=jnp.int32)
        return _g_apply(G, params, state, z, y, kr)

    denoise = bool(config.get("denoise", False))
    try:
        import cv2  # noqa: F401
    except ImportError:
        if denoise:
            print("cv2 unavailable; skipping denoise")
        denoise = False
    count = 0
    batch_idx = 0
    while count < n_images:
        imgs = np.asarray(denorm(gen(jax.random.fold_in(key, batch_idx))
                                 .astype(jnp.float32)))[..., 0]
        for img in imgs:
            if count >= n_images:
                break
            arr = img.astype(np.uint8)
            if denoise:
                import cv2
                arr = cv2.fastNlMeansDenoising(
                    src=arr, dst=None,
                    h=config.get("denoise_str_lum", 3),
                    templateWindowSize=config.get("denoise_kernel_size", 7),
                    searchWindowSize=config.get("denoise_search_window", 21))
            Image.fromarray(arr, mode="L").save(
                os.path.join(out_dir, f"image_{count:05d}.png"))
            count += 1
        batch_idx += 1
    return count
