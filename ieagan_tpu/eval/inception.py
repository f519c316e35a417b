"""InceptionV3 feature extractor for clean-FID, in flax (NHWC).

The reference's FID backbone is a torchscript InceptionV3 finetuned on the
40 PXD sensor classes ("inception_V3_best.pt", reference:
mycleanfid/fid.py:33-64 — the weights blob is a missing git-LFS artifact;
its minting recipe is notebooks/Inception_re-training.ipynb: timm
``inception_v3`` with a 40-class head, features = 2048-d average-pooled
``forward_features``).

This module implements the torchvision/timm inception_v3 graph exactly
(module names match), so weights can be converted from any torch state dict
via ``convert_torch_state_dict`` — the finetuned blob, torchvision
ImageNet weights, or a re-finetune from scripts/finetune_inception.py.
Without weights, a seeded random init gives deterministic random-projection
features (documented fallback; FID deltas remain comparable run-to-run).

Input contract matches the reference: (B, 299, 299, 3) floats in [0, 1],
no normalization inside (reference: fid.py:60-62 — normalization commented
out), output (B, 2048) pooled features.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps=1e-3, frozen running stats) + relu."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        # He init so the *random-init fallback* extractor keeps activation
        # variance through the 17-layer relu stack (lecun init collapses the
        # pooled features to near-constants, making fallback FID blind);
        # converted torch weights overwrite this.
        x = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad, use_bias=False,
                    kernel_init=nn.initializers.he_normal(),
                    dtype=self.dtype, name="conv")(x)
        # Inference-only BN: scale/bias/mean/var all converted weights.
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-3) * scale
        x = x * inv + (bias - mean * inv)
        return nn.relu(x)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, p, name: BasicConv2d(f, k, padding=p, dtype=self.dtype,
                                              name=name)
        b1 = c(64, (1, 1), (0, 0), "branch1x1")(x)
        b5 = c(48, (1, 1), (0, 0), "branch5x5_1")(x)
        b5 = c(64, (5, 5), (2, 2), "branch5x5_2")(b5)
        b3 = c(64, (1, 1), (0, 0), "branch3x3dbl_1")(x)
        b3 = c(96, (3, 3), (1, 1), "branch3x3dbl_2")(b3)
        b3 = c(96, (3, 3), (1, 1), "branch3x3dbl_3")(b3)
        bp = c(self.pool_features, (1, 1), (0, 0), "branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        c = lambda f, k, p, name: BasicConv2d(f, k, padding=p, dtype=self.dtype,
                                              name=name)
        b1 = c(192, (1, 1), (0, 0), "branch1x1")(x)
        b7 = c(c7, (1, 1), (0, 0), "branch7x7_1")(x)
        b7 = c(c7, (1, 7), (0, 3), "branch7x7_2")(b7)
        b7 = c(192, (7, 1), (3, 0), "branch7x7_3")(b7)
        bd = c(c7, (1, 1), (0, 0), "branch7x7dbl_1")(x)
        bd = c(c7, (7, 1), (3, 0), "branch7x7dbl_2")(bd)
        bd = c(c7, (1, 7), (0, 3), "branch7x7dbl_3")(bd)
        bd = c(c7, (7, 1), (3, 0), "branch7x7dbl_4")(bd)
        bd = c(192, (1, 7), (0, 3), "branch7x7dbl_5")(bd)
        bp = c(192, (1, 1), (0, 0), "branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, s, p, name: BasicConv2d(f, k, strides=s, padding=p,
                                                 dtype=self.dtype, name=name)
        b3 = c(192, (1, 1), (1, 1), (0, 0), "branch3x3_1")(x)
        b3 = c(320, (3, 3), (2, 2), (0, 0), "branch3x3_2")(b3)
        b7 = c(192, (1, 1), (1, 1), (0, 0), "branch7x7x3_1")(x)
        b7 = c(192, (1, 7), (1, 1), (0, 3), "branch7x7x3_2")(b7)
        b7 = c(192, (7, 1), (1, 1), (3, 0), "branch7x7x3_3")(b7)
        b7 = c(192, (3, 3), (2, 2), (0, 0), "branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, p, name: BasicConv2d(f, k, padding=p, dtype=self.dtype,
                                              name=name)
        b1 = c(320, (1, 1), (0, 0), "branch1x1")(x)
        b3 = c(384, (1, 1), (0, 0), "branch3x3_1")(x)
        b3 = jnp.concatenate([
            c(384, (1, 3), (0, 1), "branch3x3_2a")(b3),
            c(384, (3, 1), (1, 0), "branch3x3_2b")(b3)], axis=-1)
        bd = c(448, (1, 1), (0, 0), "branch3x3dbl_1")(x)
        bd = c(384, (3, 3), (1, 1), "branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            c(384, (1, 3), (0, 1), "branch3x3dbl_3a")(bd),
            c(384, (3, 1), (1, 0), "branch3x3dbl_3b")(bd)], axis=-1)
        bp = c(192, (1, 1), (0, 0), "branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """forward_features + global average pool -> (B, 2048)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)


def init_feature_params(seed: int = 0):
    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    # jitted: one dispatch instead of per-op round trips over the tunnel
    return model, jax.jit(
        lambda: model.init(jax.random.PRNGKey(seed), x))()["params"]


def convert_torch_state_dict(sd: dict) -> dict:
    """Convert a torchvision/timm inception_v3 state dict (tensors or numpy)
    into this module's params pytree. Keys like
    ``Mixed_5b.branch1x1.conv.weight`` / ``...bn.running_mean`` map to
    ``Mixed_5b/branch1x1/{conv/kernel, bn_*}``."""
    params: dict = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf, np.float32)

    for key, val in sd.items():
        val = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            # (O, I, kh, kw) -> (kh, kw, I, O)
            put(parts[:-2] + ["conv", "kernel"], val.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(parts[-1])
            if name:
                put(parts[:-2] + [name], val)
        # fc head ignored (features only)
    return params
