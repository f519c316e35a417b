"""Batch normalization family: class-conditional BN, plain BN, standing stats.

Reference semantics reproduced (reference: layers.py:505-742):
  * train mode: normalize with batch moments over (N, H, W); running stats
    updated as ``running = (1-m)*running + m*batch`` with m=0.1 and the
    *unbiased* batch variance used for the running update (F.batch_norm
    semantics).
  * eval mode: normalize with running stats.
  * standing-stats mode (reference myBN, layers.py:547-599 +
    utils/__init__.py:278-296): accumulate sums of batch moments and a
    counter; eval divides by the counter.
  * ccbn (layers.py:622-694): gain = 1 + Linear(y), bias = Linear(y),
    per-sample, applied after the (unparameterized) normalization.

TPU-native notes: moments are computed in float32 over the *global* batch —
under jit with a data-sharded batch axis XLA lowers the mean to a psum over
ICI, which is exactly the cross-replica BN the reference flags but never
implements (layers.py:643-644, SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import flax.linen as nn

BN_COL = "batch_stats"


def _bn_core(mdl: nn.Module, x: jnp.ndarray, num_features: int, eps: float,
             momentum: float, train: bool, accumulate_standing: bool):
    """Normalize x (N,H,W,C) returning float32 normalized output; owns the
    running-stat variables."""
    ra_mean = mdl.variable(BN_COL, "mean", lambda: jnp.zeros((num_features,), jnp.float32))
    ra_var = mdl.variable(BN_COL, "var", lambda: jnp.ones((num_features,), jnp.float32))
    counter = mdl.variable(BN_COL, "accumulation_counter",
                           lambda: jnp.zeros((), jnp.float32))
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(xf, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
        var = mean2 - jnp.square(mean)
        if not mdl.is_initializing():
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            if accumulate_standing:
                # myBN standing stats: raw sums + counter (layers.py:577-580)
                ra_mean.value = ra_mean.value + mean
                ra_var.value = ra_var.value + var
                counter.value = counter.value + 1.0
            else:
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1 - momentum) * ra_var.value + momentum * unbiased
    else:
        denom = jnp.maximum(counter.value, 1.0) if accumulate_standing else 1.0
        mean = ra_mean.value / denom
        var = ra_var.value / denom
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf - mean) * inv


def group_norm(x, norm_style: str, eps: float = 1e-5):
    """Un-parameterized group norm with the reference's style-string parsing
    (reference: layers.py:603-614): 'ch_<n>' fixes channels/group,
    'grp_<n>' fixes group count, default 16 groups."""
    c = x.shape[-1]
    if "ch" in norm_style:
        groups = max(c // int(norm_style.split("_")[-1]), 1)
    elif "grp" in norm_style:
        groups = int(norm_style.split("_")[-1])
    else:
        groups = 16
    xf = x.astype(jnp.float32)
    shape = x.shape[:-1] + (groups, c // groups)
    xg = xf.reshape(shape)
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    out = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return out.reshape(x.shape)


class ClassCondBatchNorm(nn.Module):
    """ccbn: shared BN statistics + per-sample (class-conditional) gain/bias
    produced by linear maps of the conditioning vector (reference:
    layers.py:622-694). ``which_linear`` is SNDense(bias=False) in the
    G_shared configuration (reference: model.py:264-268)."""
    num_features: int
    which_linear: Callable
    eps: float = 1e-5
    momentum: float = 0.1
    norm_style: str = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = True, update_stats: bool = False,
                 accumulate_standing: bool = False):
        # gain = 1 + Linear(y), bias = Linear(y)  (layers.py:658-659)
        gain = 1.0 + self.which_linear(self.num_features, name="gain")(
            y, update_stats=update_stats).astype(jnp.float32)
        bias = self.which_linear(self.num_features, name="bias")(
            y, update_stats=update_stats).astype(jnp.float32)
        if self.norm_style == "bn":
            out = _bn_core(self, x, self.num_features, self.eps, self.momentum,
                           train, accumulate_standing)
        elif self.norm_style == "in":
            # instance norm: per-sample spatial moments (reference:
            # layers.py:674-684)
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
            out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        elif self.norm_style.startswith("gn") or "grp" in self.norm_style \
                or "ch" in self.norm_style:
            out = group_norm(x, self.norm_style, self.eps)
        elif self.norm_style == "nonorm":
            out = x.astype(jnp.float32)
        else:
            raise NotImplementedError(f"norm_style {self.norm_style!r}")
        gain = gain[:, None, None, :]
        bias = bias[:, None, None, :]
        return (out * gain + bias).astype(self.dtype)


class BatchNorm(nn.Module):
    """Plain BN with learned per-channel gain/bias (reference: layers.bn,
    layers.py:698-742). Used in G's output head."""
    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, accumulate_standing: bool = False):
        gain = self.param("gain", nn.initializers.ones, (self.num_features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
        out = _bn_core(self, x, self.num_features, self.eps, self.momentum,
                       train, accumulate_standing)
        return (out * gain + bias).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm in float32 (used by RRM blocks and D's embedding head,
    reference: RRM.py:94-95, model.py:798)."""
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(self.dtype)
