"""Attention variants: SA-GAN image self-attention, CBAM, ILA linear attention.

Reference behaviors (reference: layers.py:262-501):
  * ``SelfAttention2d`` == SA-GAN ``Attention``: 1x1 SN convs for
    theta/phi/g/o (no bias), phi/g max-pooled 2x2, softmax over kv WITHOUT
    1/sqrt(d) scaling (layers.py:293), residual with learnable scalar gamma
    initialized to 0 (layers.py:281).
  * ``CBAMAttention`` == CBAM channel+spatial attention (layers.py:395-434).
  * ``ILA`` == image linear attention (layers.py:437-501).

The quadratic softmax attention can route through a Pallas fused kernel on
TPU (ops/pallas/flash_attention.py) to avoid materializing the (B, HW, HW/4)
score matrix in HBM; the XLA path below is the reference-semantics fallback
used on CPU and in tests.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from ieagan_tpu.ops import pallas as pallas_ops


def _max_pool_2x2(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def dot_softmax_attention(q, k, v, scale: float = 1.0, use_pallas: bool = False):
    """softmax(scale * q kᵀ) v over the last-but-one (sequence) axis.

    q: (..., Lq, dk), k: (..., Lkv, dk), v: (..., Lkv, dv) -> (..., Lq, dv).
    Softmax statistics in float32.
    """
    if use_pallas and pallas_ops.flash_attention_available():
        return pallas_ops.flash_attention(q, k, v, scale=scale)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class SelfAttention2d(nn.Module):
    """SA-GAN self-attention over an NHWC feature map."""
    ch: int
    which_conv: Callable  # partial building an SNConv given features/kernel
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, y=None, train: bool = True, update_stats: bool = False):
        del y, train
        b, h, w, _ = x.shape
        conv = lambda feats, name: self.which_conv(
            features=feats, kernel_size=(1, 1), use_bias=False, name=name)
        theta = conv(self.ch // 8, "theta")(x, update_stats=update_stats)
        phi = _max_pool_2x2(conv(self.ch // 8, "phi")(x, update_stats=update_stats))
        g = _max_pool_2x2(conv(self.ch // 2, "g")(x, update_stats=update_stats))
        q = theta.reshape(b, h * w, self.ch // 8)
        k = phi.reshape(b, (h * w) // 4, self.ch // 8)
        v = g.reshape(b, (h * w) // 4, self.ch // 2)
        # NOTE: no 1/sqrt(d) scaling, matching reference layers.py:293.
        o = dot_softmax_attention(q, k, v, scale=1.0, use_pallas=self.use_pallas)
        o = conv(self.ch, "o")(o.reshape(b, h, w, self.ch // 2),
                               update_stats=update_stats)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return (gamma.astype(x.dtype) * o + x).astype(self.dtype)


class CBAMAttention(nn.Module):
    """CBAM channel + spatial attention (reference: layers.py:395-434)."""
    ch: int
    which_conv: Callable
    reduction: int = 8
    attention_kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = True, update_stats: bool = False):
        del y, train
        conv = lambda feats, ksize, name: self.which_conv(
            features=feats, kernel_size=(ksize, ksize), name=name)
        fc1 = conv(self.ch // self.reduction, 1, "fc1")
        fc2 = conv(self.ch, 1, "fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        avg = fc2(nn.relu(fc1(avg, update_stats=update_stats)), update_stats=update_stats)
        mx = fc2(nn.relu(fc1(mx, update_stats=update_stats)), update_stats=update_stats)
        ch_gate = jax.nn.sigmoid(avg + mx)
        x = x * ch_gate
        sp = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                              jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        sp_gate = jax.nn.sigmoid(
            conv(1, self.attention_kernel_size, "conv_after_concat")(
                sp, update_stats=update_stats))
        return (x * sp_gate).astype(self.dtype)


class ILA(nn.Module):
    """Image linear attention (reference: layers.py:437-501). Plain (non-SN)
    1x1 convs as in the reference's nn.Conv2d usage."""
    ch: int
    key_dim: int = 32
    value_dim: int = 64
    heads: int = 8
    norm_queries: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = True, update_stats: bool = False):
        del y, train, update_stats
        b, h, w, _ = x.shape
        conv = lambda feats, name: nn.Conv(feats, (1, 1), use_bias=True,
                                           dtype=self.dtype, name=name)
        q = conv(self.key_dim * self.heads, "to_q")(x)
        k = conv(self.key_dim * self.heads, "to_k")(x)
        v = conv(self.value_dim * self.heads, "to_v")(x)
        n = h * w
        reshape = lambda t, d: t.reshape(b, n, self.heads, d).transpose(0, 2, 3, 1)
        q = reshape(q, self.key_dim)   # (b, heads, dk, n)
        k = reshape(k, self.key_dim)
        v = reshape(v, self.value_dim)
        scale = self.key_dim ** -0.25
        q, k = q * scale, k * scale
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1).astype(x.dtype)
        if self.norm_queries:
            q = jax.nn.softmax(q.astype(jnp.float32), axis=-2).astype(x.dtype)
        context = jnp.einsum("bhdn,bhen->bhde", k, v)
        out = jnp.einsum("bhdn,bhde->bhen", q, context)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, -1)
        return conv(self.ch, "to_out")(out).astype(self.dtype)
