"""Relational Reasoning Module: pre-LN transformer over the intra-event axis.

Reference behavior (reference: RRM.py:10-133):
  * MultiheadAttention with a fused qkv projection, 1/sqrt(d_k) scaling,
    softmax over the (fixed, 40-long) event axis;
  * pre-LN EncoderBlock: x + attn(LN(x)); x + mlp(LN(x)); dropout (0.0 in
    all configs) omitted;
  * RelationalReasoning: num_layers encoder blocks + final LayerNorm.

The projection layers use the caller's ``which_linear``: plain Dense in G's
proxy RRM (reference: model.py:305-313), SNDense in D's embedding RRM
(reference: model.py:788-798).

The sequence axis is the event (40 sensors); attention is O(40²) and runs as
one fused XLA softmax-matmul (or the Pallas fused kernel when enabled).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import flax.linen as nn

from ieagan_tpu.ops.attention import dot_softmax_attention
from ieagan_tpu.ops.norm import LayerNorm


class MultiheadSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int
    which_linear: Callable
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False, return_attention: bool = False):
        b, s, _ = x.shape
        head_dim = self.embed_dim // self.num_heads
        qkv = self.which_linear(3 * self.embed_dim, name="qkv_proj")(
            x, update_stats=update_stats)
        # (b, s, heads, 3*hd) -> (b, heads, s, hd) x3. This matches the
        # reference's per-head chunking of the packed projection
        # (RRM.py:49-53); the weight layout differs but the function class
        # is identical.
        qkv = qkv.reshape(b, s, self.num_heads, 3 * head_dim).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / float(head_dim) ** 0.5
        if return_attention:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            attn = nn.softmax(logits, axis=-1)
            values = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        else:
            attn = None
            values = dot_softmax_attention(q, k, v, scale=scale,
                                           use_pallas=self.use_pallas)
        values = values.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)
        o = self.which_linear(self.embed_dim, name="o_proj")(
            values, update_stats=update_stats)
        if return_attention:
            return o, attn
        return o


class EncoderBlock(nn.Module):
    input_dim: int
    num_heads: int
    dim_feedforward: int
    which_linear: Callable
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        attn = MultiheadSelfAttention(self.input_dim, self.num_heads,
                                      self.which_linear, dtype=self.dtype,
                                      use_pallas=self.use_pallas, name="self_attn")
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + attn(h, update_stats=update_stats)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = self.which_linear(self.dim_feedforward, name="linear1")(
            h, update_stats=update_stats)
        h = nn.relu(h)
        h = self.which_linear(self.input_dim, name="linear2")(
            h, update_stats=update_stats)
        return x + h


class RelationalReasoning(nn.Module):
    """Stack of encoder blocks + final LayerNorm (reference: RRM.py:112-125)."""
    num_layers: int
    input_dim: int
    num_heads: int
    dim_feedforward: int
    which_linear: Callable
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        for i in range(self.num_layers):
            x = EncoderBlock(self.input_dim, self.num_heads, self.dim_feedforward,
                             self.which_linear, dtype=self.dtype,
                             use_pallas=self.use_pallas, name=f"layers_{i}")(
                                 x, update_stats=update_stats)
        return LayerNorm(dtype=self.dtype, name="norm")(x)
