"""Spectral normalization as functional state threaded through flax variables.

Semantics match the reference's SN implementation (reference: layers.py:89-165):
  * per-layer persistent left singular vector(s) ``u`` (shape (1, out)),
  * one (or ``num_itrs``) power-iteration step(s) per forward call,
  * Gram-Schmidt across ``num_svs`` tracked singular values,
  * ``u`` is written back only in train mode (reference: update=self.training,
    layers.py:158),
  * the singular-value estimate ``sv = v Wᵀ uᵀ`` carries gradient through W
    (u, v are stop-gradient), so ``W/sv`` has the standard SN gradient
    (reference: layers.py:109 is computed outside the no_grad block),
  * ``sv`` buffers are persisted for logging (reference: layers.py:161-164,
    consumed by utils.get_singular_values).

TPU notes: power iteration is two tiny matvecs per layer — negligible next to
the conv FLOPs, and XLA fuses the ``W * (1/sv)`` scale into the conv. All SN
math runs in float32 regardless of the compute policy.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# Collection name for SN state (u vectors + sv logging buffers).
SN_COL = "spectral"


def _l2normalize(v: jnp.ndarray, eps: float) -> jnp.ndarray:
    # F.normalize semantics: v / max(||v||, eps)  (reference: layers.py:97,103)
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def power_iteration(w_mat: jnp.ndarray, us: jnp.ndarray, n_itrs: int, eps: float):
    """Run power iteration(s) with Gram-Schmidt over tracked singular vectors.

    Args:
      w_mat: (out, k) weight matrix (float32).
      us: (num_svs, out) current left singular vectors.
      n_itrs: power iterations per call (reference num_itrs).
      eps: normalization epsilon.
    Returns:
      (svs, new_us): (num_svs,) singular-value estimates with grad through
      w_mat, and updated u vectors (stop-gradient).
    """
    w_ng = jax.lax.stop_gradient(w_mat)
    num_svs = us.shape[0]
    for _ in range(n_itrs):
        new_us, vs = [], []
        for i in range(num_svs):
            u = us[i]
            v = u @ w_ng  # (k,)
            for v_prev in vs:  # Gram-Schmidt (reference: layers.py:82-85)
                v = v - (v @ v_prev) * v_prev / jnp.maximum(v_prev @ v_prev, eps)
            v = _l2normalize(v, eps)
            u = v @ w_ng.T  # (out,)
            for u_prev in new_us:
                u = u - (u @ u_prev) * u_prev / jnp.maximum(u_prev @ u_prev, eps)
            u = _l2normalize(u, eps)
            vs.append(v)
            new_us.append(u)
        us = jnp.stack(new_us)
    # sv carries gradient through w_mat (u, v constant).
    vs = jax.lax.stop_gradient(jnp.stack(vs))
    us = jax.lax.stop_gradient(us)
    svs = jnp.einsum("sk,ok,so->s", vs, w_mat, us)
    return svs, us


def _sn_normalize(mdl: nn.Module, w_mat: jnp.ndarray, num_svs: int, num_itrs: int,
                  eps: float, update: bool):
    """Shared SN plumbing: variables, power iteration, conditional update."""
    out_dim = w_mat.shape[0]
    u_var = mdl.variable(SN_COL, "u", lambda: jax.random.normal(
        mdl.make_rng("params") if mdl.has_rng("params") else jax.random.PRNGKey(0),
        (num_svs, out_dim), jnp.float32))
    sv_var = mdl.variable(SN_COL, "sv", lambda: jnp.ones((num_svs,), jnp.float32))
    svs, new_us = power_iteration(w_mat, u_var.value, num_itrs, eps)
    if update and not mdl.is_initializing():
        u_var.value = new_us
        sv_var.value = jax.lax.stop_gradient(svs)
    return w_mat / svs[0]


def ortho_init(scale: float = 1.0) -> Callable:
    """Orthogonal init matching torch's init.orthogonal_ on the (out, fan_in)
    flattening (reference: model.py:438-439). For flax kernels (…, out) we
    orthogonalize columns of the (fan_in, out) flattening — same singular
    spectrum, layout-transposed."""
    return nn.initializers.orthogonal(scale, column_axis=-1)


class SNDense(nn.Module):
    """Linear layer with spectral norm (reference: SNLinear, layers.py:210-224)."""
    features: int
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = 1e-12
    dtype: Any = jnp.float32
    kernel_init: Callable = ortho_init()

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), jnp.float32)
        # torch W_mat = weight.view(out, -1); singular values are layout-invariant.
        w_bar = _sn_normalize(self, kernel.T, self.num_svs, self.num_itrs, self.eps,
                              update_stats).T
        y = jnp.dot(x.astype(self.dtype), w_bar.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SNConv(nn.Module):
    """2D conv (NHWC) with spectral norm (reference: SNConv2d, layers.py:169-206)."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = 1e-12
    dtype: Any = jnp.float32
    kernel_init: Callable = ortho_init()

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        kh, kw = self.kernel_size
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_features, self.features), jnp.float32)
        # torch flattening: (out, in*kh*kw); we use (out, kh*kw*in) — the
        # spectral norm of the flattened matrix is permutation-invariant in
        # the contracted axis, so normalization is identical.
        w_mat = kernel.reshape(-1, self.features).T
        w_bar = _sn_normalize(self, w_mat, self.num_svs, self.num_itrs, self.eps,
                              update_stats)
        kernel_bar = w_bar.T.reshape(kernel.shape)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel_bar.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=self.padding if isinstance(self.padding, str)
            else [(p, p) for p in self.padding],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SNEmbed(nn.Module):
    """Embedding with spectral norm (reference: SNEmbedding, layers.py:230-259).

    Note the reference normalizes over the (num_embeddings, dim) matrix with
    u of size num_embeddings (layers.py:256 passes num_embeddings as
    num_outputs) — matched here.
    """
    num_embeddings: int
    features: int
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = 1e-12
    dtype: Any = jnp.float32
    embedding_init: Callable = ortho_init()

    @nn.compact
    def __call__(self, y, update_stats: bool = False):
        emb = self.param("embedding", self.embedding_init,
                         (self.num_embeddings, self.features), jnp.float32)
        w_bar = _sn_normalize(self, emb, self.num_svs, self.num_itrs, self.eps,
                              update_stats)
        return jnp.take(w_bar.astype(self.dtype), y, axis=0)


class Dense(nn.Module):
    """Plain linear (no SN), call-compatible with SNDense.

    Used where the reference deliberately avoids SN: G's RRM internals
    (reference: model.py:305-313 passes nn.Linear) and G's shared embedding.
    """
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = ortho_init()

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        del update_stats
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Embed(nn.Module):
    """Plain embedding (no SN) with ortho init (reference: G's shared
    embedding, model.py:263 — 'applying SN to G's embedding seems to
    randomly cripple G')."""
    num_embeddings: int
    features: int
    dtype: Any = jnp.float32
    embedding_init: Callable = ortho_init()

    @nn.compact
    def __call__(self, y, update_stats: bool = False):
        del update_stats
        emb = self.param("embedding", self.embedding_init,
                         (self.num_embeddings, self.features), jnp.float32)
        return jnp.take(emb.astype(self.dtype), y, axis=0)
