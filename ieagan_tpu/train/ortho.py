"""Modified orthogonal regularization as a gradient transform.

The reference mutates ``param.grad`` in-place after backward (reference:
utils/__init__.py:843-859): for every >=2-D weight W (viewed as (out, fan_in))
    grad += strength * 2 * ((W Wᵀ) ⊙ (1 - I)) W
with G's shared embedding blacklisted (reference: train_fns.py:185-188).

Here it is a pure function grads' = f(grads, params) applied between autodiff
and the optimizer. Flax kernels store the output axis last; we flatten to
(out, fan_in) by transposing the trailing axis out — the Gram matrix is
invariant to the fan-in flattening order, so the regularizer matches the
reference's torch-layout computation exactly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _ortho_grad(w: jnp.ndarray) -> jnp.ndarray:
    out_dim = w.shape[-1]
    w_mat = w.reshape(-1, out_dim).T  # (out, fan_in)
    gram = w_mat @ w_mat.T
    gram = gram * (1.0 - jnp.eye(out_dim, dtype=w.dtype))
    g = 2.0 * (gram @ w_mat)  # (out, fan_in)
    return g.T.reshape(w.shape)


def _default_ortho_grad(w: jnp.ndarray) -> jnp.ndarray:
    # default (non-modified) variant (reference: utils/__init__.py:865-877)
    out_dim = w.shape[-1]
    w_mat = w.reshape(-1, out_dim).T
    gram = w_mat @ w_mat.T - jnp.eye(out_dim, dtype=w.dtype)
    return (2.0 * (gram @ w_mat)).T.reshape(w.shape)


def apply_ortho_reg(grads, params, strength: float,
                    blacklist: Callable[[tuple], bool] | None = None,
                    modified: bool = True):
    """Return grads with ortho-reg added for >=2-D params.

    blacklist: predicate over the param path (tuple of DictKey) returning
    True to skip (e.g. G's shared embedding).
    """
    if strength <= 0.0:
        return grads
    fn = _ortho_grad if modified else _default_ortho_grad

    def one(path, g, p):
        if p.ndim < 2:
            return g
        if blacklist is not None and blacklist(path):
            return g
        return g + strength * fn(p.astype(g.dtype))

    return jax.tree_util.tree_map_with_path(one, grads, params)


def shared_blacklist(path) -> bool:
    """Skip G's shared class embedding (reference: train_fns.py:187-188)."""
    return any(getattr(k, "key", None) == "shared" for k in path)
