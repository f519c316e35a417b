"""Dtype policy: bf16 compute on the MXU, fp32 parameters and statistics.

The reference's mixed-precision story is vestigial (``G_fp16`` flags and a
custom ``Adam16`` that is immediately overwritten by plain Adam, reference:
model.py:398-416, utils/__init__.py:729-803). On TPU the correct design is a
policy: parameters/optimizer state in float32, matmul/conv compute in
bfloat16, reductions (BN moments, losses, attention softmax) in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)


_POLICIES = {
    "bfloat16": Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
    "float32": Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32),
}


def get_policy(name: str = "bfloat16") -> Policy:
    if name not in _POLICIES:
        raise ValueError(f"unknown compute dtype policy {name!r}")
    return _POLICIES[name]
