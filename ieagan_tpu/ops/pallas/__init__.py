"""Pallas TPU kernels — the framework's native layer.

Where the reference leaned on cuDNN, the TPU build's "native code" is Pallas
(plus XLA codegen). Kernels here are gated on platform: on TPU they run
compiled Mosaic kernels, elsewhere callers fall back to reference-semantics
XLA implementations.
"""

from ieagan_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_available,
)
