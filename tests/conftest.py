"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster"
(SURVEY.md §4): jax is forced onto the CPU backend with 8 virtual devices so
Mesh/pjit/collective paths compile and execute without TPU hardware.

Must run before any jax backend initialization, hence the config.update here
(the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
environment).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA:CPU compiles of the fused train step are
# slow; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

