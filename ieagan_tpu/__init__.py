"""IEA-GAN/TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Baran-phys/IEA-GAN (Intra-Event Aware GAN with Relational
Reasoning for Efficient High-Resolution Detector Simulation).

This is a from-scratch TPU-first re-design, not a port: models are flax.linen
modules in NHWC layout with a bf16/fp32 dtype policy, the train step is a
single fused jitted function, parallelism is expressed with jax.sharding over
a device Mesh, and the attention hot paths have Pallas TPU kernels.

Layer map (mirrors reference SURVEY.md §1):
  core/      mesh & topology, dtype policy, RNG plumbing, config surface
  ops/       functional primitives: spectral norm, (cc)BN, attention, RRM,
             DiffAugment, data-domain norms; ops/pallas/ holds TPU kernels
  models/    Generator / Discriminator / arch tables / fused G-D helpers
  losses/    hinge, conditional-contrastive (2C), IEA attention-KL, uniformity
  train/     fused jitted GAN train step, EMA, ortho-reg, driver loop
  data/      event dataset (40 sensor images / event) + host pipeline
  eval/      clean-FID engine + physics-stats harness
  deploy/    generator-only inference module (basf2-twin) + producers
"""

__version__ = "0.1.0"

from ieagan_tpu.core.config import DEFAULT_CONFIG, load_config
