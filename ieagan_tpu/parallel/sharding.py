"""Sharding rules: data-parallel events + optional tensor-parallel widths.

The reference has no distributed training at all (SURVEY.md §2.2 — the
``--parallel`` flag is never wired up). Here parallelism is first-class and
expressed declaratively:

  * **data** axis: whole events (event_size images each) are sharded across
    devices. Gradients/BN moments become psums over ICI, inserted by XLA
    from the sharding annotations — there is no hand-written collective in
    the train step.
  * **model** axis (optional): output channels of the widest kernels are
    sharded (Megatron-style column split); XLA places all-gathers where the
    residual/shortcut structure needs them. The flagship model is small
    (~10-50M params) so tp is a scaling demonstrator, off by default.

Everything runs through one ``jax.jit`` with NamedShardings — the same fused
train step used single-chip.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1)


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False,
                    min_shard_dim: int = 64):
    """NamedShardings for a param pytree.

    With tensor_parallel, kernels whose output (last) axis is wide and
    divisible by the model-axis size are column-sharded; everything else is
    replicated.
    """
    tp = _model_axis_size(mesh)

    def rule(path, leaf):
        if (tensor_parallel and tp > 1 and hasattr(leaf, "ndim")
                and leaf.ndim >= 2 and leaf.shape[-1] % tp == 0
                and leaf.shape[-1] >= min_shard_dim):
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_shardings(mesh: Mesh):
    """Sharding for (B, ...) batch arrays: batch over the data axis."""
    return NamedSharding(mesh, P("data"))


def make_sharded_train_step(G, D, config, mesh: Mesh,
                            tensor_parallel: bool = False):
    """jit the fused train step over the mesh.

    Inputs (x, y, rng keys) are batch-sharded over "data"; state placement
    follows wherever the caller device_put it (replicated or tp-sharded) —
    jit propagates shardings from the operands.
    """
    from ieagan_tpu.train.step import make_train_step

    step = make_train_step(G, D, config)
    data_sh = batch_shardings(mesh)

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, x, y, rng):
        x = jax.device_put(x, data_sh)
        y = jax.device_put(y, data_sh)
        return jitted(state, x, y, rng)

    return run


def place_state(state, mesh: Mesh, tensor_parallel: bool = False):
    """device_put a TrainState: params (and their optimizer moments / EMA)
    per the tp rule, scalar state replicated."""
    def put_params(p):
        return jax.tree_util.tree_map(
            lambda leaf, sh: jax.device_put(leaf, sh), p,
            param_shardings(p, mesh, tensor_parallel))

    rep = replicate(mesh)
    return state.replace(
        params_G=put_params(state.params_G),
        params_D=put_params(state.params_D),
        params_G_ema=put_params(state.params_G_ema),
        state_G=jax.device_put(state.state_G, rep),
        state_D=jax.device_put(state.state_D, rep),
        opt_G=jax.device_put(state.opt_G, rep),
        opt_D=jax.device_put(state.opt_D, rep),
        itr=jax.device_put(state.itr, rep))
