"""Sharding rules: data-parallel events + optional tensor-parallel widths.

The reference has no distributed training at all (SURVEY.md §2.2 — the
``--parallel`` flag is never wired up). Here parallelism is first-class and
expressed declaratively:

  * **data** axis: whole events (event_size images each) are sharded across
    devices. Gradients/BN moments become psums over ICI, inserted by XLA
    from the sharding annotations — there is no hand-written collective in
    the train step.
  * **model** axis (optional): output channels of the widest kernels are
    sharded (Megatron-style column split), and the closing layer of known
    back-to-back pairs (transformer MLP / attention projections) is
    row-sharded so each pair costs one all-reduce rather than per-layer
    all-gathers; XLA places the remaining collectives where the
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


# Second members of known back-to-back linear pairs (RRM transformer MLP
# linear1->linear2, attention qkv_proj->o_proj, SA-GAN theta/phi/g->o —
# ops/rrm.py:40-85, ops/attention.py). Their INPUT (contracting) axis is
# sharded (Megatron row split) so the column-sharded producer's activation
# flows through the pair still sharded, and GSPMD inserts ONE all-reduce at
# the row layer's output instead of an all-gather after every column layer.
_ROW_SHARD_NAMES = frozenset({"linear2", "o_proj", "o"})


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False,
                    min_shard_dim: int = 64):
    """NamedShardings for a param pytree.

    With tensor_parallel, kernels whose output (last) axis is wide and
    divisible by the model-axis size are column-sharded — except the second
    member of a known linear pair (``_ROW_SHARD_NAMES``), whose input
    (contracting) axis is row-sharded instead. Everything else (biases,
    norm scales, narrow kernels) is replicated.
    """
    tp = _model_axis_size(mesh)

    def rule(path, leaf):
        if not (tensor_parallel and tp > 1 and hasattr(leaf, "ndim")
                and leaf.ndim >= 2):
            return NamedSharding(mesh, P())
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        # Row split: kernel of a pair-closing layer, contracting axis wide.
        # Axis -2 is the input axis for both Dense (I, O) and conv HWIO.
        if (len(names) >= 2 and names[-1] == "kernel"
                and names[-2] in _ROW_SHARD_NAMES
                and leaf.shape[-2] % tp == 0
                and leaf.shape[-2] >= min_shard_dim):
            spec = [None] * leaf.ndim
            spec[-2] = "model"
            return NamedSharding(mesh, P(*spec))
        # Column split (default): output axis wide.
        if leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= min_shard_dim:
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def batch_shardings(mesh: Mesh):
    """Sharding for (B, ...) batch arrays: batch over the data axis."""
    return NamedSharding(mesh, P("data"))


def make_sharded_train_step(G, D, config, mesh: Mesh,
                            tensor_parallel: bool = False,
                            steps_per_epoch: int = 0,
                            device_transform: bool = False):
    """jit the fused train step over the mesh.

    Inputs (x, y, rng keys) are batch-sharded over "data"; state placement
    follows wherever the caller device_put it (replicated or tp-sharded) —
    jit propagates shardings from the operands. With ``device_transform``
    the raw-uint8 pad/lognorm/noise chain is fused in front of the step
    (same contract as the driver's single-chip path).
    """
    from ieagan_tpu.train.step import make_train_step
    from ieagan_tpu.parallel.distributed import host_local_batch

    step = make_train_step(G, D, config, steps_per_epoch)
    data_sh = batch_shardings(mesh)

    if device_transform:
        from ieagan_tpu.ops.image_norm import device_event_transform

        def step_with_transform(state, raw, y, rng):
            rng, kn = jax.random.split(rng)
            return step(state, device_event_transform(raw, kn), y, rng)

        jitted = jax.jit(step_with_transform, donate_argnums=(0,))
    else:
        jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, x, y, rng):
        # host batches -> globally sharded arrays (multi-process: x/y are
        # this process's local events; single: a plain device_put)
        if not (isinstance(x, jax.Array) and x.sharding == data_sh):
            x, y = host_local_batch(data_sh, np.asarray(x), np.asarray(y))
        return jitted(state, x, y, rng)

    return run


def place_state(state, mesh: Mesh, tensor_parallel: bool = False):
    """device_put a TrainState: params, their optimizer moments, and the EMA
    copy per the tp rule; scalar/norm state replicated.

    The tp rule is purely shape-based, so applying ``param_shardings`` to the
    optimizer state pytree shards Adam's mu/nu mirrors exactly like their
    params (its scalar leaves — step counts — fall through to replicated);
    anything else would force XLA to reshard moments every update and keep
    full-size moment copies per device.
    """
    multiprocess = jax.process_count() > 1

    def put_leaf(leaf, sh):
        if not multiprocess:
            return jax.device_put(leaf, sh)
        # Multi-process: every process holds the full host value (same-seed
        # init / broadcast checkpoint); each fills only its addressable
        # shards. device_put would instead run a per-leaf cross-process
        # assert_equal collective.
        leaf = np.asarray(leaf)
        return jax.make_array_from_callback(leaf.shape, sh,
                                            lambda idx: leaf[idx])

    def put_tree(p):
        return jax.tree_util.tree_map(
            put_leaf, p, param_shardings(p, mesh, tensor_parallel))

    rep = replicate(mesh)

    def put_rep(p):
        return jax.tree_util.tree_map(lambda l: put_leaf(l, rep), p)

    return state.replace(
        params_G=put_tree(state.params_G),
        params_D=put_tree(state.params_D),
        params_G_ema=put_tree(state.params_G_ema),
        state_G=put_rep(state.state_G),
        state_D=put_rep(state.state_D),
        state_G_ema=put_rep(state.state_G_ema),
        opt_G=put_tree(state.opt_G),
        opt_D=put_tree(state.opt_D),
        itr=put_rep(state.itr))
