"""Mesh & topology: the TPU-native communication layer.

The reference has *no* distributed backend (no torch.distributed / NCCL /
MPI anywhere — SURVEY.md §2.2); its ``--parallel`` flag is vestigial
(reference: train.py:580-583 is never wired to DataParallel). The TPU-native
equivalent is first-class here: a ``jax.sharding.Mesh`` over the chips with
named axes, ``NamedSharding`` annotations on the batch (event) axis, and XLA
collectives over ICI inserted by the compiler.

Axis conventions:
  "data"   — the event axis (each device holds whole events of `event_size`
             images; gradients all-reduce over ICI). Under jit's global-view
             semantics BatchNorm moments are computed over the *global*
             batch, so cross-replica BN (which the reference flags but never
             implements, reference: layers.py:643-644) falls out for free.
  "model"  — optional tensor-parallel axis for the widest convs/linears.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a Mesh with a "data" axis (and optional "model" axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def parse_mesh_spec(spec) -> tuple[int, int]:
    """Parse the ``mesh`` config key -> (n_data, n_model).

    Accepts a dict ({"data": N[, "model": M]}, the documented JSON form), a
    string ("NxM", "N", or "data:N,model:M"), or an int (pure data
    parallel). The CLI flag arrives as a string.
    """
    if isinstance(spec, dict):
        return int(spec.get("data", 1)), int(spec.get("model", 1))
    if isinstance(spec, int):
        return spec, 1
    s = str(spec).strip().lower()
    if ":" in s:  # "data:4,model:2"
        parts = dict(kv.split(":") for kv in s.split(","))
        return int(parts.get("data", 1)), int(parts.get("model", 1))
    if "x" in s:  # "4x2"
        a, b = s.split("x")
        return int(a), int(b)
    return int(s), 1


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays with a leading (event-)batch axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch-leading arrays onto the mesh's data axis."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
