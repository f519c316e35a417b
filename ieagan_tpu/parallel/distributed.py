"""Multi-host runtime: process bootstrap + host-local -> global arrays.

The reference is strictly single-process/single-GPU (SURVEY.md §2.2; its
``--parallel`` flag is never wired, reference: train.py:580-583). The
TPU-native multi-host story is the standard JAX one:

  * every process calls :func:`initialize` (a thin, idempotent wrapper over
    ``jax.distributed.initialize``) — on TPU pods the coordinator/topology
    are auto-detected from the environment, elsewhere they are passed
    explicitly;
  * a single global ``Mesh`` spans all processes' devices;
  * each process loads only its slice of the dataset
    (``EventLoader(process_index=..., process_count=...)``) and assembles
    globally-sharded batches with :func:`host_local_batch` — XLA then runs
    the one fused train step SPMD with gradient/BN psums over ICI.
"""

from __future__ import annotations

import jax
import numpy as np

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no arguments this is what a TPU pod slice wants (auto-detection
    from the TPU metadata/env). On CPU/GPU fleets pass the coordinator
    explicitly. Calling it twice, or in a plain single-process run with no
    coordinator configured, is a no-op.
    """
    global _initialized
    if _initialized:
        return
    import os
    # TPU_WORKER_HOSTNAMES counts as a pod signal only with >1 host:
    # single-host runtimes (including this machine's tunnel shim) set it
    # to one hostname, and jax.distributed.initialize would then demand a
    # coordinator_address it has no way to derive.
    worker_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = "," in worker_hosts
    if (coordinator_address is None and num_processes is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "COORDINATOR_ADDRESS" not in os.environ
            and not multi_worker
            and not os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        # nothing to coordinate with — single-process run
        return
    # explicit env-var topology (CPU/GPU fleets and the multihost dryrun;
    # TPU pods auto-detect everything from the TPU metadata)
    if coordinator_address is None:
        coordinator_address = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                               or os.environ.get("COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def host_local_batch(sharding, *arrays):
    """Assemble global jax.Arrays from each process's local shard.

    ``arrays`` are host-local numpy batches (this process's events only);
    the result is a global array sharded per ``sharding`` whose leading dim
    is ``local_dim * process_count`` when the sharding splits the batch
    axis across processes. Single-process: a plain ``device_put``.
    """
    if jax.process_count() == 1:
        out = tuple(jax.device_put(a, sharding) for a in arrays)
    else:
        out = tuple(
            jax.make_array_from_process_local_data(sharding, np.asarray(a))
            for a in arrays)
    return out[0] if len(out) == 1 else out
