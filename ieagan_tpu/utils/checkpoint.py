"""Checkpointing with the reference's file-per-component layout.

The reference saves six component files per tag — G, G_optim, D, D_optim,
state_dict, G_ema — with ``copy<N>`` / ``best<N>`` suffixes (reference:
utils/__init__.py:689-726 save, 592-668 load). Here each component is a
flax-msgpack file written atomically (tmp + rename — the TPU-native answer
to the reference's "extra copy to mitigate corruption" hack,
utils/__init__.py:306-314).
"""

from __future__ import annotations

import json
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _join(name_suffix: str | None, base: str) -> str:
    return f"{base}_{name_suffix}" if name_suffix else base


def _atomic_write(path: pathlib.Path, data: bytes):
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fp:
        fp.write(data)
    os.replace(tmp, path)


_PACKERS: dict = {}


def _to_host(tree):
    """Device->host fetch with per-dtype packing.

    A naive tree_map(np.asarray) issues one transfer per leaf; at ~100ms
    round-trip per transfer on a network-attached chip, a ~2000-leaf
    TrainState costs minutes per checkpoint. Packing all same-dtype leaves
    into one device array first makes it a handful of transfers.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or not any(hasattr(l, "devices") for l in leaves):
        return jax.tree_util.tree_map(np.asarray, tree)
    if any(isinstance(l, jax.Array) and not l.is_fully_addressable
           for l in leaves):
        # Multi-host arrays: the jit packer would be a GLOBAL program, so
        # fetch each leaf's local shard instead — replicated leaves carry
        # the full value in any addressable shard. TP-sharded leaves are
        # allgathered through a global identity program; this is why
        # save_checkpoint must be entered by EVERY process (a
        # process-0-only call would deadlock the pod at the first
        # TP-sharded leaf).
        def fetch(l):
            if isinstance(l, jax.Array) and not l.is_fully_addressable:
                if not l.is_fully_replicated:
                    from jax.experimental import multihost_utils
                    return np.asarray(
                        multihost_utils.process_allgather(l, tiled=True))
                return np.asarray(l.addressable_data(0))
            return np.asarray(l)
        return jax.tree_util.tree_unflatten(
            treedef, [fetch(l) for l in leaves])
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(np.dtype(getattr(leaf, "dtype", np.asarray(leaf).dtype)),
                          []).append(i)
    # Bound each packed transfer: one all-leaves pack is a single ~300MB
    # RPC, and this tunnel wedges forever on monster transfers (observed
    # live: the flagship itr-1000 checkpoint fetch blocked >25 min with
    # zero progress; same pathology as the old 245MB eval fetches). Many
    # ~32MB transfers also give per-chunk liveness prints the campaign
    # watchdog can see.
    chunk_bytes = int(os.environ.get("IEAGAN_FETCH_CHUNK_MB", "32")) * (1 << 20)
    chunks: list = []
    for dtype, idxs in groups.items():
        cur: list = []
        cur_bytes = 0
        for i in idxs:
            shape = np.shape(leaves[i])
            nbytes = int(np.prod(shape) if shape else 1) * dtype.itemsize
            if cur and cur_bytes + nbytes > chunk_bytes:
                chunks.append((dtype, cur))
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += nbytes
        if cur:
            chunks.append((dtype, cur))
    total_mb = sum(int(np.prod(np.shape(leaves[i]) or (1,))) * d.itemsize
                   for d, idxs in chunks for i in idxs) / (1 << 20)
    # Liveness threshold must catch EVERY component of a flagship save
    # (G params are 46MB): the post-FID best-rotation fetch re-pays packer
    # compiles after the driver's jax.clear_caches() and ran >15 silent
    # minutes — long enough for the campaign watchdog to churn-kill a
    # healthy run (observed round-5, itr 11000).
    verbose = total_mb > 16
    out: list = [None] * len(leaves)
    for n, (dtype, idxs) in enumerate(chunks):
        sig = (dtype, tuple((np.shape(leaves[i])) for i in idxs))
        if sig not in _PACKERS:
            _PACKERS[sig] = jax.jit(
                lambda ls: jnp.concatenate([jnp.ravel(l) for l in ls])
                if len(ls) > 1 else jnp.ravel(ls[0]))
        packed = np.asarray(_PACKERS[sig](tuple(leaves[i] for i in idxs)))
        if verbose:
            print(f"checkpoint fetch: chunk {n + 1}/{len(chunks)} "
                  f"({packed.nbytes / (1 << 20):.0f} MB)", flush=True)
        off = 0
        for i in idxs:
            shape = np.shape(leaves[i])
            size = int(np.prod(shape)) if shape else 1
            out[i] = packed[off:off + size].reshape(shape)
            off += size
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(weights_dir, train_state, state_dict: dict,
                    name_suffix: str | None = None):
    """Save all components of a TrainState under the run's weights dir.

    Multi-process: EVERY process must call this — TP-sharded leaves are
    allgathered to the host through a global program in ``_to_host`` —
    but only process 0 touches the filesystem.
    """
    weights_dir = pathlib.Path(weights_dir)
    components = {
        "G": {"params": train_state.params_G, "state": train_state.state_G},
        "D": {"params": train_state.params_D, "state": train_state.state_D},
        "G_optim": train_state.opt_G,
        "D_optim": train_state.opt_D,
        "G_ema": {"params": train_state.params_G_ema,
                  "state": train_state.state_G_ema},
    }
    host = {}
    for base, tree in components.items():
        # One line per component: the watchdog keys on log freshness, and
        # a full flagship save is ~240MB of chunked tunnel RPCs plus
        # packer recompiles when the driver cleared caches for the eval.
        print(f"checkpoint save: fetching {base}...", flush=True)
        host[base] = _to_host(tree)
    if jax.process_index() != 0:
        return
    weights_dir.mkdir(parents=True, exist_ok=True)
    for base, tree in host.items():
        path = weights_dir / f"{_join(name_suffix, base)}.msgpack"
        _atomic_write(path, serialization.to_bytes(tree))
    sd = dict(state_dict)
    sd["itr"] = int(train_state.itr)
    _atomic_write(weights_dir / f"{_join(name_suffix, 'state_dict')}.json",
                  json.dumps(sd).encode())


def load_checkpoint(weights_dir, train_state, name_suffix: str | None = None,
                    load_optim: bool = True):
    """Restore a TrainState (templates give the pytree structure); returns
    (train_state, state_dict)."""
    weights_dir = pathlib.Path(weights_dir)

    with open(weights_dir / f"{_join(name_suffix, 'state_dict')}.json") as fp:
        sd = json.load(fp)
    import jax.numpy as jnp

    def load(base, template, graft_ok=False):
        path = weights_dir / f"{_join(name_suffix, base)}.msgpack"
        with open(path, "rb") as fp:
            raw = fp.read()
        try:
            tree = serialization.from_bytes(template, raw)
        except (ValueError, KeyError, TypeError):
            if not graft_ok:
                raise
            # Optimizer msgpacks saved before round 5 serialize the
            # constant-lr structure (EmptyState at the lr node); the live
            # template now always carries ScaleByScheduleState(count).
            # Graft: take every serialized leaf that exists, keep template
            # defaults for the rest, then seed the schedule count with the
            # resumed itr (the reference scheduler's position after
            # itr/steps_per_epoch epochs, train.py:244-247).
            print(f"checkpoint '{path.name}': legacy optimizer structure; "
                  "grafting into the scheduled-optimizer tree")
            src = serialization.msgpack_restore(raw)
            tpl_sd = serialization.to_state_dict(template)

            def merge(t, s):
                if isinstance(t, dict):
                    return {k: (merge(v, s.get(k))
                                if isinstance(s, dict) else v)
                            for k, v in t.items()}
                return t if s is None else s

            tree = serialization.from_state_dict(template, merge(tpl_sd, src))
            import optax
            itr0 = jnp.asarray(sd.get("itr", 0), jnp.int32)
            tree = jax.tree_util.tree_map(
                lambda s: (optax.ScaleByScheduleState(count=itr0)
                           if isinstance(s, optax.ScaleByScheduleState)
                           else s),
                tree,
                is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState))
        if jax.process_count() == 1:
            # packed upload: resuming otherwise pays a per-leaf tunnel
            # round trip on the first train step (multi-process keeps the
            # host arrays for make_array_from_callback placement)
            from ieagan_tpu.utils.transfer import packed_device_put
            tree = packed_device_put(tree)
        return tree

    g = load("G", {"params": train_state.params_G, "state": train_state.state_G})
    d = load("D", {"params": train_state.params_D, "state": train_state.state_D})
    gema = load("G_ema", {"params": train_state.params_G_ema,
                          "state": train_state.state_G_ema})
    updates = dict(
        params_G=g["params"], state_G=g["state"],
        params_D=d["params"], state_D=d["state"],
        params_G_ema=gema["params"], state_G_ema=gema["state"])
    if load_optim:
        updates["opt_G"] = load("G_optim", train_state.opt_G, graft_ok=True)
        updates["opt_D"] = load("D_optim", train_state.opt_D, graft_ok=True)
    updates["itr"] = jnp.asarray(sd.get("itr", 0), jnp.int32)
    return train_state.replace(**updates), sd


def latest_checkpoint(weights_dir) -> str | None:
    """Find the most recent copy<N> suffix present, else None."""
    weights_dir = pathlib.Path(weights_dir)
    if not weights_dir.exists():
        return None
    tags = []
    for p in weights_dir.glob("state_dict_*.json"):
        tag = p.stem[len("state_dict_"):]
        try:
            with open(p) as fp:
                itr = json.load(fp).get("itr", -1)
            tags.append((itr, tag))
        except (json.JSONDecodeError, OSError):
            continue
    if not tags:
        return None
    return max(tags)[1]
