#!/usr/bin/env python3
"""Simulated multi-host dryrun: N real OS processes, one global mesh.

Validates the full multi-host stack without a pod: each process owns
``--devices-per-proc`` virtual CPU devices, joins via
``jax.distributed.initialize`` (the exact call a TPU pod worker makes), and
runs ONE fused sharded train step on a tiny config with per-process data
shards (``host_local_batch``). The parent asserts every process reports
identical replicated metrics — i.e. the global-batch psums really ran
across process boundaries.

Usage:
  python scripts/multihost_dryrun.py [--nprocs 2] [--devices-per-proc 4]
  python scripts/multihost_dryrun.py --driver   # pod-style CLI launch

--driver validates the PUBLIC surface end-to-end: every process execs the
preserved ``train.py`` CLI (exactly what each pod worker would run — zero
custom code), with the mesh config key, the debug data path, a few steps,
and a final checkpoint; the parent asserts process 0 wrote logs +
checkpoint files and process 1 wrote nothing.
Exit code 0 = all processes agree.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(args) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}")
    # Gloo (the CPU cross-process collective transport) must bind loopback
    # in sandboxed/containerized environments.
    os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from ieagan_tpu.parallel.distributed import initialize
    initialize(coordinator_address=f"localhost:{args.port}",
               num_processes=args.nprocs, process_id=args.proc_id)
    assert jax.process_count() == args.nprocs
    n_devices = jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.core.mesh import make_mesh
    from ieagan_tpu.models import Generator, Discriminator
    from ieagan_tpu.train import init_train_state
    from ieagan_tpu.train.step import make_train_step
    from ieagan_tpu.parallel.sharding import batch_shardings, place_state
    from ieagan_tpu.parallel.distributed import host_local_batch

    n_model = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    n_data = n_devices // n_model
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    config = dict(
        DEFAULT_CONFIG, resolution=32, G_ch=16, D_ch=16, G_depth=1, D_depth=1,
        H_base=1, n_classes=4, events_per_batch=n_data,
        use_pallas_attention=False, G_attn="0", D_attn="16",
        compute_dtype="float32")

    G = Generator.from_config(config)
    D = Discriminator.from_config(config)
    # same seed on every process -> identical initial params
    state = init_train_state(G, D, config, jax.random.PRNGKey(0))
    tp = n_model > 1
    state = place_state(state, mesh, tensor_parallel=tp)
    step = jax.jit(make_train_step(G, D, config), donate_argnums=(0,))

    # deterministic GLOBAL batch; this process keeps its contiguous slice
    es = config["n_classes"]
    batch = es * config["events_per_batch"]
    rng = np.random.default_rng(123)
    x_global = rng.uniform(-1, 1, (batch, 32, 32, 1)).astype(np.float32)
    y_global = np.tile(np.arange(es, dtype=np.int32),
                       config["events_per_batch"])
    rows_local = batch // args.nprocs
    lo = args.proc_id * rows_local
    x, y = host_local_batch(batch_shardings(mesh),
                            x_global[lo:lo + rows_local],
                            y_global[lo:lo + rows_local])

    # AOT-compile, then a coordination-service barrier: Gloo's context
    # bootstrap times out (30s) if compile skew lets one process reach the
    # first collective long before the other.
    key = jax.random.PRNGKey(2)
    compiled = step.lower(state, x, y, key).compile()
    from jax._src.distributed import global_state as _dist_state
    _dist_state.client.wait_at_barrier("compiled", timeout_in_ms=900_000)
    new_state, metrics = compiled(state, x, y, key)
    jax.block_until_ready(new_state.params_G)
    vals = {k: float(v) for k, v in metrics.items()}
    print("METRICS " + " ".join(f"{k}={vals[k]:.6f}" for k in sorted(vals)),
          flush=True)

    if args.ckpt_dir:
        # TP multi-host checkpoint: a cooperative save (every process
        # enters; TP-sharded leaves allgather across PROCESS boundaries,
        # not just local devices) followed by a process-0 reload + compare.
        from ieagan_tpu.utils import save_checkpoint, load_checkpoint
        from ieagan_tpu.utils.checkpoint import _to_host
        save_checkpoint(args.ckpt_dir, new_state, {"epoch": 0}, "copy1")
        # both processes gather the global param values (global programs —
        # must run everywhere), then process 0 checks the written file
        gathered = _to_host({"params": new_state.params_G})["params"]
        if args.proc_id == 0:
            fresh = init_train_state(G, D, config, jax.random.PRNGKey(9))
            restored, _ = load_checkpoint(args.ckpt_dir, fresh, "copy1")
            a = jax.tree_util.tree_leaves(gathered)
            b = jax.tree_util.tree_leaves(restored.params_G)
            ok = (len(a) == len(b) and all(
                np.array_equal(np.asarray(x), np.asarray(y))
                for x, y in zip(a, b)))
            print("CKPT_OK" if ok else "CKPT_MISMATCH", flush=True)


def parent_driver(args) -> int:
    """Launch N ``train.py`` CLI processes as a pod would and check the
    run artifacts."""
    import shutil
    import tempfile
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    outroot = tempfile.mkdtemp(prefix="mh_driver_")
    cli = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--outputroot", outroot, "--run-name", "mh",
        "--debug", "true", "--debug-batches", "4",
        "--num-epochs", "1", "--stop-after", "4",
        "--mesh", f"{args.nprocs * args.devices_per_proc}x1",
        "--events-per-batch", str(args.nprocs * args.devices_per_proc),
        "--resolution", "32", "--G-ch", "16", "--D-ch", "16",
        "--G-depth", "1", "--D-depth", "1", "--H-base", "1",
        "--n-classes", "4", "--G-attn", "0", "--D-attn", "16",
        "--use-pallas-attention", "false", "--compute-dtype", "float32",
        "--log-interval", "2", "--save-every", "1000",
        "--test-every", "1000", "--sv-log-interval", "1000",
        "--samples-per-class-sheet", "0",
    ]
    procs = []
    for i in range(args.nprocs):
        env = dict(
            os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            IEAGAN_PLATFORM="cpu",
            IEAGAN_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
            XLA_FLAGS=(f"--xla_force_host_platform_device_count="
                       f"{args.devices_per_proc}"),
            GLOO_SOCKET_IFNAME="lo",
            JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(args.nprocs),
            JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            cli, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env))
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            out, _ = p.communicate()
            out = f"[TIMEOUT after 1800s]\n{out}"
        if p.returncode != 0:
            print(f"--- driver process {i} FAILED (rc={p.returncode}) ---\n"
                  f"{out[-4000:]}")
            ok = False
        elif i == 0:
            tail = [l for l in out.splitlines() if l.startswith("itr ")]
            print("\n".join(tail[-2:]))
    rundir = os.path.join(outroot, "mh")
    weights = os.path.join(rundir, "weights")
    if ok:
        ckpts = (sorted(os.listdir(weights)) if os.path.isdir(weights)
                 else [])
        logs = os.path.join(rundir, "logs")
        n_logs = len(os.listdir(logs)) if os.path.isdir(logs) else 0
        if not ckpts or n_logs == 0:
            print(f"driver artifacts missing: ckpts={ckpts[:3]} "
                  f"logs={n_logs}")
            ok = False
        else:
            print(f"multihost_dryrun --driver OK: {args.nprocs} CLI "
                  f"processes, {len(ckpts)} checkpoint files, "
                  f"{n_logs} log files in {rundir}")
    shutil.rmtree(outroot, ignore_errors=True)
    return 0 if ok else 1


def parent(args) -> int:
    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    import tempfile
    ckpt_dir = tempfile.mkdtemp(prefix="mh_ckpt_")
    procs = []
    for i in range(args.nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc-id", str(i), "--port", str(port),
             "--nprocs", str(args.nprocs),
             "--devices-per-proc", str(args.devices_per_proc),
             "--ckpt-dir", ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))))
    lines = []
    ok = True
    ckpt_ok = False
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            # one hung child must not orphan the rest: kill the whole pool
            # and report which process stalled
            for q in procs:
                if q.poll() is None:
                    q.kill()
            out, _ = p.communicate()
            out = f"[TIMEOUT after 1200s]\n{out}"
        metric_lines = [l for l in out.splitlines() if l.startswith("METRICS")]
        if p.returncode != 0 or not metric_lines:
            print(f"--- process {i} FAILED (rc={p.returncode}) ---\n{out}")
            ok = False
        else:
            lines.append(metric_lines[0])
        if i == 0 and "CKPT_OK" in out:
            ckpt_ok = True
    import shutil
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    if ok and len(set(lines)) != 1:
        print(f"processes disagree:\n" + "\n".join(lines))
        ok = False
    if ok and not ckpt_ok:
        print("TP multi-host checkpoint round-trip FAILED (no CKPT_OK)")
        ok = False
    if ok:
        print(f"multihost_dryrun OK: {args.nprocs} processes x "
              f"{args.devices_per_proc} devices agree -> {lines[0]}; "
              "TP allgather checkpoint round-trip OK")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--driver", action="store_true",
                    help="exercise the full train.py CLI per process")
    ap.add_argument("--ckpt-dir", type=str, default=None,
                    help="if set, children run a cooperative TP "
                         "checkpoint save + round-trip check here")
    args = ap.parse_args()
    if args.proc_id is None:
        sys.exit(parent_driver(args) if args.driver else parent(args))
    child(args)


if __name__ == "__main__":
    main()
