"""Run driver: the training loop around the fused step.

Reference-parity behavior (reference: train.py:22-247): run-dir setup, seed,
model build, resume, loggers, epoch loop with periodic SV logging /
checkpoint+samples / FID test, and the same on-disk log formats. TPU-native
internals: one jitted fused step, host-threaded data pipeline with device
prefetch, mesh sharding when configured.
"""

from __future__ import annotations

import functools
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from ieagan_tpu.core.config import event_size
from ieagan_tpu.models import Generator, Discriminator
from ieagan_tpu.train.step import init_train_state, make_train_step
from ieagan_tpu.utils import (Logger, MetricsLogger, initialize_directories,
                              write_metadata, save_checkpoint, load_checkpoint,
                              latest_checkpoint)


def seed_rng(seed: int) -> jax.Array:
    """Explicit-key RNG plumbing (replaces reference's global seeding,
    utils/__init__.py:218-226)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@functools.lru_cache(maxsize=8)
def _sv_packer():
    @jax.jit
    def pack(leaves):
        return jnp.concatenate([jnp.ravel(l)[:1] for l in leaves])
    return pack


def _fetch(arr) -> np.ndarray:
    """Device->host for possibly-global (multi-host) arrays: a replicated
    global array is not fully addressable, but any one of its addressable
    shards holds the full value."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return np.asarray(arr.addressable_data(0))
    return np.asarray(arr)


def get_singular_values(state, prefix: str) -> dict:
    """Flatten logged SN singular values (reference:
    utils/__init__.py:572-588 formats keys with underscores).

    All values are packed into ONE device array before fetching — per-leaf
    host transfers cost ~100ms each over a network-attached chip (211 SN
    layers made naive sv logging a 20s stall, found via the profiler trace).
    """
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    names, leaves = [], []
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        if keys and keys[-1] == "sv":
            name = f"{prefix}_" + "_".join(str(k) for k in keys)
            names.append(name.replace(".", "_"))
            leaves.append(leaf)
    if not names:
        return {}
    vals = _fetch(_sv_packer()(tuple(leaves)))
    return dict(zip(names, vals.astype(float)))


def save_event_grid(imgs, path):
    """Save a grid PNG of the (B, H, W, 1) batch in ADU space."""
    from PIL import Image
    from ieagan_tpu.ops.image_norm import denorm
    adu = np.asarray(denorm(jnp.asarray(imgs)))[..., 0]  # (B, H-6, W)
    n = adu.shape[0]
    ncol = max(1, int(np.sqrt(n)))
    nrow = (n + ncol - 1) // ncol
    h, w = adu.shape[1:]
    grid = np.zeros((nrow * h, ncol * w), np.uint8)
    for i in range(n):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = adu[i].astype(np.uint8)
    Image.fromarray(grid).save(path)


def run(config: dict):
    device_count = jax.device_count()
    is_main = jax.process_index() == 0
    rng = seed_rng(int(config["seed"]))
    es = event_size(config)
    epb = int(config.get("events_per_batch", 1))
    runpath = pathlib.Path(config["outputroot"]) / config["run_name"]

    from ieagan_tpu.core.precision import get_policy
    policy = get_policy(config.get("compute_dtype", "bfloat16"))
    G = Generator.from_config(config, dtype=policy.compute_dtype)
    D = Discriminator.from_config(config, dtype=policy.compute_dtype)

    # Init-stage progress prints double as watchdog liveness markers: a
    # chip-server wedge during init is otherwise indistinguishable from a
    # slow compile (round-3 campaign lost ~30 min per silent init wedge).
    if jax.process_index() == 0:
        print("init: device param init...", flush=True)
    rng, k_init = jax.random.split(rng)
    state = init_train_state(G, D, config, k_init)
    n_params_g = sum(x.size for x in jax.tree_util.tree_leaves(state.params_G))
    n_params_d = sum(x.size for x in jax.tree_util.tree_leaves(state.params_D))
    if is_main:
        print(f"Param count for G: {n_params_g}")
        print(f"Param count for D: {n_params_d}")
        print(f"devices: {device_count} ({jax.process_count()} processes), "
              f"events/batch: {epb}")

    state_dict = {"itr": 0, "epoch": 0, "save_num": 0, "save_best_num": 0,
                  "best_FID": 999999.0}

    weights_dir = runpath / "weights"
    if config.get("resume"):
        tag = latest_checkpoint(weights_dir)
        if tag:
            if is_main:
                print(f"Resuming from checkpoint '{tag}'")
            state, state_dict = load_checkpoint(
                weights_dir, state, tag,
                load_optim=bool(config.get("load_optim", True)))
            if is_main:
                print(f"checkpoint '{tag}' loaded (itr "
                      f"{state_dict.get('itr')})", flush=True)
            if float(state_dict.get("best_FID", 0.0)) < 0:
                # self-heal checkpoints poisoned by an invalid (negative)
                # FID recorded before the guard in _maybe_test existed
                if is_main:
                    print(f"resetting invalid best_FID "
                          f"{state_dict['best_FID']} from checkpoint")
                state_dict["best_FID"] = 999999.0
            # A copy<N> written BEFORE that itr's eval carries a stale
            # best_FID threshold; resuming from it (watchdog restart or
            # plain --resume, not just the artifact-seeding path that
            # scripts/flagship_campaign.sh already floors) would rotate a
            # non-improvement into a best<N> slot, overwriting the true
            # best in the run dir (round-4 advisor, high severity). The
            # best tags' own state_dicts record their genuine FIDs — the
            # rotation threshold can never be worse than their minimum.
            best_fids = []
            for p in weights_dir.glob("state_dict_best*.json"):
                try:
                    v = float(json.loads(p.read_text()).get(
                        "best_FID", float("inf")))
                except (ValueError, OSError):
                    continue
                if v > 0:
                    best_fids.append(v)
            if best_fids and min(best_fids) < float(state_dict["best_FID"]):
                if is_main:
                    print(f"best_FID threshold floored "
                          f"{state_dict['best_FID']:.2f} -> "
                          f"{min(best_fids):.2f} (existing best tags)")
                state_dict["best_FID"] = min(best_fids)

    # Log sinks write files — process 0 only; other processes still track
    # state_dict so best/rotation bookkeeping stays consistent everywhere.
    train_log = Logger(config) if is_main else None
    metrics_log = MetricsLogger(config) if is_main else None
    if is_main:
        write_metadata(config, state_dict)

    # Data
    if config.get("debug") or not config.get("dataroot"):
        print("debug/synthetic data path")
        steps_per_epoch = int(config.get("debug_batches", 8))
        # Synthetic batches are generated ON DEVICE and cycled: uploading
        # fresh host batches costs a full host->device transfer per step
        # (ruinous over a network-attached chip); the real data path overlaps
        # transfers in the loader's producer thread instead.
        es_dbg = event_size(config)
        h_dbg = int(config["resolution"])
        w_dbg = h_dbg * int(config["H_base"])
        n_distinct = min(steps_per_epoch, 4)
        # multi-process: each process contributes its LOCAL events only
        # (host_local_batch assembles the global batch in the step wrapper)
        epb_local = epb // jax.process_count()
        make_batch = jax.jit(lambda k: jax.random.uniform(
            k, (es_dbg * max(1, epb_local), h_dbg, w_dbg, 1),
            jnp.float32, -1.0, 1.0))
        dbg_batches = [
            (make_batch(jax.random.PRNGKey(
                int(config["seed"]) + i + 1000 * jax.process_index())),
             jnp.tile(jnp.arange(es_dbg, dtype=jnp.int32), max(1, epb_local)))
            for i in range(n_distinct)]

        def loader_factory():
            for i in range(steps_per_epoch):
                yield dbg_batches[i % n_distinct]
    else:
        from ieagan_tpu.data import load_dataset
        device_transform = bool(config.get("device_transform", False))
        loader = load_dataset(config["dataroot"],
                              num_workers=int(config["num_workers"]),
                              shuffle=bool(config["shuffle"]),
                              seed=int(config["seed"]),
                              events_per_batch=epb,
                              raw_uint8=device_transform)
        # Resume: continue the shuffle sequence at the resumed epoch — a
        # fresh loader would otherwise re-deal epoch 0's order (the epoch
        # loop below starts at state_dict["epoch"], so the permutations
        # must line up with it).
        loader.set_epoch(int(state_dict.get("epoch", 0)))
        # device_put in the loader's producer thread overlaps the
        # host->device upload with the previous step's compute.
        loader.sharding = jax.devices()[0] if device_count == 1 else None
        loader_factory = lambda: loader
        steps_per_epoch = len(loader)

    # Multi-chip/multi-host: shard events over the data axis of a mesh; the
    # same fused step compiles with XLA collectives for the gradient/BN
    # reductions. The `mesh` config key ({"data": N[, "model": M]}, "NxM",
    # or N) is the explicit pod-scale control; without it a data-only mesh
    # is auto-built when the batch can fill the local devices.
    mesh = None
    tensor_parallel = False
    use_device_transform = (not config.get("debug") and config.get("dataroot")
                            and bool(config.get("device_transform", False)))
    mesh_cfg = config.get("mesh")
    if mesh_cfg:
        from ieagan_tpu.core.mesh import make_mesh, parse_mesh_spec
        n_data, n_model = parse_mesh_spec(mesh_cfg)
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        tensor_parallel = n_model > 1
        if epb % n_data:
            raise ValueError(f"events_per_batch={epb} must divide over the "
                             f"mesh data axis ({n_data})")
    elif device_count > 1 and epb >= device_count:
        from ieagan_tpu.core.mesh import make_mesh
        mesh = make_mesh(n_data=device_count)
    if mesh is not None:
        from ieagan_tpu.parallel.sharding import (
            place_state, batch_shardings, make_sharded_train_step)
        state = place_state(state, mesh, tensor_parallel=tensor_parallel)
        batch_sh = batch_shardings(mesh)
        if (not config.get("debug") and config.get("dataroot")
                and jax.process_count() == 1):
            loader.sharding = batch_sh  # loader thread shards the upload
        if is_main:
            print(f"mesh: {dict(mesh.shape)} tp={tensor_parallel}")
        train_step = make_sharded_train_step(
            G, D, config, mesh, tensor_parallel=tensor_parallel,
            steps_per_epoch=steps_per_epoch,
            device_transform=use_device_transform)
    else:
        base_step = make_train_step(G, D, config, steps_per_epoch)
        if use_device_transform:
            # uint8 batches cross the wire; the pad/lognorm/noise transform
            # is fused into the jitted step (ops/image_norm.py, config key
            # device_transform)
            from ieagan_tpu.ops.image_norm import device_event_transform

            def step_with_transform(state, raw, y, rng):
                rng, kn = jax.random.split(rng)
                x = device_event_transform(raw, kn)
                return base_step(state, x, y, rng)

            train_step = jax.jit(step_with_transform, donate_argnums=(0,))
        else:
            train_step = jax.jit(base_step, donate_argnums=(0,))

    if is_main:
        print("entering train loop (first step compiles: ~1-8 min on the "
              "tunneled chip, fast when the persistent cache is warm)",
              flush=True)
    itr = int(state.itr)
    t_start = time.time()
    t_last_log = t_start
    stop_after = int(config.get("stop_after", 10 ** 9))
    # Profiling hooks (reference has none — SURVEY.md §5; here jax.profiler
    # traces are a config switch: trace_dir + trace_start/trace_steps).
    trace_dir = config.get("trace_dir")
    trace_start = int(config.get("trace_start", 10))
    trace_steps = int(config.get("trace_steps", 5))
    tracing = False
    for epoch in range(state_dict.get("epoch", 0), int(config["num_epochs"])):
        for x, y in loader_factory():
            itr += 1
            state_dict["itr"] = itr
            try:
                rng, k_step = jax.random.split(rng)
            except Exception as e:  # noqa: BLE001
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # Even this tiny allocation can catch the heap full right
                # after an eval: PJRT buffer frees travel the tunnel
                # lazily. Settle and retry (same discipline as the step).
                import gc
                print("rng split RESOURCE_EXHAUSTED; settling 60s")
                gc.collect()
                jax.clear_caches()
                time.sleep(60)
                rng, k_step = jax.random.split(rng)
            if mesh is None:
                x = jnp.asarray(x)
                y = jnp.asarray(y)
            # mesh path: the sharded step wrapper places host batches
            # itself (host_local_batch — multi-process safe); batches the
            # loader already device_put with the data sharding pass through.
            if trace_dir and itr == trace_start:
                jax.profiler.start_trace(str(trace_dir))
                tracing = True
            try:
                state, metrics = train_step(state, x, y, k_step)
            except Exception as e:  # noqa: BLE001 — match on message below
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # The flagship step's HBM temp (~15G of 15.75G) leaves no
                # headroom for residue from the periodic FID eval's
                # executables (observed: first post-eval step OOMs). Drop
                # every cached executable (the persistent compile cache
                # makes the reload cheap), settle, and retry once.
                import gc
                print("train step RESOURCE_EXHAUSTED; clearing device "
                      "caches and retrying once")
                gc.collect()
                jax.clear_caches()
                time.sleep(20)
                state, metrics = train_step(state, x, y, k_step)
            if tracing and itr >= trace_start + trace_steps:
                jax.block_until_ready(state.params_G)
                jax.profiler.stop_trace()
                tracing = False
                print(f"profiler trace written to {trace_dir}")

            if itr % int(config["log_interval"]) == 0:
                # one packed transfer (per-scalar fetches pay a tunnel round
                # trip each)
                keys_sorted = sorted(metrics)
                packed = _fetch(_sv_packer()(
                    tuple(metrics[k] for k in keys_sorted)))
                now = time.time()
                metrics_host = dict(zip(keys_sorted, packed.astype(float)))
                sec_per_itr = (now - t_last_log) / int(config["log_interval"])
                t_last_log = now
                if is_main:
                    print(f"itr {itr} ({now - t_start:.1f}s, "
                          f"{sec_per_itr:.3f}s/itr): " + ", ".join(
                              f"{k}={v:.4f}" for k, v in metrics_host.items()))
                    train_log.log(itr, sec_per_itr=sec_per_itr, **metrics_host)

            if itr % int(config["sv_log_interval"]) == 0:
                svs = {}
                svs.update(get_singular_values(state.state_G.get("spectral", {}), "G"))
                svs.update(get_singular_values(state.state_D.get("spectral", {}), "D"))
                if svs and is_main:
                    train_log.log(itr, **svs)

            if itr % int(config["save_every"]) == 0:
                save_and_sample(G, state, state_dict, config, runpath)

            if itr % int(config["test_every"]) == 0:
                run_test(G, state, state_dict, config, metrics_log)

            if itr >= stop_after:
                break
        state_dict["epoch"] = epoch + 1
        if itr >= stop_after:
            break
    # final checkpoint
    save_and_sample(G, state, state_dict, config, runpath)
    return state, state_dict


def save_and_sample(G, state, state_dict, config, runpath):
    """Checkpoint + fixed-z sample grid (reference:
    utils/__init__.py:299-365). Multi-process: every process runs the
    (global) sample programs; only process 0 touches the filesystem — the
    checkpoint fetch itself is process-local (see checkpoint._to_host)."""
    is_main = jax.process_index() == 0
    weights_dir = runpath / "weights"
    itr = state_dict["itr"]
    # cooperative: every process enters (TP-sharded leaves allgather inside
    # _to_host); only process 0 writes files
    save_checkpoint(weights_dir, state, state_dict, f"copy{itr}")
    # rotation bookkeeping (reference save_num semantics)
    if int(config.get("num_save_copies", 2)) > 0:
        state_dict["save_num"] = (state_dict.get("save_num", 0) + 1) \
            % int(config["num_save_copies"])
    # fixed sample grid from (EMA) G
    use_ema = bool(config.get("ema")) and bool(config.get("use_ema"))
    params = state.params_G_ema if use_ema else state.params_G
    gstate = state.state_G_ema if use_ema else state.state_G
    es = event_size(config)
    if config.get("accumulate_stats"):
        from ieagan_tpu.utils.sampling import accumulate_standing_stats
        gstate = accumulate_standing_stats(
            G, params, gstate, config, jax.random.PRNGKey(itr),
            int(config.get("num_standing_accumulations", 16)))
    z = jax.random.normal(jax.random.PRNGKey(int(config["seed"])),
                          (es, int(config["dim_z"])), jnp.float32)
    y = jnp.arange(es, dtype=jnp.int32)
    imgs = jax.jit(lambda p, s: G.apply(
        {"params": p, **s}, z, y, train=False,
        rngs={"rdof": jax.random.PRNGKey(0)}))(params, gstate)
    if is_main:
        save_event_grid(_fetch(imgs.astype(jnp.float32)),
                        runpath / "samples" / f"fixed_samples{itr}.jpg")
    # per-class sample sheet (reference: utils/__init__.py:419-476 saves
    # classes x samples sheets each checkpoint)
    if int(config.get("samples_per_class_sheet", 4)) > 0:
        from ieagan_tpu.utils.sampling import sample_sheet
        from ieagan_tpu.utils.plot import plot_imgs
        sheets = sample_sheet(G, params, gstate, config,
                              jax.random.PRNGKey(itr),
                              samples_per_class=int(
                                  config.get("samples_per_class_sheet", 4)))
        sheets = _fetch(sheets)
        # one strip per class: (samples, H-6, W) tiled rows
        if is_main:
            plot_imgs(sheets.reshape(-1, *sheets.shape[2:]),
                      runpath / "samples" / f"sample_sheet{itr}.jpg",
                      ncol=sheets.shape[1])
    # proxy / G-embedding cosine-similarity heatmaps
    # (reference: train.py:196-229, utils/plot.py:29-70)
    if not is_main:
        return
    try:
        from ieagan_tpu.utils.plot import plot_sim_heatmap
        shared = _fetch(params["shared"]["embedding"])
        plot_sim_heatmap(shared, runpath / "samples" / f"sim_heatmap_G{itr}.jpg",
                         title=f"G shared-embedding similarity @ {itr}")
        proxies = state.params_D.get("embed", {}).get("embedding")
        if proxies is not None:
            plot_sim_heatmap(_fetch(proxies),
                             runpath / "samples" / f"sim_heatmap_D{itr}.jpg",
                             title=f"D class-proxy similarity @ {itr}")
    except Exception as e:  # plotting must never kill training
        print(f"sim-heatmap plotting failed: {e}")


def run_test(G, state, state_dict, config, metrics_log):
    """FID test + best bookkeeping (reference: train_fns.py:209-233)."""
    try:
        from ieagan_tpu.eval.fid import compute_fid_from_state
    except ImportError:
        print("FID engine unavailable; skipping test")
        return
    is_main = jax.process_index() == 0
    if bool(config.get("fid_subprocess", True)) and jax.process_count() == 1:
        # Flagship HBM discipline: in-process evals leave residue the
        # ~15G-temp train step cannot absorb (observed OOM at every
        # itr N*test_every+1 despite cache clearing — PJRT frees land
        # lazily over the tunneled chip). A fresh client that exits
        # cleanly is the one mechanism proven to return the memory
        # (bench.py phase isolation). Requires the checkpoint just saved
        # by save_and_sample (save_every | test_every).
        res = _run_fid_subprocess(state, state_dict, config)
        if res is None:
            return
        fid = float(res["fid"])
        if is_main:
            extras = {}
            if "kid" in res:
                extras["KID"] = float(res["kid"])
                if "kid_floor" in res:  # real-vs-real floor, always shown
                    extras["KID_floor"] = float(res["kid_floor"])
                    print(f"The KID score is {res['kid']} "
                          f"(real-vs-real floor {res['kid_floor']})")
                else:
                    print(f"The KID score is {res['kid']}")
            if "physics" in res:
                p = res["physics"]
                extras["phys_occupancy"] = p["mean_occupancy"]
                extras["phys_mean_charge"] = p["mean_charge"]
                print(f"physics @{p['n_events']}ev: occupancy="
                      f"{p['mean_occupancy']:.5f} mean_charge="
                      f"{p['mean_charge']:.2f} -> {p['pickle']}")
            if extras:
                metrics_log.log(itr=int(state_dict["itr"]), **extras)
    else:
        try:
            fid = compute_fid_from_state(G, state, config)
        except FileNotFoundError as e:
            if is_main:
                print(f"FID reference stats unavailable ({e}); skipping test")
            return
        finally:
            if bool(config.get("fid_free_device_cache", True)):
                import gc
                gc.collect()
                jax.clear_caches()
    if is_main:
        print(f"The FID score is {fid}")
    if not np.isfinite(fid) or fid < 0:
        # Fréchet distance is nonnegative by construction: a negative or
        # non-finite value means the eval numerics failed (seen once from a
        # f32 device eigh at 2048 dims), and letting it into best tracking
        # would beat every real score for the rest of the run.
        if is_main:
            print(f"FID {fid} is invalid (Fréchet >= 0); "
                  "excluded from best-checkpoint tracking")
            metrics_log.log(itr=int(state_dict["itr"]), FID=float(fid))
        return
    if config.get("which_best", "FID") == "FID" and fid < state_dict["best_FID"]:
        # Write the best-tagged checkpoint with num_best_copies rotation
        # (reference: train_fns.py:222-231, utils/__init__.py:689-726).
        n = state_dict.get("save_best_num", 0)
        weights_dir = (pathlib.Path(config["outputroot"]) / config["run_name"]
                       / "weights")
        # cooperative save: every process enters (see save_and_sample)
        if is_main:
            print(f"rotating best{n} checkpoint (FID {fid:.2f} < "
                  f"{state_dict['best_FID']:.2f})", flush=True)
        save_checkpoint(weights_dir, state,
                        dict(state_dict, best_FID=float(fid)), f"best{n}")
        state_dict["save_best_num"] = (n + 1) % int(
            config.get("num_best_copies", 2))
    state_dict["best_FID"] = min(state_dict["best_FID"], fid)
    if is_main:
        metrics_log.log(itr=int(state_dict["itr"]), FID=float(fid))


def _run_fid_subprocess(state, state_dict, config):
    """Run scripts/fid_eval_once.py on the latest saved checkpoint; returns
    its result dict ({"fid": ..., optional "kid"/"physics"}), or None when
    the eval failed or no checkpoint exists yet."""
    import os
    import subprocess
    import sys

    runpath = (pathlib.Path(config["outputroot"]) / config["run_name"])
    itr = int(state_dict.get("itr", int(state.itr)))
    tag = f"copy{itr}"
    if not (runpath / "weights" / f"G_ema_{tag}.msgpack").exists():
        from ieagan_tpu.utils.checkpoint import latest_checkpoint
        tag = latest_checkpoint(runpath / "weights")
        if tag is None:
            print("FID subprocess: no checkpoint to evaluate; skipping")
            return None
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "..", "scripts", "fid_eval_once.py")
    script = os.path.abspath(script)
    env = dict(os.environ)
    timeout = float(config.get("fid_subprocess_timeout", 3600))
    # Popen + polled communicate, NOT subprocess.run: the eval's compile is
    # many silent minutes, and an external staleness watchdog (e.g.
    # scripts/campaign_watchdog.sh) watching this process's log would kill a
    # healthy run — heartbeat the log while the eval is alive.
    cmd = [sys.executable, script, "--run-dir", str(runpath), "--tag", tag]
    # test_every companions (VERDICT r3 item 9): KID shares the FID feature
    # pass; physics stats add generate-only work (config-gated, default off)
    if bool(config.get("test_kid", False)):
        cmd.append("--kid")
    n_phys = int(config.get("test_physics_events", 0))
    if n_phys > 0:
        cmd += ["--physics-events", str(n_phys)]
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    # The eval child is a live chip client. If an external watchdog
    # SIGTERMs *this* process (scripts/campaign_watchdog.sh pause
    # protocol) while the child runs, a plain Popen child would be
    # orphaned and keep the chip's HBM for minutes — the borrower then
    # hits RESOURCE_EXHAUSTED. Take the child down with us, and publish
    # its pid so a SIGKILL'd parent still leaves a breadcrumb for the
    # borrower to wait on (scripts/physics_ab.py --chip).
    import signal
    pidfile = runpath / "fid_subprocess.pid"
    try:
        pidfile.write_text(str(proc.pid))
    except OSError:
        pass

    def _term(signum, frame):
        proc.kill()
        raise SystemExit(128 + signum)

    prev_term = signal.signal(signal.SIGTERM, _term)
    t0 = time.time()
    try:
        while True:
            try:
                stdout, stderr = proc.communicate(timeout=60.0)
                break
            except subprocess.TimeoutExpired:
                if time.time() - t0 > timeout:
                    proc.kill()
                    stdout, stderr = proc.communicate()
                    print("FID subprocess timed out; skipping test",
                          flush=True)
                    return None
                print(f"FID subprocess running ({time.time() - t0:.0f}s)...",
                      flush=True)
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        try:
            pidfile.unlink()
        except OSError:
            pass
    if proc.returncode != 0:
        print(f"FID subprocess failed rc={proc.returncode}: "
              f"{stderr[-800:]}", flush=True)
        return None
    try:
        res = json.loads(stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        print(f"FID subprocess output unparsable: {stdout[-400:]}",
              flush=True)
        return None
    print(f"FID eval ({res['tag']}): nonzero_frac="
          f"{res.get('nonzero_frac', -1):.5f}")
    return res
