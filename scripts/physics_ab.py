#!/usr/bin/env python3
"""Physics-residual A/B harness: train recipe variants at 64px on CPU and
score them on the residual observables.

The round-4 flagship campaign converged (best FID 119.4 at itr 14000) but
with a physics residual: per-sensor occupancy ~0.5x LOW and mean charge
~1.6x HOT — fewer-but-brighter hits (docs/VALIDATION.md r4). The
checkpoint-selection sweep showed the residual is a property of the
training recipe, not of checkpoint choice, so candidate levers (DiffAug
strength, uniformity weight, IEA temperature, lr schedule, ...) must be
A/B-tested. Flagship chip-hours are too expensive for that, and the chip
carries the live campaign — this harness reproduces the measurement at
64px/40-sensor scale on the CPU backend (the scale the round-3 dynamics
oracle already validated, scripts/dynamics_compare.py) and emits one JSON
line per variant with the GAN/real ratios of the residual observables.

Usage:
  python scripts/physics_ab.py NAME [--steps 2000] [--overrides '{...}']
      [--eval-events 400] [--root _local/ab64] [--train-events 1200]
      [--chip]
Results append to docs/physics_ab.jsonl (one line per finished variant).

--chip (round-5): run the arm on the real TPU instead of XLA:CPU. The
64px step is ~82 s/itr on this host's single CPU core — a 2000-step arm
is ~45 h, which made CPU arms economically impossible (round-4 verdict
item 3). On the chip the same arm is minutes. The flagship campaign owns
the chip, so the arm borrows it via the watchdog pause protocol
(__graft_entry__._pause_campaigns): touch <log>.pause -> watchdog kills
train.py -> run the arm -> remove the pause -> watchdog resumes from the
latest checkpoint. A keepalive refreshes the pause file's mtime (the
watchdog treats >30-min-old pauses as leaked) and a TTL janitor removes
it if this process dies.

Reference protocol being scored: Evaluation/eval_all.py:75-120 (intensity
spectrum / occupancy / per-sensor mean charge, 7-ADU noise cut).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 64px regime: flagship knobs with only the geometry scaled down (same
# choice as the round-3 dynamics A/B, scripts/dynamics_compare.py) and the
# eval/sample machinery disabled (no FID stats exist at this scale).
BASE_OVERRIDES = dict(
    resolution=64, H_base=1,
    test_every=10 ** 9, sample_every=10 ** 9, sv_log_interval=10 ** 9,
    log_interval=50, num_workers=2, use_pallas_attention=False,
)


def ensure_split(split_dir: str, events: int, event_seed: int | None):
    probe = os.path.join(split_dir, "1.1.1")
    if os.path.isdir(probe) and len(os.listdir(probe)) >= events:
        return
    cmd = [sys.executable, os.path.join(REPO, "scripts",
                                        "make_synthetic_dataset.py"),
           split_dir, "--events", str(events), "--sensors", "40",
           "--height", "58", "--width", "64", "--seed", "0"]
    if event_seed is not None:
        cmd += ["--event-seed", str(event_seed)]
    subprocess.run(cmd, check=True)


def _acquire_chip(ttl_s: int):
    """Borrow the chip from any live campaign. Returns a release()."""
    import glob

    sys.path.insert(0, REPO)
    from __graft_entry__ import _pause_campaigns
    _pause_campaigns(ttl_s=ttl_s)

    # The (pre-round-5) driver's FID subprocess survives its parent's
    # SIGTERM as an orphaned chip client; wait for the breadcrumb pid.
    for pf in glob.glob(os.path.join(REPO, "_local", "runs", "*",
                                     "fid_subprocess.pid")):
        try:
            pid = int(open(pf).read().strip())
        except (ValueError, OSError):
            continue
        t0 = time.time()
        while time.time() - t0 < 900:
            try:
                os.kill(pid, 0)
            except OSError:
                break
            print(f"waiting on orphaned FID eval pid {pid}...", flush=True)
            time.sleep(15)

    pauses = glob.glob(os.path.join(REPO, "_local", "runs", "*.log.pause"))

    # The watchdog treats a pause file whose mtime is >30 min old as
    # leaked and resumes — refresh while the arms are still running.
    # A DETACHED shell loop, not an in-process thread: a Python thread
    # can be starved past the 30-min threshold by long GIL-holding chip
    # calls (observed round-5: a 34-min grid lost its pause at +1800s
    # and the campaign relaunched onto the chip mid-arm). The loop exits
    # by itself once the pause file is gone (release() or TTL janitor).
    import shlex
    import subprocess
    for p in pauses:
        q = shlex.quote(p)
        subprocess.Popen(
            ["sh", "-c",
             f"while [ -f {q} ]; do touch {q}; sleep 60; done"],
            start_new_session=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def release():
        for p in pauses:
            try:
                os.remove(p)
            except OSError:
                pass

    return release


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--overrides", default="{}",
                    help="JSON config overrides = the lever under test")
    ap.add_argument("--grid", default=None,
                    help="JSON file (or inline JSON) with a list of arms "
                         '[{"name":..., "overrides":{...}, "steps":N}, ...]; '
                         "all arms run inside ONE chip pause window and "
                         "share the in-process jit cache")
    ap.add_argument("--eval-events", type=int, default=400)
    ap.add_argument("--root", default=os.path.join(REPO, "_local", "ab64"))
    ap.add_argument("--train-events", type=int, default=1200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chip", action="store_true",
                    help="borrow the TPU via the campaign pause protocol")
    ap.add_argument("--chip-ttl", type=int, default=5400,
                    help="janitor TTL on the pause files (crash failsafe)")
    args = ap.parse_args()

    import jax
    release = None
    if args.chip:
        release = _acquire_chip(args.chip_ttl)
    else:
        # CPU backend: the chip belongs to the flagship campaign. Must
        # happen before first backend use (the axon plugin ignores
        # JAX_PLATFORMS).
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    if args.grid:
        raw = (open(args.grid).read() if os.path.exists(args.grid)
               else args.grid)
        arms = json.loads(raw)
    else:
        if not args.name:
            ap.error("need a variant NAME (or --grid)")
        arms = [{"name": args.name, "overrides": json.loads(args.overrides),
                 "steps": args.steps}]

    import traceback
    try:
        for arm in arms:
            print(f"=== arm {arm['name']} ===", flush=True)
            try:
                _run_arm(args, arm["name"], arm.get("overrides", {}),
                         int(arm.get("steps", args.steps)))
            except Exception:
                # one broken arm must not burn the rest of the grid's
                # chip window
                traceback.print_exc()
    finally:
        if release is not None:
            release()


def _run_arm(args, name, overrides, steps):
    train_root = os.path.join(args.root, "train")
    test_root = os.path.join(args.root, "test")
    ensure_split(train_root, args.train_events, None)
    ensure_split(test_root, 400, 9000)

    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.train.driver import run

    config = dict(DEFAULT_CONFIG)
    config.update(BASE_OVERRIDES)
    config.update(overrides)
    # one step consumes events_per_batch events (the epb=3 arm would
    # otherwise exhaust num_epochs at steps/3 and silently under-train)
    steps_per_epoch = max(
        1, args.train_events // int(config.get("events_per_batch", 1)))
    config.update(
        dataroot=train_root,
        outputroot=os.path.join(args.root, "runs"),
        run_name=name,
        num_epochs=max(1, math.ceil(steps / steps_per_epoch)),
        stop_after=steps,
        save_every=steps,  # final checkpoint is also written by run()
    )
    os.makedirs(config["outputroot"], exist_ok=True)
    from ieagan_tpu.utils import initialize_directories
    config["resume"] = True  # reuse the run dir when re-scoring a variant
    initialize_directories(config)
    t0 = time.time()
    run(config)
    train_s = time.time() - t0

    # Score: generated vs real observables at the 7-ADU protocol.
    from ieagan_tpu.deploy import Model
    from ieagan_tpu.eval import physics

    weights_dir = os.path.join(args.root, "runs", name, "weights")
    # the full train config carries every arch key a lever might touch;
    # non-arch keys are inert for the Generator build
    model = Model.restore(weights_dir, config=config)
    gan = physics.get_stats(
        physics.generate_event_stream(model.module, model.params,
                                      model.state, model.config, args.seed),
        args.eval_events)
    real = physics.get_stats(physics.real_event_stream(test_root, args.seed),
                             min(400, args.eval_events))

    def tail_fraction(s):
        """Fraction of above-threshold intensity mass above 60 ADU — the
        over-weighted tail in the r4 residual (docs/VALIDATION.md)."""
        bins, hist = s["intensity_bins"], s["intensity_hist"]
        above = hist[2:]  # skip [-1,1) and [1,7) bins
        centers = 0.5 * (bins[2:-1] + bins[3:])
        total = above.sum()
        return float(above[centers > 60].sum() / total) if total else 0.0

    occ_g = float(gan["per_sensor_occupancy"].mean())
    occ_r = float(real["per_sensor_occupancy"].mean())
    import numpy as np
    chg_g = float(np.nanmean(gan["per_sensor_mean_charge"]))
    chg_r = float(np.nanmean(real["per_sensor_mean_charge"]))
    import jax
    result = {
        "variant": name,
        "overrides": overrides,
        "steps": steps,
        "backend": jax.default_backend(),
        "train_s": round(train_s, 1),
        "eval_events": args.eval_events,
        "occupancy_gan": occ_g, "occupancy_real": occ_r,
        "occupancy_ratio": occ_g / occ_r if occ_r else None,
        "mean_charge_gan": chg_g, "mean_charge_real": chg_r,
        "mean_charge_ratio": chg_g / chg_r if chg_r else None,
        "tail_frac_gan": tail_fraction(gan),
        "tail_frac_real": tail_fraction(real),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "docs", "physics_ab.jsonl"), "a") as fp:
        fp.write(line + "\n")


if __name__ == "__main__":
    main()
