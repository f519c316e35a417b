#!/usr/bin/env python3
"""Model-comparison physics evaluation (reference analog:
Evaluation/eval_all.py): accumulate intensity/occupancy/mean-charge stats
for trained checkpoints (IEAGAN + ablations) and, optionally, the real
dataset; pickle the results for scripts/plot_physics.py.

Usage:
  python scripts/eval_all.py --out eval_results.pickle \
      --model IEAGAN:<weights_dir> [--model ContraGAN:<weights_dir> ...] \
      [--dataroot <real-data>] [--n-events 100]

Ablation configs mirror the reference's (eval_all.py:23-72): ContraGAN =
no RRM/rdof; BigGAN_deep = no RRM/rdof/prior; PEGAN adds G attention at 32.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATION_OVERRIDES = {
    "IEAGAN": {},
    "ContraGAN": {"RRM_prx_G": False, "rdof_dim": 0},
    "PEGAN": {"G_attn": "32", "RRM_prx_G": False, "rdof_dim": 0},
    "BigGAN_deep": {"RRM_prx_G": False, "rdof_dim": 0},
}


def load_model(name: str, weights_dir: str, config: dict | None = None):
    """Restore an ablation model from a driver weights dir (handles the
    copy<N> tags) or a torch .pth checkpoint."""
    from ieagan_tpu.deploy import Model
    overrides = dict(ABLATION_OVERRIDES.get(name, {}))
    if config:
        overrides.update(config)
    if weights_dir.endswith((".pth", ".pt")):
        return Model.from_torch(weights_dir, config=overrides)
    return Model.restore(weights_dir, config=overrides)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="eval_results.pickle")
    ap.add_argument("--model", action="append", default=[],
                    help="NAME:weights_dir (repeatable)")
    ap.add_argument("--dataroot", default=None)
    ap.add_argument("--n-events", type=int, default=100,
                    help="generated events per model (reference scale: 10k, "
                         "eval_all.py:101,138)")
    ap.add_argument("--n-events-real", type=int, default=None,
                    help="real events (default: --n-events; the synthetic "
                         "test split holds 400 — the real stream stops at "
                         "dataset size)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when the tunneled "
                         "chip is down); flagship generate is ~2-3 "
                         "min/event there — budget n-events accordingly")
    ap.add_argument("--host-stats", action="store_true",
                    help="pull full ADU events to host and accumulate "
                         "there (the oracle path; default is on-device "
                         "reductions — over a network-attached chip the "
                         "host path is tunnel-bound at 10k events)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ieagan_tpu.eval import physics

    all_stats = {}
    if args.dataroot:
        n_real = args.n_events_real or args.n_events
        all_stats["real"] = physics.get_stats(
            physics.real_event_stream(args.dataroot, args.seed), n_real)
    for spec in args.model:
        name, _, weights_dir = spec.partition(":")
        model = load_model(name, weights_dir)
        if args.host_stats:
            stream = physics.generate_event_stream(
                model.module, model.params, model.state, model.config,
                args.seed)
            all_stats[name] = physics.get_stats(stream, args.n_events)
        else:
            all_stats[name] = physics.generate_stats(
                model.module, model.params, model.state, model.config,
                args.n_events, args.seed)
        print(f"{name}: occupancy mean "
              f"{all_stats[name]['per_sensor_occupancy'].mean():.5f}")

    with open(args.out, "wb") as fp:
        pickle.dump(all_stats, fp)
    print(f"stats -> {args.out}")


if __name__ == "__main__":
    main()
