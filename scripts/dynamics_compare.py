#!/usr/bin/env python3
"""Training-dynamics A/B: the ACTUAL reference trainer vs ours, same data,
same regime, small scale (resolution 64, H_base 1, 40 sensors).

Round-2/3 flagship campaigns show D saturating (D_loss_real == 0 within
100 itrs) and G_loss climbing under the reference hyperparameters
(config.json:49-75) on synthetic data. This experiment decides whether
that signature is a defect of OUR training step or intrinsic to the
regime+data: the reference implementation (run as an oracle from
/root/reference, never copied) is trained CPU-side on the same event tree
and its loss trajectory is compared to ours.

Usage:
  python scripts/dynamics_compare.py ref  --dataroot D --outputroot O [--steps N]
  python scripts/dynamics_compare.py ours --dataroot D --outputroot O [--steps N]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("IEAGAN_REFERENCE", "/root/reference")

# the regime under test: flagship knobs at 64px (reference config.json
# with only geometry scaled down; RR_D/RRM dims keep their hardcoded
# 32-channel/512-hidden assumptions so D_ch must stay 32)
OVERRIDES = dict(
    resolution=64, H_base=1, device="cpu",
    num_workers=2, pin_memory=False, shuffle=True,
    # disable everything but training (no FID stats at this scale)
    test_every=10 ** 9, save_every=10 ** 9, sample_every=10 ** 9,
    sv_log_interval=10 ** 9, log_interval=10,
    # The published config has clip_norm=None, under which the reference's
    # G NEVER steps (G.optim.step() sits inside the clip guard,
    # train_fns.py:190-192 — the quirk our step.py fixes by default). A
    # huge clip bound is a no-op on gradients but arms the reference's G
    # update, making the A/B about the learning dynamics, not the bug.
    clip_norm=1e9,
)


def run_reference(args):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import ref_stubs
    ref_stubs.install()
    sys.path.insert(0, REFERENCE)
    with open(os.path.join(REFERENCE, "config.json")) as f:
        config = json.load(f)
    config.update(OVERRIDES)
    config.update(dataroot=args.dataroot, outputroot=args.outputroot,
                  run_name=args.run_name, num_epochs=args.epochs,
                  resume=False)
    spec = importlib.util.spec_from_file_location(
        "ref_train", os.path.join(REFERENCE, "train.py"))
    ref_train = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_train)
    import torch
    torch.set_num_threads(max(1, (os.cpu_count() or 2) - 1))
    ref_train.main(config)


def run_ours(args):
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from ieagan_tpu.core.config import DEFAULT_CONFIG
    from ieagan_tpu.train.driver import run

    config = dict(DEFAULT_CONFIG)
    config.update(OVERRIDES)
    del config["device"]
    config.update(dataroot=args.dataroot, outputroot=args.outputroot,
                  run_name=args.run_name, num_epochs=args.epochs,
                  stop_after=args.steps, use_pallas_attention=False)
    run(config)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["ref", "ours"])
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--outputroot", required=True)
    ap.add_argument("--run-name", default=None)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()
    if args.run_name is None:
        args.run_name = f"dyn64_{args.side}"
    if args.side == "ref":
        run_reference(args)
    else:
        run_ours(args)


if __name__ == "__main__":
    main()
